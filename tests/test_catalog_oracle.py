"""Differential tests: every catalog query with an oracle must match DuckDB
on sf0.001 — a faster local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

from .oracle import compare

SPECS = [s for s in CATALOG if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, sf_dir):
    compare(spec, spark, sf_dir)


def test_driver_window_priority():
    """The driver oracle-gates only the first DRIVER_WINDOW catalog entries
    (observed in round 1) — every entry that has never had a driver
    CORRECTNESS row must sit inside that window; only r01-green twins and
    beyond-§2 breadth ops may sit past it (they stay oracle-diffed here)."""
    from hadoop_pyspark_streaming_analytics_spark.plans import DRIVER_WINDOW

    window = {s.name for s in CATALOG[:DRIVER_WINDOW]}
    # Rule 1, derived from the driver's own history rather than a
    # hand-copied list (the per-round maintenance kept lagging a round):
    # every oracle-backed entry with NO green driver row in any
    # CORRECTNESS_r*.json must sit inside the window.
    import glob
    import json
    import os

    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, int] = {}
    rounds = []
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        rounds.append(rnd)
        with open(p) as f:
            for name, row in json.load(f).items():
                if row.get("rows_match") and row.get("schema_match"):
                    last_green[name] = max(last_green.get(name, 0), rnd)
    must_be_gated = {
        s.name
        for s in CATALOG
        if s.oracle is not None and s.name not in last_green
    }
    missing = must_be_gated - window
    assert not missing, f"never-driver-gated entries outside window: {missing}"
    # Rule 3, also derived from history (VERDICT r7 item 1): green rows
    # AGE — the driver regenerates testdata each round, so a stale green
    # can hide a real break (the r3 timestamp drift).  Every oracle-backed
    # entry whose last green row is STALENESS_ROUNDS+ rounds old must be
    # in the current window (cutoff widened 3 → 4 in round 10 with the
    # cycle arithmetic documented at plans/__init__.py:STALENESS_ROUNDS —
    # 184 oracle-backed entries / 50 slots can NOT cycle in 3 rounds).
    # This is the refresh-debt forcing function: when a new round's
    # CORRECTNESS file lands, the stale set recomputes and this check
    # tells the next rotation exactly what it owes.
    from hadoop_pyspark_streaming_analytics_spark.plans import (
        ROTATION_ROUND,
        STALENESS_ROUNDS,
    )

    stale_cutoff = max(rounds) - STALENESS_ROUNDS
    stale = {
        s.name
        for s in CATALOG
        if s.oracle is not None and 0 < last_green.get(s.name, 0) <= stale_cutoff
    }
    overdue = stale - window
    if overdue and ROTATION_ROUND == max(rounds):
        # Between rotations (ADVICE r9 item 1): EXACTLY the round this
        # window was rotated for has landed, so the recomputed debt is
        # the NEXT rotation's work, not a regression at this HEAD.  Keep
        # the debt loud (the owed list in the xfail reason) without
        # turning every merged HEAD red.  The downgrade is deliberately
        # one-round-wide: a fresh rotation claim (ROTATION_ROUND > max
        # round) asserts hard below, and so does ROTATION_ROUND < max
        # round — that means an ENTIRE driver round ran on a window
        # never rotated for it, which is the forgotten-rotation failure
        # this forcing function exists to catch (an open-ended `<=`
        # downgrade would stay politely yellow forever).
        pytest.xfail(
            f"rotation debt for round {max(rounds) + 1} (window rotated "
            f"for r{ROTATION_ROUND}): entries last driver-green at "
            f"r{stale_cutoff} or earlier owed a slot: {sorted(overdue)}"
        )
    assert not overdue, (
        f"entries last driver-green at r{stale_cutoff} or earlier are "
        f"outside the window (window rotated for r{ROTATION_ROUND}, "
        f"newest CORRECTNESS round r{max(rounds)}): {sorted(overdue)}"
    )
    # the window must be exactly full: if non-tail entries exceed
    # DRIVER_WINDOW, whichever sorts last silently falls outside the
    # driver's evaluation — the failure mode this whole policy exists to
    # prevent.  (Fewer than DRIVER_WINDOW would waste hard-signal slots.)
    from hadoop_pyspark_streaming_analytics_spark.plans import _TAIL

    non_tail = len(CATALOG) - len(_TAIL)
    assert non_tail == DRIVER_WINDOW, (
        f"{non_tail} non-tail entries vs {DRIVER_WINDOW} driver slots — "
        "update _TAIL in plans/__init__.py"
    )
    # every driver slot must carry a hard differential check — an
    # oracle-less entry inside the window wastes one of the 50 slots.
    # One reviewed exception: sketch_daily_user_hll (DataSketches digests
    # have no DuckDB oracle by construction; its rows-only driver row plus
    # the pinned-estimate test in test_llm_ops is the tier's second signal).
    slotless = [
        s.name
        for s in CATALOG[:DRIVER_WINDOW]
        if s.oracle is None and s.name != "sketch_daily_user_hll"
    ]
    assert not slotless, f"oracle-less entries occupy driver slots: {slotless}"


def test_changed_operator_code_regates():
    """Rule 2 of the window policy, DERIVED instead of hand-listed
    (VERDICT r8 item 5): an oracle-backed entry whose source fingerprint
    (builder + oracle + every transitively-referenced package function
    and constant — plans/fingerprint.py) changed must re-gate.  Two
    enforcement halves:

    1. the recorded fingerprint must match the current source — else
       someone changed operator code without running
       ``python scripts/update_entry_hashes.py`` (which stamps the
       changed entries with regate_round = next driver round);
    2. every entry whose stamped regate_round exceeds its last green
       driver row must sit INSIDE the current driver window — the change
       has not been driver-verified, and a rotation that omits it would
       ship unverified code past the gate."""
    from hadoop_pyspark_streaming_analytics_spark.plans import DRIVER_WINDOW
    from hadoop_pyspark_streaming_analytics_spark.plans import (
        fingerprint as fp,
    )

    recorded, meta = fp.load_recorded(with_meta=True)
    assert recorded, (
        "plans/entry_hashes.json missing — run "
        "scripts/update_entry_hashes.py"
    )
    if meta.get("python", fp.PY_VERSION) != fp.PY_VERSION:
        pytest.skip(
            f"fingerprints recorded under Python {meta['python']}, "
            f"running {fp.PY_VERSION}: bytecode-encoding drift is "
            "indistinguishable from code changes (ADVICE r9) — "
            "regenerate via scripts/update_entry_hashes.py"
        )
    stale_hash = []
    unrecorded = []
    for spec in CATALOG:  # oracle-less entries carry rows-only re-gates
        rec = recorded.get(spec.name)
        if rec is None:
            unrecorded.append(spec.name)
        elif rec["hash"] != fp.entry_fingerprint(spec):
            stale_hash.append(spec.name)
    assert not unrecorded and not stale_hash, (
        "entry source changed without re-recording its fingerprint — "
        "run `python scripts/update_entry_hashes.py` "
        f"(unrecorded: {unrecorded}, changed: {stale_hash})"
    )
    greens = fp.last_green_rounds()
    window = {s.name for s in CATALOG[:DRIVER_WINDOW]}
    # the in-window obligation applies to oracle-backed entries (plus the
    # reviewed rows-only exception): oracle-less entries may not occupy
    # driver slots (the slotless rule in test_driver_window_priority) —
    # their re-gate signal is the local pytest suite instead.
    eligible = {s.name for s in SPECS} | {"sketch_daily_user_hll"}
    owed = {
        name
        for name, rec in recorded.items()
        if name in eligible and rec["regate_round"] > greens.get(name, 0)
    }
    outside = owed - window
    assert not outside, (
        "entries with driver-unverified source changes sit outside the "
        f"window: {sorted(outside)}"
    )


def test_oracle_no_hugeint_columns(sf_dir):
    """DuckDB sum() over integers yields HUGEINT, which the driver's value
    hash renders differently from Spark's bigint (3.0 vs 3) — the exact
    failure behind temporal_clicks_trailing_5min (r1) and
    corpus_repetition_scores (r2).  The local pandas-based compare coerces
    both to float64 and cannot see it, so gate it statically: every oracle
    output column must bind to a non-HUGEINT DuckDB type."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = []
    for spec in SPECS:
        rel = con.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                offenders.append(f"{spec.name}.{col}")
    assert not offenders, f"uncast HUGEINT oracle columns: {offenders}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names


def test_cross_engine_output_types_compatible(spark, sf_dir):
    """The r02 corpus_repetition_scores red row was a TYPE divergence
    (DuckDB HUGEINT vs Spark bigint) invisible to the tolerance-based
    local compare.  Gate the whole class: for EVERY oracle-backed entry,
    each output column's Spark dtype must map to a hash-compatible DuckDB
    type.  Costs only plan analysis (dtypes) + oracle PREPARE — no
    execution."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    compat = {
        "bigint": {"BIGINT", "INTEGER"},
        "int": {"INTEGER"},
        "double": {"DOUBLE", "FLOAT"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
        "timestamp_ntz": {"TIMESTAMP"},
        "date": {"DATE"},
    }
    problems = []
    for spec in SPECS:
        sdt = dict(spec.builder(spark, sf_dir).dtypes)
        rel = con.sql(spec.oracle)
        ddt = dict(zip(rel.columns, [str(t) for t in rel.types]))
        if set(sdt) != set(ddt):
            problems.append(f"{spec.name}: column sets differ "
                            f"{sorted(set(sdt) ^ set(ddt))}")
            continue
        for c, st in sdt.items():
            if ddt[c] not in compat.get(st, set()):
                problems.append(f"{spec.name}.{c}: spark={st} duckdb={ddt[c]}")
    assert not problems, "\n".join(problems)
