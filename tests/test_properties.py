"""Property-based tests (hypothesis): operator invariants that must hold
for ALL inputs, not just the fixtures — the layer golden files can't give.

Examples are kept small and few (each example is a Spark job); the point is
adversarial input shapes (empty strings, ties, None, boundary values), not
volume — volume is the oracle sweep's job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.functions.udfs import (
    categorize_expr,
    categorize_python_udf,
)
from hadoop_pyspark_streaming_analytics_spark.operators.dedup import (
    doc_shingles,
    normalized_text,
)
from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import sessionize

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # deterministic examples — no flaky driver runs
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Amounts around the categorization boundaries (50 / 200) plus None.
amounts = st.lists(
    st.one_of(
        st.none(),
        st.sampled_from([49.99, 50.0, 50.01, 200.0, 200.01]),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=8,
)


@given(amounts)
@SETTINGS
def test_categorize_tiers_agree(spark, values):
    """The Catalyst when/otherwise twin and the row-at-a-time Python UDF
    must categorize identically — incl. None→Unknown and both boundaries."""
    df = spark.createDataFrame([(v,) for v in values], "order_value double")
    rows = df.select(
        categorize_expr(F.col("order_value")).alias("a"),
        categorize_python_udf(F.col("order_value")).alias("b"),
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


texts = st.lists(
    st.text(alphabet=" \t\nabAB.,", min_size=0, max_size=40), min_size=1, max_size=6
)


@given(texts)
@SETTINGS
def test_normalized_text_is_idempotent(spark, docs):
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    rows = df.select(
        normalized_text(F.col("text")).alias("once"),
        normalized_text(normalized_text(F.col("text"))).alias("twice"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]


@given(texts)
@SETTINGS
def test_shingle_count_bound(spark, docs):
    """A doc with k tokens yields between 1 and k-n+1 DISTINCT n-shingles
    (k >= n), each of exactly n tokens; docs with k < n yield none."""
    n = 3
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    tok_counts = {
        r["doc_id"]: len(r["t"])
        for r in df.select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0).alias("t"),
        ).collect()
    }
    got = doc_shingles(df, n=n).collect()
    per_doc: dict[int, int] = {}
    for r in got:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert len(r["shingle"].split(" ")) == n
    for doc_id, k in tok_counts.items():
        cnt = per_doc.get(doc_id, 0)
        if k < n:
            assert cnt == 0
        else:
            assert 1 <= cnt <= k - n + 1


# Event offsets in minutes — ties and >30-minute gaps both likely.
offsets = st.lists(
    st.integers(min_value=0, max_value=200), min_size=1, max_size=12
)


@given(offsets, offsets)
@SETTINGS
def test_sessionization_partitions_events(spark, offs_a, offs_b):
    """Sessions partition each user's events exactly (counts sum), sessions
    of one user never overlap, and consecutive sessions are >= gap apart."""
    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(minutes=m), 1.0) for u, offs in (("a", offs_a), ("b", offs_b)) for m in offs]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    sessions = sessionize(df, gap="30 minutes").collect()
    by_user: dict[str, list] = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    for user, offs in (("a", offs_a), ("b", offs_b)):
        sess = sorted(by_user.get(user, []), key=lambda s: s["session_start"])
        assert sum(s["n_events"] for s in sess) == len(offs)
        for s in sess:
            assert s["session_start"] <= s["last_event"]
        for prev, nxt in zip(sess, sess[1:]):
            gap = (nxt["session_start"] - prev["last_event"]).total_seconds()
            assert gap >= 30 * 60, (prev, nxt)


# Adversarial document texts: empty, single token, all-same token,
# punctuation-only, long repeats — the corpus operators' edge shapes.
doc_texts = st.lists(
    st.one_of(
        st.just(""),
        st.just("x"),
        st.just("a a a a a"),
        st.just("...!!!"),
        st.text(
            alphabet="ab c",
            min_size=0,
            max_size=40,
        ),
    ),
    min_size=1,
    max_size=6,
)


@given(doc_texts)
@SETTINGS
def test_repetition_scores_match_pure_python(spark, texts):
    """repetition_scores must equal a direct per-document computation for
    arbitrary texts (incl. empty / one-token / all-duplicate docs)."""
    import re

    from hadoop_pyspark_streaming_analytics_spark.operators import corpus as c

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig = c.load_table
    try:
        c.load_table = lambda sp, d, t: docs  # noqa: ARG005
        rows = {r["doc_id"]: r for r in c.repetition_scores(spark, "x").collect()}
    finally:
        c.load_table = orig

    for i, t in enumerate(texts):
        toks = re.findall("[a-z]+", t.lower())
        if not toks:
            assert i not in rows  # token-less docs produce no row
            continue
        r = rows[i]
        assert r["n_tokens"] == len(toks)
        counts = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        assert r["top_token_frac"] == round(
            max(counts.values()) / len(toks) + 1e-8, 4
        )
        assert r["distinct_token_ratio"] == round(
            len(counts) / len(toks) + 1e-8, 4
        )
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        expect_bg = (
            round(1.0 - len(set(bigrams)) / len(bigrams) + 1e-8, 4)
            if bigrams
            else 0.0
        )
        assert r["dup_bigram_frac"] == expect_bg


@given(st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                          width=32),
                min_size=2, max_size=8))
@SETTINGS
def test_int8_quantization_roundtrip_bound(spark, vec):
    """For ANY float vector: codes stay in [-127, 127] and dequantization
    error is within one grid step (max_abs/127)."""
    from hadoop_pyspark_streaming_analytics_spark.operators import similarity as s

    emb = spark.createDataFrame(
        [(0, [float(x) for x in vec], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    orig = s.load_table
    try:
        s.load_table = lambda sp, d, t: emb  # noqa: ARG005
        row = s.quantize_embeddings_int8(spark, "x").collect()[0]
    finally:
        s.load_table = orig
    import numpy as np

    v32 = np.array(vec, dtype=np.float32).astype(np.float64)
    q = np.array([int(x) for x in row["q_csv"].split(",")])
    ma = max(np.abs(v32).max(), 1e-12)
    assert np.abs(q).max() <= 127
    deq = q * ma / 127.0
    assert np.abs(deq - v32).max() <= ma / 127.0 + 1e-9


# Event offsets (seconds) engineered around the 30-minute gap boundary.
session_offsets = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=120),
        st.sampled_from([1799, 1800, 1801, 3600, 7200]),
    ),
    min_size=1,
    max_size=8,
)


@given(session_offsets, session_offsets)
@SETTINGS
def test_session_attribution_matches_pure_python(spark, offs_a, offs_b):
    """event_session_attribution must equal a direct per-user
    gaps-and-islands computation for arbitrary event spacings, including
    exact 30-minute boundaries (gap > 1800s starts a new session —
    exactly 1800s CONTINUES it, matching session_window's adjacent-range
    merge so the user_sessions cross-check holds on ties; ADVICE r9)."""
    from hadoop_pyspark_streaming_analytics_spark.operators import timeseries as t

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for uid, offs in ((1, offs_a), (2, offs_b)):
        acc = 0
        for o in offs:
            acc += o
            rows.append((eid, uid, base + dt.timedelta(seconds=acc)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    orig = t.load_events
    try:
        t.load_events = lambda sp, d: ev  # noqa: ARG005
        got = {
            r["event_id"]: r["session_start"]
            for r in t.event_session_attribution(spark, "x").collect()
        }
    finally:
        t.load_events = orig

    expect = {}
    for uid in (1, 2):
        evs = sorted(
            (r for r in rows if r[1] == uid), key=lambda r: (r[2], r[0])
        )
        start = None
        prev = None
        for eid_, _, ts in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                start = ts
            expect[eid_] = start
            prev = ts
    assert got == expect


bpe_corpora = st.lists(
    st.one_of(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        # run-heavy words: self-pairs ((a,a)-style merges) dominate these,
        # stressing the batch-ending rule the round-6 counterexamples pinned
        st.lists(
            st.sampled_from(["a", "aa", "aaaa", "aaaaaa", "b", "bb", "abab"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=6,
)


@given(bpe_corpora)
# Pinned SELF-PAIR counterexamples (round-6 review): merging (a,a) on a
# symbol run creates (aa,aa) pairs that inherit from the selection ITSELF,
# which the disjoint-batch bound cannot cover — (aa,aa) can outrank the
# batch's later members ((b,b) here), so a self-pair must END the batch.
# Both corpora diverged under the pre-fix batching at every width > 1.
@example(["aaaaaa aba"] * 5 + ["bbb"] * 4 + ["b"] * 2)
@example(["aaaa"] * 3 + ["bb"] * 2)
@SETTINGS
def test_bpe_trainer_matches_reference_on_arbitrary_corpora(spark, texts):
    """The distributed BPE trainer must reproduce a from-scratch pure-
    Python BPE on ARBITRARY corpora — including the adversarial shapes
    hypothesis finds (single-letter words with no pairs, vocabularies
    that exhaust mergeable pairs before n_merges, back-to-back identical
    symbols where greedy left-to-right order matters).  The reference
    applies merges by explicit pairwise list rewriting, independent of
    the engine's regex strategy (tests/bpe_reference.py); the trainer
    runs at EVERY batching width 1..default — top-M symbol-disjoint
    batching must be merge-for-merge identical to sequential (M=1)
    training, which these tiny 'abc'-alphabet corpora stress hardest
    (ties and shared symbols everywhere, so the disjoint-prefix
    truncation logic actually gates)."""
    import tempfile

    from hadoop_pyspark_streaming_analytics_spark.operators import corpus

    from . import bpe_reference

    n_merges = 4
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

        wcounts = bpe_reference.word_counts(texts)
        want, syms = bpe_reference.train(wcounts, n_merges)

        for batch_m in (1, 2, 3, corpus.BPE_BATCH_M):
            merges, trained = corpus._bpe_train(
                spark, d, n_merges, batch_m=batch_m
            )
            assert merges == want, f"batch_m={batch_m}"
            seg = {
                r["word"]: r["segmentation"]
                for r in corpus._segment_of(trained).collect()
            }
            assert seg == syms, f"batch_m={batch_m}"


# Arbitrary unicode-ish gram strings — the bloom filter must NEVER report
# a false negative, whatever the key material.
bloom_keys = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=40,
    unique=True,
)


@given(bloom_keys)
@SETTINGS
def test_bloom_never_false_negative_on_arbitrary_keys(spark, keys):
    """For ANY key set: every inserted key tests positive under the
    production build + membership expressions (Bloom's defining
    guarantee; the contamination twin's exactness and the streaming
    gate's conservatism both rest on it)."""
    from hadoop_pyspark_streaming_analytics_spark.operators import scrubbing

    df = spark.createDataFrame([(k,) for k in keys], "gram string")
    words = scrubbing._bloom_build_words(df, "gram")
    contained = scrubbing._bloom_might_contain(F.col("gram"), words)
    assert df.filter(~contained).count() == 0


# Coordinates across the scaled domain incl. boundary values.
zorder_coords = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1000),
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
    ),
    min_size=3,
    max_size=12,
    unique=True,
)


@given(zorder_coords)
@SETTINGS
def test_zorder_value_is_monotone_per_dimension(spark, coords):
    """With the other coordinate FIXED, increasing one coordinate never
    decreases the Morton value — each dimension's bits occupy fixed
    interleave positions, so per-dimension order is preserved (the
    property that makes z-range file pruning sound)."""
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import zorder_value

    df = spark.createDataFrame(
        [(i, a, float(b)) for i, (a, b) in enumerate(coords)],
        "id long, x long, y double",
    )
    z, _ = zorder_value(df, ["x", "y"], bits=8)
    rows = df.withColumn("z", z).collect()
    by_id = {r["id"]: (r["x"], r["y"], r["z"]) for r in rows}
    vals = list(by_id.values())
    for x1, y1, z1 in vals:
        for x2, y2, z2 in vals:
            if y1 == y2 and x1 < x2:
                assert z1 <= z2, ((x1, y1, z1), (x2, y2, z2))
            if x1 == x2 and y1 < y2:
                assert z1 <= z2, ((x1, y1, z1), (x2, y2, z2))


def test_zorder_wide_column_list_stays_in_63_bits(spark):
    """ADVICE r6: at the default bits=16, 4 z-order columns used to push
    bit positions to 63 (sign flip) and 5+ past 63 (Java shiftleft wraps
    mod 64), silently folding high bits onto low positions.  bits now
    auto-shrinks to 63 // n_cols, so the interleave is non-negative and
    per-dimension monotone for wide column lists too."""
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import zorder_value

    cols = ["a", "b", "c", "d", "e"]
    # corner points + an interior ramp in every dimension
    data = []
    i = 0
    for lo_hi in (0, 1000):
        data.append(tuple([i] + [lo_hi] * 5)); i += 1
    for dim in range(5):
        for v in (100, 500, 900):
            row = [250] * 5
            row[dim] = v
            data.append(tuple([i] + row)); i += 1
    df = spark.createDataFrame(
        data, "id long, a long, b long, c long, d long, e long"
    )
    z, _ = zorder_value(df, cols)  # default bits=16 -> shrunk to 12
    rows = df.withColumn("z", z).collect()
    assert all(r["z"] >= 0 for r in rows)
    vals = [tuple(r[c] for c in cols) + (r["z"],) for r in rows]
    for p1 in vals:
        for p2 in vals:
            # p2 dominates p1 in one dimension, equal elsewhere -> z order
            diffs = [d for d in range(5) if p1[d] != p2[d]]
            if len(diffs) == 1 and p1[diffs[0]] < p2[diffs[0]]:
                assert p1[5] <= p2[5], (p1, p2)
    # the corner points bound everything
    zmin = min(r["z"] for r in rows)
    zmax = max(r["z"] for r in rows)
    corner = {tuple(r[c] for c in cols): r["z"] for r in rows}
    assert corner[(0,) * 5] == zmin
    assert corner[(1000,) * 5] == zmax

    import pytest

    with pytest.raises(ValueError):
        zorder_value(df, [f"c{i}" for i in range(64)])


# Error timestamps clustered around midnights (the boundary-merge's hard
# region), drawn at minute granularity over 3 days so exact-gap ties,
# multi-midnight chains, and empty days all occur.
_midnight = dt.datetime(2024, 1, 2, 0, 0)
error_times = st.lists(
    st.one_of(
        # dense near the two midnights: ±15 minutes in whole minutes
        st.integers(min_value=-15, max_value=15).map(
            lambda m: _midnight + dt.timedelta(minutes=m)
        ),
        st.integers(min_value=-15, max_value=15).map(
            lambda m: _midnight + dt.timedelta(days=1, minutes=m)
        ),
        # sparse elsewhere in the 3-day span, 5-minute grid (gap-sized
        # steps manufacture exactly-gap adjacency ties)
        st.integers(min_value=0, max_value=3 * 288).map(
            lambda i: _midnight
            - dt.timedelta(days=1)
            + dt.timedelta(minutes=5 * i)
        ),
    ),
    min_size=1,
    max_size=25,
    unique=True,
)


def _global_bursts_reference(times, gap_minutes=5):
    """Plain-python global gap-sessionization with Spark session_window's
    ADJACENT-merge semantics: an event exactly gap after the previous one
    CONTINUES the burst (merge while diff <= gap)."""
    gap = dt.timedelta(minutes=gap_minutes)
    out = []
    for t in sorted(times):
        if out and t - out[-1][1] <= gap:
            start, _, n = out[-1]
            out[-1] = (start, t, n + 1)
        else:
            out.append((t, t, 1))
    return out


@given(error_times)
@SETTINGS
def test_error_bursts_merged_equals_global_reference(spark, times):
    """The two-phase boundary-merge must equal GLOBAL sessionization for
    ALL inputs — midnight straddles, exactly-gap ties at and across the
    boundary, chains through consecutive midnights, singleton days."""
    from pyspark.sql import Row

    from hadoop_pyspark_streaming_analytics_spark.operators.intervals import (
        error_bursts_merged,
    )

    ev = spark.createDataFrame(
        [
            Row(event_id=i, ts=t, event_type="error", user_id=1, value=1.0)
            for i, t in enumerate(times)
        ]
    )
    got = sorted(
        (r.burst_start, r.burst_end, r.n_errors)
        for r in error_bursts_merged(ev, gap="5 minutes").collect()
    )
    assert got == _global_bursts_reference(times)


# Tie-heavy funnel streams: timestamps on a 4-slot grid across 3 users
# and 3 event types, so exact view/click/purchase timestamp collisions —
# the boundary the strict `ts > previous step` chaining must hold at —
# occur in most examples (the driver testdata is tie-sparse, so the
# oracle diff rarely exercises them; the round-10 degenerate probe
# checked crash-safety here, not values).
funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(min_value=0, max_value=3),  # minute slot (ties likely)
    ),
    min_size=1,
    max_size=14,
)


def _funnel_reference(events):
    """Plain-python ordered funnel with STRICT after-previous-step
    chaining: first view; first click strictly after it; first purchase
    strictly after that — per user, then per-step user counts + the max
    of the per-user first-times (the value-check column)."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    users: dict[int, dict[str, list]] = {}
    for uid, etype, slot in events:
        users.setdefault(uid, {}).setdefault(etype, []).append(
            base + dt.timedelta(minutes=slot)
        )
    steps = {"view": [], "click": [], "purchase": []}
    for per_type in users.values():
        fv = min(per_type.get("view", []), default=None)
        if fv is None:
            continue
        steps["view"].append(fv)
        fc = min((t for t in per_type.get("click", []) if t > fv), default=None)
        if fc is None:
            continue
        steps["click"].append(fc)
        fp_ = min(
            (t for t in per_type.get("purchase", []) if t > fc), default=None
        )
        if fp_ is not None:
            steps["purchase"].append(fp_)
    labels = {
        "view": "view",
        "click": "view>click",
        "purchase": "view>click>purchase",
    }
    return {
        labels[step]: (len(ts), max(ts)) for step, ts in steps.items() if ts
    }


@given(funnel_events)
@SETTINGS
def test_funnel_strict_ordering_matches_reference(spark, events):
    """funnel_view_click_purchase's chained-min joins must implement the
    STRICT ordered funnel for all inputs — especially exact-timestamp
    ties between consecutive steps (a click at the instant of the first
    view does NOT advance the funnel)."""
    import datetime as dt_  # noqa: F401 — used via the module-level dt

    from pyspark.sql import Row

    from hadoop_pyspark_streaming_analytics_spark.operators import temporal

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + dt.timedelta(minutes=slot),
                user_id=uid,
                event_type=etype,
                value=1.0,
                props="{}",
            )
            for i, (uid, etype, slot) in enumerate(events)
        ]
    )
    orig = temporal.load_events
    try:
        temporal.load_events = lambda sp, d: df  # noqa: ARG005
        got = {
            r["step"]: (r["users"], r["latest_ts"])
            for r in temporal.funnel_view_click_purchase(spark, "x").collect()
            if r["users"] > 0
        }
    finally:
        temporal.load_events = orig
    assert got == _funnel_reference(events)


# Trailing-range-window streams: minute slots 0..7 so events land exactly
# AT the 5-minute frame edge (rangeBetween is inclusive at both ends) and
# on exact same-instant ties between a click and the anchoring event.
trailing_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user_id
        st.sampled_from(["view", "click"]),
        st.integers(min_value=0, max_value=7),  # minute slot
    ),
    min_size=1,
    max_size=12,
)


@given(trailing_events)
@SETTINGS
def test_trailing_range_window_matches_reference(spark, events):
    """clicks_in_trailing_window's RANGE frame must count, per event, the
    same user's clicks in [ts - 5 min, ts] — BOTH endpoints inclusive: a
    click exactly 5 minutes ago counts, and a same-instant click counts
    for every event sharing that timestamp (including itself)."""
    from pyspark.sql import Row

    from hadoop_pyspark_streaming_analytics_spark.operators import temporal

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, uid, etype, base + dt.timedelta(minutes=slot))
        for i, (uid, etype, slot) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=uid, event_type=etype,
                value=1.0, props="{}")
            for i, uid, etype, ts in rows
        ]
    )
    orig = temporal.load_events
    try:
        temporal.load_events = lambda sp, d: df  # noqa: ARG005
        got = {
            r["event_id"]: r["clicks_trailing"]
            for r in temporal.clicks_in_trailing_window(spark, "x").collect()
        }
    finally:
        temporal.load_events = orig
    win = dt.timedelta(minutes=5)
    for i, uid, _etype, ts in rows:
        want = sum(
            1
            for _j, u2, e2, t2 in rows
            if u2 == uid and e2 == "click" and ts - win <= t2 <= ts
        )
        assert got[i] == want, (i, got[i], want)
