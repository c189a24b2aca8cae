"""UniMax mixture budgeting (operators/mixture_budget.py) — pytest-gated
until its catalog entry lands with a future round's free window slots
(ROUND-15 budget candidate).

Properties pinned:
1. hand-checked water-filling on a tiny frame: uncapped-uniform,
   mixed capped/uncapped, and budget-exceeds-caps regimes, with the
   allocations summing to the budget (or to total cap with the
   shortfall visible as budget_unfilled);
2. visibility: a tokenless source stays present with NULL allocation,
   never silently dropped, never a crash;
3. the catalog-ready builder matches the TEMPLATE oracle (nesting the
   proven text_token_counts oracle verbatim — the registration
   spelling) on the REAL documents table at sf0.001 AND sf0.01, the
   driver-gate mirror.
"""
from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.operators.mixture_budget import (
    oracle_unimax_allocation,
    unimax_allocation,
    unimax_of,
)

_DOCS = "doc_id long, source string"
_COUNTS = "doc_id long, bpe_ish_tokens int"


def _frames(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "empty")], _DOCS
    )
    counts = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 600), (4, None)], _COUNTS
    )
    return docs, counts


def test_uniform_regime_no_source_capped(spark):
    docs, counts = _frames(spark)
    # budget = 1000 * 0.5 = 500 < smallest cap * 3 -> uniform thirds
    rep = {r.source: r for r in unimax_of(docs, counts).collect()}
    third = round(500 / 3 + 1e-8, 4)
    assert rep["a"].allocated_tokens == third
    assert rep["b"].allocated_tokens == third
    assert rep["c"].allocated_tokens == third
    assert rep["a"].cap_tokens == 200.0
    assert rep["a"].epochs_used == round(500 / 3 / 100 + 1e-8, 4)
    assert rep["a"].budget_unfilled == 0.0


def test_mixed_regime_small_source_caps_then_waterline(spark):
    docs, counts = _frames(spark)
    # budget = 1000 * 0.8 = 800: source a saturates its 200 cap, the
    # remaining 600 spreads evenly over b and c
    rep = {
        r.source: r
        for r in unimax_of(docs, counts, budget_frac=0.8).collect()
    }
    assert rep["a"].allocated_tokens == 200.0  # capped at 2 epochs
    assert rep["a"].epochs_used == 2.0
    assert rep["b"].allocated_tokens == 300.0
    assert rep["c"].allocated_tokens == 300.0
    assert rep["c"].epochs_used == 0.5
    assert rep["b"].budget_share == round(300 / 800 + 1e-8, 4)


def test_budget_exceeding_caps_saturates_and_reports_shortfall(spark):
    docs, counts = _frames(spark)
    # epoch_cap 0.1 -> caps 10/30/60 (total 100) < budget 500
    rep = {
        r.source: r
        for r in unimax_of(docs, counts, epoch_cap=0.1).collect()
    }
    assert rep["a"].allocated_tokens == 10.0
    assert rep["b"].allocated_tokens == 30.0
    assert rep["c"].allocated_tokens == 60.0
    assert rep["a"].budget_unfilled == 400.0  # honest shortfall signal


def test_tokenless_source_visible_not_dropped(spark):
    docs, counts = _frames(spark)
    rep = {r.source: r for r in unimax_of(docs, counts).collect()}
    e = rep["empty"]
    assert e.tokens_available is None
    assert e.cap_tokens is None and e.allocated_tokens is None
    assert e.epochs_used is None and e.budget_share is None
    # budget_unfilled follows the same NULL discipline — the one column
    # where builder and oracle diverged before the ADVICE r13 fix (the
    # oracle's bare CASE fell through to ELSE 0.0 on the NULL-joined row).
    assert e.budget_unfilled is None
    # ... and an allocated row keeps the scalar 0.0, not NULL.
    assert rep["a"].budget_unfilled == 0.0


def test_template_oracle_tokenless_null_discipline():
    """The oracle side of the degenerate path, pinned directly in DuckDB:
    the real SFs have no fully-tokenless source, so the two-SF diffs
    cannot see this branch (ADVICE r13 medium) — a synthetic corpus with
    one tokenless source must yield NULL budget_unfilled (matching the
    builder) and 0.0 on every allocated row."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        """CREATE TABLE documents AS SELECT * FROM (VALUES
             (1,'a'),(2,'b'),(3,'c'),(4,'empty')) t(doc_id, source)"""
    )
    con.execute(
        """CREATE TABLE tok AS SELECT * FROM (VALUES
             (1,100),(2,300),(3,600)) t(doc_id, bpe_ish_tokens)"""
    )
    sql = oracle_unimax_allocation(
        "SELECT doc_id, bpe_ish_tokens FROM tok"
    )
    rows = {
        r[0]: r
        for r in con.execute(
            f"SELECT * FROM ({sql}) q ORDER BY q.source"
        ).fetchall()
    }
    # columns: source, tokens_available, cap_tokens, allocated_tokens,
    #          epochs_used, budget_share, budget_unfilled
    assert rows["empty"][1:] == (None,) * 6
    third = round(500 / 3 + 1e-8, 4)
    assert rows["a"][3] == third and rows["a"][6] == 0.0
    assert rows["c"][3] == third and rows["c"][6] == 0.0


def test_single_corpus_scan_behind_checkpoint(spark):
    """Scale pin: the water-filling's three consumers of per_source
    (alloc_in, totals, the visibility join) must read the checkpointed
    source-count-sized frame, NOT re-execute the corpus-sized token
    aggregate — pre-pin the plan audited 3x the two-scan subtree (six
    parquet scans; two needless full-corpus passes at 100 TB).  With the
    localCheckpoint in place the returned plan carries ZERO file scans:
    all corpus work ran exactly once, inside the eager checkpoint."""
    from hadoop_pyspark_streaming_analytics_spark.operators.mixture_budget import (
        unimax_allocation,
    )

    df = unimax_allocation(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0, plan
    # Positive marker (ADVICE r14): the zero-FileScan assert alone would
    # pass vacuously if a Spark upgrade renamed the scan node (DSv2
    # "BatchScan") — also require the checkpoint's RDD scan to be the
    # visible source, so a renamed file-scan node can't fake a pass.
    assert "Scan ExistingRDD" in plan, plan


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_catalog_ready_builder_matches_template_oracle(spark, sf_dir):
    """Differential gate for the future registration: the builder vs the
    template oracle instantiated with the CANONICAL nested SQL (the
    catalog's own text_token_counts oracle), at both SFs — the
    driver-gate mirror."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import (
        CATALOG,
        QuerySpec,
    )
    from tests.oracle import compare

    tc_sql = next(
        s.oracle for s in CATALOG if s.name == "text_token_counts"
    )
    spec = QuerySpec(
        "mb_unimax",
        unimax_allocation,
        oracle_unimax_allocation(tc_sql),
    )
    compare(spec, spark, sf_dir)
