"""ADC + exact refine (operators/refine.py) — the two-stage ANN search,
pytest-gated until its catalog entries land with round 13's free window
slots.

Properties pinned:
1. the refined output is ordered by the EXACT metric (refined_rank is a
   permutation of the exact-L2 order within the shortlist);
2. with a corpus-sized shortlist, refine degenerates to exact brute-force
   top-k — the two stages compose to the ground truth;
3. refined recall@k is never below raw ADC recall@k (the reorder within
   the shortlist can only recover truth members, provably);
4. degenerate vectors (NULL / ragged) score NULL and rank behind every
   clean candidate (they reach a top-k only when clean candidates run
   out, with a visibly NULL exact_l2), never crash;
5. the refine stage's joins are broadcasts on the FINALIZED adaptive plan
   (the corpus is probed by id, never scanned for exact scoring; the
   shortlist probe is unforced — AQE supplies the broadcast at real
   sizes and degrades to a shuffle join under adversarial ones);
6. both catalog-ready builders match their co-located DuckDB oracles on
   the REAL embeddings table at sf0.001 AND sf0.01 (the driver-gate
   mirror at the driver's own SF).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.operators.refine import (
    _exact_topk,
    adc_refine_recall_report,
    adc_refine_topk,
    exact_rerank,
)

SF = "/root/testdata/sf0.001"


def test_refined_rank_follows_exact_metric(spark):
    rows = adc_refine_topk(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.refined_rank)
        assert [r.refined_rank for r in rs] == list(range(1, 11))
        # ordered by exact_l2 (vec_id tiebreak), NOT by adc_rank
        assert all(
            (a.exact_l2, a.vec_id) <= (b.exact_l2, b.vec_id)
            for a, b in zip(rs, rs[1:])
        )


def test_corpus_sized_shortlist_equals_exact_topk(spark):
    """Stage 2 over everything == ground truth: the composition is exact
    when the shortlist stops filtering."""
    refined = {
        (r.query_id, r.vec_id, r.refined_rank)
        for r in adc_refine_topk(spark, SF, shortlist=100_000).collect()
    }
    from hadoop_pyspark_streaming_analytics_spark.operators.refine import (
        _corpus_and_queries,
    )

    emb, queries = _corpus_and_queries(spark, SF, (0, 1, 2, 3, 4))
    truth = {
        (r.query_id, r.vec_id, r.rk)
        for r in _exact_topk(emb, queries, 10).collect()
    }
    assert refined == truth


def test_refined_recall_never_below_adc_recall(spark):
    for r in adc_refine_recall_report(spark, SF).collect():
        assert r.refined_recall >= r.adc_recall
        assert 0.0 <= r.adc_recall <= 1.0


def test_degenerate_vectors_rank_out_never_crash(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, None),  # NULL vector
            (4, [0.5, 0.5]),  # ragged
        ],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    shortlist = spark.createDataFrame(
        [(0, v, i + 1) for i, v in enumerate([1, 2, 3, 4])],
        "query_id long, vec_id long, adc_rank int",
    )
    out = exact_rerank(emb, queries, shortlist, k=2).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.refined_rank)] == [
        1,
        2,
    ]  # NULL/ragged scored NULL → nulls-last → outside top-2
    # and with k covering them, they appear LAST with NULL exact_l2
    full = exact_rerank(emb, queries, shortlist, k=4).collect()
    tail = sorted(full, key=lambda r: r.refined_rank)[2:]
    assert all(r.exact_l2 is None for r in tail)


def test_refine_joins_are_broadcast(spark):
    """The query attach broadcasts by hint; the shortlist→corpus probe
    carries NO forced hint (corpus-derived, only caller-bounded — a raised
    |queries| × shortlist must degrade to AQE's safe shuffle join, not a
    forced broadcast OOM), so its broadcast is pinned where it actually
    happens: the FINALIZED adaptive plan, via collect() (the segment-scrub
    offender-join convention)."""
    df = adc_refine_topk(spark, SF)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    # the shortlist→corpus probe and the query attach must both broadcast
    assert final_plan.count("BroadcastHashJoin") >= 2


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "builder_name, oracle_name",
    [
        ("adc_refine_topk", "ORACLE_ADC_REFINE_TOPK"),
        ("adc_refine_recall_report", "ORACLE_ADC_REFINE_RECALL"),
    ],
)
def test_catalog_ready_builders_match_their_oracles(
    spark, builder_name, oracle_name, sf_dir
):
    """Differential gate for the round-13 registration: run each catalog-
    ready builder against its co-located DuckDB oracle over the REAL
    embeddings table at sf0.001 AND the driver's own sf0.01 — the same
    Spark-vs-DuckDB compare the driver applies, so the r13 QuerySpec
    lands pre-verified at the gate's scale."""
    from hadoop_pyspark_streaming_analytics_spark.operators import refine
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import QuerySpec
    from tests.oracle import compare

    spec = QuerySpec(
        f"refine_{builder_name}",
        getattr(refine, builder_name),
        getattr(refine, oracle_name),
    )
    compare(spec, spark, sf_dir)


def test_refine_corpus_arms_run_once_behind_checkpoints(spark):
    """Scale pin (round 15 census): the recall report's ``truth`` frame
    has three consumers and ``adc`` two — unpinned, each consumer
    re-executed its corpus-sized arm (the exact crossJoin x3, the whole
    ADC code pipeline x2): SIXTEEN embeddings scans in the executedPlan,
    ~5 needless full corpus passes at 100 TB.  Checkpoint-pinned (both
    frames are |queries| x k/shortlist rows), the returned recall plan
    carries exactly ONE file scan — the re-rank's vec_id equi-join probe
    — and the top-k entry drops to the ADC corpus pass + the re-rank
    probe (2 scans; was 4 until the r17-prep codebook pin inside
    adc_topk_for_queries removed the duplicated PQ_K pushdown scans).
    The ExistingRDD marker keeps a Spark scan-node rename from faking
    the counts."""
    from hadoop_pyspark_streaming_analytics_spark.operators import refine

    rec = refine.adc_refine_recall_report(spark, SF)
    plan = rec._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan
    assert "Scan ExistingRDD" in plan, plan

    top = refine.adc_refine_topk(spark, SF)
    tplan = top._jdf.queryExecution().executedPlan().toString()
    assert tplan.count("FileScan parquet") == 2, tplan
    assert "Scan ExistingRDD" in tplan, tplan


def test_recall_report_join_arms_are_key_unique(spark):
    """ADVICE r16: the fused recall tail counts hits via LEFT joins +
    count(flag), which silently inflates both _n and the hit counts if
    any arm ever yields duplicate (query_id, vec_id) rows; the old
    left_semi spelling was immune.  The invariant holds because every
    arm comes out of a row_number() <= k cut over a unique-scored frame
    — enforce it so a future rewrite cannot break it silently.  Checks
    the three arms exactly as the report builds them."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators import refine

    emb, queries = refine._corpus_and_queries(
        spark, SF, refine.DEFAULT_QUERY_IDS
    )
    k = refine.DEFAULT_K
    shortlist = refine.SHORTLIST_FACTOR * k
    truth = refine._exact_topk(emb, queries, k).select("query_id", "vec_id")
    adc = refine.adc_topk_for_queries(emb, queries, shortlist).select(
        "query_id", "vec_id", F.col("rk").alias("adc_rank")
    )
    refined = refine.exact_rerank(emb, queries, adc, k).select(
        "query_id", "vec_id"
    )
    adc_topk = adc.where(F.col("adc_rank") <= k).select("query_id", "vec_id")
    for name, arm in (
        ("truth", truth),
        ("adc_topk", adc_topk),
        ("refined", refined),
    ):
        dup = (
            arm.groupBy("query_id", "vec_id")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert dup == 0, f"{name} arm has {dup} duplicate join keys"
