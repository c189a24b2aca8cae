"""Scale-path variants: operators that trade exactness for 100 TB
feasibility must stay within their documented error bounds at test SF."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.operators.relational import (
    agg_customer_orders_approx,
    customer_summary,
    retail_base,
)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    base = retail_base(spark, sf_dir).cache()
    try:
        exact = {
            r["c_custkey"]: r["num_orders"]
            for r in customer_summary(base).collect()
        }
        approx = {
            r["c_custkey"]: r["approx_num_orders"]
            for r in agg_customer_orders_approx(base, rsd=0.05).collect()
        }
        assert set(approx) == set(exact)
        # HLL++ error is relative (rsd=5%) but quantized at tiny
        # cardinalities (±2 at n<~20 observed); guard gross regressions,
        # not sketch noise.
        for k, n in exact.items():
            assert abs(approx[k] - n) <= max(3, 0.25 * n), (k, n, approx[k])
        total_exact = sum(exact.values())
        total_err = sum(abs(approx[k] - n) for k, n in exact.items())
        assert total_err <= 0.1 * total_exact
    finally:
        base.unpersist()


def test_approx_percentile_within_bound(spark, sf_dir):
    """approx_percentile (the 100 TB path for events_type_percentiles) must
    land within a small quantile-rank distance of the exact percentile."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        event_type_percentiles,
    )
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events
    from pyspark.sql import functions as F

    exact = {r["event_type"]: r["p90"] for r in event_type_percentiles(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: r["a90"]
        for r in load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.expr("approx_percentile(value, 0.9, 1000)").alias("a90"))
        .collect()
    }
    for t, p in exact.items():
        assert abs(approx[t] - p) <= max(0.5, 0.1 * abs(p)), (t, p, approx[t])


def test_approx_percentiles_close_to_exact(spark):
    """The sketch-based twin must stay within a small relative-rank error
    of the exact percentiles per group — the accuracy contract that makes
    it a safe 100 TB substitute."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        event_type_percentiles,
        event_type_percentiles_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r for r in event_type_percentiles(spark, sf).collect()}
    approx = {
        r["event_type"]: r
        for r in event_type_percentiles_approx(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        assert a["cnt"] == e["cnt"]
        spread = e["p99"] - e["p50"] or 1.0
        for p in ("p50", "p90", "p99"):
            assert abs(a[p] - e[p]) <= 0.05 * spread + 1e-6, (et, p, a[p], e[p])


def test_hll_sketch_persists_and_merges_after_roundtrip(spark, tmp_path):
    """The pre-aggregate STORE story: per-day sketches written to parquet,
    read back in a fresh scan, and merged must give the same estimate as
    merging the in-memory sketches — binary-stable persistence."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.sketches import (
        _daily,
        merged_distinct_users,
    )

    sf = "/root/testdata/sf0.01"
    live = merged_distinct_users(spark, sf).collect()[0]
    path = str(tmp_path / "sketch_store")
    _daily(spark, sf).select("event_day", "sketch", "n_events").write.parquet(path)
    stored = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "estimated_distinct_users"
            ),
        )
        .collect()[0]
    )
    assert stored["n_days"] == live["n_days"]
    assert stored["estimated_distinct_users"] == live["estimated_distinct_users"]


def test_count_min_never_undercounts(spark, sf_dir):
    """CMS point estimates must dominate true counts (est >= true for
    every user), and the heavy-hitter screen must be a SUPERSET of the
    true heavy hitters — the property that makes CMS a safe pre-filter."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.sketches import (
        count_min_heavy_hitters,
    )
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events

    threshold = 5
    est = count_min_heavy_hitters(spark, sf_dir, threshold=threshold)
    true = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_events"))
    )
    joined = est.join(true, "user_id").cache()
    assert joined.filter(F.col("est_events") < F.col("true_events")).count() == 0
    screened = {r["user_id"] for r in est.collect()}
    heavy = {
        r["user_id"]
        for r in true.filter(F.col("true_events") >= threshold).collect()
    }
    assert heavy <= screened
    joined.unpersist()
