"""Skew/bucketing scale primitives: salting must be result-identical to the
plain spellings; bucketed tables must join with NO exchange (the co-located
large-large join SCALE.md promises)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.operators.skew import (
    salted_count,
    salted_join,
)
from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table

from .test_plan_shapes import plan_of


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = lineitem.join(dim, "l_orderkey")
    salted = salted_join(lineitem, dim, "l_orderkey", n_salts=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_count_equals_plain_count(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_orderkey"]: r["cnt"]
        for r in lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {r["l_orderkey"]: r["cnt"] for r in salted_count(lineitem, "l_orderkey").collect()}
    assert salted == plain


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{loc}'")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bucketed.{name}_b")
        )
    yield "bucketed"
    spark.sql("DROP DATABASE bucketed CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    """Both sides bucketed (8, orderkey) → the join is co-located: the plan
    must contain NO Exchange.  This is the zero-shuffle large-large join
    the 100 TB layout buys (SCALE.md 'Joins')."""
    li = spark.table("bucketed.lineitem_b")
    od = spark.table("bucketed.orders_b")
    # At test SF the dim side broadcasts (also shuffle-free, and the right
    # call) — disable broadcast to surface the large-large case bucketing
    # exists for.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = plan_of(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """Events written partitioned by event_type: a single-type query must
    prune to that partition at PLANNING time (PartitionFilters on the scan,
    non-matching directories never listed into tasks) — the layout decision
    that deletes whole directories from a 100 TB scan."""
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import write_parquet

    out = str(tmp_path / "events_by_type")
    write_parquet(load_events(spark, sf_dir), out, partition_by=["event_type"])
    pruned = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = plan_of(pruned)
    pf_line = plan.split("PartitionFilters: ")[1].split("\n")[0]
    assert "event_type" in pf_line and "click" in pf_line, plan
    # the filter is partition-level only — it must NOT also run row-by-row
    if "PushedFilters" in plan:
        assert "EqualTo(event_type" not in plan.split("PushedFilters")[1].split("\n")[0]


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the RUNTIME half of the partition-layout
    story: when the pruning value is only known by filtering a dim table
    (here: weekend dates), Catalyst must inject a dynamicpruning subquery
    into the fact scan's PartitionFilters so non-matching date directories
    are skipped at execution, not scanned-and-joined-away.  This is the
    plan shape that turns a date-dim star join over a 100 TB
    date-partitioned fact into a scan of just the matching days.

    Two pins: (1) the dim-side predicate must be a real comparison —
    Spark's PartitionPruning rule ignores bare-boolean filters as not
    "likely selective" (discovered empirically; a `WHERE is_weekend`
    spelling silently loses DPP); (2) the DPP join's result must equal
    the same join against the unpartitioned frame."""
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import write_parquet

    ev = load_events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
    write_parquet(ev, str(tmp_path / "ev"), partition_by=["event_date"])
    fact = spark.read.parquet(str(tmp_path / "ev"))

    dim = ev.select("event_date").distinct().withColumn(
        "dow", F.dayofweek("event_date")
    )
    write_parquet(dim, str(tmp_path / "dim"))
    weekend = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("dow") == 7)

    j = (
        fact.join(weekend.select("event_date"), "event_date")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(j)
    pf_line = plan.split("PartitionFilters: ")[1].split("\n")[0]
    assert "dynamicpruningexpression" in pf_line, plan[:2000]

    got = {(r["event_type"], r["n"]) for r in j.collect()}
    want = {
        (r["event_type"], r["n"])
        for r in ev.join(
            ev.select("event_date")
            .distinct()
            .filter(F.dayofweek("event_date") == 7),
            "event_date",
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join handling — the runtime half of the salting story —
    must actually fire: with one key carrying ~90% of the rows and the
    skew thresholds scaled down to toy size, the final adaptive plan
    marks the sort-merge join's skewed side (skew=true) and splits the
    oversized partition.  SCALE.md sells AQE skew-join as the first-line
    mitigation; this pins that it engages."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n = 40_000
        skewed = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("rv"),
        )
        joined = skewed.join(right, "k")
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in final or "ShuffledHashJoin" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """session.py enables runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.enabled) as a 100 TB lever:
    on a selective fact-dim join the optimizer builds a bloom filter
    from the dim side and injects a might-contain probe into the FACT
    scan, skipping shuffle input that can never match.  At toy scale the
    size thresholds suppress it, so — like the AQE skew pin above —
    scale the thresholds down and assert the rewrite actually fires:
    bloom_filter_agg on the build side, BloomFilterMightContain (or the
    equivalent probe) filtering the fact side."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        # keep the join a shuffle join so the bloom probe has a shuffle
        # to prune (a broadcast join gets runtime DPP-ish pruning free)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey")
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan or "BloomFilterMightContain" in plan, (
            plan[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
