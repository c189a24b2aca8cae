"""Sink round-trips: what the writers produce, the readers load back
identically (schema + values) — the K1/K3 artifact contract."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table
from hadoop_pyspark_streaming_analytics_spark.sources.sinks import write_csv, write_parquet


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "pq")
    write_parquet(src, out)
    back = spark.read.parquet(out)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_single_file_csv_roundtrip(spark, sf_dir, tmp_path):
    import glob

    src = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = str(tmp_path / "csv")
    write_csv(src, out, single_file=True)
    # the reference-parity artifact: exactly ONE data file
    assert len(glob.glob(f"{out}/part-*.csv")) == 1
    back = spark.read.option("header", True).schema(src.schema).csv(out)
    assert _rows(back) == _rows(src)


def test_clustered_parquet_layout_enables_skipping(spark, tmp_path):
    """write_clustered_parquet must produce (a) directory partitions,
    (b) files whose rows are sorted on the cluster key — the precondition
    for row-group min/max skipping — and (c) a lossless roundtrip with
    predicate pushdown on the clustered column."""
    import glob

    import pyarrow.parquet as pq

    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import (
        write_clustered_parquet,
    )

    ev = load_events(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "clustered")
    write_clustered_parquet(
        ev, out, partition_by=["event_type"], cluster_by=["user_id"]
    )

    dirs = glob.glob(f"{out}/event_type=*")
    assert len(dirs) >= 2, "expected hive-style directory partitions"
    files = glob.glob(f"{out}/event_type=*/*.parquet")
    assert files
    for f in files:
        uids = pq.read_table(f, columns=["user_id"])["user_id"].to_pylist()
        assert uids == sorted(uids), f"rows not clustered on user_id in {f}"

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    probe = back.filter(back.user_id == 7)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "user_id" in plan
    assert probe.count() == ev.filter(ev.user_id == 7).count()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC write -> read is lossless and filters push into the ORC scan."""
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import read_orc
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import write_orc

    src = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.count() == src.count()
    assert back.schema == src.schema
    probe = back.filter(back.c_custkey == 1)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "c_custkey" in plan
    assert probe.count() == src.filter(src.c_custkey == 1).count()


def test_compaction_merges_small_files_losslessly(spark, tmp_path):
    """Many tiny files -> one right-sized file; content identical."""
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import (
        compact_parquet,
    )
    import glob

    src = str(tmp_path / "fragmented")
    ev = load_table(spark, "/root/testdata/sf0.001", "customer")
    ev.repartition(16).write.parquet(src)  # 16 tiny files
    assert len(glob.glob(f"{src}/*.parquet")) == 16

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n == 1  # tiny data -> one file
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A long-lived dataset accretes columns over time: old files lack the
    new column, new files have it.  mergeSchema reads the union schema with
    nulls for pre-evolution rows — no rewrite of 100 TB of history."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    ).write.parquet(out)
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, s string, score double"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[3] == 0.5 and rows[1] is None and rows[2] is None
