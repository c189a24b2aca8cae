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


def test_zorder_layout_gives_locality_on_both_dimensions(spark, tmp_path):
    """Z-order vs single-column clustering, measured from the actual
    parquet file footers: after write_zordered_parquet on
    (user_id, value), BOTH columns' per-file min/max ranges must cover a
    small fraction of their global range, while a user_id-only sorted
    layout leaves value's per-file ranges ~global.  Plus losslessness and
    pushdown on both z-ordered columns."""
    import glob

    import pyarrow.parquet as pq

    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_events
    from hadoop_pyspark_streaming_analytics_spark.sources.sinks import (
        write_zordered_parquet,
    )

    ev = load_events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "value"
    )
    zout = str(tmp_path / "zorder")
    write_zordered_parquet(ev, zout, zorder_by=["user_id", "value"], target_files=8)

    sout = str(tmp_path / "single")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(sout)
    )

    def frac_ranges(path, col, lo, hi):
        span = hi - lo
        fr = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            cmins, cmaxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    cc = md.row_group(rg).column(ci)
                    if cc.path_in_schema == col and cc.statistics is not None:
                        cmins.append(cc.statistics.min)
                        cmaxs.append(cc.statistics.max)
            assert cmins, f"no {col} stats in {f}"
            fr.append((max(cmaxs) - min(cmins)) / span)
        return fr

    import pyspark.sql.functions as F

    row = ev.agg(
        F.min("user_id").alias("umn"), F.max("user_id").alias("umx"),
        F.min("value").alias("vmn"), F.max("value").alias("vmx"),
    ).collect()[0]

    z_user = frac_ranges(zout, "user_id", row["umn"], row["umx"])
    z_val = frac_ranges(zout, "value", row["vmn"], row["vmx"])
    s_val = frac_ranges(sout, "value", row["vmn"], row["vmx"])

    # both z-ordered dims show real locality...
    assert sum(z_user) / len(z_user) < 0.6, z_user
    assert sum(z_val) / len(z_val) < 0.6, z_val
    # ...and value's locality clearly beats the user_id-only layout's
    # (the synthetic columns are partially correlated, so the control is
    # not fully global — the comparative claim is the honest one)
    assert sum(z_val) / len(z_val) < 0.8 * (sum(s_val) / len(s_val)), (
        z_val,
        s_val,
    )

    back = spark.read.parquet(zout)
    assert back.count() == ev.count()
    probe = back.filter((back.user_id == 7) & (back.value > 50))
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "user_id" in plan and "value" in plan
    assert probe.count() == ev.filter((ev.user_id == 7) & (ev.value > 50)).count()
