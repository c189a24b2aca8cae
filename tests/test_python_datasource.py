"""Python DataSource API (Spark 4): the custom synthetic_events connector
must read deterministically in batch (partition-parallel) and advance
bounded micro-batch offsets in streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.sources.python_datasource import (
    EVENT_TYPES,
    register,
)


def _load(spark, rows=500, partitions=4):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_batch_read_count_schema_and_determinism(spark):
    df = _load(spark, rows=500, partitions=4)
    assert df.count() == 500
    assert dict(df.dtypes) == {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    }
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _load(spark, rows=500, partitions=4).collect()))
    assert a == b
    types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert types <= set(EVENT_TYPES)


def test_batch_read_parallelism_and_pipeline(spark):
    """The source's InputPartitions must surface as real read tasks, and
    the output must compose with ordinary DataFrame ops."""
    df = _load(spark, rows=1000, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    agg = (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in agg) == 1000


def test_stream_reader_bounded_offsets(spark, tmp_path):
    """Micro-batches advance rows_per_batch at a time and stop at
    max_rows; the streamed rows equal the batch rows for the same range
    (replay determinism)."""
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 120)
        .option("max_rows", 360)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.table("synth_stream").collect())
        )
    finally:
        q.stop()
    want = sorted(map(tuple, _load(spark, rows=360, partitions=2).collect()))
    assert got == want


def test_batch_read_zero_rows_is_empty_not_error(spark):
    df = _load(spark, rows=0, partitions=4)
    assert df.count() == 0


def test_stream_composes_with_engine_window_agg(spark, tmp_path):
    """Integration: the custom connector's stream must compose with the
    engine's event-time tumbling-window aggregation — counts per
    5-minute bucket over the deterministic sequence match the batch-side
    computation of the same range."""
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 150)
        .option("max_rows", 300)
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .count()
        .select(F.col("w.start").alias("w_start"), "count")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("synth_windows")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["w_start"]: r["count"]
            for r in spark.table("synth_windows").collect()
        }
    finally:
        q.stop()
    want = {
        r["w_start"]: r["count"]
        for r in _load(spark, rows=300, partitions=2)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .count()
        .select(F.col("w.start").alias("w_start"), "count")
        .collect()
    }
    assert got == want and sum(got.values()) == 300


def test_stream_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    """The ADVICE r3 restart scenario: stop the query mid-sequence, then
    restart from the SAME checkpoint with a FRESH source instance (fresh
    driver state) and let it continue.  With the simple stream reader the
    resumed batch's start is the checkpointed offset, so the union of both
    legs must deliver each row index exactly once — the planner-API
    spelling re-emitted the last committed range here ([100, 200) arrived
    twice).  Sink is parquet (fault-tolerant, unlike memory sinks, which
    refuse checkpoint recovery)."""
    register(spark)
    ckpt = str(tmp_path / "ckpt_restart")
    out = str(tmp_path / "out_restart")

    def run_leg(max_rows: int) -> None:
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 100)
            .option("max_rows", max_rows)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_leg(200)   # leg 1: commits offsets up to idx=200, then "crashes"
    run_leg(300)   # leg 2: fresh reader, same checkpoint, resumes at 200
    ids = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert len(ids) == 300, f"expected 300 rows, got {len(ids)}"
    assert len(set(ids)) == 300, "restart re-emitted committed row indices"
    assert set(ids) == set(range(300))
