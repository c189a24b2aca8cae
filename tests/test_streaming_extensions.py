"""Tests for the streaming extensions: ingest dedup (state-expiring),
stream-static enrichment, foreachBatch parquet sink."""

from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
    foreach_batch_parquet,
    stream_fingerprint_dedup,
    stream_static_enrich,
)
from hadoop_pyspark_streaming_analytics_spark.streaming.harness import (
    MemorySinkRun,
    write_json_batch,
)

DOC_SCHEMA = "doc_id long, text string, source string, ts string"

BATCH0 = [
    {"doc_id": 1, "text": "alpha beta gamma", "source": "src0", "ts": "2024-01-16T00:01:00"},
    {"doc_id": 2, "text": "alpha  beta   GAMMA", "source": "src1", "ts": "2024-01-16T00:02:00"},  # near-dup of 1 after normalization
    {"doc_id": 3, "text": "something else", "source": "src0", "ts": "2024-01-16T00:03:00"},
]
BATCH1 = [
    {"doc_id": 4, "text": "alpha beta gamma", "source": "src2", "ts": "2024-01-16T00:04:00"},  # dup of 1, later batch
    {"doc_id": 5, "text": "fresh content", "source": "src0", "ts": "2024-01-16T00:05:00"},
]


def _doc_stream(spark, watch_dir):
    from pyspark.sql import functions as F

    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch_dir)
        .withColumn("event_time", F.to_timestamp("ts"))
    )


def test_stream_fingerprint_dedup_across_batches(spark, tmp_path):
    """Normalization-equal docs dedup WITHIN and ACROSS micro-batches while
    the watermark holds their keys in state."""
    watch = str(tmp_path / "docs")
    write_json_batch(watch, BATCH0, 0)
    deduped = stream_fingerprint_dedup(
        _doc_stream(spark, watch), event_time_col="event_time"
    )
    run = MemorySinkRun(spark, deduped, output_mode="append")
    try:
        run.process_all()
        write_json_batch(watch, BATCH1, 1)
        run.process_all()
        ids = sorted(r["doc_id"] for r in run.table().collect())
        # doc 2 (same fingerprint as 1, same batch) and doc 4 (same
        # fingerprint, next batch, within watermark) are both dropped
        assert ids == [1, 3, 5]
    finally:
        run.stop()


def test_stream_static_enrich_broadcast(spark, tmp_path):
    watch = str(tmp_path / "docs")
    write_json_batch(watch, BATCH0, 0)
    dim = spark.createDataFrame(
        [("src0", "crawl"), ("src1", "books")], "source string, origin string"
    )
    enriched = stream_static_enrich(_doc_stream(spark, watch), dim, on="source")
    run = MemorySinkRun(spark, enriched, output_mode="append")
    try:
        run.process_all()
        rows = {r["doc_id"]: r["origin"] for r in run.table().collect()}
        assert rows == {1: "crawl", 2: "books", 3: "crawl"}  # left join keeps all
    finally:
        run.stop()


def test_foreach_batch_parquet_sink(spark, tmp_path):
    watch = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    write_json_batch(watch, BATCH0, 0)
    stream = _doc_stream(spark, watch)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(foreach_batch_parquet(out, partition_by=["source"]))
        .start()
    )
    try:
        q.processAllAvailable()
        write_json_batch(watch, BATCH1, 1)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 5
    # partitioned layout → source is a partition column readable back
    assert sorted(r["source"] for r in got.select("source").distinct().collect()) == [
        "src0",
        "src1",
        "src2",
    ]
