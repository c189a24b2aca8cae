"""Stateful streaming reservoir sampler: state carries across
micro-batches, the kept set equals the batch oracle (k smallest md5
priorities over everything seen), and replayed ids dedupe."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.streaming.harness import (
    MemorySinkRun,
    write_json_batch,
)
from hadoop_pyspark_streaming_analytics_spark.streaming.sampler import (
    _priority,
    sample_per_key,
)

DOC_SCHEMA = "source string, doc_id long"


def _stream(spark, watch):
    return spark.readStream.schema(DOC_SCHEMA).json(watch)


def test_sampler_matches_batch_oracle_across_batches(spark, tmp_path):
    watch = str(tmp_path / "docs")
    b0 = [{"source": "web", "doc_id": i} for i in range(10)]
    # batch 1 replays id 3 (must dedupe) and adds 10..19
    b1 = [{"source": "web", "doc_id": i} for i in [3, *range(10, 20)]] + [
        {"source": "books", "doc_id": 100}
    ]
    write_json_batch(watch, b0, 0)
    run = MemorySinkRun(
        spark,
        sample_per_key(_stream(spark, watch), "source", "doc_id", k=4),
        output_mode="update",
    )
    try:
        run.process_all()
        write_json_batch(watch, b1, 1)
        run.process_all()
        rows = run.table().collect()
        # last emit per key wins (update semantics over the memory sink)
        seen_web = [r["doc_id"] for r in rows if r["key"] == "web"]
        final_web = set(seen_web[-4:])
        oracle = set(
            sorted(range(20), key=lambda i: _priority(i))[:4]
        )
        assert final_web == oracle
        assert {r["doc_id"] for r in rows if r["key"] == "books"} == {100}
    finally:
        run.stop()
