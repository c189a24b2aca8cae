"""Batch-by-batch update-mode parity, pinned to EXACT expected rows — the
shape of the reference's per-batch console tables (q4_streaming.ipynb
cell 1: "Batch: 0" / "Batch: 1" for Parts A/B/C).  The reference's raw
input (q4_sensor_data.json) is not in its checkout (FIXTURES.md), so the
fixture is ours, but every number below is hand-derived from it and
asserted literally: what each batch EMITS (update mode = only changed
groups), cumulative aggregates across batches, and watermark-boundary
drops, batch by batch."""

from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.sources.readers import read_sensor_stream
from hadoop_pyspark_streaming_analytics_spark.streaming.harness import (
    ForeachBatchRun,
    write_json_batch,
)
from hadoop_pyspark_streaming_analytics_spark.streaming.queries import (
    running_sensor_stats,
    sliding_window_max,
    tumbling_window_stats,
    with_event_time,
)

BATCH0 = [
    {"sensor_id": "S001", "temperature": 70.0, "timestamp": "2024-01-16T00:05:10"},
    {"sensor_id": "S001", "temperature": 74.0, "timestamp": "2024-01-16T00:06:40"},
    {"sensor_id": "S002", "temperature": 60.0, "timestamp": "2024-01-16T00:07:00"},
    {"sensor_id": "S002", "temperature": 62.0, "timestamp": "2024-01-16T00:05:30"},
    {"sensor_id": "S003", "temperature": 99.0, "timestamp": "not-a-time"},
]

BATCH1 = [
    {"sensor_id": "S001", "temperature": 80.0, "timestamp": "2024-01-16T00:21:00"},
    {"sensor_id": "S002", "temperature": 64.0, "timestamp": "2024-01-16T00:23:30"},
    # late: watermark after batch 0 is 00:07:00 - 2 min = 00:05:00
    {"sensor_id": "S001", "temperature": 100.0, "timestamp": "2024-01-16T00:04:30"},
]


@pytest.fixture()
def watch_dir(tmp_path):
    return str(tmp_path / "sensor_input")


def _run_two_batches(spark, watch_dir, build):
    write_json_batch(watch_dir, BATCH0, 0)
    stream = with_event_time(
        read_sensor_stream(spark, watch_dir, max_files_per_trigger=1)
    )
    run = ForeachBatchRun(spark, build(stream), output_mode="update")
    try:
        run.process_all()
        n_first = len(run.nonempty())
        write_json_batch(watch_dir, BATCH1, 1)
        run.process_all()
        batches = run.nonempty()
        assert n_first == 1 and len(batches) == 2, (
            f"expected exactly one data batch per file, got {len(batches)}"
        )
        return batches[0][1], batches[1][1]
    finally:
        run.stop()


def test_part_a_running_stats_per_batch_tables(spark, watch_dir):
    """Part A: unwatermarked per-sensor cumulative stats.  Batch 1 must
    emit UPDATED cumulative rows (S001 absorbs the late 100.0: the
    reference's Batch-1 table likewise shows counts grown across batches),
    and S003's unparseable timestamp appears in no batch."""
    b0, b1 = _run_two_batches(spark, watch_dir, lambda s: running_sensor_stats(s))
    as_tuple = lambda r: (
        r["sensor_id"], r["avg_value"], r["reading_count"], r["min_value"], r["max_value"]
    )
    assert sorted(map(as_tuple, b0)) == [
        ("S001", 72.0, 2, 70.0, 74.0),
        ("S002", 61.0, 2, 60.0, 62.0),
    ]
    assert sorted(map(as_tuple, b1)) == [
        ("S001", 81.0, 4, 70.0, 100.0),
        ("S002", 62.0, 3, 60.0, 64.0),
    ]


def test_part_b_tumbling_per_batch_tables(spark, watch_dir):
    """Part B: watermarked 5-min tumbling windows.  Batch 0 emits the one
    populated window; batch 1 emits only the new [00:20, 00:25) window —
    the late 00:04:30 event's window ended at/before the 00:05:00 watermark
    and must never surface."""
    b0, b1 = _run_two_batches(spark, watch_dir, lambda s: tumbling_window_stats(s))
    as_tuple = lambda r: (
        r["window_start"].isoformat(),
        r["window_end"].isoformat(),
        r["avg_value"],
        r["reading_count"],
    )
    assert sorted(map(as_tuple, b0)) == [
        ("2024-01-16T00:05:00", "2024-01-16T00:10:00", 66.5, 4),
    ]
    assert sorted(map(as_tuple, b1)) == [
        ("2024-01-16T00:20:00", "2024-01-16T00:25:00", 72.0, 2),
    ]


def test_part_c_sliding_per_batch_tables(spark, watch_dir):
    """Part C: watermarked 10-min/5-min sliding windows per sensor.  Every
    batch-0 event lands in two windows; in batch 1 the late 100.0 reading
    is dropped from its [23:55, 00:05) window (end <= watermark) but KEPT
    in [00:00, 00:10) (end beyond watermark), updating that window's max —
    the subtle half-late case the coarse tests don't pin."""
    b0, b1 = _run_two_batches(spark, watch_dir, lambda s: sliding_window_max(s))
    as_tuple = lambda r: (
        r["window_start"].isoformat()[11:16],
        r["sensor_id"],
        r["max_value"],
        r["reading_count"],
    )
    assert sorted(map(as_tuple, b0)) == [
        ("00:00", "S001", 74.0, 2),
        ("00:00", "S002", 62.0, 2),
        ("00:05", "S001", 74.0, 2),
        ("00:05", "S002", 62.0, 2),
    ]
    assert sorted(map(as_tuple, b1)) == [
        ("00:00", "S001", 100.0, 3),
        ("00:15", "S001", 80.0, 1),
        ("00:15", "S002", 64.0, 1),
        ("00:20", "S001", 80.0, 1),
        ("00:20", "S002", 64.0, 1),
    ]
