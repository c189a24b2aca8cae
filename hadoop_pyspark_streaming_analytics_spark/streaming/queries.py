"""Structured Streaming query builders (SURVEY.md §2.10, T1-T8) — the Q4
sensor-analytics module (q4_streaming.ipynb cell 1) re-expressed as
composable builders that work on ANY streaming DataFrame with an event-time
column.

The three reference queries:
  Part A (q4:51-59):  per-sensor running stats, NO watermark (state grows
                      forever — kept for parity, with a watermarked variant
                      as the scale-correct default).
  Part B (q4:74-87):  5-minute tumbling window avg/count over all sensors,
                      2-minute watermark (q4:71).
  Part C (q4:100-114): 10/5-minute sliding window max/count per sensor.

All builders accept batch DataFrames too — the SAME plan compiles for batch
and streaming (Structured Streaming's core design, SIGMOD '18), which is how
the driver's DuckDB oracle checks these semantics via the batch twins in
plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round4


def with_event_time(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Event-time projection + validity filter (q4:44-48): parse the string
    timestamp, drop unparseable rows (F2 + P4).

    The reference's ``to_timestamp`` nulled bad input under ANSI-off; Spark 4
    defaults to ANSI mode where it THROWS, so ``try_to_timestamp`` is the
    semantics-preserving spelling."""
    return df.withColumn("event_time", F.try_to_timestamp(F.col(ts_col))).filter(
        F.col("event_time").isNotNull()
    )


def running_sensor_stats(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
    watermark: str | None = None,
    event_time_col: str = "event_time",
) -> DataFrame:
    """Part A (T4, q4:51-59): per-key running avg/count/min/max.

    The reference runs this unwatermarked — state never expires, which is
    the documented 100 TB hazard (SURVEY.md §7): pass ``watermark`` to bound
    it.  Update output mode; works identically on batch input.
    """
    if watermark:
        df = df.withWatermark(event_time_col, watermark)  # T1
    return df.groupBy(key_col).agg(
        round4(F.avg(value_col)).alias("avg_value"),
        F.count(F.lit(1)).alias("reading_count"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def tumbling_window_stats(
    df: DataFrame,
    value_col: str = "temperature",
    window_duration: str = "5 minutes",
    watermark: str = "2 minutes",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Part B (T1+T2, q4:71-87): watermarked tumbling-window avg/count over
    ALL keys, window struct flattened to start/end (F9/F10)."""
    windowed = (
        df.withWatermark(event_time_col, watermark)  # T1
        .groupBy(F.window(event_time_col, window_duration))  # T2/F9
        .agg(
            round4(F.avg(value_col)).alias("avg_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
    )
    return windowed.select(  # F10
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "avg_value",
        "reading_count",
    )


def sliding_window_max(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 minutes",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Part C (T3, q4:100-114): watermarked sliding-window max/count per key."""
    windowed = (
        df.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration, slide), key_col)  # T3
        .agg(
            F.max(value_col).alias("max_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
    )
    return windowed.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        key_col,
        "max_value",
        "reading_count",
    )


def session_window_stats(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Session windows (beyond the reference surface): events within ``gap``
    of each other merge into one per-key session.  In streaming the session
    state is watermark-bounded (a session closes once the watermark passes
    its end); the SAME plan compiles for batch input — the DuckDB
    gaps-and-islands oracle for ``events_user_sessions`` proves the
    semantics (plans/catalog.py)."""
    windowed = (
        df.withWatermark(event_time_col, watermark)
        .groupBy(F.session_window(event_time_col, gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum(value_col)).alias("total_value"),
        )
    )
    return windowed.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        key_col,
        "n_events",
        "total_value",
    )


def start_console_query(
    df: DataFrame,
    query_name: str,
    trigger_seconds: int = 10,
    output_mode: str = "update",
):
    """K2 (q4:61-68): console sink, update mode, processing-time trigger —
    the reference's presentation sink, kept for API parity (T5/T6)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("console")
        .option("truncate", False)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .queryName(query_name)
        .start()
    )


def stop_all_queries(spark) -> None:
    """T8 (q4 cell 3): enumerate and stop every active streaming query."""
    for q in spark.streams.active:
        q.stop()
