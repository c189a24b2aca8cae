"""Streaming operators BEYOND the reference surface (SURVEY.md §2.10 lists
these as "not present"): streaming ingest dedup, stream-static enrichment
joins, and a transactional parquet sink via foreachBatch.  Together with
queries.py these make the streaming module a usable ingest pipeline (the
LLM-data use case: documents arrive as files → dedup → enrich → parquet).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    df: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on arbitrary key columns.

    With an event-time column, uses ``dropDuplicatesWithinWatermark`` so the
    dedup state EXPIRES — the only shape that survives an unbounded stream
    (plain dropDuplicates state grows forever; kept as the semantic fallback
    for keyed replay-free sources)."""
    if event_time_col is not None:
        return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)


def stream_fingerprint_dedup(
    docs: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content-level streaming dedup: fingerprint (md5 of normalized text)
    then keyed dedup — the streaming twin of operators/dedup.py:
    exact_duplicates, for ingest-time filtering."""
    from ..operators.dedup import normalized_text

    with_fp = docs.withColumn("fingerprint", F.md5(normalized_text(F.col(text_col))))
    return stream_dedup_exact(
        with_fp, ["fingerprint"], event_time_col=event_time_col, watermark=watermark
    )


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a dimension table.
    Spark re-plans the static side per batch; broadcast it explicitly —
    dimension tables are the canonical broadcast case and this avoids
    re-shuffling the stream state."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    bound: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join on ``key`` bounded to an event-time interval:
    a right row matches a left row when ``left_time <= right_time <=
    left_time + bound``.

    Both sides are watermarked and the join condition carries the time
    bound — the combination is what lets Spark EXPIRE join state (left rows
    older than watermark+bound can never match again and are evicted).  An
    unbounded stream-stream join without both is a state leak, not a plan.
    ``left_time`` and ``right_time`` must be distinct names; the right-side
    key is dropped from the output.
    """
    if left_time == right_time:
        raise ValueError("left_time and right_time must be distinct column names")
    lhs = left.withWatermark(left_time, watermark).alias("l")
    rhs = right.withWatermark(right_time, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {bound}")
        )
    )
    return lhs.join(rhs, cond, how).drop(F.col(f"r.{key}"))


def foreach_batch_parquet(
    path: str,
    partition_by: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
):
    """foreachBatch sink writing each micro-batch to partitioned parquet in
    append mode — the production sink the reference's console sink stands in
    for.  ``transform`` runs batch-only logic per micro-batch (e.g. exact
    countDistinct, which streaming aggregation cannot express)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        writer = out.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    return write


def foreach_batch_parquet_idempotent(path: str):
    """Replay-safe foreachBatch sink: each micro-batch writes to its own
    ``batch_id=N`` directory with OVERWRITE mode, so reprocessing after a
    failure (Spark replays the last un-committed batch on restart)
    rewrites the same directory instead of appending duplicates —
    file-sink exactly-once without a transaction log.  Readers scan
    ``path`` with ``batch_id`` as an ordinary partition column."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write
