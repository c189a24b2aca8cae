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
