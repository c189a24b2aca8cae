"""Multimodal-column operators (BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with typed
metadata riding alongside.  The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition sizing — is real and tested;
the codec step is STUBBED (this container ships no image/audio libraries)
behind ``decode_image_batch(stub=False)`` → ``NotImplementedError`` and a
deterministic fake in stub mode, so swapping in PIL/torchaudio later is a
one-function change.

Scale notes:
- binary payloads dominate row size → ``spark.sql.files.maxPartitionBytes``
  should target ~128 MB of payload per task; metadata-only queries never
  touch the blob column thanks to parquet column pruning.
- decode fan-out runs in ``mapInPandas`` so each Arrow batch amortizes the
  Python crossing; per-row UDFs would be 10-100x slower.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, content_md5 string, "
    "width int, height int, channels int, decode_status string"
)


def binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest documents as opaque binary payloads + typed metadata — the
    canonical multimodal row shape (content, n_bytes, checksum)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.octet_length("text").alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
    )


def decode_image_batch(stub: bool = True):
    """Return the mapInPandas decode function.

    stub=True  → deterministic fake decode (dimensions derived from the
                 payload size / id), exercising the full Arrow round trip.
    stub=False → NotImplementedError: the real codec (PIL / libvips) is not
                 available in this environment; the call site, schema, and
                 batch shape are exactly what the real decoder needs.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not stub:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips; not shipped here"
                )
            n_bytes = pdf["n_bytes"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_md5": pdf["content_md5"],
                    # deterministic fake "decode": dims from payload size/id
                    "width": (n_bytes % 64 + 16).astype("int32"),
                    "height": ((pdf["doc_id"].astype("int64") * 7) % 64 + 16).astype(
                        "int32"
                    ),
                    "channels": 3,
                    "decode_status": "stub",
                }
            )

    return decode


def decoded_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: binary ingest → Arrow-batched decode
    (stubbed) → typed metadata.  The blob column is projected away at the
    end so downstream aggregation never shuffles payloads."""
    return binary_ingest(spark, sf_dir).mapInPandas(
        decode_image_batch(stub=True), schema=DECODED_SCHEMA
    )


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 10) -> DataFrame:
    """Frame-sampling shape for video-like payloads: deterministic 1-in-N
    selection by id hash — a pushdown-friendly filter (no decode needed to
    drop 90% of rows)."""
    ingest = binary_ingest(spark, sf_dir)
    return ingest.filter(F.col("doc_id") % every_n == 0).select(
        "doc_id", "n_bytes", "content_md5"
    )
