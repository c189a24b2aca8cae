"""Deterministic streaming test harness (SURVEY.md §5).

Reproducing the reference's committed Batch 0 / Batch 1 console tables
requires controlling file arrival, not wall-clock triggers: the harness
writes one JSON file per intended micro-batch into a watched directory,
runs the query with ``availableNow``/``processAllAvailable``, and collects
from a ``memory`` sink (K2's testable twin)."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_json_batch(watch_dir: str, rows: list[dict], batch_id: int) -> str:
    """Drop one JSON-lines file into the watched directory — the file source
    discovers it as one micro-batch (mirrors q4 cell 2's ``cp``)."""
    os.makedirs(watch_dir, exist_ok=True)
    path = os.path.join(watch_dir, f"batch_{batch_id:04d}.json")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    os.rename(tmp, path)  # atomic: the source never sees a partial file
    return path


class MemorySinkRun:
    """Run a streaming DataFrame into a memory sink and step it batch-by-batch."""

    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        output_mode: str = "update",
        name: str | None = None,
    ):
        self.spark = spark
        self.name = name or f"mem_{uuid.uuid4().hex[:8]}"
        self.query = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(self.name)
            .start()
        )

    def process_all(self) -> None:
        self.query.processAllAvailable()

    def table(self) -> DataFrame:
        return self.spark.table(self.name)

    def stop(self) -> None:
        self.query.stop()


class ForeachBatchRun:
    """Run a streaming DataFrame through ``foreachBatch``, recording each
    micro-batch's (batch_id, rows) — the instrument for BATCH-BY-BATCH
    parity tests against the reference's per-batch console tables
    (q4_streaming.ipynb "Batch: 0"/"Batch: 1" output), which a memory sink
    cannot reproduce (it appends without batch boundaries)."""

    def __init__(self, spark: SparkSession, df: DataFrame, output_mode: str = "update"):
        self.batches: list[tuple[int, list]] = []

        def capture(batch_df: DataFrame, batch_id: int) -> None:
            self.batches.append((int(batch_id), batch_df.collect()))

        self.query = (
            df.writeStream.outputMode(output_mode).foreachBatch(capture).start()
        )

    def process_all(self) -> None:
        self.query.processAllAvailable()

    def nonempty(self) -> list[tuple[int, list]]:
        """Batches that carried rows (stateful queries may schedule empty
        watermark-advance batches — the reference's empty Batch 2/5/8)."""
        return [(bid, rows) for bid, rows in self.batches if rows]

    def stop(self) -> None:
        self.query.stop()
