"""Custom connector via the Spark 4 Python DataSource API — the
user-defined source tier (pyspark.sql.datasource), beyond the reference's
built-in CSV/JSON/text/file-stream sources (SURVEY.md §2.1).

``synthetic_events`` is a deterministic seeded event generator with BOTH
batch and micro-batch-streaming readers:

* batch: ``spark.read.format("synthetic_events").option("rows", N)
  .option("partitions", P).load()`` — P InputPartitions, each generating
  its contiguous id slice independently (embarrassingly parallel, no
  driver-side row materialization: the generator runs IN the executors,
  which is the whole point of the partition-planning API).
* stream: ``spark.readStream.format("synthetic_events")
  .option("rows_per_batch", B).option("max_rows", M)`` — offsets are
  plain row indices; every micro-batch emits the next B rows of the SAME
  deterministic sequence until M, so replays after checkpoint recovery
  produce identical data (exactly the property a reliable source must
  give the engine).

Every field is a pure function of the row index (md5-mixed), so two reads
NEVER diverge — no RNG state anywhere.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Ship by value: executors outside the repo cwd have no package on sys.path.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass


SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = datetime(2024, 3, 1, tzinfo=timezone.utc)


def _row(i: int):
    """Deterministic event for index ``i`` (md5-mixed, engine-portable)."""
    h = int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:8], "big", signed=False
    )
    return (
        i,
        _EPOCH + timedelta(seconds=i),
        h % 1000,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self):
        if self.rows <= 0:  # empty source: one no-op partition, not step=0
            return [_RangePartition(0, 0)]
        step = -(-self.rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _StreamReader(DataSourceStreamReader):
    """Offsets are row indices; latestOffset advances ``rows_per_batch``
    per trigger, capped at ``max_rows`` so bounded tests terminate.

    Restart safety: ``self._latest`` is driver memory and is NOT restored
    from the checkpoint (Spark skips initialOffset when one exists), so
    ``partitions(start, end)`` — which IS called with checkpointed
    offsets — re-anchors the counter at the committed position, and
    ``read`` iterates ``range(start, end)`` (empty when a post-restart
    probe briefly trails the committed offset).  Net effect: after a
    driver restart the source emits each row index exactly once; no
    committed range is ever re-read."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self._latest = 0

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"idx": self._latest}

    def partitions(self, start: dict, end: dict):
        # Re-anchor after restart: never fall behind an offset Spark has
        # already planned or committed.
        self._latest = max(self._latest, start["idx"], end["idx"])
        return [_RangePartition(start["idx"], end["idx"])]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)
