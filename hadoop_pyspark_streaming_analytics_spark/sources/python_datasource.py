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
  give the engine).  The stream uses ``SimpleDataSourceStreamReader``:
  its ``read(start)`` receives the CHECKPOINTED start offset, so the
  next offset is always derived from a committed position and a driver
  restart can never regress the offset log (the planner-API spelling
  kept a ``latestOffset`` counter in driver memory, which after a
  restart briefly trailed the committed offset and could double-emit a
  batch).  Trade-off, per the simple API's contract: stream batches
  materialize driver-side — fine at rows_per_batch scale for a
  synthetic/test source; the BATCH reader stays executor-parallel.

Every field is a pure function of the row index (md5-mixed), so two reads
NEVER diverge — no RNG state anywhere.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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


class _StreamReader(SimpleDataSourceStreamReader):
    """Offsets are row indices; each ``read(start)`` emits the next
    ``rows_per_batch`` rows after the CHECKPOINTED start, capped at
    ``max_rows`` so bounded tests terminate.

    Restart safety by construction: the simple stream-reader API hands
    ``read`` the start offset Spark recovered from the offset log, and the
    returned next-offset is derived from it — there is NO driver-memory
    counter to desynchronize.  The planner-API spelling this replaced kept
    ``self._latest`` on the driver; after a checkpoint restart its fresh
    ``latestOffset()`` (counter at 0) could return an offset BEHIND the
    committed one, Spark would log that regressed end, and the following
    batch re-emitted the already-delivered range — duplicates under
    exactly-once claims.  ``readBetweenOffsets`` replays any logged range
    deterministically (pure function of the row index)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["idx"], end["idx"])])

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

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)
