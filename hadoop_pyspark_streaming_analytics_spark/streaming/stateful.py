"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for semantics Spark's built-in streaming aggregations
cannot express (SURVEY.md §2.10 lists this whole tier as absent from the
reference).

Operator: per-key EWMA (exponentially weighted moving average) with
anomaly flagging.  A windowed avg forgets nothing inside the window and
everything outside it; an EWMA needs *ordered, carried* state — exactly
the applyInPandasWithState shape.  State per key is three numbers, so
state size is O(keys), not O(events): safe on an unbounded stream.

Scale notes: state lives in the executor state store partitioned by the
group key (one shuffle); Arrow batches amortize the Python crossing; an
opt-in processing-time timeout evicts idle keys so sensor churn cannot
grow state forever.  The timeout is OFF by default because a registered
processing-time timer makes the engine schedule micro-batches continuously
(to fire timers), which breaks deterministic ``processAllAvailable()``
test harnesses — enable it on real deployments, not in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Ship Python-worker closures by VALUE (see operators/multimodal.py): a
# driver outside the repo cwd has no package on executor sys.path, and
# by-reference pickling of module-level helpers would break there.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass


EWMA_OUTPUT_SCHEMA = (
    "sensor_id string, n_seen long, ewma double, last_value double, "
    "is_anomaly boolean"
)
EWMA_STATE_SCHEMA = "n long, ewma double"


def make_ewma_fn(
    alpha: float = 0.3,
    anomaly_factor: float = 1.5,
    idle_timeout_ms: int | None = None,
):
    """Build the per-group update function.

    Rows inside each micro-batch are sorted by event time before folding,
    so the EWMA is deterministic regardless of shuffle order.  The emitted
    row per (key, batch) carries the post-batch EWMA and whether the LAST
    value deviated from the pre-update EWMA by more than ``anomaly_factor``.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # idle-key eviction: drop state, emit nothing
            state.remove()
            return
        if state.exists:
            n, ewma = state.get
        else:
            n, ewma = 0, None
        last_value = None
        is_anomaly = False
        # Concatenate ALL Arrow chunks before sorting: a large group arrives
        # as multiple pandas chunks in arbitrary order, so per-chunk sorting
        # would fold later-arriving earlier timestamps last.  mergesort +
        # (seq, value) tiebreak keeps equal-timestamp rows deterministic AND
        # matches the batch twin's (ts, event_id, value) fold order when the
        # caller wires a sequence column (``seq`` is all-null otherwise, a
        # no-op sort key).
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(
            ["event_time", "seq", "value"], kind="mergesort", na_position="first"
        )
        for v in batch["value"].tolist():
            if v is None or pd.isna(v):
                continue
            prev = ewma
            ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
            n += 1
            last_value = v
            is_anomaly = (
                prev is not None
                and abs(v) > 1e-12
                and abs(v - prev) > anomaly_factor * max(abs(prev), 1e-12)
            )
        if last_value is None:  # batch had only null values for this key
            return
        state.update((n, float(ewma)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "sensor_id": [key[0]],
                "n_seen": [n],
                "ewma": [float(ewma)],
                "last_value": [float(last_value)],
                "is_anomaly": [bool(is_anomaly)],
            }
        )

    return update


def ewma_per_key(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
    event_time_col: str = "event_time",
    seq_col: str | None = None,
    alpha: float = 0.3,
    anomaly_factor: float = 1.5,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming EWMA with anomaly flags.  Input: a streaming
    DataFrame with (key, value, event_time).  Output: one row per key per
    micro-batch in update mode.  Pass ``idle_timeout_ms`` (e.g. 1h) on real
    deployments to evict idle keys; leave ``None`` for deterministic tests
    (a registered timer forces continuous empty micro-batches).

    ``seq_col``: optional monotone id (event_id, offset).  With it, the fold
    order is (event_time, seq, value) — identical to the batch twin
    (operators/timeseries.py:ewma_per_user, which sorts (ts, event_id,
    value)) even when one key has two different values at the SAME
    timestamp.  Without it the tiebreak degrades to (event_time, value);
    sources like the reference's sensor JSON (no id field) accept that
    divergence on timestamp ties."""
    from pyspark.sql import functions as F

    normalized = df.select(
        F.col(key_col).alias("sensor_id"),
        F.col(value_col).alias("value"),
        F.col(event_time_col).alias("event_time"),
        (
            F.col(seq_col) if seq_col is not None else F.lit(None).cast("long")
        ).alias("seq"),
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return normalized.groupBy("sensor_id").applyInPandasWithState(
        make_ewma_fn(alpha, anomaly_factor, idle_timeout_ms),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


# --- transformWithStateInPandas (Spark 4.x successor API) ---
#
# The applyInPandasWithState operator above predates Spark 4's
# StatefulProcessor interface.  transformWithState adds typed state
# primitives (Value/List/MapState), per-state TTL, and timers, and requires
# the RocksDB state store provider.  The operator below covers the new
# surface with running per-key stats (count/min/max/mean) whose state is a
# single fixed-width ValueState row — O(keys) state, exactly like the EWMA.

TWS_OUTPUT_SCHEMA = (
    "sensor_id string, n_seen long, vmin double, vmax double, mean double"
)
TWS_STATE_SCHEMA = "n long, vmin double, vmax double, vsum double"


def make_running_stats_processor(ttl_ms: int | None = None):
    """Build the StatefulProcessor (imported lazily: the class only exists
    on pyspark >= 4.0, and building it inside the factory keeps module
    import safe on older runtimes)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", TWS_STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, vmin, vmax, vsum = self._state.get()
            else:
                n, vmin, vmax, vsum = 0, None, None, 0.0
            folded = 0
            for pdf in rows:
                vals = pdf["value"].dropna()
                if len(vals) == 0:
                    continue
                folded += int(len(vals))
                n += int(len(vals))
                vsum += float(vals.sum())
                bmin, bmax = float(vals.min()), float(vals.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
            if folded == 0:
                return  # unchanged group: no state write, no update-mode row
            self._state.update((n, vmin, vmax, vsum))
            yield pd.DataFrame(
                {
                    "sensor_id": [key[0]],
                    "n_seen": [n],
                    "vmin": [vmin],
                    "vmax": [vmax],
                    "mean": [vsum / n],
                }
            )

        def close(self) -> None:
            pass

    return RunningStatsProcessor()


def running_stats_per_key_tws(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running stats via ``transformWithStateInPandas``.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — the caller/test sets it before
    ``start()``; the HDFS-backed default provider rejects the operator.

    ``ttl_ms`` maps to ValueState TTL: idle keys' state expires without a
    timer (the TTL is enforced by the state store, so — unlike the
    EWMA's processing-time timeout — it does NOT force continuous
    micro-batches and stays test-deterministic)."""
    from pyspark.sql import functions as F

    normalized = df.select(
        F.col(key_col).alias("sensor_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return normalized.groupBy("sensor_id").transformWithStateInPandas(
        make_running_stats_processor(ttl_ms),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_stats_per_key_apws(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "temperature",
) -> DataFrame:
    """Transport twin of :func:`running_stats_per_key_tws`: the SAME
    ``RunningStatsProcessor`` folding logic, executed end-to-end through
    ``applyInPandasWithState`` with a ValueState→GroupState adapter.

    Why it exists: transformWithState's driver-side state server speaks
    protobuf, which some runtimes (including this sandbox) lack — so the
    TWS operator alone is implemented-but-unprovable there.  This twin
    carries the identical processor semantics over the older transport,
    letting the e2e test assert the processor under a real streaming
    engine everywhere, while the TWS leg runs wherever protobuf exists
    (tests/test_stateful.py branches on availability instead of skipping).
    """
    from pyspark.sql import functions as F

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        class _ValueStateAdapter:
            """ValueState surface (exists/get/update) over a GroupState."""

            def exists(self) -> bool:
                return state.exists

            def get(self):
                return state.get

            def update(self, value) -> None:
                state.update(tuple(value))

            def clear(self) -> None:
                state.remove()

        class _HandleAdapter:
            def getValueState(self, name, schema, ttlDurationMs=None):
                return _ValueStateAdapter()

        proc = make_running_stats_processor()
        proc.init(_HandleAdapter())
        out = proc.handleInputRows(key, pdfs, None)
        if out is not None:
            yield from out

    normalized = df.select(
        F.col(key_col).alias("sensor_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return normalized.groupBy("sensor_id").applyInPandasWithState(
        update,
        outputStructType=TWS_OUTPUT_SCHEMA,
        stateStructType=TWS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
