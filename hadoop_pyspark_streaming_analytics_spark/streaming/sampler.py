"""Per-key streaming reservoir sampler (``applyInPandasWithState``).

Operator: keep a bounded, uniform-without-replacement sample of K document
ids per key (e.g. per source/language) over an unbounded stream — the
training-data downsampling primitive (cap a hot domain at K docs while the
stream runs).

Determinism: instead of random reservoir replacement, each doc's priority
is ``md5(doc_id)`` and the state keeps the K SMALLEST priorities seen — a
fixed random permutation of doc ids, so (a) the kept set is a uniform
sample of everything seen, (b) replaying the stream (any batch split, any
order) yields the IDENTICAL sample, and (c) batch and streaming agree:
the same selection is one SQL query (``ORDER BY md5(id) LIMIT k`` per
key), which is the test oracle.

Scale: state is O(K) per key (priority + id arrays), merged over Arrow
batches; keys are hash-partitioned by the groupBy so the state store
shards horizontally.

API note: Spark 4's ``transformWithStateInPandas`` (ListState-based) is
the forward spelling of this operator, but its state protocol requires
``google.protobuf`` at runtime — unavailable in this environment — so the
implementation uses the stable ``applyInPandasWithState`` API (same shape
as streaming/stateful.py:ewma_per_key).
"""

from __future__ import annotations

import hashlib
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


SAMPLE_OUTPUT_SCHEMA = "key string, doc_id long, priority string"
_STATE_SCHEMA = "priorities array<string>, ids array<long>"


def _priority(doc_id: int) -> str:
    return hashlib.md5(str(doc_id).encode()).hexdigest()


def make_sampler_fn(k: int = 8):
    """Per-group update: merge the batch's (priority, id) pairs into the
    kept top-k (smallest md5), dedupe replayed ids, emit the FULL current
    sample for the key (update semantics — last emit per key wins)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            priorities, ids = state.get
            current = set(zip(priorities, ids))
        else:
            current = set()
        for pdf in pdfs:
            for doc_id in pdf["doc_id"].tolist():
                if doc_id is None or pd.isna(doc_id):  # null ids: skip, don't crash
                    continue
                current.add((_priority(int(doc_id)), int(doc_id)))
        best = sorted(current)[:k]
        state.update(([p for p, _ in best], [d for _, d in best]))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(best),
                "doc_id": [d for _, d in best],
                "priority": [p for p, _ in best],
            }
        )

    return update


def sample_per_key(
    df: DataFrame, key_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Bounded deterministic sample of ``k`` ids per key over a streaming
    DataFrame."""
    from pyspark.sql import functions as F

    normalized = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return normalized.groupBy("key").applyInPandasWithState(
        make_sampler_fn(k),
        outputStructType=SAMPLE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
