"""UDF surface (SURVEY.md §2.11, U1) — the bonus module's order-size
categorizer in three executions tiers.

Reference semantics (bonus.py:51-58, boundaries are part of the contract):
null → "Unknown"; x < 50 → "Small"; 50 <= x <= 200 → "Medium";
x > 200 → "Large".

Tiering (the 100 TB story):
1. ``categorize_expr`` — when/otherwise chain: pure Catalyst, whole-stage
   codegen, zero Python. THE hot-path choice.
2. ``categorize_pandas_udf`` — Arrow-batched vectorized Python: ~10-100x
   over row UDFs when Python is genuinely needed.
3. ``categorize_python_udf`` — row-at-a-time Python, kept only for parity
   with the reference's registration surface (bonus.py:61).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Ship Python-worker closures by VALUE (see operators/multimodal.py): a
# driver outside the repo cwd has no package on executor sys.path, and
# by-reference pickling of module-level helpers would break there.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass



def categorize_expr(col: Column) -> Column:
    """Catalyst-native twin of the reference UDF (bonus.py:51-58)."""
    return (
        F.when(col.isNull(), "Unknown")
        .when(col < 50, "Small")
        .when(col <= 200, "Medium")
        .otherwise("Large")
    )


def _categorize_scalar(value) -> str:
    # bonus.py:52-58 verbatim logic (not code): null first, then boundaries.
    if value is None:
        return "Unknown"
    if value < 50:
        return "Small"
    if value <= 200:
        return "Medium"
    return "Large"


categorize_python_udf = F.udf(_categorize_scalar, T.StringType())


@F.pandas_udf(T.StringType())
def categorize_pandas_udf(values: pd.Series) -> pd.Series:
    out = pd.Series("Large", index=values.index, dtype="object")
    out[values <= 200] = "Medium"
    out[values < 50] = "Small"
    out[values.isna()] = "Unknown"
    return out
