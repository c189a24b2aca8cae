"""Cross-engine-stable decimal rounding.

The testdata's money amounts are exact 4-decimal values
(price(2dp) * (1 - discount(2dp))), so aggregate sums frequently land
EXACTLY on the .xx5 half-cent boundary.  There, the last-bit differences
between Spark's and DuckDB's summation order (and their HALF_UP vs
HALF_EVEN conventions) flip the rounded cent — the classic
differential-testing trap (SURVEY.md §7 "rounding parity").

Fix: nudge the value off the boundary by an epsilon far larger than
float-summation noise (~1e-10) but far smaller than the rounding grid,
before rounding — on BOTH engines.  Exact half-way values then round UP
consistently (matching Spark's native HALF_UP), and non-boundary values are
unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS2 = 1e-6  # for 2-decimal (money) rounding
EPS4 = 1e-8  # for 4-decimal (measurement) rounding


def round2(col: Column) -> Column:
    """Money rounding, stable across engines."""
    return F.round(col + F.lit(EPS2), 2)


def round4(col: Column) -> Column:
    """Measurement rounding, stable across engines."""
    return F.round(col + F.lit(EPS4), 4)


def sql_round2(expr: str) -> str:
    return f"round(({expr}) + 1e-6, 2)"


def sql_round4(expr: str) -> str:
    return f"round(({expr}) + 1e-8, 4)"
