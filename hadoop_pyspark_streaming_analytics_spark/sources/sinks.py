"""Sinks (SURVEY.md §2.2, K1-K5).

The reference writes single-file CSVs via ``coalesce(1)``
(q2_ecommerce_analysis.py:271-275, q3_json_processing.py:116-119) — a
driver-bottleneck anti-pattern at scale.  Here single-file output is an
explicit opt-in; the default leaves Spark's parallel writers alone and the
primary sink is partitioned parquet (the reference shows parquet commented
out, bonus.py:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """CSV writer (K1). ``single_file=True`` reproduces the reference's
    ``coalesce(1)`` artifact shape for golden-file parity; default keeps one
    file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet writer (K3) with optional partition columns — partitioned
    layout is what makes partition pruning possible on the read side at
    100 TB."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
