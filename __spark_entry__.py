"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to the engine's query catalog
(``hadoop_pyspark_streaming_analytics_spark/plans/catalog.py``), which binds
each operator from SURVEY.md §2 to its Spark builder and DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q2 Part A semantics: scan → clean → two-level agg →
    rank window → left join) on /root/testdata/sf0.001."""
    from hadoop_pyspark_streaming_analytics_spark.operators.relational import (
        customer_summary_with_top_product,
    )

    return customer_summary_with_top_product(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: spec.builder for spec in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    return {spec.name: spec.oracle for spec in CATALOG if spec.oracle is not None}
