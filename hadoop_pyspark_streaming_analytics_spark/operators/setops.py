"""Set operations, collection aggregations, and CUBE — extensions BEYOND
the reference surface.

SURVEY.md §2.8 records "None": the reference has no union / intersect /
except anywhere.  §2.5's "not present" list includes collect_list /
collect_set and cube / grouping sets (rollup is covered by
``timeseries.hourly_rollup``).  A user migrating real workloads expects all
of these, so the engine carries them as first-class catalog queries.

Scale notes (100 TB):

- ``union`` is a zero-shuffle plan combinator — the distinct that follows
  is the only exchange, and it partially aggregates map-side.
- ``intersect`` / ``subtract`` compile to aggregate + left-semi/anti join
  on the full row as key; with AQE they broadcast when one side collapses
  to a small distinct set (the common case for "active entity" queries).
- ``collect_set``/``collect_list`` buffer a whole group in executor memory:
  safe only for bounded groups (an order has ≤ 7 lines here).  For
  unbounded groups, cap with ``slice(sort_array(...), 1, k)`` or switch to
  a top-K window — never collect an unbounded group.
- ``cube`` over d dimensions expands each input row to 2^d grouping-set
  rows map-side, but partial aggregation collapses them before the single
  shuffle — one pass regardless of dimension count, vs 2^d separate jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round2
from ..sources.readers import load_events, load_table


def _buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"))
        .where(F.col("user_id").isNotNull())
    )


def _event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events(spark, sf_dir)
        .select("user_id")
        .where(F.col("user_id").isNotNull())
    )


def active_users_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): every id that bought OR emitted an event.  The
    union itself is free; the single shuffle is the trailing distinct."""
    return _buyers(spark, sf_dir).union(_event_users(spark, sf_dir)).distinct()


def buyers_with_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: ids that bought AND emitted an event (distinct output,
    SQL INTERSECT semantics — NULLs compare equal)."""
    return _buyers(spark, sf_dir).intersect(_event_users(spark, sf_dir))


def buyers_without_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: ids that bought but never emitted an event.  ``subtract`` is
    Spark's EXCEPT DISTINCT — an aggregate + left-anti join."""
    return _buyers(spark, sf_dir).subtract(_event_users(spark, sf_dir))


def order_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order product baskets: ``collect_set`` (distinct parts) and
    ``collect_list`` (all parts, with duplicates), both sorted for
    determinism and rendered as CSV strings so the oracle hash is
    representation-stable across engines.

    Groups are bounded (≤ 7 lineitems per order in this schema), so the
    in-memory collect buffer is safe at any table size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    as_csv = lambda arr: F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))  # noqa: E731
    return li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").alias("basket_size"),
        as_csv(F.array_sort(F.collect_set("l_partkey"))).alias("products_distinct_csv"),
        as_csv(F.sort_array(F.collect_list("l_partkey"))).alias("products_all_csv"),
    )


def event_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, hour): all four grouping sets — (type,hour),
    (type), (hour), () — in one shuffle.  ``grouping_level`` is the
    SQL-standard GROUPING_ID bitmask disambiguating the NULLs cube
    introduces from genuine NULL dimension values."""
    ev = load_events(spark, sf_dir).withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    return (
        ev.cube("event_type", "hour")
        .agg(
            F.grouping_id().cast("int").alias("grouping_level"),
            F.count(F.lit(1)).alias("cnt"),
            round2(F.sum("value")).alias("total_value"),
        )
        .select("event_type", "hour", "grouping_level", "cnt", "total_value")
    )
