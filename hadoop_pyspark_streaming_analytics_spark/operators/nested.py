"""Nested-document operators (SURVEY.md §1.2, §2.5 A7-A10, §2.9 F7/F8) —
Q3 semantics (q3_json_processing.py) on the driver star schema.

The testdata has no nested table (FIXTURES.md §2), so the nested fixture is
built by composing orders+lineitem+part into an array-of-structs column
(``collect_list(struct(...))``) — exercising the inverse of explode — and
then flattened back with ``explode`` exactly as the reference does
(q3_json_processing.py:36-45).

Scale note: Catalyst does NOT prune struct fields through
``collect_list`` → ``explode`` (the ObjectHashAggregate materializes the
whole struct), so every field in the struct rides the nest shuffle even if
no consumer reads it.  ``nested_orders`` therefore takes an explicit
``fields`` subset and each consumer requests only what it reads — at 100 TB
the difference is shipping 2 narrow columns vs 6 (incl. a ~30-byte product
name string) per lineitem through the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round2
from ..sources.readers import load_table

#: Explicit pivot domain.  The reference lets ``pivot()`` discover its
#: column values at runtime (q3_json_processing.py:76-81) — an extra job,
#: capped by spark.sql.pivotMaxValues, and nondeterministic column order.
#: At scale the value list must be explicit (SURVEY.md §7).
BRAND_VALUES = [f"Brand#{i}" for i in range(1, 26)]

#: Full product-struct field set (FIXTURES.md §2 document shape) and the
#: source column each is drawn from.  Fields prefixed ``p_`` require the
#: part join; a ``fields`` subset without them skips that join entirely.
PRODUCT_FIELD_SOURCES = {
    "name": "p_name",
    "price": "l_extendedprice",
    "discount": "l_discount",
    "product_id": "l_partkey",
    "brand": "p_brand",
    "quantity": "l_quantity",
}
ALL_PRODUCT_FIELDS = tuple(PRODUCT_FIELD_SOURCES)


def nested_orders(
    spark: SparkSession,
    sf_dir: str,
    fields: Sequence[str] = ALL_PRODUCT_FIELDS,
    include_total: bool = True,
) -> DataFrame:
    """Build the array-of-structs order document: one row per order with a
    ``products`` array (FIXTURES.md §2 schema shape).

    collect_list is a single shuffle on the order key; ``fields`` bounds
    what that shuffle carries (see module docstring).  ``total_amount`` is
    aggregated from the flat line columns BEFORE nesting so it never forces
    price/discount into the struct.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lines = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
    if any(PRODUCT_FIELD_SOURCES[f].startswith("p_") for f in fields):
        part = load_table(spark, sf_dir, "part")
        lines = lines.join(part, lineitem.l_partkey == part.p_partkey, "inner")
    lines = lines.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("order_date"),
        F.struct(
            *[F.col(PRODUCT_FIELD_SOURCES[f]).alias(f) for f in fields]
        ).alias("product"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
    )
    aggs = [F.collect_list("product").alias("products")]
    if include_total:
        aggs.append(round2(F.sum("amount")).alias("total_amount"))
    return lines.groupBy("order_id", "customer_id", "order_date").agg(*aggs)


def exploded_products(nested: DataFrame) -> DataFrame:
    """F7+F8+P6 (q3_json_processing.py:36-45): explode the products array
    and project struct fields with renames.  Projects whatever fields the
    struct carries (``name`` surfaces as ``product_name``)."""
    ex = nested.select(
        "order_id",
        "customer_id",
        F.explode("products").alias("product"),  # F7
    )
    present = [f.name for f in ex.schema["product"].dataType.fields]
    renames = {"name": "product_name"}
    return ex.select(
        "order_id",
        "customer_id",
        *[F.col(f"product.{f}").alias(renames.get(f, f)) for f in present],  # F8/P6
    )


def product_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 Part A (A7, q3_json_processing.py:54-63): per-product totals over
    the exploded rows — quantity, revenue (rounded), distinct orders.

    Semantically identity with a direct lineitem⋈part aggregation (the
    oracle); the nest→explode roundtrip is the point of the exercise.
    """
    ex = exploded_products(
        nested_orders(
            spark,
            sf_dir,
            fields=("product_id", "name", "price", "discount", "quantity"),
            include_total=False,
        )
    )
    return ex.groupBy("product_id", "product_name").agg(
        F.sum("quantity").alias("total_quantity"),
        round2(F.sum(F.col("price") * (1 - F.col("discount")))).alias("total_revenue"),
        F.countDistinct("order_id").alias("num_orders"),
    )


def customer_brand_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 Part B (A8-A10, q3_json_processing.py:76-90): customer×brand pivot
    with explicit values, null→0 fill, and a horizontal (row-wise) total.

    Pivoting on brand (25 values) rather than raw part keys keeps the
    dynamic-column set bounded — the 100 TB rule for pivot is "explicit,
    small, known domain".  The nest shuffle carries only (brand, quantity).
    """
    ex = exploded_products(
        nested_orders(
            spark, sf_dir, fields=("brand", "quantity"), include_total=False
        )
    )
    pivoted = (
        ex.groupBy("customer_id")
        .pivot("brand", BRAND_VALUES)  # A8, explicit domain
        .agg(F.sum("quantity"))
        .fillna(0)  # A9
    )
    renames = {b: f"brand_{b.split('#')[1]}" for b in BRAND_VALUES}
    for old, new in renames.items():
        pivoted = pivoted.withColumnRenamed(old, new)
    brand_cols = [F.col(c) for c in renames.values()]
    # A10: horizontal sum across the pivoted columns.
    total = brand_cols[0]
    for c in brand_cols[1:]:
        total = total + c
    return pivoted.withColumn("total_items", total)


def customer_brand_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the inverse of the A8 pivot (``DataFrame.unpivot``,
    wide→long): melt the 25 brand columns back to (customer_id, brand,
    quantity) rows, dropping the zero-fill the pivot introduced.  The
    roundtrip property (pivot ∘ unpivot = the pre-pivot aggregation) is
    what the oracle checks: its SQL derives the long form DIRECTLY from
    the base tables, never pivoting at all."""
    wide = customer_brand_pivot(spark, sf_dir).drop("total_items")
    brand_cols = [f"brand_{i}" for i in range(1, 26)]
    long = wide.unpivot(
        ids=["customer_id"],
        values=brand_cols,
        variableColumnName="brand_col",
        valueColumnName="quantity",
    )
    return long.filter(F.col("quantity") > 0).select(
        "customer_id",
        F.concat(
            F.lit("Brand#"), F.regexp_extract("brand_col", r"(\d+)", 1)
        ).alias("brand"),
        "quantity",
    )
