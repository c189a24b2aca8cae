"""Nested-document operators (SURVEY.md §1.2, §2.5 A7-A10, §2.9 F7/F8) —
Q3 semantics (q3_json_processing.py) on the driver star schema.

The testdata has no nested table (FIXTURES.md §2), so the nested fixture is
built by composing orders+lineitem+part into an array-of-structs column
(``collect_list(struct(...))``) — exercising the inverse of explode — and
then flattened back with ``explode`` exactly as the reference does
(q3_json_processing.py:36-45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round2
from ..sources.readers import load_table

#: Explicit pivot domain.  The reference lets ``pivot()`` discover its
#: column values at runtime (q3_json_processing.py:76-81) — an extra job,
#: capped by spark.sql.pivotMaxValues, and nondeterministic column order.
#: At scale the value list must be explicit (SURVEY.md §7).
BRAND_VALUES = [f"Brand#{i}" for i in range(1, 26)]


def nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the array-of-structs order document: one row per order with a
    ``products`` array (FIXTURES.md §2 schema shape).

    collect_list is a single shuffle on the order key; struct fields carry
    everything downstream consumers need so the exploded view loses nothing.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    lines = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey, "inner")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderdate").alias("order_date"),
            F.struct(
                F.col("p_name").alias("name"),
                F.col("l_extendedprice").alias("price"),
                F.col("l_discount").alias("discount"),
                F.col("l_partkey").alias("product_id"),
                F.col("p_brand").alias("brand"),
                F.col("l_quantity").alias("quantity"),
            ).alias("product"),
        )
    )
    return lines.groupBy("order_id", "customer_id", "order_date").agg(
        F.collect_list("product").alias("products"),
        round2(F.sum(F.col("product.price") * (1 - F.col("product.discount")))).alias(
            "total_amount"
        ),
    )


def exploded_products(nested: DataFrame) -> DataFrame:
    """F7+F8+P6 (q3_json_processing.py:36-45): explode the products array and
    project struct fields with renames."""
    ex = nested.select(
        "order_id",
        "customer_id",
        F.explode("products").alias("product"),  # F7
    )
    return ex.select(
        "order_id",
        "customer_id",
        F.col("product.product_id").alias("product_id"),  # F8/P6
        F.col("product.name").alias("product_name"),
        F.col("product.brand").alias("brand"),
        F.col("product.price").alias("price"),
        F.col("product.discount").alias("discount"),
        F.col("product.quantity").alias("quantity"),
    )


def product_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 Part A (A7, q3_json_processing.py:54-63): per-product totals over
    the exploded rows — quantity, revenue (rounded), distinct orders.

    Semantically identity with a direct lineitem⋈part aggregation (the
    oracle); the nest→explode roundtrip is the point of the exercise.
    """
    ex = exploded_products(nested_orders(spark, sf_dir))
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
    small, known domain".
    """
    ex = exploded_products(nested_orders(spark, sf_dir))
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
