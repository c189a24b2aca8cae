"""Golden-semantics tests on REFERENCE-SHAPED inputs (FIXTURES.md §1-§4):
dirty retail CSV through the cleaning pipeline, nested orders JSON through
explode/pivot, text lines through the Q1 report — asserting the exact
behaviors the reference's golden artifacts encode (cleaning drops, UDF
boundaries, rank ties, pivot zeros)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.functions.udfs import (
    categorize_expr,
    categorize_pandas_udf,
    categorize_python_udf,
)
from hadoop_pyspark_streaming_analytics_spark.operators.cleaning import clean_retail
from hadoop_pyspark_streaming_analytics_spark.operators.text import tokens
from hadoop_pyspark_streaming_analytics_spark.sources.readers import (
    read_orders_json,
    read_retail_csv,
)

RETAIL_ROWS = [
    # InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country
    "536365,85123A,HOLDER,6,12/1/2010 8:26,2.55,17850,United Kingdom",
    "536365,71053,LANTERN,6,12/1/2010 8:26,3.39,17850,United Kingdom",
    # null CustomerID → dropped (P1)
    "536366,22633,MUG,6,12/1/2010 8:28,1.85,,United Kingdom",
    # negative quantity (return) → dropped (P2)
    "536367,84406B,TRAY,-2,12/1/2010 8:34,2.75,13047,United Kingdom",
    # zero price → dropped (P2)
    "536368,22960,JAR,6,12/1/2010 8:34,0.0,13047,United Kingdom",
    # cancellation prefix → dropped (P3)
    "C536369,21756,BOX,3,12/1/2010 8:35,5.95,13047,United Kingdom",
    # unparseable date → dropped (P4 after try_to_timestamp)
    "536370,22728,ALARM,24,not-a-date,3.75,12583,France",
    # second invoice, same customer, SAME timestamp as 536365 (rank tie)
    "536371,85123A,HOLDER,2,12/1/2010 8:26,2.55,17850,United Kingdom",
]


@pytest.fixture(scope="module")
def retail(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("retail") / "retail.csv"
    header = "InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country"
    p.write_text("\n".join([header, *RETAIL_ROWS]) + "\n")
    return read_retail_csv(spark, str(p))


def test_retail_cleaning_contract(spark, retail):
    """q2_ecommerce_analysis.py:49-61: each dirty-data class is dropped, the
    cleaning rate is observable (8 → 3 rows)."""
    assert retail.count() == 8
    cleaned = clean_retail(retail)
    rows = cleaned.collect()
    assert len(rows) == 3
    assert {r["InvoiceNo"] for r in rows} == {"536365", "536371"}
    assert all(r["InvoiceTimestamp"] is not None for r in rows)


def test_rank_ties_share_order_number(spark, retail):
    """W2 semantics (q2_ecommerce_analysis.py:191-196): rank (not
    row_number) — two invoices with the same timestamp share order_number."""
    from pyspark.sql import Window

    cleaned = clean_retail(retail)
    orders = cleaned.groupBy("CustomerID", "InvoiceNo", "InvoiceTimestamp").agg(
        F.sum(F.col("Quantity") * F.col("UnitPrice")).alias("order_value")
    )
    w = Window.partitionBy("CustomerID").orderBy("InvoiceTimestamp")
    ranked = orders.withColumn("order_number", F.rank().over(w)).collect()
    nums = {r["InvoiceNo"]: r["order_number"] for r in ranked}
    assert nums == {"536365": 1, "536371": 1}  # tie → both rank 1


@pytest.mark.parametrize(
    "fn", [categorize_expr, categorize_python_udf, categorize_pandas_udf]
)
def test_categorize_boundaries_all_tiers(spark, fn):
    """U1 boundary contract (bonus.py:51-58): null→Unknown, <50→Small,
    50<=x<=200→Medium (inclusive BOTH ends), >200→Large — across all three
    execution tiers."""
    df = spark.createDataFrame(
        [(None,), (0.0,), (49.99,), (50.0,), (120.0,), (200.0,), (200.01,), (1e6,)],
        "v double",
    )
    got = [r["c"] for r in df.select(fn(F.col("v")).alias("c")).collect()]
    assert got == [
        "Unknown",
        "Small",
        "Small",
        "Medium",
        "Medium",
        "Medium",
        "Large",
        "Large",
    ]


ORDERS_JSON = [
    {
        "order_id": "O1",
        "customer_name": "alice",
        "order_date": "2024-01-01",
        "total_amount": 30.0,
        "products": [
            {"name": "widget", "price": 10.0, "product_id": "P001", "quantity": 2},
            {"name": "gadget", "price": 5.0, "product_id": "P002", "quantity": 2},
        ],
    },
    {
        "order_id": "O2",
        "customer_name": "bob",
        "order_date": "2024-01-02",
        "total_amount": 10.0,
        "products": [
            {"name": "widget", "price": 10.0, "product_id": "P001", "quantity": 1}
        ],
    },
]


@pytest.fixture(scope="module")
def orders_json(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("oj") / "orders.json"
    p.write_text("\n".join(json.dumps(o) for o in ORDERS_JSON) + "\n")
    return read_orders_json(spark, str(p))


def test_nested_json_explode_and_pivot(spark, orders_json):
    """Q3 semantics on the reference's own JSON shape: explode fan-out,
    per-product stats, pivot null→0 (q3_json_processing.py:36-90)."""
    ex = orders_json.select(
        "order_id", "customer_name", F.explode("products").alias("p")
    ).select(
        "order_id",
        "customer_name",
        F.col("p.product_id").alias("product_id"),
        (F.col("p.price") * F.col("p.quantity")).alias("revenue"),
        F.col("p.quantity").alias("quantity"),
    )
    assert ex.count() == 3  # 2 + 1 products
    stats = {
        r["product_id"]: (r["total_quantity"], r["num_orders"])
        for r in ex.groupBy("product_id")
        .agg(
            F.sum("quantity").alias("total_quantity"),
            F.countDistinct("order_id").alias("num_orders"),
        )
        .collect()
    }
    assert stats == {"P001": (3, 2), "P002": (2, 1)}

    pivoted = (
        ex.groupBy("customer_name")
        .pivot("product_id", ["P001", "P002"])
        .sum("quantity")
        .fillna(0)
    )
    rows = {r["customer_name"]: (r["P001"], r["P002"]) for r in pivoted.collect()}
    assert rows == {"alice": (2, 2), "bob": (1, 0)}  # bob never bought P002 → 0


def test_q1_tokenizer_contract(spark):
    """q1_mapper.py:19-27: lowercase, [a-z]+ runs (don't → don,t), stop
    words removed, digits/punctuation never produce tokens."""
    df = spark.createDataFrame(
        [("Don't PANIC — 42 times the answer is a LIE!",)], "text string"
    )
    got = sorted(r["word"] for r in tokens(df).collect())
    assert got == ["answer", "don", "lie", "panic", "t", "times"]


def test_q1_report_shape(spark, sf_dir):
    from hadoop_pyspark_streaming_analytics_spark.operators.text import format_q1_report

    report = format_q1_report(spark, sf_dir, k=5)
    assert "WORD COUNT WITH STATISTICS" in report
    assert "Word Frequencies (Top 5):" in report
    assert "Word Length Distribution:" in report
    assert "Total words:" in report and "Average word length:" in report


def test_json_corrupt_records_are_captured_not_dropped(spark, tmp_path):
    """X5 for JSON: malformed lines must surface in _corrupt_record under
    PERMISSIVE mode — countable and quarantinable — while valid lines
    parse normally."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.sources.readers import (
        read_orders_json,
    )

    p = tmp_path / "orders.jsonl"
    p.write_text(
        '{"order_id": "O1", "customer_name": "A", "order_date": "2024-01-01", '
        '"total_amount": 10.5, "products": []}\n'
        "this is not json at all\n"
        '{"order_id": "O2", "customer_name": "B", "order_date": "2024-01-02", '
        '"total_amount": 7.25, "products": []}\n'
        '{"order_id": "O3", "unterminated": \n'
    )
    df = read_orders_json(spark, str(p), capture_corrupt=True).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["order_id"] for r in good.collect()) == ["O1", "O2"]
    assert bad.count() == 2
    raw = [r["_corrupt_record"] for r in bad.collect()]
    assert any("not json" in s for s in raw)
    df.unpersist()
