"""Cleaning pipeline (SURVEY.md §2.3, P1-P4).

The reference's dirty-data contract IS part of its semantics
(q2_ecommerce_analysis.py:49-61, README.md:150-155): drop null customer ids,
non-positive quantities/prices, cancellation-prefixed order ids, and rows
whose date fails to parse.  Expressed declaratively so Catalyst pushes every
predicate into the scan (``.explain`` shows them under ``PushedFilters``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_retail(df: DataFrame) -> DataFrame:
    """Reference cleaning pipeline on the retail CSV shape
    (q2_ecommerce_analysis.py:49-61): P1 null filter, P2 comparisons,
    P3 negated prefix match, F1 safe timestamp parse + P4 validity filter."""
    return (
        df.filter(F.col("CustomerID").isNotNull())
        .filter(F.col("Quantity") > 0)
        .filter(F.col("UnitPrice") > 0)
        .filter(~F.col("InvoiceNo").startswith("C"))
        .withColumn(
            "InvoiceTimestamp",
            F.expr("try_to_timestamp(InvoiceDate, 'M/d/yyyy H:mm')"),
        )
        .filter(F.col("InvoiceTimestamp").isNotNull())
    )


def star_clean_predicates() -> list[Column]:
    """The same P1-P4 pipeline transplanted onto the driver star schema
    (orders/lineitem).  The testdata is clean, so these are no-op row-wise,
    but they exercise the operators and keep the scan-adjacent-filter shape
    the 100 TB plan needs (all of them push down to parquet)."""
    return [
        F.col("o_custkey").isNotNull(),  # P1 (q2_ecommerce_analysis.py:51)
        F.col("l_quantity") > 0,  # P2 (q2_ecommerce_analysis.py:52)
        F.col("l_extendedprice") > 0,  # P2 (q2_ecommerce_analysis.py:53)
        ~F.col("o_orderstatus").startswith("C"),  # P3 (q2_ecommerce_analysis.py:54)
        F.col("o_orderdate").isNotNull(),  # P4 (q2_ecommerce_analysis.py:61)
    ]


STAR_CLEAN_SQL = (
    "o.o_custkey IS NOT NULL AND l.l_quantity > 0 AND l.l_extendedprice > 0 "
    "AND o.o_orderstatus NOT LIKE 'C%' AND o.o_orderdate IS NOT NULL"
)
