#!/usr/bin/env python3
"""Regenerate tests/golden/* from the pinned fixtures — run ONLY when the
fixture or intended semantics change, then review the diff like code.
The committed goldens are asserted byte-for-byte by tests/test_golden.py."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_pyspark_streaming_analytics_spark.operators.reference_golden import (
    q2a_reference_summary,
    q2b_reference_window,
)
from hadoop_pyspark_streaming_analytics_spark.operators.text import format_q1_report
from hadoop_pyspark_streaming_analytics_spark.session import get_spark
from hadoop_pyspark_streaming_analytics_spark.sources.readers import read_retail_csv
from tests.golden_fixtures import (
    df_to_csv_text,
    materialize_documents_dir,
    materialize_retail_csv,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app_name="regen-golden", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        csv_path = os.path.join(tmp, "retail.csv")
        materialize_retail_csv(csv_path)
        raw = read_retail_csv(spark, csv_path)
        q2a = df_to_csv_text(q2a_reference_summary(raw), ["CustomerID"])
        q2b = df_to_csv_text(
            q2b_reference_window(raw), ["CustomerID", "InvoiceTimestamp", "InvoiceNo"]
        )
        docs_dir = materialize_documents_dir(spark, os.path.join(tmp, "corpus"))
        q1 = format_q1_report(spark, docs_dir) + "\n"
    for name, content in [
        ("q2a_customer_summary.csv", q2a),
        ("q2b_customer_orders_window.csv", q2b),
        ("q1_report.txt", q1),
    ]:
        with open(os.path.join(GOLDEN_DIR, name), "w") as f:
            f.write(content)
        print(f"wrote {name} ({len(content)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
