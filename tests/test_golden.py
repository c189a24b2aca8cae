"""Byte-for-byte golden tests: the committed artifacts in tests/golden/ are
the engine's Q1 report and Q2a/Q2b CSVs over the PINNED reference-shaped
fixtures (tests/golden_fixtures.py — pure md5-derived, no RNG).

The reference's own input datasets (Online Retail CSV, plato.txt) are not
in its checkout (reference README.md:45, q1_output.txt), so value replay of
ITS artifacts is impossible; these goldens freeze OUR pipeline's output on
a fixture exercising the same dirty-data and tie semantics, so any drift in
cleaning/agg/window/report behavior breaks the bytes.  Regenerate
deliberately with scripts/regen_golden.py and review the diff."""

from __future__ import annotations

import os

import pytest

from hadoop_pyspark_streaming_analytics_spark.operators.reference_golden import (
    q2a_reference_summary,
    q2b_reference_window,
)
from hadoop_pyspark_streaming_analytics_spark.operators.text import format_q1_report
from hadoop_pyspark_streaming_analytics_spark.sources.readers import read_retail_csv

from .golden_fixtures import (
    df_to_csv_text,
    materialize_documents_dir,
    materialize_retail_csv,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()


@pytest.fixture(scope="module")
def retail_raw(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("golden") / "retail.csv")
    materialize_retail_csv(p)
    return read_retail_csv(spark, p)


def test_q2a_summary_matches_golden_bytes(spark, retail_raw):
    got = df_to_csv_text(q2a_reference_summary(retail_raw), ["CustomerID"])
    assert got == _golden("q2a_customer_summary.csv")


def test_q2b_window_matches_golden_bytes(spark, retail_raw):
    got = df_to_csv_text(
        q2b_reference_window(retail_raw), ["CustomerID", "InvoiceTimestamp", "InvoiceNo"]
    )
    assert got == _golden("q2b_customer_orders_window.csv")


def test_q1_report_matches_golden_bytes(spark, tmp_path_factory):
    docs_dir = materialize_documents_dir(
        spark, str(tmp_path_factory.mktemp("golden") / "corpus")
    )
    assert format_q1_report(spark, docs_dir) + "\n" == _golden("q1_report.txt")


def test_golden_fixture_semantics_are_planted():
    """The goldens must keep encoding the reference's tie semantics: rank
    ties share an order number and leave a gap (12090: 1,1,3), and the
    product-frequency tie resolves by spend (12091 → 84021)."""
    q2b = _golden("q2b_customer_orders_window.csv")
    ranks_12090 = [
        line.split(",")[6] for line in q2b.splitlines() if line.startswith("12090,")
    ]
    assert sorted(ranks_12090) == ["1", "1", "3"]
    q2a = _golden("q2a_customer_summary.csv")
    row_12091 = next(l for l in q2a.splitlines() if l.startswith("12091,"))
    assert row_12091.endswith(",84021")
