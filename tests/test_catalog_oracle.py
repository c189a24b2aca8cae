"""Differential tests: every catalog query with an oracle must match DuckDB
on sf0.001 — a faster local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

from .oracle import compare

SPECS = [s for s in CATALOG if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, sf_dir):
    compare(spec, spark, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names
