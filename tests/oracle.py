"""Differential-test harness: run a catalog query on Spark and its oracle
SQL on DuckDB over the same parquet tables, and compare order-insensitively
— a local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import QuerySpec
from hadoop_pyspark_streaming_analytics_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spec: QuerySpec, spark, sf_dir: str) -> None:
    assert spec.oracle is not None, f"{spec.name} has no oracle"
    got = _canon(spec.builder(spark, sf_dir).toPandas())
    con = duck_connection(sf_dir)
    try:
        want = _canon(con.execute(spec.oracle).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"{spec.name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{spec.name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            import numpy as np

            # isclose, not a fillna-subtraction: Inf - Inf is NaN, so the
            # subtraction spelling would reject two EQUAL infinities.
            # equal_nan is irrelevant after fillna but keeps the intent
            # explicit if the NA handling ever changes.
            ok = (g.isna() == w.isna()).all() and bool(
                np.isclose(
                    g.fillna(0.0), w.fillna(0.0), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                ).all()
            )
        else:
            ok = g.astype(object).where(pd.notna(g), None).equals(
                w.astype(object).where(pd.notna(w), None)
            )
        if not ok:
            diff = (g != w) if g.dtype == w.dtype else pd.Series([True] * len(g))
            raise AssertionError(
                f"{spec.name}: column {c} mismatch\n"
                f"got:\n{got[diff.fillna(True)].head(10)}\n"
                f"want:\n{want[diff.fillna(True)].head(10)}"
            )


def _isclose(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
