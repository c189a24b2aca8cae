"""CI wiring for the degenerate-input probe (scripts/degenerate_probe.py).

The probe found real crashes twice (round-10: priority_sample ANSI
DIVIDE_BY_ZERO, multimodal NaN→int Arrow kill; round-11: the cosine/ANN
tier's zero/NULL-norm loud failure) — but until this test it lived
outside every green path, so the per-row-degradation property could
silently rot.  This runs the probe's ``--quick`` selection (only the
builders whose oracle reads the corrupted table) for ALL FOUR suites
inside the shared test session: documents + embeddings since round 11's
first wiring, events + tpch added once their round-11 harsh variants
were adjudicated (4 documented expected failures for events, zero for
tpch — pre-delivering the round-12 plan's candidate (b)).

Two properties per suite: no builder crashes UNEXPECTEDLY, and every
documented expected failure STILL fires — a stale expectation would
green-wash the crash class it documents once its remediation lands
(the round-12 try_cast fixes must delete their names from
EXPECTED_EVENTS_FAILURES to stay green).

Full four-suite probe over the whole catalog:
``python scripts/degenerate_probe.py``.
"""
from __future__ import annotations

import importlib.util
import pathlib

import pytest

_PROBE = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "degenerate_probe.py"
_spec = importlib.util.spec_from_file_location("degenerate_probe", _PROBE)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


# Per-suite selection floors, set just under the round-15 counts
# (documents 90 / embeddings 23 / events 42 / tpch 46 after the three
# round-15 registrations — all documents-suite — and the round-14
# bonus_categorize_expr retirement): a shrinking pick means the
# relevance filter broke or a tier silently lost its oracle-table read,
# either of which would green-wash the probe.  Raise these as the
# catalog grows.
_SUITE_FLOORS = {"documents": 83, "embeddings": 20, "events": 38, "tpch": 42}


@pytest.mark.parametrize("suite", ["documents", "embeddings", "events", "tpch"])
def test_degenerate_inputs_degrade_per_row(spark, suite):
    """No builder crashes on corrupted tables, and no expectation is stale."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    catalog = probe.relevant_specs(CATALOG, suite)
    floor = _SUITE_FLOORS[suite]
    assert len(catalog) >= floor, (
        f"--quick selected only {len(catalog)} builders for {suite} "
        f"(floor {floor})"
    )
    fails, stale = probe.run_suite(spark, suite, catalog)
    assert not fails, f"{suite}: unexpected degenerate-input failures: {fails}"
    assert not stale, (
        f"{suite}: expected failures that no longer fire — remove from "
        f"EXPECTED_FAILURES or the probe green-washes them: {stale}"
    )


# ---------------------------------------------------------------------------
# Cross-engine degenerate twins for the try_cast remediation
# ---------------------------------------------------------------------------
# The probe proves the SPARK side degrades per-row; these twins prove the
# DuckDB oracle SQL agrees with the builder ON the degenerate rows both
# engines can ingest — NaN / ±Inf values, NULL value/props, nested-object
# and non-integer $.k, far-future (2199) and pre-epoch (1960) timestamps.
# Malformed JSON stays probe-only: DuckDB's json functions RAISE on it
# (InvalidInputException), so oracle parity there is out of contract —
# the driver's tables carry valid JSON, and the Spark-side NULL degrade
# is what the probe pins.  Two engine asymmetries the oracles guard:
# DuckDB sign(NaN) is 0 while Spark signum(NaN) is NaN, and Spark's
# floor() maps NaN to 0L while DuckDB's keeps NaN — both isnan-guarded
# to a shared NaN -> NULL (plans/catalog.py).

_TWIN_ROWS = [
    (1, "2024-03-01 12:00:00", 1, "click", "10.0", '{"k": 1}'),
    (2, "2024-03-01 12:01:00", 1, "view", "-3.5", '{"k": 42}'),
    (3, "2024-03-01 12:02:00", 2, "error", "0.0", '{"k": -7}'),
    (4, "2024-03-01 12:03:00", 2, "purchase", "99.9", "{}"),
    (5, "2024-03-01 12:04:00", 3, "click", None, None),
    (6, "2024-03-01 12:05:00", 3, "view", "nan",
     '{"k": {"deep": [1,2,{"x": null}]}}'),
    (7, "2024-03-01 12:06:00", 4, "error", "inf", '{"k": 2}'),
    (8, "2024-03-01 12:07:00", 4, "click", "-inf", '{"k": 3}'),
    (9, "2199-12-31 23:59:59", 5, "view", "1.0", '{"k": 4}'),
    (10, "1960-01-01 00:00:00", 5, "purchase", "-2.0", '{"k": "str"}'),
    (11, "2024-03-01 12:08:00", 6, "click", "25.0", '{"k": "5"}'),
    (12, "2024-03-01 12:09:00", 6, "view", "-25.0", '{"k": 1.7}'),
    (13, "2024-03-01 12:10:00", 7, "error", "1e18", '{"k": 99}'),
]


def _twin_spark_frame(spark):
    import datetime as dt

    rows = [
        (
            eid,
            dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"),
            uid,
            etype,
            float(val) if val is not None else None,
            props,
        )
        for eid, ts, uid, etype, val, props in _TWIN_ROWS
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _twin_duck_connection():
    """Register the SAME rows as a DuckDB ``events`` view — via SQL
    literals, NOT a pandas frame: DuckDB's pandas scan reads a float64
    NaN as NULL, which would silently drop the very rows under test."""
    import duckdb

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, int):
            return str(v)
        return "'" + v.replace("'", "''") + "'"

    values = ",\n".join(
        f"({lit(eid)}, TIMESTAMP {lit(ts)}, {lit(uid)}, {lit(etype)}, "
        f"{'NULL' if val is None else lit(val) + '::DOUBLE'}, {lit(props)})"
        for eid, ts, uid, etype, val, props in _TWIN_ROWS
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM (VALUES\n{values}\n) AS "
        "t(event_id, ts, user_id, event_type, value, props)"
    )
    return con


def _twin_canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name",
    [
        "events_scalar_features",
        "events_props_avg_k",
        "events_props_map_stats",
        "events_value_histogram",
    ],
)
def test_try_cast_degenerate_cross_engine(spark, name):
    import numpy as np
    import pandas as pd

    from hadoop_pyspark_streaming_analytics_spark.operators import timeseries
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    spec = next(s for s in CATALOG if s.name == name)
    frame = _twin_spark_frame(spark)
    orig = timeseries.load_events
    try:
        timeseries.load_events = lambda sp, d: frame  # noqa: ARG005
        got = _twin_canon(spec.builder(spark, "ignored").toPandas())
    finally:
        timeseries.load_events = orig
    con = _twin_duck_connection()
    try:
        want = _twin_canon(con.execute(spec.oracle).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g, w = g.astype(float), w.astype(float)
            # isclose(equal_nan) matches NaN==NaN and Inf==Inf — the
            # same spelling tests/oracle.py adopted after its original
            # fillna-subtraction compare failed on Inf - Inf = NaN.
            assert (
                (g.isna() == w.isna()).all()
                and np.isclose(
                    g.fillna(0.0), w.fillna(0.0), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                ).all()
            ), f"{name}.{c}:\n{pd.DataFrame({'spark': g, 'duckdb': w})}"
        else:
            assert g.astype(object).where(pd.notna(g), None).equals(
                w.astype(object).where(pd.notna(w), None)
            ), f"{name}.{c}:\n{pd.DataFrame({'spark': g, 'duckdb': w})}"
