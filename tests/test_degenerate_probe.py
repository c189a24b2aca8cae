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


@pytest.mark.parametrize("suite", ["documents", "embeddings", "events", "tpch"])
def test_degenerate_inputs_degrade_per_row(spark, suite):
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    catalog = probe.relevant_specs(CATALOG, suite)
    # Selection sanity: an empty pick means the relevance filter broke,
    # which would green-wash the probe.
    assert len(catalog) >= 10, f"--quick selected only {len(catalog)} builders"
    fails, stale = probe.run_suite(spark, suite, catalog)
    assert not fails, f"{suite}: unexpected degenerate-input failures: {fails}"
    assert not stale, (
        f"{suite}: expected failures that no longer fire — remove from "
        f"EXPECTED_FAILURES or the probe green-washes them: {stale}"
    )
