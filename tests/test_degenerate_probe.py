"""CI wiring for the degenerate-input probe (scripts/degenerate_probe.py).

The probe found real crashes twice (round-10: priority_sample ANSI
DIVIDE_BY_ZERO, multimodal NaN→int Arrow kill; round-11: the cosine/ANN
tier's zero/NULL-norm loud failure) — but until this test it lived
outside every green path, so the per-row-degradation property could
silently rot.  This runs the probe's ``--quick`` selection (only the
builders whose oracle reads the corrupted table) for the two suites
whose crash classes have actually fired, inside the shared test session.

Full four-suite probe: ``python scripts/degenerate_probe.py``.
"""
from __future__ import annotations

import importlib.util
import pathlib

import pytest

_PROBE = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "degenerate_probe.py"
_spec = importlib.util.spec_from_file_location("degenerate_probe", _PROBE)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


@pytest.mark.parametrize("suite", ["documents", "embeddings"])
def test_degenerate_inputs_degrade_per_row(spark, suite):
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    catalog = probe.relevant_specs(CATALOG, suite)
    # Selection sanity: an empty pick means the relevance filter broke,
    # which would green-wash the probe.
    assert len(catalog) >= 10, f"--quick selected only {len(catalog)} builders"
    fails = probe.run_suite(spark, suite, catalog)
    assert not fails, f"{suite}: unexpected degenerate-input failures: {fails}"
