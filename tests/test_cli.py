"""CLI surface: catalog listing and argument validation (the `run` path
spins up and stops its own SparkSession, so it is exercised manually /
by the driver, not inside the shared-session suite)."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.__main__ import main


def test_list_prints_catalog(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q2a_customer_summary" in out
    assert "temporal_asof_last_click" in out
    assert "dedup_minhash_lsh" in out


def test_unknown_query_is_an_error(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
