"""End-to-end data-prep pipeline test: dedup + quality gating compose, the
near-dup victims actually disappear, the parquet lake is partitioned."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark import pipelines
from hadoop_pyspark_streaming_analytics_spark.operators import dedup

SF = "/root/testdata/sf0.01"


def test_pipeline_removes_neardup_victims(spark):
    prepared = pipelines.prepare_documents(spark, SF, min_quality=0.0)
    kept = {r["doc_id"] for r in prepared.select("doc_id").collect()}
    pairs = dedup.ngram_jaccard_pairs(spark, SF, threshold=0.5).collect()
    assert pairs
    for p in pairs:
        assert p["doc_b"] not in kept  # victim gone
    # at least one canonical side survives unless it lost another pair
    victims = {p["doc_b"] for p in pairs}
    assert any(p["doc_a"] in kept for p in pairs if p["doc_a"] not in victims)


def test_pipeline_quality_gate(spark):
    loose = pipelines.prepare_documents(spark, SF, min_quality=0.0).count()
    tight = pipelines.prepare_documents(spark, SF, min_quality=0.9).count()
    assert tight <= loose


def test_pipeline_write_partitioned(spark, tmp_path):
    out = str(tmp_path / "lake")
    pipelines.prepare_and_write(spark, SF, out, min_quality=0.0)
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert "source" in back.columns  # partition column round-trips


def test_yield_report_monotone(spark):
    rows = {r["stage"]: r["docs"] for r in pipelines.pipeline_yield_report(spark, SF).collect()}
    assert rows["ingested"] >= rows["after_exact_dedup"] >= rows["after_neardup_and_quality"]
    assert rows["after_neardup_and_quality"] > 0
