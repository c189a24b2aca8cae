"""End-to-end training-data preparation pipeline: the composition that
makes the individual operators a usable 100 TB data-prep engine.

    documents → exact dedup → near-dup removal (MinHash-LSH candidates →
    Jaccard verify) → quality filter → per-doc features → partitioned
    parquet

Every stage is one of the catalog operators; this module only wires them.
Batch and streaming variants share the per-document feature logic (the
same plan compiles both ways — Structured Streaming's core contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, quality
from .sources.readers import load_table
from .sources.sinks import write_parquet


def prepare_documents(
    spark: SparkSession,
    sf_dir: str,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.3,
) -> DataFrame:
    """The batch pipeline.  Returns the surviving documents with their
    quality features; every pruning decision is recorded in a status column
    so the yield at each stage is auditable (the first question asked of
    any 100 TB data-prep run is "where did my tokens go").
    """
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: keep the canonical (min doc_id) copy per fingerprint.
    fp = docs.select(
        "doc_id", F.md5(dedup.normalized_text(F.col("text"))).alias("fingerprint")
    )
    canonical = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    survivors = docs.join(canonical.select("doc_id"), "doc_id", "left_semi")

    # 2. near-dup removal: exact Jaccard verify → connected components over
    #    the verified pairs → keep the per-cluster minimum doc_id (the same
    #    canonical policy as dedup.keep_canonical).  A naive "drop doc_b of
    #    every pair" over-deletes on chains: in A~B~C it removes both B and
    #    C even though C's only above-threshold neighbor was B, which was
    #    itself removed.
    verified = dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=jaccard_threshold)
    clusters = dedup.connected_components(verified)
    victims = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    survivors = survivors.join(victims, "doc_id", "left_anti")

    # 3. quality gate + features.
    feats = quality.quality_scores(spark, sf_dir)
    out = survivors.join(feats, "doc_id", "inner").filter(
        F.col("quality_score") >= min_quality
    )
    return out.select(
        "doc_id",
        "lang",
        "source",
        "text",
        "word_count",
        "avg_word_len",
        "stopword_ratio",
        "alpha_ratio",
        "quality_score",
    )


def prepare_and_write(
    spark: SparkSession, sf_dir: str, out_path: str, **kwargs
) -> None:
    """Pipeline + partitioned parquet sink (partition by source: the
    pruning key downstream sampling reads by)."""
    write_parquet(prepare_documents(spark, sf_dir, **kwargs), out_path, ["source"])


def pipeline_yield_report(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
    """Stage-by-stage yield accounting — one row per pipeline stage with
    surviving doc count (the A12-style cardinality reporting the reference
    prints ad hoc, as a queryable DataFrame)."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    fp = docs.select(
        "doc_id", F.md5(dedup.normalized_text(F.col("text"))).alias("fingerprint")
    )
    after_exact = fp.select("fingerprint").distinct().count()
    prepared = prepare_documents(spark, sf_dir, **kwargs)
    after_all = prepared.count()
    rows = [
        ("ingested", total),
        ("after_exact_dedup", after_exact),
        ("after_neardup_and_quality", after_all),
    ]
    return spark.createDataFrame(rows, "stage string, docs bigint")


#: Training docs whose (4dp-rounded) benchmark-trigram overlap exceeds this
#: are dropped by :func:`curate_documents_modern`.  Calibrated to the
#: synthetic corpus (p90 ≈ 0.028, max ≈ 0.11): survivors dominate, the
#: gate is exercised.
CONTAMINATION_MAX = 0.05


def curate_documents_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 curation composition — the "modern" counterpart of
    :func:`prepare_documents` (which is the heuristic/near-dup pipeline):

        documents → exact-dedup canonical → MODEL quality gate
                  → benchmark decontamination

    i.e. the C4→CCNet→LLaMA progression: hash dedup first (cheapest),
    then the learned classifier gate, then drop both eval members and any
    training doc overlapping the eval set above CONTAMINATION_MAX.  Every
    stage is an existing driver-gated operator; this wires them under one
    result (and one composed oracle), so a stage/pipeline divergence is a
    hash mismatch in either place.

    Plan shape at 100 TB: three corpus-grain scans (fingerprint groupBy,
    feature projection, gram explode) joined back on doc_id — each stage's
    own scale notes apply unchanged; the joins are doc-grain (left_semi /
    inner on the id), never content-grain.  Short (<3-token) docs have no
    trigrams → contamination 0 → kept, made explicit with the left join +
    coalesce.
    """
    from .operators import scrubbing

    docs = load_table(spark, sf_dir, "documents")
    canonical = (
        docs.select(
            "doc_id",
            F.md5(dedup.normalized_text(F.col("text"))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    gate = quality.quality_classifier(spark, sf_dir).filter(F.col("keep"))
    contamination = scrubbing.contamination_check(spark, sf_dir).select(
        "doc_id", "contamination_frac"
    )
    return (
        docs.select("doc_id", "source")
        .filter(F.col("doc_id") % scrubbing.BENCHMARK_MOD != 0)
        .join(canonical, "doc_id", "left_semi")
        .join(gate.select("doc_id", "model_score"), "doc_id")
        .join(contamination, "doc_id", "left")
        .withColumn(
            "contamination_frac",
            F.coalesce(F.col("contamination_frac"), F.lit(0.0)),
        )
        .filter(F.col("contamination_frac") <= CONTAMINATION_MAX)
    )
