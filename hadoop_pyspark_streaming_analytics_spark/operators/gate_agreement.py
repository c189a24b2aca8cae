"""Quality-gate agreement audit: where do the HEURISTIC quality gate
(quality.quality_classifier — the expression-only "looks like reference
text" logistic over extracted features) and the TRAINED gate
(model_filter.quality_model_scores — hashed-unigram LR trained on
reference-vs-crawl) disagree?  Running a new gate in shadow against the
incumbent and reading the per-source disagreement split IS the standard
adoption step for a classifier filter (a gate that disagrees with the
incumbent on 40% of one source needs a human look before it starts
dropping data); neither gate's own calibration report answers it.

Spark-first shape: both gates run as the already-pinned entries they
are, then ONE LEFT join each from the documents table (the
quality_model_report visibility convention — docs either gate could not
score stay visible, never silently shrink the denominator) and one
source-grained aggregate.  Nothing here adds corpus-sized work beyond
the two gates themselves.

Degrade-per-row: a doc unscored by either gate has NULL keep on that
side and is excluded from the agreement fraction (which covers
both-scored docs only, reported as ``n_both_scored``); a source where
no doc is both-scored reports NULL agree_frac (0/0 -> NULL).

Built round 13 as a zero-churn module (the length_policy /
segment_dedup pattern); REGISTERED round 15 as
``quality_gate_agreement`` into the measured window, deliberately
OFF-headline (it runs the trained gate's 8-step GD, inheriting the
quality-model pair's ~9 s floor — 10.38 s warm at sf0.1, on record in
SCALE.md before the QuerySpec landed).  The oracle is a TEMPLATE
(:func:`oracle_gate_agreement`) that llm_catalog.py instantiates with
both gates' proven oracles — single source of truth, no SQL duplicated
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .model_filter import LR_RATE, LR_STEPS, LR_TARGET_SOURCES
from .model_filter import quality_model_scores
from .quality import quality_classifier


def agreement_of(
    docs: DataFrame, heur: DataFrame, trained: DataFrame
) -> DataFrame:
    """The report over explicit frames: ``docs`` is (doc_id, source …);
    ``heur`` and ``trained`` are gate outputs carrying (doc_id, keep)."""
    j = (
        docs.select("doc_id", "source")
        .join(heur.select("doc_id", F.col("keep").alias("h_keep")), "doc_id", "left")
        .join(trained.select("doc_id", F.col("keep").alias("t_keep")), "doc_id", "left")
    )
    both = F.col("h_keep").isNotNull() & F.col("t_keep").isNotNull()
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(both.cast("int")).cast("bigint").alias("n_both_scored"),
        F.round(
            F.avg(
                F.when(
                    both,
                    (F.col("h_keep") == F.col("t_keep")).cast("double"),
                )
            )
            + F.lit(1e-8),
            4,
        ).alias("agree_frac"),
        F.sum(
            F.when(both & F.col("h_keep") & ~F.col("t_keep"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("heuristic_only_keeps"),
        F.sum(
            F.when(both & F.col("t_keep") & ~F.col("h_keep"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("trained_only_keeps"),
    )


def quality_gate_agreement(
    spark: SparkSession,
    sf_dir: str,
    targets: tuple[str, ...] = LR_TARGET_SOURCES,
    steps: int = LR_STEPS,
    lr: float = LR_RATE,
) -> DataFrame:
    """Catalog-ready builder: per-source shadow comparison of the
    heuristic and trained quality gates over the real documents table —
    total docs, docs both gates scored, agreement fraction over those,
    and the two disagreement directions (heuristic keeps / trained
    drops, and the reverse)."""
    return agreement_of(
        load_table(spark, sf_dir, "documents"),
        quality_classifier(spark, sf_dir),
        quality_model_scores(spark, sf_dir, targets=targets, steps=steps, lr=lr),
    )


def oracle_gate_agreement(classifier_sql: str, model_scores_sql: str) -> str:
    """DuckDB oracle TEMPLATE: nest the proven text_quality_classifier
    and quality_model_scores oracles verbatim and roll up the per-source
    agreement split with the same LEFT-join visibility and NULL
    discipline as the builder."""
    return f"""
WITH h AS ({classifier_sql}),
m AS ({model_scores_sql}),
j AS (
  SELECT d.source, h.keep AS h_keep, m.keep AS t_keep
  FROM documents d
  LEFT JOIN h ON d.doc_id = h.doc_id
  LEFT JOIN m ON d.doc_id = m.doc_id
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN h_keep IS NOT NULL AND t_keep IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_both_scored,
       round(avg(CASE WHEN h_keep IS NOT NULL AND t_keep IS NOT NULL
                      THEN CASE WHEN h_keep = t_keep THEN 1.0 ELSE 0.0 END
                 END) + 1e-8, 4) AS agree_frac,
       CAST(sum(CASE WHEN h_keep IS NOT NULL AND t_keep IS NOT NULL
                          AND h_keep AND NOT t_keep
                     THEN 1 ELSE 0 END) AS BIGINT) AS heuristic_only_keeps,
       CAST(sum(CASE WHEN h_keep IS NOT NULL AND t_keep IS NOT NULL
                          AND t_keep AND NOT h_keep
                     THEN 1 ELSE 0 END) AS BIGINT) AS trained_only_keeps
FROM j GROUP BY 1"""
