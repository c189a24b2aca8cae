"""Tokenizer health: per-source fertility and compression of the trained
BPE tokenizer — the standard tokenizer-fairness audit (multilingual/
multi-domain tokenizer papers report "fertility", subwords per word, per
language; a source whose words fragment into many subwords pays more
compute per character and gets under-represented at a fixed token
budget).  The per-DOC numbers already exist (corpus.bpe_token_counts);
this is the per-SOURCE calibration face an operator reads before
adopting a token budget or mixture weight.

Spark-first shape: one LEFT join from the documents table onto the
per-doc token-count frame (the boilerplate_loss / quality_model_report
visibility convention — sources full of untokenizable docs surface as a
``docs_tokenized < n_docs`` gap, never silently vanish) and ONE
map-side-combinable per-source aggregate.  Everything corpus-sized is
inside bpe_token_counts, whose plan is already pinned (dictionary-sized
segmentation join, AQE-broadcast); this report adds a single source-
grained shuffle on top, plus a second documents scan for the source
attach (self-contained-entry convention) that is column-pruned to
(doc_id, source, length(text)) — trivial beside the tokenizer's own
text scans.

Degrade-per-row: NULL/untokenizable docs carry NULL word counts through
the LEFT join; a source with zero tokenizable docs reports NULL
fertility / chars_per_token (0/0 -> NULL, never a crash), with its
``n_docs`` still visible.

Built round 13 as a zero-churn module (the length_policy /
segment_dedup pattern); REGISTERED round 15 as
``tokenizer_fertility_report`` into the measured window (sf0.1 cost
2.63 s warm, on record in SCALE.md before the QuerySpec landed).  The
oracle is a TEMPLATE (:func:`oracle_fertility_report`) that
llm_catalog.py instantiates with the catalog's proven
corpus_bpe_token_counts oracle — the house convention for composed
entries, kept single-source-of-truth by taking the nested SQL as an
argument instead of duplicating it here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .corpus import BPE_MERGES, bpe_token_counts


def fertility_of(docs: DataFrame, counts: DataFrame) -> DataFrame:
    """The report over explicit frames: ``docs`` is (doc_id, source,
    text …), ``counts`` a per-doc token-count frame in the
    corpus.bpe_token_counts shape (doc_id, n_words, n_bpe_tokens …)."""
    j = docs.select(
        "doc_id", "source", F.length("text").alias("chars")
    ).join(counts.select("doc_id", "n_words", "n_bpe_tokens"), "doc_id", "left")
    tokenized_chars = F.sum(
        F.when(F.col("n_words").isNotNull(), F.col("chars"))
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_words").alias("docs_tokenized"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.sum("n_bpe_tokens") / F.sum("n_words") + F.lit(1e-8), 4
        ).alias("fertility"),
        F.round(
            tokenized_chars / F.sum("n_bpe_tokens") + F.lit(1e-8), 4
        ).alias("chars_per_token"),
    )


def tokenizer_fertility_report(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Catalog-ready builder: per-source tokenizer report over the real
    documents table — total docs, docs the tokenizer could segment,
    word/token mass, ``fertility`` (BPE tokens per word — the headline
    fairness number) and ``chars_per_token`` (compression of the
    tokenized documents' character mass)."""
    return fertility_of(
        load_table(spark, sf_dir, "documents"),
        bpe_token_counts(spark, sf_dir, n_merges),
    )


def oracle_fertility_report(token_counts_sql: str) -> str:
    """DuckDB oracle TEMPLATE: nest the proven corpus_bpe_token_counts
    oracle verbatim (``token_counts_sql``) and roll it up per source with
    the same LEFT-join visibility and NULL discipline as the builder."""
    return f"""
WITH tc AS ({token_counts_sql}),
j AS (
  SELECT d.source, length(d.text) AS chars, tc.n_words, tc.n_bpe_tokens
  FROM documents d LEFT JOIN tc ON d.doc_id = tc.doc_id
)
SELECT source,
       count(*) AS n_docs,
       count(n_words) AS docs_tokenized,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       round(sum(n_bpe_tokens)::DOUBLE / sum(n_words) + 1e-8, 4)
         AS fertility,
       round(sum(CASE WHEN n_words IS NOT NULL THEN chars END)::DOUBLE
               / sum(n_bpe_tokens) + 1e-8, 4)
         AS chars_per_token
FROM j GROUP BY 1"""
