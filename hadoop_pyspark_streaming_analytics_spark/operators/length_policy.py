"""Document length-cap policy — bound per-document work BEFORE the
doc-length-proportional tiers (shingle/MinHash dedup, BPE segmentation,
n-gram fingerprints).

Why this exists (SCALE.md "Degenerate-input behavior", the round-11
giant-doc probe): nothing in the engine crashes on a 250k-char document,
but the composed dedup entries spend ~20-25 s of honest linear token work
on ONE such doc — and a single 100 MB crawl artifact would own one task
for hours at 100 TB, skewing its whole stage.  A cap is the standard
curation answer (crawl corpora cap documents at ingest), but it must be
(a) an explicit, opt-in knob — silently truncating training text is a
data bug, not a default — and (b) paired with a measurement face so the
loss is a number, not a guess (same philosophy as the BPE tier's
``truncation_report``, which prices context-length truncation the same
way).

Beyond-reference operator (the reference's corpus is coursework-sized;
SURVEY.md §2 has no length policy): pytest-gated this round, catalog
entry + DuckDB oracle scheduled with round 12's free window slots
(plans/__init__.py ROUND-12 note).

``cap_text`` is a single codegen projection — no Exchange is added to
any pipeline that composes it (pinned by
tests/test_length_policy.py::test_cap_text_adds_no_exchange).
``truncation_loss_report`` is one map-side-combinable hash aggregate,
i.e. a single small shuffle of per-source partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.readers import load_table


def cap_text(
    df: DataFrame,
    text_col: str = "text",
    cap_chars: int = 50_000,
    out_col: str | None = None,
    flag_col: str = "was_truncated",
) -> DataFrame:
    """Cap ``text_col`` at ``cap_chars`` characters, flagging affected rows.

    - ``out_col`` defaults to overwriting ``text_col`` (drop-in upstream of
      shingle/BPE stages); pass a different name to keep the original.
    - NULL/empty text passes through untouched with ``flag_col = false``
      (degrade-per-row discipline: a corrupt row must never change shape).
    - ``substring`` counts CHARACTERS, not bytes — a CJK/emoji doc caps at
      the same character budget as ASCII (consistent with ``n_chars``).
    """
    if cap_chars <= 0:
        raise ValueError(f"cap_chars must be positive, got {cap_chars}")
    out_col = out_col or text_col
    flag = F.coalesce(F.length(text_col) > cap_chars, F.lit(False))
    return df.withColumn(flag_col, flag).withColumn(
        out_col,
        F.when(F.col(flag_col), F.substring(F.col(text_col), 1, cap_chars))
        .otherwise(F.col(text_col)),
    )


def truncation_loss_report(
    df: DataFrame,
    text_col: str = "text",
    cap_chars: int = 50_000,
    source_col: str = "source",
) -> DataFrame:
    """Per-source loss a ``cap_text(cap_chars)`` pass would incur — run this
    BEFORE adopting a cap value: docs affected, characters dropped, and the
    dropped fraction of the source's total characters.

    One map-side-combinable aggregate over a projection (conditional sums,
    no second pass over the capped frame needed — the loss is computable
    from lengths alone).
    """
    n = F.length(text_col)
    dropped = F.when(n > cap_chars, n - cap_chars).otherwise(F.lit(0))
    return (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum((n > cap_chars).cast("long")), F.lit(0)).alias(
                "docs_truncated"
            ),
            F.coalesce(F.sum(dropped), F.lit(0)).alias("chars_dropped"),
            F.coalesce(F.sum(n), F.lit(0)).alias("chars_total"),
        )
        .withColumn(
            "dropped_frac",
            F.round(
                F.col("chars_dropped")
                / F.nullif(F.col("chars_total"), F.lit(0))
                + F.lit(1e-12),
                6,
            ),
        )
    )


# ---------------------------------------------------------------------------
# Catalog-ready builders (round-12 registration; pytest-gated until then)
# ---------------------------------------------------------------------------
# (spark, sf_dir) signatures + the load_table seam so the degenerate probe's
# documents suite covers them the moment their QuerySpecs land.  Their
# DuckDB oracles live beside them (ORACLE_* below) — already diffed against
# the builders at sf0.001 by tests/test_length_policy.py, so round 12's
# registration is QuerySpec boilerplate, not new verification work.
# CAP_CHARS=300 sits near the median document length at every SF
# (sf0.001/0.01/0.1 medians are ~295-312), so roughly half the corpus
# truncates — a non-trivial diff at the driver's sf0.01 gate.

CAP_CHARS = 300


def cap_documents(spark, sf_dir: str, cap_chars: int = CAP_CHARS) -> DataFrame:
    """``cap_text`` over the documents table — full capped-content output
    (doc_id, was_truncated, text), so the oracle diff hashes the actual
    truncated text, not just lengths."""
    docs = load_table(spark, sf_dir, "documents")
    return cap_text(docs, cap_chars=cap_chars).select(
        "doc_id", "was_truncated", "text"
    )


def documents_truncation_loss(
    spark, sf_dir: str, cap_chars: int = CAP_CHARS
) -> DataFrame:
    """``truncation_loss_report`` over the documents table at the same cap."""
    docs = load_table(spark, sf_dir, "documents")
    return truncation_loss_report(docs, cap_chars=cap_chars)


ORACLE_CAP_DOCUMENTS = f"""
SELECT doc_id,
       coalesce(length(text) > {CAP_CHARS}, FALSE) AS was_truncated,
       CASE WHEN length(text) > {CAP_CHARS}
            THEN substr(text, 1, {CAP_CHARS}) ELSE text END AS text
FROM documents"""

ORACLE_TRUNCATION_LOSS = f"""
WITH l AS (SELECT source, length(text) AS n FROM documents)
SELECT source,
       count(*) AS n_docs,
       CAST(coalesce(sum(CASE WHEN n > {CAP_CHARS} THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS docs_truncated,
       CAST(coalesce(sum(CASE WHEN n > {CAP_CHARS} THEN n - {CAP_CHARS}
                         ELSE 0 END), 0) AS BIGINT) AS chars_dropped,
       CAST(coalesce(sum(n), 0) AS BIGINT) AS chars_total,
       round(CAST(coalesce(sum(CASE WHEN n > {CAP_CHARS} THEN n - {CAP_CHARS}
                                ELSE 0 END), 0) AS DOUBLE)
             / nullif(CAST(coalesce(sum(n), 0) AS DOUBLE), 0)
             + 1e-12, 6) AS dropped_frac
FROM l GROUP BY 1"""
