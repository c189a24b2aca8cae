"""Document chunking and sequence packing — the two transforms between a
cleaned corpus and a training loader (beyond the reference surface; part of
the LLM-pipeline extension alongside dedup/similarity/quality).

* :func:`chunk_documents` — fixed-size token windows with overlap (the
  RAG / long-doc-training split).  Pure codegen: tokenize once, generate
  window starts with ``sequence``, ``slice`` each window out, explode.
  No shuffle at all — chunking is embarrassingly parallel per document.
* :func:`pack_documents` — GPT-style sequence packing: per shard,
  concatenate documents in doc_id order and cut the token stream into
  fixed-capacity blocks; a document may span blocks.  One window cumsum
  per shard.  The UNSHARDED version of this is the classic scale trap (a
  single global running sum serializes the corpus through one partition),
  so the shard key is part of the operator's contract: packing is exact
  within a shard, shards are independent — exactly how a distributed
  pretraining tokenizer shards its output files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish pre-tokenizer (quality.py)

#: Packing defaults, shared with the catalog oracles' literals so engine
#: default and oracle cannot silently diverge (ADVICE r5).
PACK_CAPACITY = 512
PACK_SHARDS = 32


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Overlapping token windows per document: starts at 0, step
    ``chunk_tokens - overlap``; the final window may be short.  Empty
    docs produce no chunks.

    Start generation is capped at ``n - overlap - 1`` (not ``n - 1``) so a
    chunk is only emitted when it contributes tokens beyond the previous
    chunk's overlap — otherwise, whenever ``(n - 1) % step`` lands inside
    the overlap region, the final window is a pure duplicate of the tail of
    the previous one (``chunk_len <= overlap``) and a RAG/training consumer
    would ingest the same content twice."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
            ).alias("t"),
        )
        .withColumn("n", F.size("t"))
        .filter(F.col("n") > 0)
    )
    starts = toks.select(
        "doc_id",
        "t",
        "n",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n") - overlap - 1, F.lit(0)),
                F.lit(step),
            )
        ).alias("chunk_id", "start"),
    )
    chunk = F.expr(f"slice(t, start + 1, {chunk_tokens})")
    return starts.select(
        "doc_id",
        "chunk_id",
        "start",
        F.size(chunk).alias("chunk_len"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def pack_documents(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Map each document onto the packed token stream of its shard:
    ``offset`` = tokens before it (doc_id order within the shard),
    ``start_block``/``end_block`` = the capacity-sized blocks its first and
    last token land in.  Blocks are what a loader reads; end > start means
    the doc crosses a block boundary (standard in GPT-style packing).

    Shard = ``doc_id % n_shards`` keeps every window partition-local; the
    cumsum window is ordered by doc_id so re-runs are bit-stable.

    ``counts`` (doc_id, n_tokens) overrides the default regex
    pre-tokenizer pricing — pass the TRAINED tokenizer's true subword
    counts (:func:`pack_documents_bpe`) so block layout matches what the
    loader actually emits; the regex default misprices documents whose
    words fragment into many subwords.  ``counts`` also defines the
    PACKED SET: a document absent from it is not packed (correct for
    wordless docs, which the n_tokens>0 filter drops anyway; a stale
    counts table silently omits docs, so regenerate counts with the
    corpus).
    """
    if counts is None:
        counts = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("n_tokens"),
        )
    counts = counts.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        "n_tokens",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counts.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("offset"),
            F.floor((F.col("cum") - F.col("n_tokens")) / capacity)
            .cast("int")
            .alias("start_block"),
            F.floor((F.col("cum") - 1) / capacity).cast("int").alias("end_block"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def pack_documents_bpe(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """:func:`pack_documents` priced with TOKENIZER-TRUE counts: the
    trained BPE's per-document subword totals (corpus.bpe_token_counts)
    replace the regex pre-tokenizer estimate, so offsets/blocks are the
    ones the training loader will actually see — regex counts misprice
    fragmenting documents, and packing mispricing is paid in silently
    overfull or underfull blocks.  Re-trains the catalog tokenizer by the
    self-contained-entry convention; production passes stored counts via
    ``pack_documents(counts=...)``."""
    from .corpus import bpe_token_counts

    counts = bpe_token_counts(spark, sf_dir).select(
        "doc_id", F.col("n_bpe_tokens").cast("int").alias("n_tokens")
    )
    return pack_documents(spark, sf_dir, capacity, n_shards, counts=counts)


#: Default training context length for :func:`truncation_report`, shared
#: with the catalog oracle's literal (ADVICE r5 constants discipline).
TRUNCATION_CONTEXT = 512


def truncation_report(
    spark: SparkSession,
    sf_dir: str,
    context_len: int = TRUNCATION_CONTEXT,
) -> DataFrame:
    """Context-length fit report per source, priced with TOKENIZER-TRUE
    counts: how many documents exceed ``context_len`` subwords and how
    many tokens a truncate-at-context loader would DROP — the number that
    decides context length (or chunking policy) before a training run,
    the truncation-side twin of :func:`pack_efficiency_report`'s
    padding-side numbers.  Regex word counts would understate the loss
    exactly where it bites (long docs fragment hardest), so the pricing
    is the trained BPE's per-doc totals.

    Plan: the per-doc token rollup (see corpus.bpe_token_counts) joins the
    doc-grain source column and aggregates to |sources| rows map-side —
    nothing beyond the token-count pass itself at any corpus size.
    Re-trains the catalog tokenizer by the self-contained-entry
    convention; production passes :func:`~..operators.corpus.bpe_artifacts`
    counts through the same rollup.
    """
    from .corpus import bpe_token_counts

    counts = bpe_token_counts(spark, sf_dir).select("doc_id", "n_bpe_tokens")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    lost = F.greatest(F.col("n_bpe_tokens") - context_len, F.lit(0))
    return (
        docs.join(counts, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_tokens"),
            F.sum((F.col("n_bpe_tokens") > context_len).cast("int"))
            .cast("int")
            .alias("n_docs_truncated"),
            F.sum(lost).cast("bigint").alias("tokens_lost"),
        )
        .withColumn(
            "lost_frac",
            F.round(
                F.col("tokens_lost") / F.col("total_tokens") + F.lit(1e-8), 6
            ),
        )
        .orderBy("source")
    )


def chunk_documents_udtf(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Python-UDTF twin of :func:`chunk_documents` — same rows, same
    oracle, produced by a user-defined TABLE function applied with a
    LATERAL join (the Spark 3.5+/4.x UDTF surface; the reference's only
    UDTF-shaped op is the built-in explode, SURVEY.md §2.11).

    This is the API-coverage tier, NOT the hot path: a row-at-a-time
    Python UDTF pays the interpreter per document, where the codegen
    original chunks at scan speed.  Keep the original for production;
    this twin exists so a user porting a UDTF-based pipeline has the
    pattern (and so the plan difference is measurable: see
    tests/test_llm_ops.py parity test)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    import re

    from pyspark.sql.functions import udtf

    step = chunk_tokens - overlap
    pattern = TOKEN_PATTERN

    @udtf(returnType="chunk_id int, start int, chunk_len int, chunk_text string")
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                return
            toks = re.findall(pattern, text.lower())
            n = len(toks)
            if n == 0:
                return
            for chunk_id, start in enumerate(
                range(0, max(n - overlap - 1, 0) + 1, step)
            ):
                window = toks[start : start + chunk_tokens]
                yield chunk_id, start, len(window), " ".join(window)

    spark.udtf.register("chunk_doc_udtf", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__chunk_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.start, c.chunk_len, c.chunk_text "
        "FROM __chunk_udtf_docs d, LATERAL chunk_doc_udtf(d.text) c"
    )


def pack_efficiency_report(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Packing-efficiency report per shard: total tokens, block count,
    padding waste (the tokens the last partial block burns), fill ratio,
    and how many documents straddle a block boundary — the numbers that
    decide capacity/shard tuning before a training run (padding waste is
    paid in GPU-hours; boundary crossings cost attention-mask work).

    Composes :func:`pack_documents`; the rollup adds one
    map-side-combined aggregation to ``n_shards`` rows, so the report is
    free at any corpus size relative to the packing pass itself.
    """
    packed = pack_documents(spark, sf_dir, capacity, n_shards)
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum((F.col("end_block") > F.col("start_block")).cast("int"))
            .cast("int")
            .alias("n_boundary_docs"),
        )
        .withColumn(
            "n_blocks",
            F.ceil(F.col("total_tokens") / F.lit(float(capacity))).cast("int"),
        )
        .withColumn(
            "waste_tokens",
            (F.col("n_blocks").cast("bigint") * capacity - F.col("total_tokens")),
        )
        .withColumn(
            "fill_ratio",
            F.round(
                F.col("total_tokens")
                / (F.col("n_blocks") * F.lit(float(capacity)))
                + F.lit(1e-8),
                4,
            ),
        )
        .orderBy("shard")
    )
