"""Corpus-level text statistics for LLM training-data curation: vocabulary
building, TF-IDF term weighting, and Gopher-style repetition signals.

These complement the per-document features in :mod:`.quality` (which are
single-scan, zero-shuffle): the operators here are the corpus-global tier —
token frequencies across ALL documents (vocabulary, IDF) and within-document
repetition ratios, the standard pre-training corpus filters (Rae et al.,
"Scaling Language Models" — the Gopher repetition thresholds; Raffel et al.,
C4).  All JVM-side: explode + two-level aggregation, no Python in the path.

Scale notes (100 TB corpus):
* The exploded token table is ~corpus-token-count rows, but both consumers
  aggregate it immediately with map-side partial aggregation, so the shuffle
  carries (token, partial-count) pairs — bounded by vocabulary size per
  partition, not corpus size.
* The vocabulary table itself is small (vocab sizes are millions of rows at
  web scale, ~10^6-10^7): the global row_number() window and the IDF join
  both operate on it — the window runs single-partition but over a
  vocab-sized input (documented below), and the join side is broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .text import TOKEN_PATTERN


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) one row per token OCCURRENCE (not distinct)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
        ).alias("token"),
    )


def vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with contiguous frequency-ranked ids — the
    token→id mapping a tokenizer-training or embedding-table step consumes.

    ``token_id`` is row_number() over (freq DESC, token ASC): deterministic
    across runs and engines.  The window is a single global partition BY
    DESIGN — it runs over the already-aggregated vocabulary (one row per
    distinct token), which is vocab-sized (10^6-ish), not corpus-sized; at
    100 TB the heavy lifting is the map-side-combined explode→count below
    it, and a vocab-sized single-partition sort is milliseconds.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = _doc_tokens(docs).groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return vocab.select(
        F.row_number().over(w).cast("int").alias("token_id"),
        "token",
        "freq",
        "doc_freq",
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic relevance /
    keyword-extraction signal over a training corpus.

    tf   = occurrences of token in doc / doc token count
    idf  = ln((N + 1) / (doc_freq + 1)) + 1   (smoothed, sklearn-style)
    Ranked per document by (tfidf DESC, token ASC); rank() keeps score
    ties (like the q2a top-product policy, catalog.py).

    Plan shape: one explode feeding a (doc_id, token) count (map-side
    combined), attach-joins against the doc-grain length table and the
    vocab-grain doc_freq table, and a per-document rank window —
    partitioned by doc_id, so the window state is one document's distinct
    tokens.  No corpus-sized shuffle carries text.

    No broadcast hints on ``doc_len`` (one row per document) or ``df_tbl``
    (one row per vocab term) — both are corpus-proportional at 100 TB and
    a hard-coded hint overrides AQE's size-based fallback, turning a
    graceful shuffle join into an OOM.  Only the 1-row ``n_docs`` scalar
    keeps its hint (provably bounded).

    ``tf`` feeds three consumers (the scored rows, doc_len, doc_freq) and
    Catalyst does not reuse common subplans — without materialization the
    corpus would be scanned and exploded 3×.  ``localCheckpoint`` (the same
    discipline as dedup.connected_components) pins the aggregated
    (doc_id, token, count) table — far smaller than the raw corpus — so the
    100 TB scan happens exactly once.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _doc_tokens(docs)
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tok_count"))
        .localCheckpoint(eager=True)
    )
    doc_len = tf.groupBy("doc_id").agg(F.sum("tok_count").alias("doc_tokens"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tok_count",
            F.round(
                (F.col("tok_count") / F.col("doc_tokens"))
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1))
                    + F.lit(1.0)
                )
                + F.lit(1e-8),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.rank().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "token", "tok_count", "tfidf", F.col("rk").alias("term_rank"))
    )


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals:

    * ``top_token_frac``      — occurrences of the most frequent token /
      total tokens (Gopher filters docs where this exceeds ~0.2 for stop
      words excluded; here raw).
    * ``distinct_token_ratio`` — distinct tokens / total tokens.
    * ``dup_bigram_frac``     — 1 - distinct bigrams / total bigrams
      (Gopher's duplicate-n-gram fraction, n=2).

    One explode into (doc_id, token) + one bigram derivation, each
    immediately aggregated with map-side combine; the final per-document
    join is on doc_id between two doc-count-sized aggregates.  Documents
    with < 2 tokens report ``dup_bigram_frac`` 0.0.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        # Guard the sequence: sequence(0, -1) is DESCENDING in Spark, so
        # docs with < 2 tokens must short-circuit to an empty array.
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN"
            " transform(sequence(0, size(toks) - 2),"
            "           i -> concat(toks[i], ' ', toks[i+1]))"
            " ELSE cast(array() AS array<string>) END"
        ).alias("bigrams"),
    )
    tok_stats = (
        base.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_token_count"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
        )
    )
    bg_stats = (
        base.filter(F.size("bigrams") > 0)
        .select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
    )
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("top_token_count") / F.col("n_tokens") + F.lit(1e-8), 4
            ).alias("top_token_frac"),
            F.round(
                F.col("n_distinct_tokens") / F.col("n_tokens") + F.lit(1e-8), 4
            ).alias("distinct_token_ratio"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
                    F.lit(0.0),
                )
                + F.lit(1e-8),
                4,
            ).alias("dup_bigram_frac"),
        )
    )


def select_corpus_token_budget(
    spark: SparkSession,
    sf_dir: str,
    token_budget: int = 2000,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: keep the
    highest-quality documents, in (quality DESC, doc_id) order, until the
    cumulative token count would exceed ``token_budget`` — the data-mixing
    step that assembles a training corpus from a scored pool.

    ``counts`` (doc_id, n_tokens) overrides the default regex word-count
    pricing with TOKENIZER-TRUE counts (:func:`bpe_token_counts` /
    :func:`bpe_artifacts`) — a budget priced in regex words admits more
    true tokens than it claims whenever words fragment into subwords.
    ``counts`` also defines the ELIGIBLE POOL: a document absent from it
    has no price and cannot be selected (wordless docs are the intended
    case — they carry zero trainable tokens; a caller passing a STALE
    counts table silently shrinks the pool, so regenerate counts with
    the corpus).

    Semantically this is a GLOBAL ordered cumulative sum (the oracle
    spells it that way), but a global ROWS window serializes 100 TB
    through one task.  The plan here is the two-phase equivalent:

    1. decile-bucket documents by quality cutpoints (one scalar
       ``percentile`` aggregate, broadcast — the q2_spend_deciles
       pattern);
    2. per-bucket token totals (10 rows) -> running bucket prefix sums,
       broadcast back;
    3. buckets whose prefix fits entirely are taken whole — no per-row
       ordering cost; ONLY the single boundary bucket runs a cumulative
       window, partitioned by bucket (bounded: ~1/10th of the corpus).

    Global (quality DESC, doc_id) order equals (bucket DESC, within-bucket
    order) because buckets partition disjoint quality ranges — equal
    qualities always share a bucket, so the two-phase result is exactly
    the global cumsum's.  Quality is 4dp-rounded on both engines before
    ordering so ranking ties resolve identically.
    """
    from pyspark.sql import Window

    from .quality import quality_scores

    priced = quality_scores(spark, sf_dir).select(
        "doc_id", "word_count", "quality_score"
    )
    if counts is not None:
        priced = priced.drop("word_count").join(
            counts.select("doc_id", F.col("n_tokens").alias("word_count")),
            "doc_id",
        )
    docs = priced.localCheckpoint(eager=True)  # three consumers, one scan
    cuts = docs.agg(
        F.expr(
            "transform(percentile(quality_score,"
            " array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)),"
            " c -> round(c + 1e-8, 4))"
        ).alias("cuts")
    )
    bucketed = docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "word_count",
        "quality_score",
        (
            F.lit(1) + F.expr("size(filter(cuts, c -> c < quality_score))")
        ).alias("bucket"),
    )
    bucket_totals = (
        bucketed.groupBy("bucket")
        .agg(F.sum("word_count").alias("bucket_tokens"))
    )
    # 10-row running prefix: window over the bucket DIMENSION, not rows.
    wb = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = bucket_totals.select(
        "bucket",
        (F.sum("bucket_tokens").over(wb) - F.col("bucket_tokens")).alias(
            "tokens_before_bucket"
        ),
    )
    wd = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(prefix), "bucket")
        .withColumn(
            "cum_tokens",
            F.col("tokens_before_bucket") + F.sum("word_count").over(wd),
        )
        .filter(F.col("cum_tokens") <= token_budget)
        .select("doc_id", "word_count", "quality_score", "cum_tokens")
    )


#: Per-source sample size of :func:`priority_sample` — one definition
#: shared with the catalog oracle's literal (the SKEW_REPORT_TOP / ADVICE
#: r5 discipline: engine default and oracle cannot silently diverge).
PRIORITY_SAMPLE_K = 50


def priority_sample(
    spark: SparkSession, sf_dir: str, k: int = PRIORITY_SAMPLE_K
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement per source —
    Efraimidis-Spirakis exponential keys: each doc draws
    ``key = -ln(u) / w`` and the ``k`` SMALLEST keys per stratum win,
    which is exactly weighted sampling without replacement with weight
    ``w`` (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir" — the one-pass/mergeable formulation reservoir samplers
    use).  Weight here is ``ln(1 + n_chars)`` (mild length preference);
    any positive per-doc score (model quality, token count) slots in
    unchanged.

    Complements the existing sampling tier: ``quality_weighted_sample``
    is BERNOULLI (keep-probability per doc, output size varies);
    ``corpus_epoch_mixture`` is per-source fixed RATES.  This is the
    fixed-BUDGET shape — "give me exactly k docs per source, length-
    weighted" — the data-mixture recipe step that needs exact counts.

    Determinism discipline: ``u`` derives from md5(doc_id) (the seedless
    cross-engine hash every sampling op here uses), u = (h32 + 0.5) /
    2^32 in (0, 1) — reproducible across runs, engines, partitionings.

    Zero-weight docs (``n_chars <= 0`` — empty documents exist in any
    real crawl) take key = +inf EXPLICITLY: under ANSI mode (Spark 4's
    default) the naive ``-ln(u) / ln(1+0)`` raises DIVIDE_BY_ZERO at
    runtime (caught by the python-reference differential test).  +inf
    is exact Efraimidis-Spirakis weight-0 semantics — the doc sorts
    after every positive-weight doc and is drawn only when the stratum
    cannot otherwise fill ``k``; corrupt negative ``n_chars`` (log of a
    non-positive → NULL) funnels into the same branch.

    Scale shape: one scan; hash/key are pure codegen expressions; the
    per-source top-k is a row_number <= k filter, which Catalyst rewrites
    to WindowGroupLimit — each map partition forwards at most k rows per
    source into the window shuffle, so a handful of giant sources cost
    k rows each, never corpus-proportional skew (the top_users_per_type
    discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    w_log = F.log(F.lit(1.0) + F.col("n_chars"))
    key = F.when(w_log > 0, -F.log(u) / w_log).otherwise(
        F.lit(float("inf"))
    )
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.round(key + F.lit(1e-8), 6).alias("priority"),
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def tfidf_similar_pairs(
    spark: SparkSession, sf_dir: str, k: int = 10, threshold: float = 0.5
) -> DataFrame:
    """Lexical document similarity: cosine over SPARSE TF-IDF vectors —
    the inverted-index complement of the embedding-based similarity tier
    (no model needed; catches lexical near-duplicates and topical pairs).

    Scale discipline: each document is SPARSIFIED to its top-``k`` TF-IDF
    terms first, so the inverted index carries at most k postings per doc
    and the token self-join is k-bounded per document — the unbounded
    hot-token blowup of a full inverted index (the ngram-Jaccard hazard)
    is designed out, at the cost of approximating the true cosine from
    the top-k components (norms are computed over the SAME truncated
    vectors on both engines, so the oracle is exact for what is claimed).
    """
    terms = tfidf_top_terms(spark, sf_dir, k=k).select(
        "doc_id", "token", "tfidf"
    ).localCheckpoint(eager=True)
    norms = terms.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )
    a = terms.alias("a")
    b = terms.alias("b")
    dots = (
        a.join(b, "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.tfidf") * F.col("b.tfidf")).alias("dot"))
    )
    # No broadcast hints on the norm attach-joins: ``norms`` is one row per
    # document — corpus-proportional, never broadcastable at 100 TB.  AQE
    # still picks broadcast at runtime when the aggregate is small.
    return (
        dots.join(
            norms.select(F.col("doc_id").alias("doc_a"),
                         F.col("norm").alias("norm_a")),
            "doc_a",
        )
        .join(
            norms.select(F.col("doc_id").alias("doc_b"),
                         F.col("norm").alias("norm_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot") / (F.col("norm_a") * F.col("norm_b"))
                + F.lit(1e-8),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal (-ln p(token)) under the
    corpus's own unigram language model — the cheapest perplexity-style
    quality signal (documents of improbable tokens score high; boilerplate
    scores low).  The classic KenLM-perplexity filter (CCNet, Wenzek et
    al.) reduced to the 0-gram case that needs no external model.

    Plan shape at 100 TB:
    * (doc_id, token) occurrence counts aggregate map-side to
      (doc_id, token, c) — bounded by doc×distinct-tokens, not corpus
      tokens.
    * The unigram model (token → count) is vocabulary-sized (10^6-10^7 at
      web scale) — the corpus total rides along as a 1-row broadcast, and
      the model joins back on ``token`` (AQE broadcasts when it fits; the
      hot-token skew is bounded because the probe side is per-doc DISTINCT
      tokens, not raw occurrences).
    * Final per-doc aggregate is one map-side-combinable weighted average.
    """
    docs = load_table(spark, sf_dir, "documents")
    # per_doc feeds BOTH the model build and the probe join — checkpoint so
    # the corpus scan + tokenize + first aggregation run once, not three
    # times (the ngram_jaccard convention; localCheckpoint over cache so
    # blocks are reclaimed when the frame is GC'd).
    per_doc = (
        _doc_tokens(docs)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    model = per_doc.groupBy("token").agg(F.sum("c").alias("tok_total"))
    corpus_total = model.agg(F.sum("tok_total").alias("corpus_total"))
    surprisal = -F.log(F.col("tok_total") / F.col("corpus_total"))
    return (
        per_doc.join(model, "token")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * surprisal) / F.sum("c") + F.lit(1e-8), 4
            ).alias("mean_surprisal"),
        )
    )


def boilerplate_ngram_fraction(
    spark: SparkSession, sf_dir: str, top_b: int = 20
) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a document's
    DISTINCT trigrams that belong to the corpus's ``top_b`` most-shared
    trigrams (ranked by document frequency, ties by gram) — the signal
    behind header/footer/template removal in web-corpus pipelines (C4
    strips repeated boilerplate lines; at flat-text grain the shared-
    n-gram fraction is the analogous detector).  Output: (doc_id, n_grams,
    n_boilerplate, boilerplate_frac); docs with < 3 tokens have no
    trigrams and don't appear (the contamination_check convention).

    Scale shape: ONE corpus scan builds the distinct (doc_id, gram) table
    (localCheckpoint — it feeds both the frequency agg and the per-doc
    join); gram doc-frequencies are map-side combined; the boilerplate
    set is top_b rows via orderBy+limit (TakeOrderedAndProject — no
    global sort) and bounded by the algorithm parameter, so the per-doc
    attach join is against a ~20-row table (AQE broadcasts it).  No
    corpus-sized shuffle carries text beyond the gram aggregation itself.
    """
    from .scrubbing import _doc_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = _doc_ngrams(docs).localCheckpoint(eager=True)
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("doc_freq"))
    boiler = (
        gfreq.orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(top_b)
        .select("gram")
        .withColumn("is_boiler", F.lit(1))
    )
    return (
        grams.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("int")
            .alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boilerplate",
            F.round(
                F.col("n_boilerplate") / F.col("n_grams") + F.lit(1e-8), 4
            ).alias("boilerplate_frac"),
        )
    )


#: Interpolation weight on the bigram MLE in :func:`bigram_surprisal`
#: (the remainder falls back to the unigram model) — Jelinek-Mercer
#: smoothing with a fixed lambda, the simplest back-off that keeps
#: unseen-context probabilities finite.
BIGRAM_LAMBDA = 0.7
#: Spelled as its own literal (not ``1 - BIGRAM_LAMBDA``): the oracle SQL
#: embeds the same literal, and 1.0-0.7 != 0.3 in IEEE doubles.
BIGRAM_BACKOFF = 0.3


def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal -ln(λ·p(w₂|w₁) + (1-λ)·p(w₂))
    under the corpus's own bigram model with Jelinek-Mercer back-off to
    unigrams — one order up from :func:`unigram_surprisal`, i.e. the
    KenLM-perplexity quality filter (CCNet, Wenzek et al.) reduced to the
    first-order case that needs no external model.  Repetitive/boilerplate
    documents score low; incoherent token soups score high even when
    their unigrams are common — which is exactly what the unigram filter
    cannot see.

    Plan shape at 100 TB:
    * Bigram EXTRACTION is array-native codegen (``transform`` over the
      token array) — no posexplode-then-self-join on position, which
      would shuffle corpus-token-count rows twice.
    * (doc_id, bigram) counts aggregate map-side; the bigram model
      (bigram → count) and context model (w₁ → count) are
      vocabulary²-bounded in theory but Heaps-law-sized in practice —
      both join back on their token keys; AQE broadcasts when they fit.
    * The unigram back-off model rides the SAME per-doc counts (grouped
      by w₂), and the corpus total is a 1-row broadcast.
    * Final per-doc aggregate is one map-side-combinable weighted mean.

    Docs with < 2 tokens have no bigrams and drop out (same convention as
    the trigram shingle tiers).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0).alias(
            "t"
        ),
    ).filter(F.size("t") >= 2)
    # (doc_id, w1, w2) one row per bigram occurrence, built array-side.
    per_doc = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        # feeds the bigram model, the context model, the unigram model AND
        # the probe join — checkpoint so the corpus scan + tokenize + first
        # aggregation run once (the unigram_surprisal convention).
        .localCheckpoint(eager=True)
    )
    bi_model = per_doc.groupBy("w1", "w2").agg(F.sum("c").alias("bi_total"))
    ctx_model = bi_model.groupBy("w1").agg(F.sum("bi_total").alias("ctx_total"))
    # Unigram back-off over the SECOND position (the predicted token), so
    # λ·p_bi + (1-λ)·p_uni is a proper conditional mixture.
    uni_model = per_doc.groupBy("w2").agg(F.sum("c").alias("uni_total"))
    corpus_total = uni_model.agg(F.sum("uni_total").alias("corpus_total"))
    p_mix = F.lit(BIGRAM_LAMBDA) * (
        F.col("bi_total") / F.col("ctx_total")
    ) + F.lit(BIGRAM_BACKOFF) * (F.col("uni_total") / F.col("corpus_total"))
    return (
        per_doc.join(bi_model, ["w1", "w2"])
        .join(ctx_model, "w1")
        .join(uni_model, "w2")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * -F.log(p_mix)) / F.sum("c") + F.lit(1e-8), 4
            ).alias("mean_surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (byte-pair encoding, Sennrich et al. 2016)
# ---------------------------------------------------------------------------

BPE_MERGES = 8

#: Merge-selection width per training round: up to this many SYMBOL-DISJOINT
#: top pairs are selected and applied together (see :func:`_bpe_train` for
#: the exactness argument).  Amortizes the per-round driver round-trip —
#: a 32k-rule production tokenizer drops from 32k sequential rounds to
#: ~32k/M (measured: BPE_MERGES=8 trains in 1 round at the default; the
#: sequential trainer needed 8).  ``batch_m=1`` is the vanilla Sennrich
#: loop; every width is property-tested equal to it.
BPE_BATCH_M = 16


def _select_disjoint_merges(
    rows: list, m: int
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint prefix of the (cnt DESC, pair ASC)-sorted
    candidate rows — the batch whose one-pass application is provably
    identical to ``len(result)`` sequential vanilla-BPE rounds.

    Scan rows[:m] in sort order, selecting while the pair touches no
    symbol in the blocked set {lft, rgt, lft+rgt of every selection}:
    * disjointness of {lft, rgt} means earlier replacements cannot create
      or destroy occurrences of later selections (a merge only removes
      the adjacency of its own two symbols, and the token it emits is
      their concatenation);
    * blocking the CONCATENATION guards the case where a later candidate
      contains an earlier round's output symbol — its count grows the
      moment the earlier merge lands, so its round-start count is stale.

    Stop at the first conflict; ``bound`` = that row's count (or the
    (m+1)-th row's count when no conflict — every unseen pair sorts at or
    below it).  The final truncation to counts STRICTLY above ``bound``
    is what makes the batch exact: a pair newly created by selection i
    arises from a context "x lᵢ rᵢ" / "lᵢ rᵢ y" / "lᵢ rᵢ lᵢ rᵢ", i.e.
    inherits occurrences from a BRIDGING pair — (x,lᵢ), (rᵢ,y), or
    (rᵢ,lᵢ) — that shares a symbol with selection i yet is distinct from
    it (distinct precisely because lᵢ ≠ rᵢ; see the self-pair case
    below), and every such pair sorts at/after the stop position (else
    scanning would have stopped sooner), so its count — and hence any
    new pair's — is ≤ bound < every kept selection's count.  Ties WITHIN
    the kept prefix are safe (disjoint ⇒ counts unchanged ⇒ sequential
    argmax follows the identical (cnt DESC, pair ASC) order).

    SELF-PAIRS (lft == rgt) end the batch: for (a,a) the bridging pair
    of "a a a a" → "aa aa" is (a,a) ITSELF — the new (aa,aa) inherits up
    to half the SELECTION's own count, which sorts before any stop
    position, so the bound argument cannot protect later selections
    (counterexample: counts a|a=25, b|b=8 — merging (a,a) can create
    (aa,aa)=10 > 8, which sequential BPE merges before (b,b)).  A
    self-pair is therefore selected as the batch's LAST member (nothing
    after it can be overtaken), with ``bound`` = the next row's count so
    the truncation still guards the self-pair's own turn against
    equal-count new pairs created by EARLIER selections.

    If truncation empties the batch (top ties straight into a conflict),
    fall back to the top-1 pair — a single merge is vanilla BPE and
    always exact.
    """
    selected: list[tuple[str, str, int]] = []
    blocked: set[str] = set()
    bound = int(rows[m]["cnt"]) if len(rows) > m else -1
    for idx, r in enumerate(rows[:m]):
        lft, rgt = r["pr"].split("|", 1)
        if lft in blocked or rgt in blocked or (lft + rgt) in blocked:
            bound = int(r["cnt"])
            break
        selected.append((lft, rgt, int(r["cnt"])))
        blocked.update((lft, rgt, lft + rgt))
        if lft == rgt:
            bound = int(rows[idx + 1]["cnt"]) if idx + 1 < len(rows) else -1
            break
    safe: list[tuple[str, str, int]] = []
    for lft, rgt, cnt in selected:
        if cnt <= bound:
            break
        safe.append((lft, rgt, cnt))
    return safe or selected[:1]


def _bpe_train(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int,
    batch_m: int = BPE_BATCH_M,
):
    """Distributed BPE training on the corpus's WORD-FREQUENCY dictionary —
    the standard industrial shape (Sennrich et al. 2016: train on the word
    count dict, not the raw corpus): one corpus scan builds (word, count),
    and every merge ROUND is a scan+agg over that vocabulary-sized table.
    At 100 TB the corpus pass is the only big job; the dictionary is
    ~10^6-10^7 rows, so the per-round pair count shuffles kilobytes of
    (pair, partial-count) after map-side combine.

    Per round: adjacent symbol pairs via the codegen'd
    slice+arrays_zip+explode pattern (same rationale as dedup.doc_shingles
    — higher-order lambdas run interpreted), weighted by word count; the
    top ``batch_m + 1`` pairs by the engine-portable tiebreak (count DESC,
    then the 'left|right' pair string ASC) collect as ONE bounded driver
    action, and :func:`_select_disjoint_merges` keeps the greedy
    symbol-disjoint prefix that is provably identical to the same number
    of sequential vanilla rounds — the amortization that takes a 32k-rule
    production tokenizer from 32k driver round-trips to ~32k/M.  Each
    selected pair merges via ``regexp_replace('\\bl r\\b' -> 'lr')`` — RE2
    and Java agree on ASCII \\b and on left-to-right non-overlapping
    replacement, which matches BPE's greedy within-word merge order
    (verified on the 'a a a' / 'x y x y' adversarial cases in both
    engines); the batch applies as one chained projection.  Lineage stays
    flat because the dictionary is localCheckpoint'ed once after the
    corpus scan and re-materialized every ~16 applied merges (without
    this, round i re-executes all prior stacked regexp projections —
    quadratic recompute plus Catalyst analysis blowup at 32k merges).

    Returns (merge list, final symbolized-dictionary DataFrame).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    syms = words.select(
        "word",
        "wcount",
        F.concat_ws(
            " ", F.regexp_extract_all(F.col("word"), F.lit("[a-z]"), 0)
        ).alias("sym"),
    ).localCheckpoint(eager=True)
    merges: list[tuple] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        m = min(max(batch_m, 1), n_merges - len(merges))
        pairs = syms.select(
            "wcount",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1)"),
                    F.expr("slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1)"),
                )
            ).alias("z"),
        )
        counted = (
            pairs.select(
                F.concat(F.col("z.0"), F.lit("|"), F.col("z.1")).alias("pr"),
                "wcount",
            )
            .groupBy("pr")
            .agg(F.sum("wcount").alias("cnt"))
        )
        rows = (
            counted.orderBy(F.col("cnt").desc(), F.col("pr").asc())
            .limit(m + 1)
            .collect()
        )
        if not rows:
            break
        col = F.col("sym")
        for lft, rgt, cnt in _select_disjoint_merges(rows, m):
            merges.append((len(merges) + 1, lft, rgt, lft + rgt, cnt))
            col = F.regexp_replace(col, rf"\b{lft} {rgt}\b", lft + rgt)
            since_ckpt += 1
        syms = syms.withColumn("sym", col)
        if since_ckpt >= 16:
            syms = syms.localCheckpoint(eager=True)
            since_ckpt = 0
    return merges, syms


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """The learned merge table: (step, lft, rgt, merged, pair_count) — the
    tokenizer artifact BPE training exists to produce (apply order = step
    order).  See :func:`_bpe_train` for the distributed shape."""
    merges, _ = _bpe_train(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        merges, "step int, lft string, rgt string, merged string, pair_count bigint"
    )


def _segment_of(syms: DataFrame) -> DataFrame:
    """Segmentation frame from a trained symbolized dictionary."""
    return syms.select(
        "word",
        "wcount",
        F.col("sym").alias("segmentation"),
        F.size(F.split(F.col("sym"), " ")).alias("n_subwords"),
    ).orderBy("word")


def bpe_segment(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """The APPLY side: every dictionary word segmented under the learned
    merges (space-joined subword symbols + subword count) — what the
    tokenizer does to new text, evaluated over the training dictionary
    itself.  Re-runs :func:`_bpe_train` (each catalog entry is
    self-contained, the kmeans-retrain convention); a caller needing
    several artifacts should call :func:`bpe_artifacts` once instead."""
    _, syms = _bpe_train(spark, sf_dir, n_merges)
    return _segment_of(syms)


def bpe_artifacts(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> dict[str, DataFrame]:
    """Train ONCE, return the complete tokenizer artifact set — merges
    table, dictionary segmentation, subword vocabulary, and per-document
    true token counts — so a caller materializing a shipped tokenizer
    pays one training run instead of four (the per-entry catalog
    spellings below re-train by the self-contained-entry convention;
    this is the production entry point)."""
    merges, syms = _bpe_train(spark, sf_dir, n_merges)
    syms = syms.localCheckpoint(eager=True)  # four consumers, one train
    return {
        "merges": spark.createDataFrame(
            merges,
            "step int, lft string, rgt string, merged string, pair_count bigint",
        ),
        "segment": _segment_of(syms),
        "vocab": _vocab_of(syms),
        "token_counts": _token_counts_of(spark, sf_dir, syms),
    }


def difficulty_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: quartile-bin every document by LM difficulty
    (mean unigram surprisal) and by quality score — the stage labels a
    curriculum schedule trains over (easy/clean first, hard/rare last;
    the difficulty x quality grid also drives ablation slicing).

    Scale shape: bins come from three exact percentile CUTPOINTS (one
    scalar aggregate, broadcast back as a 1-row array) and a stateless
    ``count(cuts < value)`` filter — the q2_spend_deciles_scalable
    pattern, NOT a global ntile window: no global sort, no single-task
    bottleneck, at any corpus size.  Cutpoints are 4dp-rounded (+1e-8) so
    interpolation noise cannot flip a boundary doc across engines.
    """
    from .quality import quality_scores

    surp = unigram_surprisal(spark, sf_dir).select("doc_id", "mean_surprisal")
    qual = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    # one checkpoint: the joined frame feeds the cutpoint aggregate AND the
    # binning projection (ngram_jaccard convention)
    d = surp.join(qual, "doc_id").localCheckpoint(eager=True)
    cuts = d.agg(
        F.expr(
            "transform(percentile(mean_surprisal, array(0.25D, 0.5D, 0.75D)),"
            " c -> round(c + 1e-8, 4))"
        ).alias("scuts"),
        F.expr(
            "transform(percentile(quality_score, array(0.25D, 0.5D, 0.75D)),"
            " c -> round(c + 1e-8, 4))"
        ).alias("qcuts"),
    )
    return (
        d.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "mean_surprisal",
            "quality_score",
            F.expr(
                "CAST(1 + size(filter(scuts, c -> c < mean_surprisal)) AS INT)"
            ).alias("difficulty_bin"),
            F.expr(
                "CAST(1 + size(filter(qcuts, c -> c < quality_score)) AS INT)"
            ).alias("quality_bin"),
        )
        .orderBy("doc_id")
    )


#: Legal BPE symbol shape.  Training only ever produces [a-z]+ symbols
#: (the pre-tokenizer is '[a-z]+' and merges concatenate), and the apply
#: step interpolates symbols into regex PATTERNS and REPLACEMENTS — a
#: metacharacter ('(', '$', '\\', …) from a foreign merge table would
#: silently corrupt the pattern chain, so it is rejected up front.
_BPE_SYMBOL = re.compile(r"[a-z]+\Z")


def bpe_tokenize_documents(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned BPE merge list to ANY (doc_id, text) frame — batch
    or STREAMING: the whole projection is stateless (the merge rules are
    embedded in the plan as literal regexp chains, the same
    weights-ARE-the-plan discipline as the quality classifier), so the
    identical operator object compiles under Structured Streaming and
    tokenizes ingest micro-batches exactly like the batch backfill —
    batch/stream parity is test-pinned.

    ``merges`` is [(lft, rgt), ...] in step order — collect it once from
    :func:`bpe_merges` output; 8-64k rules are all literal constants, no
    model artifact to distribute.  Symbols must match ``[a-z]+`` (every
    trained merge does; a stored table that doesn't would corrupt the
    regex chain and is rejected).  Output: one row per word occurrence
    (doc_id, pos, word, segmentation).
    """
    for lft, rgt in merges:
        if not (_BPE_SYMBOL.match(lft) and _BPE_SYMBOL.match(rgt)):
            raise ValueError(f"BPE merge symbols must match [a-z]+: {(lft, rgt)!r}")
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("pos", "word"),
    )
    col = F.concat_ws(" ", F.regexp_extract_all(F.col("word"), F.lit("[a-z]"), 0))
    for lft, rgt in merges:
        col = F.regexp_replace(col, rf"\b{lft} {rgt}\b", lft + rgt)
    return words.select("doc_id", "pos", "word", col.alias("segmentation"))


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Per-document token counts UNDER THE TRAINED TOKENIZER — the counts
    a token budget or packing pass should actually use (whitespace/word
    counts misprice documents whose words fragment into many subwords).
    Re-runs :func:`_bpe_train` to get the dictionary (self-contained-entry
    convention); production callers get this via :func:`bpe_artifacts`
    (one training run) or a stored merge table.
    """
    _, syms = _bpe_train(spark, sf_dir, n_merges)
    return _token_counts_of(spark, sf_dir, syms)


def _token_counts_of(
    spark: SparkSession, sf_dir: str, syms: DataFrame
) -> DataFrame:
    """Per-doc true-token rollup from a trained symbolized dictionary.

    Plan shape: per-doc word occurrence counts aggregate map-side off the
    corpus scan (the unigram-surprisal discipline); the trained dictionary
    segmentation is vocabulary-sized and joins back on ``word`` (AQE
    broadcasts when it fits), and the final per-doc rollup is one
    map-side-combinable weighted sum.
    """
    seg = syms.select(
        "word", F.size(F.split(F.col("sym"), " ")).alias("n_subwords")
    )
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        occ.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("n_subwords")).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
        .withColumn(
            "subwords_per_word",
            F.round(F.col("n_bpe_tokens") / F.col("n_words") + F.lit(1e-8), 4),
        )
        .orderBy("doc_id")
    )


def bpe_vocab(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """The trained tokenizer's SUBWORD VOCABULARY: every distinct symbol
    in the final segmentation, occurrence-weighted by word frequency,
    with contiguous frequency-ranked ids — tokenizer artifact #2 (a
    shipped tokenizer is exactly the merge table + this vocab file).

    Ranking follows :func:`vocabulary`'s convention (row_number over
    freq DESC, subword ASC — deterministic across runs/engines; the
    global window runs over the vocab-sized aggregate by design).  Ids
    start at 0, the usual tokenizer convention.
    """
    _, syms = _bpe_train(spark, sf_dir, n_merges)
    return _vocab_of(syms)


def _vocab_of(syms: DataFrame) -> DataFrame:
    """Frequency-ranked subword vocabulary from a trained dictionary."""
    freq = (
        syms.select(
            F.explode(F.split(F.col("sym"), " ")).alias("subword"), "wcount"
        )
        .groupBy("subword")
        .agg(F.sum("wcount").cast("bigint").alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("subword"))
    return freq.select(
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "subword",
        "n_occurrences",
    ).orderBy("token_id")


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: Hashed feature space for the DSIR importance model.  The paper buckets
#: unigram+bigram features into a fixed hash space so the model is
#: CONSTANT-SIZE regardless of corpus scale; 4096 here (10k in the paper)
#: keeps both engines' tables tiny while leaving the synthetic 31-word
#: vocabulary collision-free enough to be non-degenerate.
DSIR_BUCKETS = 4096
#: The "target domain" stand-in: docs from these sources play the
#: high-quality corpus (the paper's Wikipedia+books target).
DSIR_TARGET_SOURCES = ("src0", "src1")
#: Keep raw docs whose importance weight clears this quantile cutpoint.
DSIR_CUT_Q = 0.75


def dsir_importance_sample(
    spark: SparkSession,
    sf_dir: str,
    targets: tuple[str, ...] = DSIR_TARGET_SOURCES,
    buckets: int = DSIR_BUCKETS,
    cut_q: float = DSIR_CUT_Q,
) -> DataFrame:
    """Importance-resample the raw corpus toward a target domain — DSIR
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"), the domain-matching step between heuristic gates and
    model-based filters in a modern curation stack.

    Per the paper: featurize every doc as hashed unigram+bigram counts
    (md5 bucket, cross-engine bit-identical — the count-min convention),
    fit bag-of-buckets models for the TARGET (docs from ``targets``
    sources) and the RAW remainder (add-1 smoothing over the bucket
    space), and score every raw doc by its mean per-feature log importance
    ratio ln(p_target/p_raw).  Docs at or above the ``cut_q`` weight
    quantile are kept (the paper resamples ~top weights; the quantile
    spelling is the deterministic equivalent, matching the
    difficulty_bins cutpoint pattern).  Tokenless docs carry no features
    and are not scored (the _doc_ngrams convention).

    Scale shape (100 TB): the feature explode aggregates straight back to
    (doc, bucket) grain with map-side combine; BOTH model tables are
    bounded at ``buckets`` rows — constants — so the log-ratio table
    broadcasts into the scoring join no matter how big the corpus is, and
    the per-doc weight is one more map-side-combinable aggregate.  The
    keep decision is a broadcast 1-row cutpoint + stateless compare: no
    global sort, no window.  One documents scan, checkpointed, feeds
    featurization; one weights checkpoint feeds cutpoint + flag.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
    # unigrams ++ space-joined bigrams, then the md5 bucket of each gram
    # (first 8 hex chars = 32 bits, identical '0x'-cast in DuckDB).
    grams = F.expr(
        "concat(toks, CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', slice(toks, i, 2)))"
        " ELSE cast(array() AS array<string>) END)"
    )
    feat = (
        docs.select(
            "doc_id",
            "source",
            F.col("source").isin(*targets).alias("is_target"),
            toks.alias("toks"),
        )
        .select("doc_id", "source", "is_target", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            "is_target",
            "source",
            (
                F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast(
                    "bigint"
                )
                % buckets
            ).alias("bucket"),
        )
        .groupBy("doc_id", "source", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    model = feat.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), F.col("c")).otherwise(0)).alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("t_total"), F.sum("cr").alias("r_total")
    )
    lam = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1) / (F.col("t_total") + F.lit(buckets)))
            - F.log((F.col("cr") + 1) / (F.col("r_total") + F.lit(buckets)))
        ).alias("logratio"),
    )
    weights = (
        feat.filter(~F.col("is_target"))
        .join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("int").alias("n_feats"),
            F.round(
                F.sum(F.col("c") * F.col("logratio")) / F.sum("c") + 1e-8, 4
            ).alias("dsir_weight"),
        )
        .localCheckpoint(eager=True)
    )
    cuts = weights.agg(
        F.round(
            F.expr(f"percentile(dsir_weight, {cut_q!r}D)") + 1e-8, 4
        ).alias("cut")
    )
    return (
        weights.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "source",
            "n_feats",
            "dsir_weight",
            (F.col("dsir_weight") >= F.col("cut")).alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus statistics for tokenizer / loader planning (round 7)
# ---------------------------------------------------------------------------

#: n-gram widths for the diversity audit and rank cutpoints for the
#: vocabulary head-coverage curve (shared with the oracles).
DIVERSITY_NS = (1, 2, 3)
COVERAGE_KS = (10, 100, 1000)
LENGTH_QUANTILES = (0.5, 0.9, 0.99)


def ngram_diversity_by_source(
    spark: SparkSession,
    sf_dir: str,
    ns: tuple[int, ...] = DIVERSITY_NS,
) -> DataFrame:
    """Per-source n-gram diversity: total grams, distinct grams, and the
    distinct ratio for each width in ``ns`` — the standard templated-spam
    / repetition-collapse diagnostic (a source whose trigram distinct
    ratio craters is stamping the same text; complements the per-doc
    repetition scores with a SOURCE-level view a mixture designer reads).

    One tokenize pass (checkpointed): each width re-reads the token
    arrays, never the raw text.  Grams are built by a generator
    expression inside the JVM (sequence + transform + slice — the
    _doc_ngrams pattern); the per-width aggregate is one map-side-
    combined count + exact distinct (the oracle-parity spelling; at
    100 TB swap ``approx_count_distinct`` exactly like column_profile's
    monitoring twin)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
            ).alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    parts = []
    for n in ns:
        grams = F.expr(
            f"CASE WHEN size(toks) >= {n} THEN"
            f" transform(sequence(1, size(toks) - {n} + 1),"
            f" i -> concat_ws(' ', slice(toks, i, {n})))"
            " ELSE cast(array() AS array<string>) END"
        )
        parts.append(
            toks.select("source", F.explode(grams).alias("gram"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.count_distinct("gram").alias("n_distinct"),
            )
            .select(
                "source",
                F.lit(n).cast("int").alias("n"),
                "n_grams",
                "n_distinct",
                F.round(
                    F.col("n_distinct") / F.col("n_grams") + F.lit(1e-8), 4
                ).alias("distinct_ratio"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("source", "n")


def token_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document token-length profile — docs, mean tokens, and
    the p50/p90/p99 exact percentiles — the numbers a packing/batching
    planner reads before choosing sequence length and truncation policy
    (pairs with corpus_truncation_report, which prices ONE chosen
    context length; this shows the whole tail).

    One tokenize scan to (source, n_tokens) grain, one map-side-
    combinable aggregate per source.  ``percentile`` is exact (the
    oracle-parity spelling; approx_percentile is the 100 TB monitoring
    twin, same trade as column_profile)."""
    qs = ", ".join(repr(q) + "D" for q in LENGTH_QUANTILES)
    lens = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
        ).alias("n_tokens"),
    )
    prof = lens.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens") + F.lit(1e-8), 4).alias("mean_tokens"),
        F.expr(f"percentile(n_tokens, array({qs}))").alias("pq"),
    )
    return prof.select(
        "source",
        "n_docs",
        "mean_tokens",
        F.round(F.element_at("pq", 1) + F.lit(1e-8), 4).alias("p50_tokens"),
        F.round(F.element_at("pq", 2) + F.lit(1e-8), 4).alias("p90_tokens"),
        F.round(F.element_at("pq", 3) + F.lit(1e-8), 4).alias("p99_tokens"),
    ).orderBy("source")


def vocab_coverage(
    spark: SparkSession, sf_dir: str, ks: tuple[int, ...] = COVERAGE_KS
) -> DataFrame:
    """Vocabulary head coverage: the fraction of all token OCCURRENCES
    covered by the top-``k`` most frequent types, for each rank cutpoint
    in ``ks`` — the Zipf-head curve that sizes a tokenizer vocabulary
    (if 1000 types cover 95%, byte-fallback traffic is the remaining 5%).

    Plan: one tokenize scan into a vocabulary-grain frequency table;
    ranking uses a single whole-frame window over VOCAB-grain rows
    (types, not occurrences — bounded far below corpus size; the same
    deliberate trade as bpe_vocab's ranking), then each cutpoint is a
    bounded join + map-side-combined sum.  A ``k`` beyond the vocabulary
    naturally reports coverage 1.0."""
    freq = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = freq.select(
        "cnt", F.row_number().over(w).alias("rk")
    ).localCheckpoint(eager=True)
    total = ranked.agg(F.sum("cnt").alias("total"))
    cuts = spark.createDataFrame([(int(k),) for k in ks], "top_k int")
    return (
        F.broadcast(cuts)
        .join(ranked, ranked.rk <= cuts.top_k)
        .groupBy("top_k")
        .agg(F.sum("cnt").alias("covered_occurrences"))
        .crossJoin(F.broadcast(total))
        .select(
            "top_k",
            "covered_occurrences",
            F.col("total").alias("total_occurrences"),
            F.round(
                F.col("covered_occurrences") / F.col("total") + F.lit(1e-8), 4
            ).alias("coverage_frac"),
        )
        .orderBy("top_k")
    )


def vocab_coverage_scalable(
    spark: SparkSession, sf_dir: str, ks: tuple[int, ...] = COVERAGE_KS
) -> DataFrame:
    """The 100×-scale spelling of :func:`vocab_coverage` (VERDICT r7
    "wrong" #3): result-identical, but NO window ever touches the
    vocabulary-grain frequency table — a raw ``[a-z]+`` vocabulary over
    100 TB of web text is billions of types, and the exact twin's
    unpartitioned row_number would sort them all on one partition.

    The key observation: head COVERAGE is tie-insensitive.  Every type
    sharing the k-th type's count contributes the same ``cnt``, so
    which of them the (cnt, token) tiebreak ranks inside the top-k
    cannot change the covered-occurrence sum:

        covered(k) = Σ_{c > T_k} c·types(c) + (k − Σ_{c > T_k} types(c))·T_k

    where ``T_k`` is the k-th ranked type's count.  Everything on the
    right lives on the COUNT-HISTOGRAM grain — (cnt, n_types) rows,
    bounded by the number of DISTINCT frequency values, which is at most
    ~sqrt(2·total_occurrences) (distinct positive integers summing to N)
    — ~6M rows at 2e13 occurrences, vs billions of types.  So:

    1. tokenize scan → token-grain frequency (the one corpus-sized job,
       all map-side-combined aggregation);
    2. fold to the count histogram (second tiny aggregate);
    3. one cumulative window over the HISTOGRAM (the only single-
       partition step, plan-asserted to sit above the cnt-grain
       aggregate and nothing bigger);
    4. each cutpoint picks its threshold row with a broadcast range
       join and closes the formula.

    ``k`` beyond the vocabulary clamps to the full vocabulary (coverage
    1.0), matching the exact twin.  Shares the exact entry's DuckDB
    oracle — the results are bit-identical by the tie argument above
    (parity also pytest-pinned against :func:`vocab_coverage`)."""
    freq = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = freq.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_types"))
    above = Window.orderBy(F.desc("cnt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "cnt",
        "n_types",
        F.coalesce(F.sum("n_types").over(above), F.lit(0)).alias(
            "types_above"
        ),
        F.coalesce(
            F.sum(F.col("cnt") * F.col("n_types")).over(above), F.lit(0)
        ).alias("occ_above"),
    )
    total = hist.agg(
        F.sum(F.col("cnt") * F.col("n_types")).alias("total"),
        F.sum("n_types").alias("vocab_size"),
    )
    cuts = (
        spark.createDataFrame([(int(k),) for k in ks], "top_k int")
        .crossJoin(F.broadcast(total))
        .select(
            "top_k",
            "total",
            F.least(F.col("top_k").cast("bigint"), F.col("vocab_size")).alias(
                "eff_k"
            ),
        )
    )
    return (
        cum.join(
            F.broadcast(cuts),
            (F.col("types_above") < F.col("eff_k"))
            & (F.col("eff_k") <= F.col("types_above") + F.col("n_types")),
        )
        .select(
            "top_k",
            (
                F.col("occ_above")
                + (F.col("eff_k") - F.col("types_above")) * F.col("cnt")
            ).alias("covered_occurrences"),
            F.col("total").alias("total_occurrences"),
            F.round(
                (
                    F.col("occ_above")
                    + (F.col("eff_k") - F.col("types_above")) * F.col("cnt")
                )
                / F.col("total")
                + F.lit(1e-8),
                4,
            ).alias("coverage_frac"),
        )
        .orderBy("top_k")
    )
