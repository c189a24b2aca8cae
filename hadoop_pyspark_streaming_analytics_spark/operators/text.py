"""Text/word-statistics operators (SURVEY.md §2.5 A14-A16, §2.9 F11-F13) —
Q1's Hadoop-Streaming job re-expressed as DataFrame aggregations.

The reference multiplexes three aggregations through one MapReduce shuffle
with prefixed keys (q1_mapper.py:29-36, README.md:109).  In Spark that trick
is unnecessary: one cached token DataFrame feeds three independent
aggregations, and Catalyst plans each as partial+final hash agg
(q1_reducer.py's single-reducer bottleneck disappears).

Semantics preserved exactly (q1_mapper.py:11,19-27): lowercase, tokens are
``[a-z]+`` runs, stop words {the,is,an,a,are} excluded from ALL statistics
(counts, lengths, totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round2
from ..sources.readers import load_table

STOP_WORDS = ("the", "is", "an", "a", "are")  # q1_mapper.py:11

TOKEN_PATTERN = "[a-z]+"  # q1_mapper.py:23


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """F11-F13 + A14 map side: lowercase → extract [a-z]+ runs → explode →
    drop stop words.  All JVM-side builtins — no Python in the hot path."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
            ).alias("word")
        )
        .filter(~F.col("word").isin(*STOP_WORDS))  # P9
    )


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens(load_table(spark, sf_dir, "documents"), "text")


def word_count_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """A14 + O2 (q1_reducer.py:34-36,53-57): word frequencies, top-K.
    Deterministic tiebreak (word asc) added at the cut — the reference's
    Python sort is stable but unspecified across ties (SURVEY.md §7).
    orderBy+limit plans as TakeOrderedAndProject (no global sort)."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(k)
    )


def word_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 (q1_mapper.py:32-33, q1_reducer.py:37-40,59-63): word-length
    distribution, sorted by length."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy(F.length("word").alias("length"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("length")
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 (q1_reducer.py:64-72): total words, unique words, average word
    length — one aggregation instead of the reducer's three dicts."""
    return doc_tokens(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("total_words"),
        F.countDistinct("word").alias("unique_words"),
        round2(F.avg(F.length("word"))).alias("avg_word_length"),
    )


def format_q1_report(spark: SparkSession, sf_dir: str, k: int = 20) -> str:
    """K5 (q1_reducer.py:49-73): the sectioned text report, for golden-shape
    parity with q1_output.txt.  Driver-side formatting of three small
    collected results — the aggregations themselves stay distributed."""
    top = word_count_topk(spark, sf_dir, k).collect()
    hist = word_length_histogram(spark, sf_dir).collect()
    stats = corpus_stats(spark, sf_dir).collect()[0]
    lines = ["=" * 60, "WORD COUNT WITH STATISTICS - ANALYSIS RESULTS", "=" * 60]
    lines += ["", f"Word Frequencies (Top {k}):", "-" * 40]
    lines += [f"{r['word']}: {r['cnt']}" for r in top]
    lines += ["", "", "Word Length Distribution:", "-" * 40]
    lines += [f"length_{r['length']}: {r['cnt']}" for r in hist]
    lines += ["", "", "Statistics:", "-" * 40]
    lines += [
        f"Total words: {stats['total_words']}",
        f"Unique words: {stats['unique_words']}",
        f"Average word length: {stats['avg_word_length']:.2f}",
        "=" * 60,
    ]
    return "\n".join(lines)
