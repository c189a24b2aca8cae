"""Tokenizer fertility report (operators/tokenizer_health.py) —
pytest-gated until its catalog entry lands with a future round's free
window slots (ROUND-15 budget candidate).

Properties pinned:
1. hand-checked numbers on a tiny synthetic frame (fertility = BPE
   tokens per word; chars_per_token over tokenized docs' character
   mass only);
2. LEFT-join visibility: docs absent from the token-count frame
   (NULL/untokenizable) surface as a docs_tokenized < n_docs gap, and a
   source with ZERO tokenizable docs reports NULL token mass and NULL
   ratios — present, never dropped, never a crash;
3. the catalog-ready builder matches the TEMPLATE oracle (nesting the
   proven corpus_bpe_token_counts oracle verbatim — the registration
   spelling) on the REAL documents table at sf0.001 AND sf0.01, the
   driver-gate mirror.
"""
from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.operators.tokenizer_health import (
    fertility_of,
    oracle_fertility_report,
    tokenizer_fertility_report,
)

_DOCS = "doc_id long, text string, source string"
_COUNTS = "doc_id long, n_words bigint, n_bpe_tokens bigint"


def test_fertility_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaab aaab aaab cd", "web"),  # 17 chars, 4 words
            (2, "aaab cd cd", "web"),  # 10 chars, 3 words
            (3, "xyz", "books"),  # 3 chars, 1 word
        ],
        _DOCS,
    )
    counts = spark.createDataFrame(
        [(1, 4, 9), (2, 3, 5), (3, 1, 3)], _COUNTS
    )
    rep = {r.source: r for r in fertility_of(docs, counts).collect()}
    web, books = rep["web"], rep["books"]
    assert (web.n_docs, web.docs_tokenized) == (2, 2)
    assert (web.n_words, web.n_bpe_tokens) == (7, 14)
    assert web.fertility == 2.0  # 14 / 7
    assert web.chars_per_token == round(27 / 14 + 1e-8, 4)
    assert (books.n_words, books.fertility) == (1, 3.0)


def test_untokenizable_docs_visible_not_dropped(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "web"),
            (2, None, "web"),  # NULL text: no counts row
            (3, "123 456", "digits"),  # no [a-z] words: no counts row
        ],
        _DOCS,
    )
    counts = spark.createDataFrame([(1, 2, 4)], _COUNTS)
    rep = {r.source: r for r in fertility_of(docs, counts).collect()}
    assert (rep["web"].n_docs, rep["web"].docs_tokenized) == (2, 1)
    # doc 2's NULL chars stay out of the tokenized character mass
    assert rep["web"].chars_per_token == round(10 / 4 + 1e-8, 4)
    d = rep["digits"]
    assert (d.n_docs, d.docs_tokenized) == (1, 0)
    assert d.n_words is None and d.n_bpe_tokens is None
    assert d.fertility is None and d.chars_per_token is None


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_catalog_ready_builder_matches_template_oracle(spark, sf_dir):
    """Differential gate for the future registration: the builder vs the
    template oracle instantiated with the CANONICAL nested SQL (the
    catalog's own corpus_bpe_token_counts oracle), at both SFs — the
    driver-gate mirror."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import (
        CATALOG,
        QuerySpec,
    )
    from tests.oracle import compare

    tc_sql = next(
        s.oracle for s in CATALOG if s.name == "corpus_bpe_token_counts"
    )
    spec = QuerySpec(
        "th_fertility",
        tokenizer_fertility_report,
        oracle_fertility_report(tc_sql),
    )
    compare(spec, spark, sf_dir)
