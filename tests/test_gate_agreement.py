"""Quality-gate agreement audit (operators/gate_agreement.py) —
pytest-gated until its catalog entry lands with a future round's free
window slots (ROUND-15 budget candidate).

Properties pinned:
1. hand-checked agreement split on a tiny synthetic frame (both
   disagreement directions counted separately; agreement fraction over
   both-scored docs only);
2. visibility: docs either gate could not score stay in n_docs with a
   smaller n_both_scored; a source with ZERO both-scored docs reports
   NULL agree_frac (0/0 -> NULL), never a crash;
3. the catalog-ready builder matches the TEMPLATE oracle (nesting the
   proven text_quality_classifier and quality_model_scores oracles
   verbatim — the registration spelling) on the REAL documents table at
   sf0.001 AND sf0.01, the driver-gate mirror.
"""
from __future__ import annotations

import pytest

from hadoop_pyspark_streaming_analytics_spark.operators.gate_agreement import (
    agreement_of,
    oracle_gate_agreement,
    quality_gate_agreement,
)

_DOCS = "doc_id long, source string"
_GATE = "doc_id long, keep boolean"


def test_agreement_hand_checked(spark):
    docs = spark.createDataFrame(
        [(i, "web") for i in range(1, 6)] + [(6, "books")], _DOCS
    )
    heur = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False), (6, True)], _GATE
    )  # doc 5 unscored by the heuristic gate
    trained = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, False), (5, True)], _GATE
    )  # doc 6 unscored by the trained gate
    rep = {
        r.source: r for r in agreement_of(docs, heur, trained).collect()
    }
    web = rep["web"]
    assert (web.n_docs, web.n_both_scored) == (5, 4)
    # docs 1 (T,T) and 4 (F,F) agree; 2 (T,F) and 3 (F,T) disagree
    assert web.agree_frac == round(2 / 4 + 1e-8, 4)
    assert web.heuristic_only_keeps == 1  # doc 2
    assert web.trained_only_keeps == 1  # doc 3
    books = rep["books"]
    assert (books.n_docs, books.n_both_scored) == (1, 0)
    assert books.agree_frac is None  # 0/0 -> NULL, never a crash
    assert (books.heuristic_only_keeps, books.trained_only_keeps) == (0, 0)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_catalog_ready_builder_matches_template_oracle(spark, sf_dir):
    """Differential gate for the future registration: the builder vs the
    template oracle instantiated with the CANONICAL nested SQL (the
    catalog's own text_quality_classifier oracle and
    model_filter.ORACLE_MODEL_SCORES), at both SFs — the driver-gate
    mirror."""
    from hadoop_pyspark_streaming_analytics_spark.operators.model_filter import (
        ORACLE_MODEL_SCORES,
    )
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import (
        CATALOG,
        QuerySpec,
    )
    from tests.oracle import compare

    classifier_sql = next(
        s.oracle for s in CATALOG if s.name == "text_quality_classifier"
    )
    spec = QuerySpec(
        "ga_agreement",
        quality_gate_agreement,
        oracle_gate_agreement(classifier_sql, ORACLE_MODEL_SCORES),
    )
    compare(spec, spark, sf_dir)
