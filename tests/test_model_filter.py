"""Trained model-based quality filter (operators/model_filter.py;
catalog entries quality_model_scores / quality_model_report registered
round 13) and its streaming face (foreach_batch_quality_gate).

Properties pinned:
1. the Spark GD trajectory equals a pure-numpy reference step for step
   (same quantization after every step — exact equality, not tolerance);
2. on a separable corpus (disjoint vocabularies), the trained filter
   scores reference-like docs above crawl-like docs and keeps exactly
   the reference-like ones;
3. tokenless/NULL docs carry no features and are not scored;
4. every GD step is ONE aggregate job — no per-doc shuffle in training
   (plan-checked on the step expression), and scoring adds no Exchange
   over the feature frame;
5. both catalog-ready builders match their co-located unrolled-GD DuckDB
   oracles on the REAL documents table at sf0.001 AND sf0.01.
"""
from __future__ import annotations

import math
import re

import pytest

from hadoop_pyspark_streaming_analytics_spark.operators.model_filter import (
    LR_BUCKETS,
    doc_features,
    score_documents,
    train_quality_lr,
)

_SCHEMA = "doc_id long, text string, source string"


def _bucket_py(tok: str) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % LR_BUCKETS


def _feats_py(rows):
    out = {}
    for doc_id, text, source in rows:
        t = re.findall("[a-z]+", (text or "").lower())
        if not t:
            continue
        f = [0.0] * LR_BUCKETS
        for tok in t:
            f[_bucket_py(tok)] += 1.0
        out[doc_id] = ([x / len(t) for x in f], source)
    return out


def _train_py(feats, targets, steps, lr):
    w = [0.0] * LR_BUCKETS
    items = list(feats.items())
    for _ in range(steps):
        grads = [0.0] * LR_BUCKETS
        for _, (f, source) in items:
            y = 1.0 if source in targets else 0.0
            z = sum(a * b for a, b in zip(w, f))
            p = 1.0 / (1.0 + math.exp(-z))
            for b in range(LR_BUCKETS):
                grads[b] += (y - p) * f[b]
        n = len(items)
        w = [round(w[b] + lr * grads[b] / n + 1e-8, 6) for b in range(LR_BUCKETS)]
    return w


_ROWS = [
    (1, "alpha beta gamma delta epsilon zeta", "ref"),
    (2, "alpha beta gamma eta theta iota", "ref"),
    (3, "spam junk noise filler clutter waste", "crawl"),
    (4, "junk noise alpha waste filler spam", "crawl"),
    (5, "beta gamma delta theta alpha iota", "crawl"),  # ref-like crawl doc
    (6, None, "crawl"),
    (7, "12345", "crawl"),  # untokenizable
]


def test_gd_matches_numpy_reference_exactly(spark):
    """Quantizing the weights after every step makes the distributed and
    the sequential trajectories IDENTICAL (any float-sum divergence is
    below the 6dp quantum), so the pin is exact equality."""
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    feats = doc_features(df, targets=("ref",))
    got = train_quality_lr(feats, steps=4, lr=2.0)
    want = _train_py(_feats_py(_ROWS), ("ref",), steps=4, lr=2.0)
    assert got == want


def test_separable_corpus_is_separated(spark):
    """Disjoint-vocabulary reference vs crawl: the trained filter must
    score the reference-vocabulary docs (including the ref-like crawl
    doc 5) above the junk docs and keep exactly them."""
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    feats = doc_features(df, targets=("ref",))
    w = train_quality_lr(feats, steps=12, lr=8.0)
    out = {r.doc_id: r for r in score_documents(feats, w).collect()}
    assert out[1].keep and out[2].keep and out[5].keep
    assert not out[3].keep and not out[4].keep
    assert min(out[i].score for i in (1, 2, 5)) > max(
        out[i].score for i in (3, 4)
    )


def test_tokenless_docs_are_not_scored(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    feats = doc_features(df, targets=("ref",))
    ids = {r.doc_id for r in feats.select("doc_id").collect()}
    assert 6 not in ids and 7 not in ids and 1 in ids


def test_training_step_is_single_aggregate_no_doc_shuffle(spark):
    """The per-step job must be one partial-aggregate tree over the cached
    feature frame: no Exchange other than the single-row aggregate's, no
    window, no join."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.model_filter import (
        _sigmoid_z,
        _w_lit,
    )

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    feats = doc_features(df, targets=("ref",)).localCheckpoint(eager=True)
    resid = F.col("y") - _sigmoid_z(_w_lit([0.0] * LR_BUCKETS))
    step = feats.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(resid * F.element_at("f", b + 1)).alias(f"g{b}")
            for b in range(LR_BUCKETS)
        ],
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the single-row aggregate's only
    assert "Window" not in plan and "Join" not in plan


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "builder_name, oracle_name",
    [
        ("quality_model_scores", "ORACLE_MODEL_SCORES"),
        ("quality_model_report", "ORACLE_MODEL_REPORT"),
    ],
)
def test_catalog_ready_builders_match_their_oracles(
    spark, builder_name, oracle_name, sf_dir
):
    """Differential gate for the future registration: the full quantized
    GD trajectory (8 steps) plus scoring, Spark vs the unrolled-CTE
    DuckDB oracle, over the REAL documents table at sf0.001 AND the
    driver's own sf0.01."""
    from hadoop_pyspark_streaming_analytics_spark.operators import (
        model_filter as mf,
    )
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import QuerySpec
    from tests.oracle import compare

    spec = QuerySpec(
        f"mf_{builder_name}",
        getattr(mf, builder_name),
        getattr(mf, oracle_name),
    )
    compare(spec, spark, sf_dir)


def test_all_tokenless_corpus_degrades_not_crashes(spark):
    """Nothing trainable → zero-init weights back, empty scored frame —
    never a NULL-gradient TypeError (degrade-per-row discipline)."""
    df = spark.createDataFrame(
        [(1, None, "crawl"), (2, "123 456", "crawl")], _SCHEMA
    )
    feats = doc_features(df, targets=("ref",))
    w = train_quality_lr(feats, steps=3)
    assert w == [0.0] * LR_BUCKETS
    assert score_documents(feats, w).count() == 0


def test_null_source_labels_as_crawl(spark):
    """A NULL source is NOT the reference corpus: y must be 0.0 (matching
    the oracle's CASE and the python reference), never NULL — a NULL y
    would silently drop the doc's residual from every gradient."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", None), (2, "alpha beta gamma", "ref")],
        _SCHEMA,
    )
    got = {
        r.doc_id: r.y for r in doc_features(df, targets=("ref",)).collect()
    }
    assert got == {1: 0.0, 2: 1.0}


# ---------------------------------------------------------------------------
# Streaming face: foreach_batch_quality_gate (streaming/extensions.py)
# ---------------------------------------------------------------------------


def _gate_out(spark, out, batch_id):
    return {
        r.doc_id: (r.score, r.keep)
        for r in spark.read.parquet(f"{out}/batch_id={batch_id}").collect()
    }


def test_streaming_gate_equals_batch_operator_per_batch(spark, tmp_path):
    """Per-batch parity: the gate's output rows equal score_documents over
    the same rows (same weights), with every input doc present."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_quality_gate,
    )

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    feats = doc_features(df, targets=("ref",))
    w = train_quality_lr(feats, steps=3)
    out = str(tmp_path / "out")
    gate = foreach_batch_quality_gate(w, out)

    for batch_id, lo, hi in ((0, 1, 4), (1, 4, 8)):
        batch = df.where(f"doc_id >= {lo} AND doc_id < {hi}").select(
            "doc_id", "text"
        )
        gate(batch, batch_id)
        got = _gate_out(spark, out, batch_id)
        want_scored = {
            r.doc_id: (r.score, r.keep)
            for r in score_documents(
                doc_features(
                    batch.withColumn("source", batch.doc_id.cast("string")),
                    targets=("ref",),
                ),
                w,
            ).collect()
        }
        want_ids = {r.doc_id for r in batch.collect()}
        assert set(got) == want_ids  # every input doc present
        for doc_id in want_ids:
            assert got[doc_id] == want_scored.get(doc_id, (None, None))


def test_streaming_gate_tokenless_docs_visible_not_dropped(spark, tmp_path):
    """Degrade-per-row: NULL/untokenizable docs are written with NULL
    score and NULL keep — visible, never silently dropped."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_quality_gate,
    )

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    w = train_quality_lr(doc_features(df, targets=("ref",)), steps=2)
    out = str(tmp_path / "out")
    foreach_batch_quality_gate(w, out)(
        df.where("doc_id IN (1, 6, 7)").select("doc_id", "text"), 0
    )
    got = _gate_out(spark, out, 0)
    assert set(got) == {1, 6, 7}
    assert got[6] == (None, None) and got[7] == (None, None)
    assert got[1][0] is not None and got[1][1] is not None


def test_streaming_gate_replay_is_idempotent(spark, tmp_path):
    """Exactly-once: replaying a batch_id overwrites to the same rows
    (stateless gate — no store to double-count)."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_quality_gate,
    )

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    w = train_quality_lr(doc_features(df, targets=("ref",)), steps=2)
    out = str(tmp_path / "out")
    gate = foreach_batch_quality_gate(w, out)
    batch = df.where("doc_id < 5").select("doc_id", "text")
    gate(batch, 0)
    first = _gate_out(spark, out, 0)
    gate(batch, 0)  # replay
    assert _gate_out(spark, out, 0) == first


def test_weights_roundtrip_and_custom_threshold(spark, tmp_path):
    """save/load preserves the exact quantized weights; a custom
    threshold shifts only the keep verdicts, not the scores."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_quality_gate,
        load_quality_weights,
        save_quality_weights,
    )

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    w = train_quality_lr(doc_features(df, targets=("ref",)), steps=3)
    path = str(tmp_path / "weights")
    save_quality_weights(spark, path, w)
    assert load_quality_weights(spark, path) == w

    out = str(tmp_path / "out")
    batch = df.where("doc_id < 6").select("doc_id", "text")
    foreach_batch_quality_gate(w, out)(batch, 0)
    default = _gate_out(spark, out, 0)
    foreach_batch_quality_gate(w, out, threshold=0.0)(batch, 1)
    loose = _gate_out(spark, out, 1)
    assert {d: s for d, (s, _) in default.items()} == {
        d: s for d, (s, _) in loose.items()
    }
    assert all(k for _, k in loose.values())  # every scored doc kept at 0.0
