"""Corpus-frequency segment scrubbing (operators/segment_dedup.py) — the
text-rewrite face of boilerplate dedup, pytest-gated until its catalog
entries land with round 13's free window slots.

Properties pinned:
1. a segment shared by more than ``max_doc_freq`` distinct documents is
   dropped from EVERY document; unshared segments survive in order;
2. NULL/untokenizable text passes through untouched (``was_modified``
   false); a fully-boilerplate document rebuilds to NULL, never an error;
3. the loss report's arithmetic is segment-tokenizer-exact (short final
   segments priced by their real token count);
4. the offender flag join carries no forced hint; AQE's runtime
   broadcast is pinned on real data, and the whole plan scans the source
   exactly three times;
5. both catalog-ready builders match their co-located DuckDB oracles on
   the REAL documents table at sf0.001 AND sf0.01 (the driver-gate
   mirror at the driver's own SF);
6. the whole operator equals a pure-Python reference on fuzzed corpora;
7. the streaming handler equals a pure-Python streaming reference for
   ANY partition of fuzzed docs into micro-batches (cumulative counts,
   per-batch offender decision, no retraction).
"""
from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.operators.segment_dedup import (
    boilerplate_loss_report,
    common_segments,
    doc_segments,
    scrub_common_segments,
)

_SCHEMA = "doc_id long, text string, source string"


def _docs(spark):
    rows = [
        # "the shared span" appears in docs 1-4 and 6 (>3 docs) at segment
        # boundaries; doc 5 contains the same words NOT segment-aligned.
        (1, "the shared span alpha beta gamma", "web"),
        (2, "the shared span delta echo foxtrot", "web"),
        (3, "the shared span golf hotel india", "books"),
        (4, "the shared span juliet kilo lima", "books"),
        (5, "prefix the shared span suffix word", "web"),
        (6, "the shared span", "web"),  # fully boilerplate
        (7, None, "web"),
        (8, "", "books"),
        (9, "12345 67890", "books"),  # untokenizable: no [a-z]+ runs
        (10, "unique words only here now friend", "web"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_segments_are_consecutive_token_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g", "s")], _SCHEMA
    )
    got = {
        (r.seg_idx, r.segment) for r in doc_segments(df, n=3).collect()
    }
    assert got == {(0, "a b c"), (1, "d e f"), (2, "g")}


def test_offenders_need_distinct_docs_not_occurrences(spark):
    # one doc repeating a segment 5 times is NOT an offender at
    # max_doc_freq=1; the same segment in 2 docs is.
    rep = spark.createDataFrame(
        [(1, "x y " * 5, "s")], _SCHEMA
    )
    assert common_segments(doc_segments(rep, n=2), 1).count() == 0
    two = spark.createDataFrame(
        [(1, "x y", "s"), (2, "x y", "s")], _SCHEMA
    )
    assert common_segments(doc_segments(two, n=2), 1).collect()[0].segment == "x y"


def test_scrub_drops_shared_segments_and_preserves_order(spark):
    out = {r.doc_id: r for r in scrub_common_segments(_docs(spark)).collect()}
    # docs 1-4 and 6 share the aligned "the shared span" (5 docs > 3)
    assert out[1].cleaned_text == "alpha beta gamma"
    assert out[1].was_modified is True and out[1].segments_dropped == 1
    assert out[2].cleaned_text == "delta echo foxtrot"
    # doc 5's tokens are shifted one position: its segments are
    # "prefix the shared" / "span suffix word" — NOT the offender string.
    assert out[5].was_modified is False
    assert out[5].cleaned_text == "prefix the shared span suffix word"
    # fully-boilerplate doc rebuilds to NULL, loss visible in the counts
    assert out[6].cleaned_text is None
    assert out[6].segments_total == 1 and out[6].segments_dropped == 1
    # unshared doc survives whole, in order
    assert out[10].cleaned_text == "unique words only here now friend"
    assert out[10].was_modified is False


def test_scrub_passthrough_null_and_untokenizable(spark):
    out = {r.doc_id: r for r in scrub_common_segments(_docs(spark)).collect()}
    assert out[7].cleaned_text is None and out[7].was_modified is False
    assert out[7].segments_total == 0 and out[7].segments_dropped == 0
    assert out[8].cleaned_text == "" and out[8].was_modified is False
    assert out[9].cleaned_text == "12345 67890"  # untouched, not retokenized
    assert out[9].was_modified is False


def test_loss_report_arithmetic(spark):
    rep = {
        r.source: r for r in boilerplate_loss_report(_docs(spark)).collect()
    }
    web = rep["web"]
    # web: docs 1, 2, 6 lose one 3-token segment each (doc 5 unmodified,
    # docs 7 untokenizable, doc 10 untouched)
    assert web.n_docs == 6 and web.docs_modified == 3
    assert web.segments_dropped == 3 and web.tokens_dropped == 9
    books = rep["books"]
    # books: docs 3, 4 lose one 3-token segment each; docs 8, 9 contribute
    # no segments at all
    assert books.n_docs == 4 and books.docs_modified == 2
    assert books.segments_dropped == 2 and books.tokens_dropped == 6
    assert books.segments_total == 4 and books.tokens_total == 12
    assert abs(books.dropped_token_frac - 6 / 12) < 1e-5


def test_loss_report_all_null_source_degrades(spark):
    docs = spark.createDataFrame(
        [(1, None, "void"), (2, "", "void")], _SCHEMA
    )
    r = boilerplate_loss_report(docs).first()
    assert r.n_docs == 2 and r.docs_modified == 0
    assert r.tokens_total == 0 and r.tokens_dropped == 0
    assert r.dropped_token_frac is None  # 0/0 → NULL, never a crash


def test_scrub_plan_aqe_broadcasts_offenders_and_scans_thrice(spark):
    """The offender flag join carries NO forced hint (an adversarially
    duplicated corpus makes every segment an offender — it must degrade
    to a shuffle join, not OOM), so the broadcast is pinned where it
    actually happens: AQE's runtime re-plan over the real small offender
    set.  The one-aggregate spelling also pins the scan budget: base +
    segment stream + the offenders aggregate's own pass = exactly 3
    source scans (the LEFT ANTI + separate-totals spelling cost 4 —
    r12 plan audit)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.segment_dedup import (
        scrub_documents,
    )

    df = scrub_documents(spark, "/root/testdata/sf0.001")
    static_plan = df._jdf.queryExecution().executedPlan().toString()
    assert static_plan.count("FileScan parquet") == 3
    # collect() (NOT a noop write, which runs a separate QueryExecution
    # and leaves this one un-finalized) finalizes THIS df's adaptive plan
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "BroadcastHashJoin" in final_plan


def test_loss_report_respects_source_col(spark):
    renamed = _docs(spark).withColumnRenamed("source", "domain")
    rep = {
        r.domain: r
        for r in boilerplate_loss_report(renamed, source_col="domain").collect()
    }
    assert rep["web"].docs_modified == 3 and rep["books"].docs_modified == 2


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "builder_name, oracle_name",
    [
        ("scrub_documents", "ORACLE_SCRUB_DOCUMENTS"),
        ("documents_boilerplate_loss", "ORACLE_BOILERPLATE_LOSS"),
    ],
)
def test_catalog_ready_builders_match_their_oracles(
    spark, builder_name, oracle_name, sf_dir
):
    """Differential gate for the round-13 registration: run each catalog-
    ready builder against its co-located DuckDB oracle over the REAL
    documents table at sf0.001 AND the driver's own sf0.01 — the same
    Spark-vs-DuckDB compare the driver applies, so the r13 QuerySpec
    lands pre-verified at the gate's scale."""
    from hadoop_pyspark_streaming_analytics_spark.operators import (
        segment_dedup as sdd,
    )
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import QuerySpec
    from tests.oracle import compare

    spec = QuerySpec(
        f"sdd_{builder_name}",
        getattr(sdd, builder_name),
        getattr(sdd, oracle_name),
    )
    compare(spec, spark, sf_dir)


# ---------------------------------------------------------------------------
# Property pin (hypothesis, repo conventions: derandomized, 12 examples)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocabulary forces real segment collisions across fuzzed docs.
_texts = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "Dd", "1"]),
            max_size=12,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=8,
)


def _ref_scrub(values, n, max_doc_freq):
    """Pure-Python reference: segment, count distinct-doc frequency, drop,
    reassemble — the whole operator in ~15 lines."""
    segs = {}
    for i, v in enumerate(values):
        t = re.findall("[a-z]+", (v or "").lower())
        segs[i] = (
            [
                " ".join(t[j * n : (j + 1) * n])
                for j in range(math.ceil(len(t) / n))
            ]
            if t
            else None
        )
    freq: dict[str, set] = {}
    for i, s in segs.items():
        for seg in s or []:
            freq.setdefault(seg, set()).add(i)
    offenders = {s for s, docs in freq.items() if len(docs) > max_doc_freq}
    out = {}
    for i, v in enumerate(values):
        if segs[i] is None:
            out[i] = (0, 0, v, False)
            continue
        kept = [s for s in segs[i] if s not in offenders]
        dropped = len(segs[i]) - len(kept)
        out[i] = (
            len(segs[i]),
            dropped,
            " ".join(kept) if kept else None,
            dropped > 0,
        )
    return out


@given(_texts, st.integers(1, 3), st.integers(1, 2))
@_SETTINGS
def test_scrub_matches_python_reference(spark, values, n, max_doc_freq):
    df = spark.createDataFrame(
        [(i, v, "s") for i, v in enumerate(values)], _SCHEMA
    )
    got = {
        r.doc_id: (
            r.segments_total,
            r.segments_dropped,
            r.cleaned_text,
            r.was_modified,
        )
        for r in scrub_common_segments(df, n=n, max_doc_freq=max_doc_freq).collect()
    }
    assert got == _ref_scrub(values, n, max_doc_freq)


# ---------------------------------------------------------------------------
# Streaming handler (streaming/extensions.foreach_batch_segment_scrub)
# ---------------------------------------------------------------------------


def _scrub_out(spark, out):
    return {
        r.doc_id: r
        for r in spark.read.option("basePath", out).parquet(out).collect()
    }


def test_streaming_scrub_single_batch_equals_batch_operator(spark, tmp_path):
    """With an empty store, one micro-batch through the handler must equal
    the batch operator on the same docs — the composition contract."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_segment_scrub,
    )

    docs = _docs(spark)
    apply_fn = foreach_batch_segment_scrub(
        str(tmp_path / "store"), str(tmp_path / "out")
    )
    apply_fn(docs.select("doc_id", "text"), 0)
    got = _scrub_out(spark, str(tmp_path / "out"))
    want = {r.doc_id: r for r in scrub_common_segments(_docs(spark)).collect()}
    assert set(got) == set(want)
    for i in want:
        assert (
            got[i].cleaned_text,
            got[i].segments_total,
            got[i].segments_dropped,
            got[i].was_modified,
        ) == (
            want[i].cleaned_text,
            want[i].segments_total,
            want[i].segments_dropped,
            want[i].was_modified,
        )


def test_streaming_scrub_cumulative_threshold_and_no_retraction(
    spark, tmp_path
):
    """A segment under the threshold in batch 0 crosses it in batch 1:
    batch-1 docs are scrubbed, batch-0 docs stay as emitted (the
    admit-the-first-copy semantics), and the store's counts equal the
    batch operator's over the union."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_segment_scrub,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    apply_fn = foreach_batch_segment_scrub(store, out, max_doc_freq=3)
    b0 = spark.createDataFrame(
        [(i, "the shared span unique%d tail" % i) for i in range(1, 4)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(4, "the shared span fresh words")], "doc_id long, text string"
    )
    apply_fn(b0, 0)
    got0 = _scrub_out(spark, out)
    assert all(not got0[i].was_modified for i in (1, 2, 3))  # 3 docs = at threshold
    apply_fn(b1, 1)
    got = _scrub_out(spark, out)
    # batch-1 doc sees cumulative count 4 > 3 → scrubbed
    assert got[4].was_modified and got[4].cleaned_text == "fresh words"
    # batch-0 docs were NOT retracted (already emitted unmodified)
    assert all(not got[i].was_modified for i in (1, 2, 3))
    # store counts == batch-operator counts over the union
    union = b0.unionByName(b1).withColumn("source", F.lit("s"))
    from hadoop_pyspark_streaming_analytics_spark.operators.segment_dedup import (
        doc_segments,
    )

    want_counts = {
        (r.segment, r.n_docs)
        for r in doc_segments(union)
        .groupBy("segment")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .collect()
    }
    got_counts = {
        (r.segment, r.n_docs)
        for r in spark.read.option("basePath", store)
        .parquet(store)
        .groupBy("segment")
        .agg(F.sum("n_docs").alias("n_docs"))
        .collect()
    }
    assert got_counts == want_counts


def test_streaming_scrub_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch (failure recovery) must neither double-count its
    own store rows nor change its scrub decisions."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_segment_scrub,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    apply_fn = foreach_batch_segment_scrub(store, out, max_doc_freq=3)
    b0 = spark.createDataFrame(
        [(i, "the shared span unique%d tail" % i) for i in range(1, 4)],
        "doc_id long, text string",
    )
    apply_fn(b0, 0)
    first = {
        (i, r.cleaned_text, r.was_modified)
        for i, r in _scrub_out(spark, out).items()
    }
    apply_fn(b0, 0)  # replay
    second = {
        (i, r.cleaned_text, r.was_modified)
        for i, r in _scrub_out(spark, out).items()
    }
    assert first == second
    total = (
        spark.read.option("basePath", store)
        .parquet(store)
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    # 3 docs × their segment counts, counted ONCE despite the replay
    assert total == sum(
        r.n_docs
        for r in spark.read.option("basePath", store)
        .parquet(store)
        .filter("batch_id = 0")
        .collect()
    )


def _ref_stream_scrub(batches, n, max_doc_freq):
    """Pure-Python streaming reference: cumulative per-segment distinct-doc
    counts across batches; each batch's offenders use prior + own counts."""
    prior: dict[str, int] = {}
    out = {}
    for batch in batches:
        segs = {}
        for doc_id, v in batch:
            t = re.findall("[a-z]+", (v or "").lower())
            segs[doc_id] = (
                [
                    " ".join(t[j * n : (j + 1) * n])
                    for j in range(math.ceil(len(t) / n))
                ]
                if t
                else None
            )
        batch_counts: dict[str, int] = {}
        for s in segs.values():
            for seg in set(s or []):
                batch_counts[seg] = batch_counts.get(seg, 0) + 1
        offenders = {
            seg
            for seg in set(prior) | set(batch_counts)
            if prior.get(seg, 0) + batch_counts.get(seg, 0) > max_doc_freq
        }
        for doc_id, v in batch:
            if segs[doc_id] is None:
                out[doc_id] = (0, 0, v, False)
                continue
            kept = [s for s in segs[doc_id] if s not in offenders]
            dropped = len(segs[doc_id]) - len(kept)
            out[doc_id] = (
                len(segs[doc_id]),
                dropped,
                " ".join(kept) if kept else None,
                dropped > 0,
            )
        for seg, c in batch_counts.items():
            prior[seg] = prior.get(seg, 0) + c
    return out


_batches = st.lists(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=9
            ).map(" ".join),
        ),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


@given(_batches, st.integers(1, 2), st.integers(1, 2))
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_streaming_scrub_matches_python_reference(
    spark, batches, n, max_doc_freq
):
    """For ANY partition of docs into micro-batches, the handler's output
    equals a pure-Python streaming reference (cumulative counts, per-batch
    offender decision, no retraction) — the streaming twin of the batch
    operator's reference property."""
    import shutil
    import tempfile

    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_segment_scrub,
    )

    root = tempfile.mkdtemp(prefix="seg_scrub_prop_")
    try:
        store, out = f"{root}/store", f"{root}/out"
        apply_fn = foreach_batch_segment_scrub(
            store, out, n=n, max_doc_freq=max_doc_freq
        )
        next_id = 0
        ided_batches = []
        for batch in batches:
            ided = [(next_id + i, v) for i, v in enumerate(batch)]
            next_id += len(batch)
            ided_batches.append(ided)
        for bid, ided in enumerate(ided_batches):
            apply_fn(
                spark.createDataFrame(ided, "doc_id long, text string"), bid
            )
        got = {
            r.doc_id: (
                r.segments_total,
                r.segments_dropped,
                r.cleaned_text,
                r.was_modified,
            )
            for r in spark.read.option("basePath", out)
            .parquet(out)
            .collect()
        }
        assert got == _ref_stream_scrub(ided_batches, n, max_doc_freq)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_streaming_scrub_store_compaction_transparent(spark, tmp_path):
    """Folding the frequency store into a pre-aggregated base must be
    invisible to the handler: the authority counts survive (the base's
    negative id is always < N), later batches scrub identically, and the
    base holds one row per distinct segment."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        compact_segment_store,
        foreach_batch_segment_scrub,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    apply_fn = foreach_batch_segment_scrub(store, out, max_doc_freq=3)
    b0 = spark.createDataFrame(
        [(i, "the shared span unique%d tail" % i) for i in range(1, 3)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "the shared span more words")], "doc_id long, text string"
    )
    apply_fn(b0, 0)
    apply_fn(b1, 1)
    folded = compact_segment_store(spark, store, keep_latest=1)
    assert folded == 1  # batch 0 folded; batch 1 kept for replay safety
    base = (
        spark.read.option("basePath", store)
        .parquet(store)
        .filter("batch_id < 0")
    )
    segs = base.groupBy("segment").count().collect()
    assert segs and all(r["count"] == 1 for r in segs)  # pre-aggregated
    # a post-compaction batch pushes "the shared span" to 4 distinct docs
    # (2 folded + 1 live append + itself) → scrubbed
    b2 = spark.createDataFrame(
        [(4, "the shared span fresh tokens")], "doc_id long, text string"
    )
    apply_fn(b2, 2)
    got = _scrub_out(spark, out)
    assert got[4].was_modified and got[4].cleaned_text == "fresh tokens"
    assert not got[1].was_modified and not got[3].was_modified
