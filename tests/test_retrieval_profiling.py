"""Semantic invariants and plan-shape guards for the retrieval tier
(BM25 / hybrid RRF / PRF expansion) and the profiling/drift tier.

Exactness is gated by the DuckDB oracles (test_catalog_oracle); these
tests pin the properties an oracle diff can't see — formula consistency,
mathematical invariants (PSI terms are non-negative by construction),
the approx profiling twin, and the plans staying scan-shaped.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.operators import (
    profiling,
    retrieval,
)
from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table


def plan_of(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_contiguous_and_terms_bounded(spark, sf_dir):
    rows = retrieval.bm25_rank(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(1 <= r.n_terms <= len(retrieval.BM25_QUERY) for r in rows)
    assert all(r.score > 0 for r in rows)
    # descending by score, doc_id ascending on ties
    for a, b in zip(rows, rows[1:]):
        assert (-a.score, a.doc_id) < (-b.score, b.doc_id)


def test_bm25_top_doc_contains_query_terms(spark, sf_dir):
    top = retrieval.bm25_rank(spark, sf_dir, k=1).collect()[0]
    text = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == top.doc_id)
        .collect()[0]
        .text.lower()
    )
    hits = [t for t in retrieval.BM25_QUERY if t in text.split()]
    assert len(hits) == top.n_terms


def test_bm25_plan_is_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(retrieval.bm25_rank(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Hybrid RRF
# ---------------------------------------------------------------------------


def test_rrf_score_matches_rank_formula(spark, sf_dir):
    rows = retrieval.hybrid_rrf_search(spark, sf_dir).collect()
    assert rows, "hybrid search returned nothing"
    for r in rows:
        expect = sum(
            1.0 / (retrieval.RRF_K + rank)
            for rank in (r.lex_rank, r.vec_rank)
            if rank is not None
        )
        assert abs(r.rrf_score - expect) < 2e-6
        assert r.lex_rank is not None or r.vec_rank is not None
    # fused ordering is by rrf_score desc
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_arms_beat_single_arm_at_same_rank(spark, sf_dir):
    """A doc retrieved by BOTH arms at rank r must outscore a doc one arm
    retrieved at the same r — the monotonicity RRF exists for."""
    rows = retrieval.hybrid_rrf_search(spark, sf_dir).collect()
    both = [r for r in rows if r.lex_rank is not None and r.vec_rank is not None]
    single = [r for r in rows if (r.lex_rank is None) != (r.vec_rank is None)]
    for b in both:
        for s in single:
            s_rank = s.lex_rank if s.lex_rank is not None else s.vec_rank
            if s_rank >= min(b.lex_rank, b.vec_rank):
                assert b.rrf_score > s.rrf_score - 2e-6


def test_hybrid_plan_broadcasts_query_vector(spark, sf_dir):
    plan = plan_of(retrieval.hybrid_rrf_search(spark, sf_dir))
    assert "CartesianProduct" not in plan  # 1-row sides ride BNLJ


# ---------------------------------------------------------------------------
# PRF expansion
# ---------------------------------------------------------------------------


def test_prf_excludes_query_and_stop_words(spark, sf_dir):
    from hadoop_pyspark_streaming_analytics_spark.operators.text import (
        STOP_WORDS,
    )

    rows = retrieval.prf_expand_query(spark, sf_dir).collect()
    assert rows, "no expansion terms"
    toks = {r.token for r in rows}
    assert not toks & set(retrieval.BM25_QUERY)
    assert not toks & set(STOP_WORDS)
    assert all(1 <= r.fb_docs <= retrieval.PRF_FEEDBACK_R for r in rows)
    assert all(r.weight > 0 for r in rows)


# ---------------------------------------------------------------------------
# Column profile
# ---------------------------------------------------------------------------


def test_column_profile_consistent_with_direct_aggregates(spark, sf_dir):
    rows = {r.col_name: r for r in profiling.column_profile(spark, sf_dir).collect()}
    assert set(rows) == {c for c, _ in profiling.PROFILE_COLUMNS}
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    direct = orders.agg(
        F.count("o_custkey").alias("nn"),
        F.count_distinct("o_orderstatus").alias("nd"),
        F.min("o_orderkey").alias("mn"),
    ).collect()[0]
    assert all(r.n_rows == n for r in rows.values())
    assert rows["o_custkey"].n_null == n - direct.nn
    assert rows["o_orderstatus"].n_distinct == direct.nd
    assert rows["o_orderkey"].min_value == str(direct.mn)


def test_column_profile_approx_twin_same_schema_close_cardinality(
    spark, sf_dir
):
    exact = {
        r.col_name: r for r in profiling.column_profile(spark, sf_dir).collect()
    }
    approx_df = profiling.column_profile(spark, sf_dir, approx=True)
    approx = {r.col_name: r for r in approx_df.collect()}
    assert approx_df.columns == [
        "col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value",
    ]
    for c in exact:
        e, a = exact[c].n_distinct, approx[c].n_distinct
        assert abs(a - e) <= max(2, 0.1 * e), (c, e, a)
        # everything but the HLL cardinality is identical
        assert exact[c].n_null == approx[c].n_null
        assert exact[c].min_value == approx[c].min_value


def test_column_profile_is_single_scan(spark, sf_dir):
    plan = plan_of(profiling.column_profile(spark, sf_dir))
    # formatted mode prints each node twice (tree + detail): one scan.
    assert plan.count("Scan parquet") == 2


# ---------------------------------------------------------------------------
# Drift / PSI
# ---------------------------------------------------------------------------


def test_numeric_psi_terms_nonnegative_and_total_is_sum(spark, sf_dir):
    rows = profiling.numeric_drift_psi(spark, sf_dir).collect()
    assert [r.bin_idx for r in sorted(rows, key=lambda r: r.bin_idx)] == list(
        range(profiling.PSI_BINS)
    )
    # (pc-pr) and ln(pc/pr) always share sign -> every term >= 0
    assert all(r.psi_term >= -1e-9 for r in rows)
    total = rows[0].psi_total
    assert all(abs(r.psi_total - total) < 1e-12 for r in rows)
    assert abs(total - sum(r.psi_term for r in rows)) < 1e-4
    assert total >= -1e-9


def test_numeric_psi_bins_partition_the_values(spark, sf_dir):
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import (
        load_events,
    )

    rows = profiling.numeric_drift_psi(spark, sf_dir).collect()
    n_binned = sum(r.n_ref + r.n_cur for r in rows)
    n_values = load_events(spark, sf_dir).filter(F.col("value").isNotNull()).count()
    assert n_binned == n_values


def test_categorical_psi_invariants(spark, sf_dir):
    rows = profiling.categorical_drift_report(spark, sf_dir).collect()
    assert rows
    assert all(r.psi_term >= -1e-9 for r in rows)
    # fractions are Laplace-smoothed: strictly positive, roughly sum to 1
    for frac in ("ref_frac", "cur_frac"):
        s = sum(getattr(r, frac) for r in rows)
        assert all(getattr(r, frac) > 0 for r in rows)
        assert abs(s - 1.0) < 0.01
    total = rows[0].psi_total
    assert abs(total - sum(r.psi_term for r in rows)) < 1e-4


def test_psi_is_zero_for_identical_distributions(spark, sf_dir, tmp_path):
    """Synthetic check that the score MEANS drift: duplicate the same
    values into both halves -> PSI ~ 0 (only Laplace noise)."""
    # pairs (2k, 2k+1) share a value and land one per half -> identical mix
    base = [
        (
            k,
            "2024-01-01 00:00:00" if k % 2 == 0 else "2024-01-03 00:00:00",
            float((k // 2) % 50),
        )
        for k in range(1000)
    ]
    ev = (
        spark.createDataFrame(base, "event_id long, ts_s string, value double")
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("x").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        )
    )
    out = str(tmp_path / "events.parquet")
    ev.write.parquet(out)
    rows = profiling.numeric_drift_psi(spark, str(tmp_path)).collect()
    # identical halves: every bin's ref/cur counts match exactly
    assert all(r.n_ref == r.n_cur for r in rows)
    assert abs(rows[0].psi_total) < 1e-6


def _psi_fixture_events(spark, ref_vals, cur_vals):
    """events-shaped frame: ref_vals land in the first time half,
    cur_vals in the second (midpoint split at 2024-01-02)."""
    rows = [(k, "2024-01-01 00:00:00", float(v)) for k, v in enumerate(ref_vals)]
    rows += [
        (10_000 + k, "2024-01-03 00:00:00", float(v))
        for k, v in enumerate(cur_vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("x").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )


def test_numeric_psi_degenerate_constant_reference(spark, sf_dir, tmp_path):
    """ADVICE r6: a CONSTANT reference half used to make the bin width
    (rmax-rmin)/n = 0 and the bin expression 0/0 = NaN (Spark sorts NaN
    greatest -> silent top-bin pileup).  With the width-floor guard the
    report is defined: the whole reference mass sits in bin 0, drifted
    current values clamp through the normal edge bins, no NaN anywhere,
    and the DuckDB oracle (same CASE guard) agrees bin-for-bin."""
    import math

    import duckdb

    from hadoop_pyspark_streaming_analytics_spark.operators.profiling import (
        _numeric_psi_from,
    )
    from hadoop_pyspark_streaming_analytics_spark.plans.llm_catalog import (
        _numeric_psi_sql,
    )

    ev = _psi_fixture_events(
        spark, ref_vals=[7.0] * 200, cur_vals=[7.0] * 100 + [9.5] * 100
    )
    out = str(tmp_path / "events.parquet")
    ev.write.parquet(out)
    rows = sorted(
        profiling.numeric_drift_psi(spark, str(tmp_path)).collect(),
        key=lambda r: r.bin_idx,
    )
    assert [r.bin_idx for r in rows] == list(range(profiling.PSI_BINS))
    # reference mass entirely in bin 0; current: equal values join bin 0,
    # larger values bin at the unit-width floor (floor((9.5-7)/1.0) = 2)
    assert rows[0].n_ref == 200 and sum(r.n_ref for r in rows) == 200
    assert rows[0].n_cur == 100
    assert rows[2].n_cur == 100
    assert sum(r.n_cur for r in rows) == 200
    for r in rows:
        for v in (r.ref_frac, r.cur_frac, r.psi_term, r.psi_total):
            assert math.isfinite(v), rows
    assert rows[0].psi_total > 0.1  # a 50% mass shift reads as drift

    # oracle parity on the degenerate fixture (the CASE guard twin)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{out}/*.parquet')"
        )
        want = con.execute(_numeric_psi_sql()).df()
    finally:
        con.close()
    want = want.sort_values("bin_idx", ignore_index=True)
    assert [int(b) for b in want["bin_idx"]] == [r.bin_idx for r in rows]
    assert [int(n) for n in want["n_ref"]] == [r.n_ref for r in rows]
    assert [int(n) for n in want["n_cur"]] == [r.n_cur for r in rows]
    assert all(
        abs(float(t) - r.psi_term) < 1e-9
        for t, r in zip(want["psi_term"], rows)
    )

    # the injectable core accepts a constructed frame directly too
    e = ev.select("value", F.col("event_id") < 10_000).toDF("value", "is_ref")
    direct = sorted(
        _numeric_psi_from(spark, e).collect(), key=lambda r: r.bin_idx
    )
    assert [(r.n_ref, r.n_cur) for r in direct] == [
        (r.n_ref, r.n_cur) for r in rows
    ]


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_round_never_reshuffles_edge_side(spark, sf_dir):
    """VERDICT r6 item 5: the per-round join must reuse the edge frame's
    one-time hash partitioning on ``u``.  With broadcast disabled (so the
    join is forced to the sort-merge path a 100 TB graph would take), the
    SMJ's edge child must read the cache directly — no Exchange, no Sort
    — leaving exactly two shuffles per round: the node-grain rank table
    and the groupBy(v) combine."""
    import re

    from pyspark import StorageLevel

    from hadoop_pyspark_streaming_analytics_spark.operators import graph

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        raw = spark.createDataFrame(
            [(i, (i * 7) % 50) for i in range(200)], "u long, v long"
        )
        sym = raw.repartition("u").persist(StorageLevel.MEMORY_AND_DISK)
        sym.count()
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
        edges = sym.join(deg, "u").persist(StorageLevel.MEMORY_AND_DISK)
        edges.count()
        n = sym.select("u").distinct().agg(F.count(F.lit(1)).alias("n_nodes"))
        ranks = (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("pr", F.lit(0.1))
            .localCheckpoint(eager=True)
        )
        rnd = graph._pagerank_round(edges, ranks, n, 0.85)
        plan = rnd._sc._jvm.PythonSQLUtils.explainString(
            rnd._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree
        # the span from the join down to its edge-cache child: no Exchange
        m = re.search(
            r"SortMergeJoin Inner.*?InMemoryTableScan", tree, re.DOTALL
        )
        assert m, tree
        assert "Exchange" not in m.group(0), m.group(0)
        assert "Sort (" not in m.group(0), m.group(0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        sym.unpersist()
        edges.unpersist()


def test_pagerank_mass_conserved_and_nodes_match_graph(spark, sf_dir):
    """Undirected graph -> no dangling mass: sum(pagerank) == 1 (to
    rounding); node set == the candidate graph's node set; degree >= 1."""
    from hadoop_pyspark_streaming_analytics_spark.operators import graph
    from hadoop_pyspark_streaming_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    rows = graph.pagerank_similar_docs(spark, sf_dir).collect()
    assert rows, "empty candidate graph"
    assert all(r.degree >= 1 for r in rows)
    assert all(r.pagerank > 0 for r in rows)
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-4 * len(rows)
    cand = minhash_lsh_candidates(spark, sf_dir).collect()
    nodes = {c.doc_a for c in cand} | {c.doc_b for c in cand}
    assert {r.doc_id for r in rows} == nodes


def test_pagerank_releases_its_caches(spark, sf_dir):
    """pagerank_similar_docs persists the edge frames internally; it
    must unpersist them before returning (ADVICE r7: catalog sweeps run
    the entry repeatedly in one shared JVM — leaked MEMORY_AND_DISK
    blocks are exactly the cross-tier cache debt bench.py drains).  The
    returned frame is checkpointed, so collecting it after release must
    still work without replaying the LSH pipeline."""
    from hadoop_pyspark_streaming_analytics_spark.operators import graph

    def plain_persisted_ids(sc) -> set[int]:
        """Persistent RDD ids that are NOT localCheckpoint blocks.
        Checkpoint blocks are the flat-lineage mechanism every iterative
        operator here uses; they are released by the ContextCleaner when
        their frames drop out of scope.  A plain persist() surviving the
        call is the actual leak."""
        out, it = set(), sc.getPersistentRDDs().iterator()
        while it.hasNext():
            t = it.next()
            if not t._2().isLocallyCheckpointed():
                out.add(t._1())
        return out

    sc = spark.sparkContext._jsc.sc()
    before = plain_persisted_ids(sc)
    out = graph.pagerank_similar_docs(spark, sf_dir)
    assert plain_persisted_ids(sc) == before
    assert out.count() > 0  # checkpointed result survives the unpersist


def test_pagerank_favors_high_degree_on_average(spark, sf_dir):
    """Rank mass flows toward hubs: the mean pagerank of above-median-
    degree nodes must exceed the mean of below-median ones."""
    from hadoop_pyspark_streaming_analytics_spark.operators import graph

    rows = graph.pagerank_similar_docs(spark, sf_dir).collect()
    degs = sorted(r.degree for r in rows)
    med = degs[len(degs) // 2]
    hi = [r.pagerank for r in rows if r.degree > med]
    lo = [r.pagerank for r in rows if r.degree < med]
    if hi and lo:  # degenerate all-equal-degree graphs skip the split
        assert sum(hi) / len(hi) > sum(lo) / len(lo)


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


def test_mmr_matches_independent_numpy_greedy(spark, sf_dir):
    """Recompute the whole greedy MMR selection from raw embeddings with
    numpy (independent of every Spark expression) and require the same
    picks, in order, with matching scores."""
    import numpy as np

    out = retrieval.mmr_rerank(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    qid, lam = retrieval.HYBRID_QUERY_VEC_ID, retrieval.MMR_LAMBDA
    q = emb[qid]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel = {
        i: round(cos(v, q) + 1e-8, 6) for i, v in emb.items() if i != qid
    }
    short = sorted(rel, key=lambda i: (-rel[i], i))[: retrieval.MMR_SHORTLIST]
    picks, sel = [], []
    for step in range(1, retrieval.MMR_SELECT_K + 1):
        best = None
        for c in short:
            if c in sel:
                continue
            if not sel:
                score = round(lam * rel[c] + 1e-8, 6)
            else:
                mx = max(round(cos(emb[c], emb[s]) + 1e-8, 6) for s in sel)
                score = round(lam * rel[c] - (1 - lam) * mx + 1e-8, 6)
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        sel.append(best[1])
        picks.append((step, best[1], rel[best[1]], best[2]))
    got = [(r.rnk, r.doc_id, r.relevance, r.mmr_score) for r in out]
    assert got == picks


def test_mmr_selects_distinct_shortlist_members(spark, sf_dir):
    out = retrieval.mmr_rerank(spark, sf_dir).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) == retrieval.MMR_SELECT_K
    assert [r.rnk for r in out] == list(range(1, retrieval.MMR_SELECT_K + 1))


# ---------------------------------------------------------------------------
# Composed serving pipeline: hybrid RRF -> MMR (VERDICT r6 item 7)
# ---------------------------------------------------------------------------


def test_hybrid_mmr_pipeline_matches_independent_greedy(spark, sf_dir):
    """Normalize + greedy-select in plain Python from the (separately
    oracle-gated) fused shortlist and raw embeddings; the composed
    pipeline must make the same picks with the same scores."""
    import numpy as np

    out = retrieval.hybrid_mmr_pipeline(spark, sf_dir).collect()
    fused = {
        r.doc_id: r.rrf_score
        for r in retrieval.hybrid_rrf_search(spark, sf_dir).collect()
    }
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    lam = retrieval.MMR_LAMBDA
    mn, mx = min(fused.values()), max(fused.values())
    rel = {
        d: round(
            (1.0 if mx == mn else (s - mn) / (mx - mn)) + 1e-8, 6
        )
        for d, s in fused.items()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    picks, sel = [], []
    for step in range(1, retrieval.MMR_SELECT_K + 1):
        best = None
        for c in sorted(fused):
            if c in sel:
                continue
            if not sel:
                score = round(lam * rel[c] + 1e-8, 6)
            else:
                mxs = max(
                    round(cos(emb[c], emb[s]) + 1e-8, 6) for s in sel
                )
                score = round(lam * rel[c] - (1 - lam) * mxs + 1e-8, 6)
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        sel.append(best[1])
        picks.append((step, best[1], fused[best[1]], rel[best[1]], best[2]))
    got = [
        (r.rnk, r.doc_id, r.rrf_score, r.relevance, r.mmr_score) for r in out
    ]
    assert got == picks
    # sanity on the shape: picks come from the fused shortlist, first pick
    # is the top-fused doc (rel = 1.0), relevances normalized into [0, 1]
    assert {r.doc_id for r in out} <= set(fused)
    assert out[0].relevance == round(1.0 + 1e-8, 6)
    assert all(0.0 <= r.relevance <= 1.0 + 1e-6 for r in out)


def test_hybrid_mmr_shortlist_attach_is_one_embeddings_scan(spark, sf_dir):
    """The MMR stage's only corpus-sized addition over the fusion arms is
    the vector-attach broadcast join: beyond the cosine arm's corpus scan
    and its 1-row query-vector lookup, the pre-checkpoint shortlist plan
    adds exactly one embeddings scan and never re-scans documents (the tf
    table is checkpointed upstream)."""
    sl = retrieval._hybrid_mmr_shortlist(spark, sf_dir)
    plan = plan_of(sl)
    # exactly 3 embeddings scans: the 1-row query-vector lookup (filter
    # pushed), the cosine arm's corpus scan, and the attach — NOT one per
    # MMR step, and no second corpus pass sneaks in via the fusion join
    assert plan.count("embeddings.parquet") == 3, plan
    assert "documents.parquet" not in plan, plan
    # the 20-row fused side is broadcast, not shuffled, into the attach
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# Materialized text index
# ---------------------------------------------------------------------------


def test_bm25_indexed_parity_with_from_corpus(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tindex")
    retrieval.materialize_text_index(spark, sf_dir, path)
    direct = retrieval.bm25_rank(spark, sf_dir).collect()
    indexed = retrieval.bm25_rank_indexed(spark, path).collect()
    assert direct == indexed


def test_bm25_indexed_pushes_token_filter_into_postings_scan(
    spark, sf_dir, tmp_path
):
    """The 100 TB point of the index: the term predicate must reach the
    token-sorted postings scan as a pushed filter (file/row-group pruning
    via min/max), and the scan must not read doc-grain columns it doesn't
    need."""
    path = str(tmp_path / "tindex")
    retrieval.materialize_text_index(spark, sf_dir, path)
    plan = plan_of(retrieval.bm25_rank_indexed(spark, path))
    postings_scan = [
        b
        for b in plan.split("\n\n")
        if "postings" in b and "Scan parquet" in b and "PushedFilters" in b
    ]
    assert postings_scan, "no pushed filter on the postings scan"
    assert any("token" in b.split("PushedFilters")[1].splitlines()[0]
               for b in postings_scan)


def test_text_index_postings_are_token_clustered(spark, sf_dir, tmp_path):
    """Range partition + sort must actually cluster: each postings file's
    (min, max) token range must not overlap any other file's."""
    import pyarrow.parquet as pq
    from pathlib import Path

    path = str(tmp_path / "tindex")
    retrieval.materialize_text_index(spark, sf_dir, path)
    spans = []
    for f in Path(path, "postings", "batch_id=-1").glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["token"]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (_, amax), (bmin, _) in zip(spans, spans[1:]):
        assert amax <= bmin, f"overlapping token ranges: {amax} > {bmin}"


# ---------------------------------------------------------------------------
# Streaming drift monitor
# ---------------------------------------------------------------------------


def test_drift_monitor_matches_batch_report_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Feed the monitor the midpoint report's own inputs — reference
    profile = first-half counts, one micro-batch = the whole second half —
    and the per-batch report must EQUAL categorical_drift_report's rows
    (shared psi_report math, same counts).  Replaying the batch must
    overwrite, not append; a second batch with an unseen category must
    produce a finite positive psi row for it."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_drift_monitor,
    )

    e = profiling._events_with_split(spark, sf_dir)
    ref = (
        e.filter("is_ref")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    cur_half = e.filter(~F.col("is_ref")).select("event_type")
    out = str(tmp_path / "drift")
    apply_fn = foreach_batch_drift_monitor(ref, out)
    apply_fn(cur_half, 0)
    apply_fn(cur_half, 0)  # replay: overwrite discipline
    got = {
        r.event_type: r
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    want = {
        r.event_type: r
        for r in profiling.categorical_drift_report(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t].n_ref == want[t].n_ref
        assert got[t].n_cur == want[t].n_cur
        assert got[t].psi_term == want[t].psi_term
        assert got[t].psi_total == want[t].psi_total

    # unseen category in a later batch: finite positive drift, no crash
    novel = cur_half.limit(50).withColumn("event_type", F.lit("brand_new"))
    apply_fn(novel, 1)
    rows = {
        r.event_type: r
        for r in spark.read.parquet(f"{out}/batch_id=1").collect()
    }
    assert "brand_new" in rows
    assert rows["brand_new"].n_ref == 0
    assert rows["brand_new"].psi_term > 0
    assert math.isfinite(rows["brand_new"].psi_total)


def test_profile_monitor_matches_batch_profile_and_replays(
    spark, sf_dir, tmp_path
):
    """The streaming profile monitor: a micro-batch's per-column report
    must EQUAL profile_frame over the same static frame (shared core);
    replaying a batch overwrites; columns absent from the batch schema
    are skipped, not crashed; the approx default still produces the
    same schema with near-exact cardinalities."""
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_profile_monitor,
    )

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "profiles")
    apply_fn = foreach_batch_profile_monitor(out, approx=False)
    apply_fn(orders, 0)
    apply_fn(orders, 0)  # replay: overwrite discipline
    got = {
        r.col_name: r
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    want = {
        r.col_name: r
        for r in profiling.profile_frame(orders).collect()
    }
    assert set(got) == {c for c, _ in profiling.PROFILE_COLUMNS}
    for c in want:
        for field in ("n_rows", "n_null", "n_distinct", "min_value", "max_value"):
            assert getattr(got[c], field) == getattr(want[c], field), (c, field)

    # a batch missing some profiled columns: those columns are skipped
    thin = orders.select("o_orderkey", "o_orderstatus")
    apply_fn(thin, 1)
    rows = spark.read.parquet(f"{out}/batch_id=1").collect()
    assert {r.col_name for r in rows} == {"o_orderkey", "o_orderstatus"}

    # approx default: same schema, HLL cardinality within 10% (Spark's
    # default rsd is 0.05, ~2 sigma headroom)
    apply_fn_approx = foreach_batch_profile_monitor(out)
    apply_fn_approx(orders, 2)
    approx_rows = {
        r.col_name: r
        for r in spark.read.parquet(f"{out}/batch_id=2").collect()
    }
    for c, r in approx_rows.items():
        exact = want[c].n_distinct
        assert abs(r.n_distinct - exact) <= max(1, 0.10 * exact), c
        assert r.min_value == want[c].min_value
        assert r.max_value == want[c].max_value


def test_quantile_shift_drift_invariants(spark, sf_dir, tmp_path):
    """Probe rows come back in quantile order with monotone ref/cur
    values; an identical-halves fixture reports ~zero shift everywhere;
    a constant middle (degenerate IQR) reports shift_iqr 0.0, not a
    division blow-up."""
    rows = profiling.quantile_shift_drift(spark, sf_dir).collect()
    assert [r.quantile for r in rows] == sorted(profiling.DRIFT_QS)
    refs = [r.ref_value for r in rows]
    curs = [r.cur_value for r in rows]
    assert refs == sorted(refs) and curs == sorted(curs)
    for r in rows:
        assert abs(r.abs_shift - round(r.cur_value - r.ref_value, 4)) < 1e-3

    # identical halves -> every shift ~0
    ev = _psi_fixture_events(
        spark,
        ref_vals=[float(v % 50) for v in range(500)],
        cur_vals=[float(v % 50) for v in range(500)],
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    same = profiling.quantile_shift_drift(spark, str(tmp_path)).collect()
    for r in same:
        assert abs(r.abs_shift) < 1e-6 and abs(r.shift_iqr) < 1e-6

    # constant reference half -> IQR 0 -> guarded shift_iqr
    tmp2 = tmp_path / "const"
    tmp2.mkdir()
    ev2 = _psi_fixture_events(
        spark, ref_vals=[7.0] * 200, cur_vals=[9.0] * 200
    )
    ev2.write.parquet(str(tmp2 / "events.parquet"))
    const = profiling.quantile_shift_drift(spark, str(tmp2)).collect()
    for r in const:
        assert r.shift_iqr == 0.0
        assert abs(r.abs_shift - 2.0) < 1e-6


def test_quantile_monitor_matches_batch_report_and_replays(
    spark, sf_dir, tmp_path
):
    """Feed the streaming quantile monitor the midpoint report's own
    inputs — frozen reference = ref-half quantiles, one micro-batch =
    the whole current half — and the per-batch report must EQUAL
    quantile_shift_drift's rows (shared report tail).  Replay
    overwrites; a wrong-length reference array is rejected at wrap
    time."""
    import pytest

    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_quantile_monitor,
    )

    e = profiling._events_with_split(spark, sf_dir)
    ref_q = profiling.quantile_reference(e.filter("is_ref"))
    assert len(ref_q) == len(profiling.DRIFT_QS)
    cur_half = e.filter(~F.col("is_ref")).select("value")
    out = str(tmp_path / "qdrift")
    apply_fn = foreach_batch_quantile_monitor(ref_q, out)
    apply_fn(cur_half, 0)
    apply_fn(cur_half, 0)  # replay: overwrite discipline
    got = sorted(
        spark.read.parquet(f"{out}/batch_id=0").collect(),
        key=lambda r: r.quantile,
    )
    want = sorted(
        profiling.quantile_shift_drift(spark, sf_dir).collect(),
        key=lambda r: r.quantile,
    )
    assert [
        (r.quantile, r.ref_value, r.cur_value, r.abs_shift, r.shift_iqr)
        for r in got
    ] == [
        (r.quantile, r.ref_value, r.cur_value, r.abs_shift, r.shift_iqr)
        for r in want
    ]

    with pytest.raises(ValueError):
        foreach_batch_quantile_monitor([1.0, 2.0], out)


def test_grouped_cores_equal_per_group_runs(spark, sf_dir):
    """The ``by=`` generalization of the two shared monitor cores must be
    EXACTLY per-group application of the ungrouped core — this is the pin
    that lets the rollup catalog entry claim it shares one math
    definition with the streaming monitors (psi_report's totals,
    category count, and score window all partition on the keys; the
    quantile tail's explode/IQR guard ride per row)."""
    from pyspark.sql import Row

    counts = spark.createDataFrame(
        [
            Row(batch_id=b, event_type=t, n_ref=nr, n_cur=nc)
            for b, cats in (
                (0, (("a", 50, 45), ("b", 30, 40), ("c", 20, 15))),
                (1, (("a", 50, 5), ("b", 30, 80), ("d", 0, 15))),
            )
            for t, nr, nc in cats
        ]
    )
    grouped = profiling.psi_report(counts, "event_type", by=("batch_id",))
    for b in (0, 1):
        got = sorted(
            (
                (r.event_type, r.n_ref, r.n_cur, r.ref_frac, r.cur_frac,
                 r.psi_term, r.psi_total)
            )
            for r in grouped.filter(F.col("batch_id") == b).collect()
        )
        want = sorted(
            (
                (r.event_type, r.n_ref, r.n_cur, r.ref_frac, r.cur_frac,
                 r.psi_term, r.psi_total)
            )
            for r in profiling.psi_report(
                counts.filter(F.col("batch_id") == b).drop("batch_id"),
                "event_type",
            ).collect()
        )
        assert got == want

    qs = profiling.DRIFT_QS
    one = spark.createDataFrame(
        [
            Row(batch_id=0, rq=[1.0, 2.0, 3.0, 4.0], cq=[1.5, 2.5, 3.0, 9.0]),
            Row(batch_id=1, rq=[5.0, 5.0, 5.0, 5.0], cq=[6.0, 7.0, 8.0, 9.0]),
        ]
    )
    grouped_q = profiling._quantile_report_from(one, qs, by=("batch_id",))
    for b in (0, 1):
        got = [
            (r.quantile, r.ref_value, r.cur_value, r.abs_shift, r.shift_iqr)
            for r in grouped_q.filter(F.col("batch_id") == b)
            .orderBy("quantile")
            .collect()
        ]
        want = [
            (r.quantile, r.ref_value, r.cur_value, r.abs_shift, r.shift_iqr)
            for r in profiling._quantile_report_from(
                one.filter(F.col("batch_id") == b).drop("batch_id"), qs
            ).collect()
        ]
        assert got == want
    # the degenerate-IQR batch reports 0.0 shifts, not a division blowup
    assert all(
        r.shift_iqr == 0.0
        for r in grouped_q.filter(F.col("batch_id") == 1).collect()
    )


def test_monitor_rollup_flags_exactly_the_drifted_batches(spark, tmp_path):
    """End-to-end alerting (VERDICT r7 item 3): drive the THREE streaming
    monitors over 4 synthetic micro-batches — batch 0 clean, batch 1
    nulls 20% of values, batch 2 collapses the category mix, batch 3
    shifts every value by +1000 — then the store rollup must flag
    exactly (null_rate@1, psi@2, quantile@3) with the right first-breach
    batch ids and nothing else."""
    import random

    from pyspark.sql import Row

    from hadoop_pyspark_streaming_analytics_spark.operators.profiling import (
        monitor_alert_rollup_from_store,
        quantile_reference,
    )
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_drift_monitor,
        foreach_batch_profile_monitor,
        foreach_batch_quantile_monitor,
    )

    rng = random.Random(7)
    cats = ("click", "view", "purchase", "error")

    def batch_rows(n, null_every=None, one_cat=None, shift=0.0):
        rows = []
        for i in range(n):
            v = rng.uniform(0, 100) + shift
            rows.append(
                Row(
                    event_type=one_cat or cats[i % len(cats)],
                    value=None
                    if null_every and i % null_every == 0
                    else float(v),
                )
            )
        return rows

    ref = spark.createDataFrame(batch_rows(400))
    ref_counts = ref.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    ref_q = quantile_reference(ref)

    psi_p = str(tmp_path / "psi")
    q_p = str(tmp_path / "q")
    prof_p = str(tmp_path / "prof")
    drift_fn = foreach_batch_drift_monitor(ref_counts, psi_p)
    quant_fn = foreach_batch_quantile_monitor(ref_q, q_p)
    prof_fn = foreach_batch_profile_monitor(
        prof_p, columns=(("value", "double"),), approx=False
    )

    batches = [
        batch_rows(200),                      # 0: clean
        batch_rows(200, null_every=5),        # 1: 20% nulls
        batch_rows(200, one_cat="error"),     # 2: category collapse
        batch_rows(200, shift=1000.0),        # 3: value shift
    ]
    for bid, rows_ in enumerate(batches):
        frame = spark.createDataFrame(
            rows_, schema="event_type string, value double"
        )
        drift_fn(frame, bid)
        quant_fn(frame, bid)
        prof_fn(frame, bid)

    alerts = {
        (r.metric, r.batch_id): r
        for r in monitor_alert_rollup_from_store(
            spark, psi_p, q_p, prof_p
        ).collect()
    }
    assert len(alerts) == 12
    breached = {k for k, r in alerts.items() if r.breached}
    assert breached == {
        ("null_rate_value", 1),
        ("psi_total", 2),
        ("max_quantile_shift_iqr", 3),
    }
    assert alerts[("null_rate_value", 1)].value == 0.2
    for (metric, _), r in alerts.items():
        want_first = {
            "null_rate_value": 1,
            "psi_total": 2,
            "max_quantile_shift_iqr": 3,
        }[metric]
        assert r.first_breach_batch == want_first


def test_multi_query_entries_contain_single_query_parity(spark, sf_dir):
    """The multi-query catalog faces (VERDICT r7 item 6): query 0 of the
    fixed batch IS BM25_QUERY, so its slice of the batched result must
    equal the proven single-query bm25_rank ranking row-for-row — the
    batching (shared postings prune, broadcast ownership re-attach,
    per-query WindowGroupLimit) must be invisible in the answers.  The
    hybrid face must cover every query id and keep per-query ranks
    contiguous from 1."""
    from hadoop_pyspark_streaming_analytics_spark.operators.retrieval import (
        MULTI_QUERY_TERMS,
        bm25_multi_query_entry,
        bm25_rank,
        hybrid_multi_query_entry,
    )

    multi = bm25_multi_query_entry(spark, sf_dir).collect()
    q0 = sorted(
        ((r.rnk, r.doc_id, r.n_terms, r.score) for r in multi if r.query_id == 0)
    )
    single = sorted(
        (r.rnk, r.doc_id, r.n_terms, r.score)
        for r in bm25_rank(spark, sf_dir).collect()
    )
    assert q0 == single and q0
    assert {r.query_id for r in multi} == {q for q, _ in MULTI_QUERY_TERMS}

    hyb = hybrid_multi_query_entry(spark, sf_dir).collect()
    assert {r.query_id for r in hyb} == {q for q, _ in MULTI_QUERY_TERMS}
    for qid in (0, 1, 2):
        ranks = sorted(r.rnk for r in hyb if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1)) and ranks
        for r in hyb:
            assert r.lex_rank is not None or r.vec_rank is not None


def test_monitor_rollup_corpus_scans_behind_checkpoints(spark, sf_dir):
    """Scale pin (round 15 census): the rollup's report-grain frames are
    each consumed more than once (cur_counts by batches + the full_outer
    join, counts twice inside psi_report, the fused quantile/profile agg
    by two report faces) — unpinned, the executedPlan re-executed the
    corpus-sized subtree per consumer: EIGHTEEN events scans, ~8 needless
    full passes at 100 TB.  Checkpoint-pinned, the returned plan carries
    exactly ONE column-pruned ref-side scan (the frozen quantile array's
    ts+value read; the split threshold's ts-only read moved behind the
    round-16 midpoint pin in _events_with_split); every heavy-column
    pass runs once, inside an eager checkpoint.  The ExistingRDD marker
    keeps a Spark scan-node rename from faking the count."""
    from hadoop_pyspark_streaming_analytics_spark.operators.profiling import (
        monitor_alert_rollup,
    )

    df = monitor_alert_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan
    assert "Scan ExistingRDD" in plan, plan


def test_numeric_psi_corpus_scans_behind_checkpoints(spark, sf_dir):
    """Scale pin (round-16 census): numeric PSI's report tail consumes
    ``filled`` twice (totals + probs) and the binning pass re-ran the
    midpoint + ref-bounds subtrees — unpinned, the executedPlan carried
    EIGHT events scans (~5 needless full passes at 100 TB).  With the
    midpoint, ref-bounds, and bin-spine checkpoints the returned plan
    reads NO parquet at all: the three unavoidable passes (midpoint →
    ref bounds → binned counts) run exactly once, eagerly, and the
    report tail is bin-grain arithmetic over an ExistingRDD."""
    from hadoop_pyspark_streaming_analytics_spark.operators.profiling import (
        numeric_drift_psi,
    )

    df = numeric_drift_psi(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
