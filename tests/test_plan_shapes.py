"""Physical-plan regression tests: the scale properties SURVEY.md §7 and
the 100 TB design notes promise must be visible in ``explain`` output —
pushdown, pruning, broadcast, partial aggregation, top-k without global
sort.  These guard against silent plan regressions (e.g. a refactor that
breaks filter pushdown)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from hadoop_pyspark_streaming_analytics_spark.operators.relational import (
    customer_summary_with_top_product,
    retail_base,
    top_customers_by_spend,
)
from hadoop_pyspark_streaming_analytics_spark.operators.text import word_count_topk


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_cleaning_filters_push_down_to_parquet(spark, sf_dir):
    plan = plan_of(retail_base(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,0.0)" in plan
    assert "StringStartsWith(o_orderstatus,C)" in plan


def test_base_scan_prunes_columns(spark, sf_dir):
    """The lineitem scan must read only the columns the query needs — a
    scan with l_shipdate/l_returnflag in ReadSchema would be reading 2x the
    bytes at 100 TB."""
    plan = plan_of(retail_base(spark, sf_dir))
    assert "l_shipdate" not in plan
    assert "l_returnflag" not in plan
    assert "o_totalprice" not in plan


def test_flagship_broadcasts_order_side(spark, sf_dir):
    """orders (thin, filtered) must broadcast into lineitem — a sort-merge
    join here would shuffle the fact table twice."""
    plan = plan_of(customer_summary_with_top_product(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_flagship_partial_aggregation(spark, sf_dir):
    """Map-side combine (partial_sum before the exchange) is what keeps the
    customer-level shuffle proportional to |customers|, not |lineitems|."""
    plan = plan_of(customer_summary_with_top_product(spark, sf_dir))
    assert "partial_sum" in plan


def test_rank_filter_uses_window_group_limit(spark, sf_dir):
    """filter(rank == 1) must plan as WindowGroupLimit (per-partition top-1
    pushdown) — without it every (customer, product) row sorts through the
    full window."""
    plan = plan_of(customer_summary_with_top_product(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    """orderBy().limit(k) must plan as TakeOrderedAndProject — per-partition
    heaps + driver merge, not a full exchange-and-sort."""
    plan = plan_of(top_customers_by_spend(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    plan2 = plan_of(word_count_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan2


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    """The scan→filter→project→partial-agg pipeline must fuse into
    whole-stage-generated code (AQE hides the ids in pre-execution plans, so
    ask the codegen explain mode directly)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(customer_summary_with_top_product(spark, sf_dir), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in plan
    assert "Found 0 WholeStageCodegen" not in plan


def test_rollup_is_single_shuffle(spark, sf_dir):
    """ROLLUP must plan as Expand (grouping-set replication map-side) over
    ONE exchange — multi-grain aggregation in one pass, not one job per
    grain."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        hourly_rollup,
    )

    plan = plan_of(hourly_rollup(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Exchange (") == 1


def test_top_users_per_type_uses_window_group_limit(spark, sf_dir):
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        top_users_per_type,
    )

    plan = plan_of(top_users_per_type(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_sessionization_is_single_shuffle(spark, sf_dir):
    """Batch session_window: one exchange on user_id, sessions merged by a
    sort-based aggregation within partitions — no second shuffle."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        user_sessions,
    )

    plan = plan_of(user_sessions(spark, sf_dir))
    assert plan.count("Exchange (") == 1


def test_customer_summary_has_no_distinct_expand(spark, sf_dir):
    """num_orders counts rows of an already-(custkey, orderkey)-grouped
    intermediate; a countDistinct here would plan an Expand + second
    distinct-agg pass for nothing.  Guards the rewrite staying rewritten."""
    from hadoop_pyspark_streaming_analytics_spark.operators.relational import (
        customer_summary,
    )

    plan = plan_of(customer_summary(retail_base(spark, sf_dir)))
    assert "Expand" not in plan


def test_pricing_summary_is_joinless_pushed_partial_agg(spark, sf_dir):
    """star_pricing_summary is the partial-aggregation probe: the shipdate
    cutoff must reach the parquet scan, the aggregation must map-side
    combine, and there must be no join anywhere."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import pricing_summary

    plan = plan_of(pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_shipping_priority_topk_and_broadcast(spark, sf_dir):
    """Top-10 must plan TakeOrderedAndProject (per-partition top-K, no
    global sort); the filtered customer segment must broadcast."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import shipping_priority

    plan = plan_of(shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Sort (" not in plan.split("TakeOrderedAndProject")[0]


def test_local_supplier_volume_broadcasts_dims(spark, sf_dir):
    """The region→nation dim chain carries explicit broadcast hints (bounded
    tables) so the static plan already shows BroadcastHashJoin; the
    supplier/customer sides are SF-proportional and deliberately un-hinted —
    the static plan may sort-merge them, but AQE must converge every join to
    broadcast at this scale (no SortMergeJoin survives in the executed
    adaptive plan)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        local_supplier_volume,
    )

    df = local_supplier_volume(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_of(df)
    # AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan =="
    # (which legitimately sort-merges the un-hinted sides) — assert on the
    # final section only.
    final = final_plan_of(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "BroadcastHashJoin" in final


def test_semi_and_anti_joins_are_broadcast_existence_probes(spark, sf_dir):
    """Semi/anti joins must plan as broadcast hash existence probes of the
    (filtered, thin) key set — never inner-join + dedup, never shuffled."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        big_spender_order_mix,
        dormant_customers,
    )

    semi = plan_of(big_spender_order_mix(spark, sf_dir))
    assert "LeftSemi" in semi and "BroadcastHashJoin" in semi
    anti = plan_of(dormant_customers(spark, sf_dir))
    assert "LeftAnti" in anti and "BroadcastHashJoin" in anti


def test_q4_q13_q17_star_shapes(spark, sf_dir):
    """The round-6 TPC-H trio's defining plan properties:
    Q4 — the EXISTS decorrelates to a LEFT SEMI join with the returnflag
    filter pushed to the lineitem scan (an inner join would fan out);
    Q13 — the order-side predicate stays IN the outer join condition
    (LeftOuter in the plan; a post-join filter would re-inner it and lose
    the zero-order customers);
    Q17 — the brand filter reaches the part scan, and the final plan
    reads NO parquet at all (both the threshold agg and the probe consume
    the one checkpointed brand_lines scan)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        customer_order_distribution,
        order_priority_returns,
        small_quantity_revenue,
    )

    q4 = plan_of(order_priority_returns(spark, sf_dir))
    assert "LeftSemi" in q4
    assert "EqualTo(l_returnflag,R)" in q4

    q13 = plan_of(customer_order_distribution(spark, sf_dir))
    assert "LeftOuter" in q13

    q17 = plan_of(small_quantity_revenue(spark, sf_dir))
    assert "Scan parquet" not in q17  # checkpointed single scan
    # ...and the checkpoint's own build pushed the brand filter to part
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.star import SMALL_QTY_BRAND
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table

    pre = plan_of(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == SMALL_QTY_BRAND)
    )
    assert f"EqualTo(p_brand,{SMALL_QTY_BRAND})" in pre


def test_round6_tail_entry_plan_shapes(spark, sf_dir):
    """The second-session entries' scale-defining plan properties:
    DSIR — cutpoints/models ride broadcasts, NO Window anywhere, and the
    final plan reads zero parquet (both checkpoints absorb the scans);
    staleness audit — Window-free, exactly two scans (documents for the
    gate, embeddings for the rollup);
    filtered search — the label predicate reaches the embeddings scan as
    a pushed filter (EqualTo on the shared constant)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        dsir_importance_sample,
    )
    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        ANN_FILTER_LABEL,
        embedding_staleness_audit,
        ivf_pq_search_filtered,
    )

    dsir = plan_of(dsir_importance_sample(spark, sf_dir))
    assert "Window" not in dsir
    assert "Scan parquet" not in dsir  # checkpointed feat + weights

    stale = plan_of(embedding_staleness_audit(spark, sf_dir))
    assert "Window" not in stale
    scans = [
        b for b in stale.split("\n\n")
        if b.splitlines() and "Scan parquet" in b.splitlines()[0]
    ]
    assert len(scans) <= 2, stale[:1500]

    filt = plan_of(ivf_pq_search_filtered(spark, sf_dir))
    assert f"EqualTo(label,{ANN_FILTER_LABEL})" in filt


def test_embedding_lsh_has_no_cross_join(spark, sf_dir):
    """The random-hyperplane LSH near-dup path must generate candidates via
    a bucketed EQUI-join on (band_id, sig) — never a cartesian product or a
    label-wide nested-loop join (the scale failure of the all-pairs
    baseline).  Signature computation itself must be shuffle-free up to the
    bucket join: exactly the candidate distinct + two verify joins shuffle."""
    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        embedding_near_duplicates_lsh,
    )

    plan = plan_of(embedding_near_duplicates_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_id" in plan  # the bucket equi-join key is in the plan


def test_tfidf_broadcasts_stats_and_limits_window(spark, sf_dir):
    """TF-IDF: doc_len / doc_freq / n_docs are vocab- or scalar-sized and
    must broadcast into the (doc_id, token) counts; the top-k per document
    must plan as WindowGroupLimit, not a full per-doc sort+filter.  The
    corpus explode must hit exactly ONE parquet scan of documents — tf is
    localCheckpoint-ed so the three consumers reuse it."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        tfidf_top_terms,
    )

    df = tfidf_top_terms(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    # one documents scan for the explode path (n_docs count scans no text)
    assert plan.count("regexp_extract_all") <= 1


def test_priority_sample_window_group_limit_and_pruned_scan(spark, sf_dir):
    """corpus.priority_sample's scale claims (round 10): the per-source
    top-k by Efraimidis-Spirakis key must plan as WindowGroupLimit (each
    map partition forwards at most k rows per source into the window
    shuffle — a handful of giant sources cost k rows each, never a full
    per-source sort of the corpus), over exactly ONE exchange, and the
    documents scan must read only (source, doc_id, n_chars) — pulling
    `text` here would read ~all the corpus bytes to sample ids."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        priority_sample,
    )

    plan = plan_of(priority_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange (") == 1
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_repetition_scores_map_side_combine(spark, sf_dir):
    """Both the token and bigram paths must partially aggregate before
    their exchanges — the shuffle carries (doc_id, gram, partial count),
    bounded by distinct grams per partition, never raw exploded rows."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        repetition_scores,
    )

    plan = plan_of(repetition_scores(spark, sf_dir))
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_quantization_is_pure_map_no_shuffle(spark, sf_dir):
    """int8 quantization must plan as a single scan with NO Exchange —
    a pure codegen map over the embedding store."""
    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    plan = plan_of(quantize_embeddings_int8(spark, sf_dir))
    assert "Exchange" not in plan
    # formatted mode prints each scan twice (tree node + detail entry)
    assert plan.count("Scan parquet") == 2


def test_rolling_sketch_merge_broadcasts_day_dimension(spark, sf_dir):
    """The trailing-window sketch merge is a range join over the
    day-count-sized sketch table: the build side must broadcast (nested
    loop over ~365 rows/year is the design), never sort-merge."""
    from hadoop_pyspark_streaming_analytics_spark.operators.sketches import (
        rolling_distinct_users,
    )

    plan = plan_of(rolling_distinct_users(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_locf_resample_windows_per_user(spark, sf_dir):
    """Gap-fill carry-forward must be a per-user window (partitioned by
    user_id — bounded state), with no cartesian product anywhere."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        resample_hourly_locf,
    )

    plan = plan_of(resample_hourly_locf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" in plan and "last(v" in plan and "user_id" in plan


def final_plan_of(df: DataFrame) -> str:
    """Execute the query and return the FINAL adaptive plan — the one AQE
    actually ran, after runtime size-based join re-planning.  The
    ``== Initial Plan ==`` section Spark appends is stripped: it shows the
    static plan AQE replaced (e.g. a SortMergeJoin later converted to
    broadcast), so assertions about what actually executed must not see
    it."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_merge_upsert_is_anti_probe_aqe_broadcast(spark, sf_dir):
    """The CDC apply must plan as a LEFT ANTI existence probe of the
    update keys plus a union — never a shuffled full-outer join.  There is
    deliberately NO broadcast hint (a bulk-backfill update batch must be
    free to shuffle); AQE must still pick a broadcast join at runtime for
    this small batch."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import (
        _merge_upsert_customers,
    )

    df = _merge_upsert_customers(spark, sf_dir)
    static = plan_of(df)
    assert "LeftAnti" in static
    assert "FullOuter" not in static
    assert "BroadcastHashJoin" in final_plan_of(df)


def test_funnel_user_stages_aqe_broadcast_no_window(spark, sf_dir):
    """Funnel stages are |users|-sized: no hard-coded broadcast hint (OOM
    at 100 TB), but AQE must converge on broadcast joins at runtime on
    small data; no window over raw events, no cartesian product."""
    from hadoop_pyspark_streaming_analytics_spark.operators.temporal import (
        funnel_view_click_purchase,
    )

    df = funnel_view_click_purchase(spark, sf_dir)
    static = plan_of(df)
    assert "CartesianProduct" not in static
    assert "Window" not in static
    assert "BroadcastHashJoin" in final_plan_of(df)


def test_cohort_retention_aqe_broadcast_first_day(spark, sf_dir):
    """The per-user cohort table joins back into the fact scan with no
    hint (AQE broadcasts when it fits) and the final distinct-count must
    partially aggregate."""
    from hadoop_pyspark_streaming_analytics_spark.operators.timeseries import (
        cohort_retention,
    )

    df = cohort_retention(spark, sf_dir)
    static = plan_of(df)
    assert "partial_count" in static or "Expand" in static
    assert "BroadcastHashJoin" in final_plan_of(df)


def test_unpivot_plans_as_expand(spark, sf_dir):
    """DataFrame.unpivot must plan as a single Expand over the wide rows
    (row replication map-side) — never a per-column union of scans."""
    from hadoop_pyspark_streaming_analytics_spark.operators.nested import (
        customer_brand_unpivot,
    )

    plan = plan_of(customer_brand_unpivot(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Scan parquet") <= 8  # one scan set, not 25 unions


def test_q6_predicates_push_to_scan_no_join(spark, sf_dir):
    """The Q6-shape scalar aggregate must push all three range predicates
    into the parquet scan and plan zero joins — at 100 TB this query is a
    pure embarrassingly-parallel scan-reduce."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        forecast_revenue_change,
    )

    plan = plan_of(forecast_revenue_change(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24" in plan
    assert "Join" not in plan


def test_q10_topk_and_postagg_dim_attach(spark, sf_dir):
    """Q10 shape: returnflag filter reaches the scan, the top-20 plans as
    TakeOrderedAndProject (no global sort), and nation broadcasts."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        returned_item_losses,
    )

    plan = plan_of(returned_item_losses(spark, sf_dir))
    assert "EqualTo(l_returnflag,R)" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q18_preaggregates_before_join(spark, sf_dir):
    """Q18 shape: the quantity HAVING must aggregate lineitem to order
    grain (partial_sum map-side) BEFORE any join touches orders — joining
    raw lineitem⋈orders first would shuffle the full fact table."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        large_volume_customers,
    )

    plan = plan_of(large_volume_customers(spark, sf_dir))
    assert "partial_sum" in plan
    # Structural assertion via the tree section (printed top-down): the
    # quantity HashAggregate must be a DESCENDANT of a Join — i.e. some
    # Join prints before the aggregate.  A regressed plan that joins raw
    # lineitem first and aggregates after would print HashAggregate at
    # the top, above every Join.
    tree = plan.split("\n\n(")[0]
    join_pos = tree.find("Join")
    agg_pos = tree.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1
    assert join_pos < agg_pos


def test_q19_or_brackets_stay_one_scan(spark, sf_dir):
    """Q19 shape: the OR-of-brackets predicate must evaluate over ONE
    lineitem scan joined once to part — not a union of three filtered
    scans."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        bracketed_discount_revenue,
    )

    plan = plan_of(bracketed_discount_revenue(spark, sf_dir))
    # one Location line per distinct scan: lineitem + part, once each
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "Union" not in plan
    # Catalyst must derive the per-side legs of the OR and push them into
    # BOTH scans (quantity bands → lineitem, brand/size → part).
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "EqualTo(p_brand,Brand#1)" in plan


def test_point_in_time_join_is_equi_not_nested_loop(spark, sf_dir):
    """The SCD2 interval lookup must plan the user_id equi-key as the join
    key (hash/sort-merge/broadcast-HASH) with the validity range as a
    post-match filter — a BroadcastNestedLoopJoin or CartesianProduct here
    explodes at 100 TB."""
    from hadoop_pyspark_streaming_analytics_spark.operators.temporal import (
        point_in_time_value,
    )

    plan = plan_of(point_in_time_value(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The hint API must steer the planner: merge forces SortMergeJoin
    where AQE/size stats would broadcast, shuffle_hash forces a
    ShuffledHashJoin build — the manual override layer SCALE.md points at
    when AQE's estimate is wrong."""
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    merged = plan_of(
        orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    )
    assert "SortMergeJoin" in merged and "BroadcastHashJoin" not in merged
    hashed = plan_of(
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
    )
    assert "ShuffledHashJoin" in hashed


def test_pii_redaction_is_shuffle_free_projection(spark, sf_dir):
    """PII scrubbing must be a pure projection over the scan — any
    Exchange here means the redaction pass stopped being scan-speed."""
    from hadoop_pyspark_streaming_analytics_spark.operators.scrubbing import (
        pii_redaction,
    )

    plan = plan_of(pii_redaction(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_count_min_reads_fact_twice_not_per_hash_row(spark, sf_dir):
    """The CMS build must explode (j, bucket) structs inside ONE scan —
    a union of per-j selects would read the fact table CMS_DEPTH times.
    Two scans total: sketch build + distinct-user probes."""
    from hadoop_pyspark_streaming_analytics_spark.operators.sketches import (
        count_min_heavy_hitters,
    )

    plan = plan_of(count_min_heavy_hitters(spark, sf_dir))
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "BroadcastHashJoin" in plan  # the 1024-row counter table


def test_broadcast_hint_policy():
    """SCALE.md broadcast-hint policy, grep-enforced: every hard-coded
    ``F.broadcast(`` call site in the package must target a PROVABLY
    BOUNDED table (bounded by schema or algorithm parameter — nation,
    region, centroids, cutpoints, sketch-day rows, query sets, 1-row
    scalars), never anything doc-/user-/vocab-/order-/part-grain, filtered
    or aggregated.  A forced hint on a corpus-proportional side overrides
    AQE's size fallback and OOMs at 100 TB instead of degrading to a
    shuffle join."""
    import re
    from pathlib import Path

    import hadoop_pyspark_streaming_analytics_spark as pkg

    root = Path(pkg.__file__).parent
    # (file, first identifier inside F.broadcast(...)) -> why it is bounded
    allowed = {
        ("operators/sketches.py", "b"): "per-day sketch table, 365 rows/yr",
        ("operators/sketches.py", "cms"): "d*w=1024-row counter table",
        ("operators/similarity.py", "q"): "ANN query set (per-request)",
        ("operators/similarity.py", "cents"): "k centroids / PQ codebook",
        ("operators/similarity.py", "probes"): "nprobe rows per query",
        ("operators/similarity.py", "cb"): "1-row collapsed PQ codebook",
        ("operators/similarity.py", "qtab"): "|queries| rows of M*K dists",
        ("operators/similarity.py", "queries"): "ANN query set (per-request)",
        ("operators/similarity.py", "total"): "1-row scalar",
        ("operators/quality.py", "min_toks"): "1-row scalar",
        ("operators/quality.py", "lang_rates"): "language-grain, bounded by ISO code space",
        ("operators/corpus.py", "n_docs"): "1-row scalar",
        ("operators/corpus.py", "cuts"): "decile cutpoints",
        ("operators/corpus.py", "prefix"): "per-bucket prefix sums",
        ("operators/corpus.py", "corpus_total"): "1-row scalar",
        ("operators/corpus.py", "totals"): "1-row scalar (DSIR model totals)",
        ("operators/corpus.py", "total"): "1-row scalar (vocab occurrence total)",
        ("operators/corpus.py", "lam"): "bounded at DSIR_BUCKETS rows (hashed feature space, a constant)",
        ("operators/star.py", "nation"): "25 rows by TPC-H schema",
        ("operators/star.py", "region"): "5 rows by TPC-H schema",
        ("operators/star.py", "local_nations"): "subset of nation",
        ("operators/star.py", "max_rev"): "1-row scalar",
        ("operators/star.py", "avg_bal"): "1-row scalar",
        ("operators/relational.py", "total"): "1-row scalar",
        ("operators/windows.py", "cuts"): "decile cutpoints",
        ("operators/timeseries.py", "stats"): "1-row median/total scalar",
        ("streaming/extensions.py", "dim"): "caller-contracted dimension",
        ("operators/retrieval.py", "df_tbl"): "|query_terms| rows (BM25 df)",
        ("operators/retrieval.py", "stats"): "1-row N/avgdl scalar",
        ("operators/retrieval.py", "q"): "1-row hybrid query vector",
        ("operators/retrieval.py", "fb"): "feedback_r row ids (PRF)",
        ("operators/retrieval.py", "n_docs"): "1-row scalar",
        ("operators/profiling.py", "mid"): "1-row epoch midpoint",
        ("operators/profiling.py", "rb"): "1-row reference value bounds",
        ("operators/profiling.py", "totals"): "1-row half totals",
        ("operators/retrieval.py", "sel"): "<=k selected MMR rows",
        ("operators/retrieval.py", "qterms"): "batch-bounded (query_id, token) pairs",
        ("operators/retrieval.py", "fused"): "HYBRID_TOP_K-row fused shortlist",
        ("operators/graph.py", "n"): "1-row node-count scalar",
        ("operators/profiling.py", "ref_counts"): "category-grain frozen reference profile",
        ("operators/profiling.py", "rq"): "1-row reference quantile array",
        # refine's SHORTLIST hint was deliberately REMOVED round 13 (the
        # shortlist is corpus-derived and only caller-bounded — AQE owns
        # that broadcast now); only the query-set hint remains.
        ("operators/refine.py", "queries"): "ANN query set (per-request)",
        ("operators/mixture_budget.py", "totals"): "1-row scalar (budget/n_sources/total_cap)",
    }
    pat = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")
    violations = []
    for py in sorted(root.rglob("*.py")):
        rel = py.relative_to(root).as_posix()
        for m in pat.finditer(py.read_text()):
            if (rel, m.group(1)) not in allowed:
                line = py.read_text()[: m.start()].count("\n") + 1
                violations.append(f"{rel}:{line} F.broadcast({m.group(1)}...)")
    assert not violations, (
        "broadcast hint on a table not in the reviewed bounded-table "
        f"allowlist (see SCALE.md policy): {violations}"
    )


def test_pq_adc_topk_is_single_scan_with_partial_topk(spark, sf_dir):
    """ADC search must be scan-speed: the codebook (1 row) and the
    per-query distance tables (|queries| rows) attach via broadcast
    nested-loop joins — bounded build sides, the one place BNLJ is the
    right plan — and code assignment + the ADC sum happen inside the
    projection.  The per-query top-k must plan WindowGroupLimit BOTH
    per-partition (before the exchange) and finally, so the only
    corpus-wide exchange carries at most k rows per partition per query —
    never a (sub, code)-join + per-(query, vec) groupBy, which would
    shuffle |queries|·PQ_M·|corpus| partial rows."""
    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        pq_adc_topk,
    )

    plan = plan_of(pq_adc_topk(spark, sf_dir))
    # Assert the partial AND final top-k modes by their detail blocks
    # (node-print COUNTS vary across harmless explain-format changes;
    # the modes are the actual plan property — round-4 advice).
    wgl = [
        b
        for b in plan.split("\n\n")
        if b.strip() and b.strip().splitlines()[0].endswith("WindowGroupLimit")
    ]
    assert any(", Partial" in b for b in wgl), "no partial WindowGroupLimit"
    assert any(", Final" in b for b in wgl), "no final WindowGroupLimit"
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" not in plan.split("WindowGroupLimit")[0]


def test_quality_classifier_is_shuffle_free_single_scan(spark, sf_dir):
    """The model gate must stay one codegen projection over the documents
    scan: no Exchange (nothing aggregates), no Python evaluation (the
    weights are plan literals, not a UDF), and the scan reads only the
    columns the features need."""
    from hadoop_pyspark_streaming_analytics_spark.operators.quality import (
        quality_classifier,
    )

    plan = plan_of(quality_classifier(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
    # formatted mode prints each node twice (tree + detail block): exactly
    # one scan means exactly two mentions.
    assert plan.count("Scan parquet") == 2
    assert "lang" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_semdedup_pairs_join_per_cell_not_cross(spark, sf_dir):
    """SemDeDup's quadratic stage must be keyed on the cell id: the
    members self-join appears as an equi-join on centroid_id (hash-
    partitioned per cell), never a CartesianProduct / BroadcastNestedLoop
    over the corpus — the difference between O(Σ|cell|²) and O(N²) at
    100 TB."""
    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        semdedup,
    )

    plan = plan_of(semdedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "centroid_id" in plan


def test_source_report_rides_one_scan(spark, sf_dir):
    """The report card's features + fingerprint must ride a single
    documents projection (quality_features keep= passthrough): the
    enriched frame is one parquet scan, and everything downstream of the
    checkpoint reuses it — zero additional parquet scans in the final
    plan."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.dedup import (
        normalized_text,
    )
    from hadoop_pyspark_streaming_analytics_spark.operators.quality import (
        quality_features,
        source_curation_report,
    )
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    enriched = quality_features(
        docs.withColumn("fingerprint", F.md5(normalized_text(F.col("text")))),
        keep=("source", "fingerprint"),
    )
    # simple mode prints each physical node once (formatted repeats
    # scans in the detail blocks)
    assert plan_of(enriched, "simple").count("Scan parquet") == 1
    final = plan_of(source_curation_report(spark, sf_dir), "simple")
    assert final.count("Scan parquet") == 0  # checkpoint reuse
    assert "CartesianProduct" not in final


def test_difficulty_bins_no_global_window(spark, sf_dir):
    """Curriculum binning must use broadcast percentile cutpoints + a
    stateless filter — never a global ntile/rank Window (the single-task
    bottleneck the scalable-deciles pattern exists to avoid)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        difficulty_bins,
    )

    plan = plan_of(difficulty_bins(spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_language_audit_single_scan_no_join(spark, sf_dir):
    """Prediction and declared label come out of ONE documents projection
    — the audit must not self-join on doc_id."""
    from hadoop_pyspark_streaming_analytics_spark.operators.quality import (
        language_mislabel_audit,
    )

    plan = plan_of(language_mislabel_audit(spark, sf_dir), "simple")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_pack_bpe_seg_join_broadcasts_not_sortmerge(spark, sf_dir):
    """pack_documents_bpe's dictionary-segmentation join is vocab-sized on
    the build side — it must plan as a broadcast hash join (AQE or
    static), never a corpus-wide sort-merge, and the per-shard cumsum must
    be the only Sort in the plan's window path."""
    from hadoop_pyspark_streaming_analytics_spark.operators.chunking import (
        pack_documents_bpe,
    )

    plan = plan_of(pack_documents_bpe(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_truncation_report_partial_aggregates(spark, sf_dir):
    """truncation_report's rollup must partial-aggregate map-side (shuffle
    carries |sources| groups, not doc rows) and never cross-join."""
    from hadoop_pyspark_streaming_analytics_spark.operators.chunking import (
        truncation_report,
    )

    plan = plan_of(truncation_report(spark, sf_dir))
    assert "partial_sum" in plan or "Partial" in plan
    assert "CartesianProduct" not in plan


def test_epoch_mixture_is_shuffle_free_single_scan(spark, sf_dir):
    """The epoch-repeat decision is a stateless md5 projection — one
    documents scan, zero exchanges."""
    from hadoop_pyspark_streaming_analytics_spark.operators.quality import (
        epoch_mixture_repeats,
    )

    plan = plan_of(epoch_mixture_repeats(spark, sf_dir))
    assert "Exchange" not in plan
    # one source: the formatted plan prints each scan twice (tree + detail)
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_q21_waiting_suppliers_shape(spark, sf_dir):
    """Q21's plan lesson: the paired EXISTS/NOT-EXISTS must decorrelate
    into ONE orderkey-grain aggregation (both existence facts from one
    shuffle) — no correlated re-scan, no cartesian, and the final ranking
    is TakeOrderedAndProject, never a global sort.  The status filter
    must push to the orders scan."""
    from pyspark.sql import functions as F

    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        waiting_suppliers,
    )

    plan = plan_of(waiting_suppliers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # both existence consumers read the CHECKPOINTED (order, supplier)
    # grain — the only parquet scan left in this plan is the supplier
    # name attach (lineitem/orders were consumed once, at checkpoint
    # build; formatted mode prints each node twice)
    assert plan.count("Scan parquet") == 2
    # ...and the checkpoint's own build pushed the status filter to the
    # orders scan
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import (
        load_table,
    )

    build = plan_of(
        load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"
        )
    )
    assert "EqualTo(o_orderstatus,F)" in build


def test_q19_disjunctive_branch_revenue_shape(spark, sf_dir):
    """Q19's plan lesson: the OR-of-conjunctions still yields per-table
    prunes — the brand IN set must reach the part scan and the quantity
    envelope must reach the lineitem scan as pushed filters — while the
    branch CASE runs post-join in codegen.  part carries NO broadcast
    hint (SF-proportional — SCALE.md policy); Spark's size stats pick
    broadcast at test scale and are free to shuffle at 100 TB."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        disjunctive_branch_revenue,
    )

    plan = plan_of(disjunctive_branch_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    blocks = plan.split("\n\n")
    part_scans = [
        b for b in blocks if "part.parquet" in b and "Scan parquet" in b
    ]
    li_scans = [
        b for b in blocks if "lineitem.parquet" in b and "Scan parquet" in b
    ]
    assert part_scans and li_scans
    assert any(
        "PushedFilters" in b and "p_brand" in b.split("PushedFilters")[1]
        for b in part_scans
    ), part_scans
    assert any(
        "PushedFilters" in b and "l_quantity" in b.split("PushedFilters")[1]
        for b in li_scans
    ), li_scans
    # partial aggregation before the 3-group exchange
    assert "partial_count" in plan or "partial_sum" in plan


def test_corpus_stats_plans_stay_scan_shaped(spark, sf_dir):
    """The round-7 corpus-statistics trio must keep its promised shapes:
    the length profile is ONE documents scan feeding one aggregate; the
    vocabulary-coverage cutpoint join is broadcast (3 literal rows
    against the vocab-grain checkpoint), never a shuffle join; the
    diversity audit scans raw documents exactly once (each gram width
    re-reads the token checkpoint, not the text)."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        ngram_diversity_by_source,
        token_length_profile,
        vocab_coverage,
    )

    prof = plan_of(token_length_profile(spark, sf_dir))
    assert prof.count("Scan parquet") == 2  # formatted prints each node twice
    assert "Join" not in prof

    cov = plan_of(vocab_coverage(spark, sf_dir))
    assert "SortMergeJoin" not in cov
    assert "Scan parquet" not in cov  # ranked vocab is checkpointed upstream
    assert "BroadcastNestedLoopJoin" in cov or "BroadcastHashJoin" in cov

    div = plan_of(ngram_diversity_by_source(spark, sf_dir))
    assert "Scan parquet" not in div  # token arrays checkpointed once


def test_vocab_coverage_scalable_no_vocab_grain_single_partition(
    spark, sf_dir
):
    """The scale twin's contract (VERDICT r7 "wrong" #3): NO single-
    partition Exchange may sit over vocabulary-grain (token) data.  The
    only SinglePartition steps allowed are the cumulative window and the
    totals aggregate, both over the (cnt, n_types) COUNT HISTOGRAM —
    bounded by ~sqrt(2·occurrences) distinct frequencies, never by the
    type count.  Checked structurally: every SinglePartition exchange's
    child must carry histogram columns (n_types) and must not carry the
    token column."""
    from hadoop_pyspark_streaming_analytics_spark.operators.corpus import (
        vocab_coverage,
        vocab_coverage_scalable,
    )

    df = vocab_coverage_scalable(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    sp = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert sp, "expected the histogram-grain SinglePartition steps"
    for i in sp:
        child = lines[i + 1]
        assert "n_types" in child, child
        assert "token" not in child, child
    # the vocab-grain aggregate itself shuffles hash-partitioned only
    assert "hashpartitioning(token" in plan
    # and the twin is bit-identical to the exact spelling (the tie-
    # insensitivity argument, checked not just argued)
    got = [tuple(r) for r in df.collect()]
    want = [tuple(r) for r in vocab_coverage(spark, sf_dir).collect()]
    assert got == want


def test_q2_min_cost_supplier_shape(spark, sf_dir):
    """Q2's plan lesson: the correlated scalar MIN subquery decorrelates
    into a window min over the already-aggregated (part, supplier) offer
    grain — exactly ONE lineitem scan (no per-part re-scan),
    type/size/region filters pushed to the dim scans, and the final
    ranking TakeOrderedAndProject.  part/supplier carry NO broadcast
    hint (SF-proportional — SCALE.md policy), so the broadcast
    assertion runs on the AQE-FINAL executed plan: at test scale AQE
    must still converge on broadcast joins; at 100 TB it is free to
    shuffle instead of OOMing a forced build side."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        min_cost_supplier,
    )

    df = min_cost_supplier(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    executed = final_plan_of(df)
    assert "BroadcastHashJoin" in executed
    assert "SortMergeJoin" not in executed
    blocks = plan.split("\n\n")
    li_scans = [
        b for b in blocks if "lineitem.parquet" in b and "Scan parquet" in b
    ]
    assert len(li_scans) == 1, f"{len(li_scans)} lineitem scans"
    part_scans = [
        b for b in blocks if "part.parquet" in b and "Scan parquet" in b
    ]
    assert any(
        "PushedFilters" in b and "p_type" in b.split("PushedFilters")[1]
        for b in part_scans
    ), part_scans
    region_scans = [
        b for b in blocks if "region.parquet" in b and "Scan parquet" in b
    ]
    assert any(
        "PushedFilters" in b and "r_name" in b.split("PushedFilters")[1]
        for b in region_scans
    ), region_scans
    assert "Window" in plan  # the decorrelated per-part min


def test_q20_promo_part_suppliers_shape(spark, sf_dir):
    """Q20's plan lesson: the nested IN/EXISTS chain with a correlated
    half-sum threshold decorrelates into ONE lineitem scan — both sum
    scopes as conditional aggregates of the same grouped pass (never a
    second pass for the inner SUM).  The part gate and the supplier
    attach carry NO broadcast hint (SF-proportional — SCALE.md policy);
    AQE must still converge on broadcast joins in the executed plan at
    test scale."""
    from hadoop_pyspark_streaming_analytics_spark.operators.star import (
        promo_part_suppliers,
    )

    df = promo_part_suppliers(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    executed = final_plan_of(df)
    assert "BroadcastHashJoin" in executed
    assert "SortMergeJoin" not in executed
    blocks = plan.split("\n\n")
    li_scans = [
        b for b in blocks if "lineitem.parquet" in b and "Scan parquet" in b
    ]
    assert len(li_scans) == 1, f"{len(li_scans)} lineitem scans"
    part_scans = [
        b for b in blocks if "part.parquet" in b and "Scan parquet" in b
    ]
    assert any(
        "PushedFilters" in b and "p_type" in b.split("PushedFilters")[1]
        for b in part_scans
    ), part_scans
    # the two sum scopes are partials of one aggregate, not two passes
    assert "partial_sum" in plan


def test_round15_census_multiscan_fixes_pinned(spark, sf_dir):
    """Round-15 file-scan census pins (SCALE.md "round-15 window plan
    audit"): four entries whose executedPlans re-executed corpus-sized
    subtrees once per consumer, each fixed with the corpus.py:260
    checkpoint convention.  Pre-fix scan counts: merge_upsert_customers
    5x customer (CDC batch consumed by anti-probe + union, its base by
    both branches), star_segment_contribution 2x orders + 2x customer
    (segment agg consumed by grand total + ratio join),
    drift_event_type_psi 4x events (psi_report's totals/probs split),
    dedup_edit_distance_verify 4x documents (LSH subtree per consumer +
    the heavy text column attached via two full corpus joins).  The
    ExistingRDD assert keeps a Spark scan-node rename from faking the
    zero/one counts."""
    from hadoop_pyspark_streaming_analytics_spark.operators.dedup import (
        edit_distance_verify,
    )
    from hadoop_pyspark_streaming_analytics_spark.operators.profiling import (
        categorical_drift_report,
    )
    from hadoop_pyspark_streaming_analytics_spark.operators.relational import (
        segment_contribution,
    )
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    merge_builder = next(
        s for s in CATALOG if s.name == "merge_upsert_customers"
    ).builder

    for df, max_scans in (
        (merge_builder(spark, sf_dir), 1),  # target scan only
        (segment_contribution(spark, sf_dir), 0),
        (categorical_drift_report(spark, sf_dir), 0),
        (edit_distance_verify(spark, sf_dir), 0),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") <= max_scans, plan
        assert "Scan ExistingRDD" in plan, plan


def test_round16_census_multiscan_fixes_pinned(spark, sf_dir):
    """Round-16 file-scan census pins (SCALE.md "round-15 full-catalog
    scan census", deferred bucket — fixed this round): eleven entries
    whose returned plans re-executed corpus-sized subtrees once per
    consumer, each fixed with the checkpoint convention (or, for
    ann_ivf_cell_stats, by deriving the 1-row total from the k-row cell
    aggregate instead of a second corpus pass).  Pre-fix scan counts:
    drift_numeric_psi 8 (pinned in test_retrieval_profiling),
    dedup_incremental_ingest 7, ann_recall_curve 7 (Catalyst pushes the
    ground-truth semi join below the nprobe Union — unpinned, the whole
    brute-force subtree re-ran per curve point), events_funnel_conversion
    6, ann_ivf_search 5, dedup_split_leakage 4, ann_pq_adc_topk 4,
    ann_ivf_cell_stats 4, embedding_near_duplicates_lsh 4,
    docs_boilerplate_loss 4, dedup_keep_best_quality 3.  Post-fix counts
    below are the remaining DISTINCT single-execution passes (e.g.
    ann_ivf_search keeps its assignment-build + candidate-scoring full
    passes plus the pushdown query probe — the IVF build+search minimum).
    The ExistingRDD assert keeps a Spark scan-node rename from faking
    the counts."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    builders = {s.name: s.builder for s in CATALOG}
    for name, n_scans in (
        ("dedup_incremental_ingest", 0),
        ("ann_recall_curve", 0),
        ("ann_ivf_cell_stats", 0),
        ("dedup_split_leakage", 0),
        ("events_funnel_conversion", 1),
        ("dedup_keep_best_quality", 1),
        ("ann_ivf_search", 3),
        ("ann_pq_adc_topk", 2),
        ("embedding_near_duplicates_lsh", 2),
        ("docs_boilerplate_loss", 2),
    ):
        df = builders[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == n_scans, (name, plan)
        assert "Scan ExistingRDD" in plan, (name, plan)


def test_round17_census_multiscan_fixes_pinned(spark, sf_dir):
    """Round-17 file-scan census pins: the landed shared-helper fixes
    plus the round's in-window census finds, each fixed with the
    checkpoint convention (or, for tokenizer_fertility_report, by
    carrying (source, chars) through the word aggregate instead of a
    second corpus pass).  Pre-fix scan counts: dedup_minhash_lsh 2
    documents (minhash_lsh_candidates' band self-join re-ran the
    signature subtree per side — same defect reached every LSH
    consumer), ann_adc_refine_topk 4 (pinned in test_refine),
    tokenizer_fertility_report 2 (the "pruned" attach re-decoded the
    full text column for length(text)), quality_score_calibration 2
    documents (cutpoints + join-back each re-ran the text-feature
    scan), events_key_skew_report 2 events (stats + share projection
    each re-ran the per-key count), events_error_bursts_midnight_merged
    2 events (interior/boundary split re-ran the day-local
    sessionization per side).  The ExistingRDD assert keeps a Spark
    scan-node rename from faking the counts."""
    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG

    builders = {s.name: s.builder for s in CATALOG}
    for name, n_scans in (
        ("dedup_minhash_lsh", 0),
        ("quality_score_calibration", 0),
        ("events_key_skew_report", 0),
        ("events_error_bursts_midnight_merged", 0),
        # one remaining scan = the fused single documents pass
        ("tokenizer_fertility_report", 1),
    ):
        df = builders[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == n_scans, (name, plan)
        assert "Scan ExistingRDD" in plan, (name, plan)
    # The scan census is blind to exchange-level re-execution:
    # minhash_estimate_pairs consumed its candidate frame three times
    # (estimate join chain + candidate_jaccard's intersection build +
    # left-join base), re-running the band digest + self-join + distinct
    # over the pinned signatures per consumer.  Pinned, the banding
    # explode leaves the returned plan entirely — no Generate node may
    # reappear (it would mean a consumer re-derives candidates inline).
    for name in ("dedup_minhash_estimate", "dedup_cross_source_matrix"):
        df = builders[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan, (name, plan)
        assert "Scan ExistingRDD" in plan, (name, plan)
