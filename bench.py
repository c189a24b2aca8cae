#!/usr/bin/env python3
"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (computes every
column and row; no driver collect, no result-size bias).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # Runnable from any cwd: the engine package lives next to this file.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG
    from hadoop_pyspark_streaming_analytics_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("WARN")

    specs = [s for s in CATALOG if s.headline]
    # Warm-up: run every headline query once at the smallest SF so JIT /
    # whole-stage-codegen compilation and parquet footer caches are paid
    # before measurement — bench numbers are steady-state execution, not
    # first-query JVM warm-up (which dominated: 5.2s cold vs 2.0s warm).
    warm_dir = "/root/testdata/sf0.001"
    import gc

    for spec in specs:
        try:
            spec.builder(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        # Release the Python-side DataFrame refs so py4j drops the JVM
        # handles and the ContextCleaner can reclaim localCheckpoint blocks
        # — otherwise checkpointed RDDs from every prior query accumulate
        # in block-manager memory and skew later measurements.
        gc.collect()

    # Host yardstick BEFORE the query tier (and again after, inside
    # _bench_calibration): r5 observed core_total swinging 28→40 s across
    # same-code runs with flat single-point calibration — a pre/post pair
    # shows whether the host drifted WITHIN the run.
    calibration_pre = {
        k + "_pre": v for k, v in _bench_calibration(spark, sf_dir).items()
    }

    # Steady-state timing: best of 2 measured runs per query (single-JVM
    # local mode has ~±0.5 s GC/scheduler noise per query; min-of-N is the
    # standard microbenchmark estimator for the noise-free cost).
    timings: dict[str, float] = {}
    for spec in specs:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            del df
            gc.collect()
        timings[spec.name] = round(best, 3)

    streaming = _bench_streaming(spark)
    calibration = _bench_calibration(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    # Round-over-round comparability: ``value`` grows whenever the headline
    # set grows, so also report the frozen ROUND-2 core set (24 queries) —
    # core_total is the number to diff against BENCH_r02/r03 regardless of
    # how many headline queries later rounds add.
    core_total = round(
        sum(t for name, t in timings.items() if name in CORE_QUERIES), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "core_total": core_total,
                "core_n": sum(1 for n in timings if n in CORE_QUERIES),
                "sf": sf,
                **streaming,
                **calibration,
                **calibration_pre,
            }
        )
    )
    spark.stop()


# The 24 headline queries of BENCH_r02.json, frozen for cross-round
# comparability (see core_total above).  Do NOT edit when adding headline
# queries — new ones are reported in ``queries``/``value`` only.
CORE_QUERIES = frozenset(
    {
        "ann_brute_force_topk", "ann_ivf_search", "corpus_tfidf_top_terms",
        "dedup_components", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "events_hourly_rollup", "events_resample_hourly_locf",
        "events_session_attribution", "events_sliding_10min_5min",
        "events_tumbling_5min", "events_user_sessions", "pack_documents",
        "q1_word_count_top20", "q2a_customer_summary",
        "q2b_customer_orders_window", "q3a_product_statistics",
        "q3b_customer_brand_pivot", "q3b_customer_brand_unpivot",
        "star_local_supplier_volume", "star_pricing_summary",
        "star_shipping_priority", "temporal_asof_last_click",
        "text_quality_scores",
    }
)


def _bench_calibration(spark, sf_dir: str) -> dict:
    """Fixed reference workloads whose cost depends ONLY on host speed —
    never on engine code — so cross-round comparisons can separate
    machine noise from real regressions (r5 observed a uniform ~+30%
    drift on UNTOUCHED queries vs BENCH_r04; per-query deltas are
    meaningless without a same-run host yardstick).

    * ``calibration_cpu_sec``: sum over spark.range(1e9) with arithmetic —
      pure whole-stage codegen, no disk, no shuffle.
    * ``calibration_scan_sec``: full-column count over the lineitem
      parquet — disk + decode path at the bench SF.
    Both best-of-2 after a warm-up run, like the query tier.  To compare
    round N to round M, scale per-query times by the calibration ratio.
    """
    import gc
    import time

    out = {}
    workloads = {
        "calibration_cpu_sec": lambda: spark.range(1_000_000_000)
        .selectExpr("sum(id * 2 + 1)")
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "calibration_scan_sec": lambda: spark.read.parquet(
            f"{sf_dir}/lineitem.parquet"
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    }
    for name, fn in workloads.items():
        fn()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            gc.collect()
        out[name] = round(best, 3)
    return out


def _bench_streaming(spark, n_rows: int = 50_000) -> dict:
    """The reference's ONE published performance fact is streaming lag: its
    3 concurrent queries (running stats / tumbling / sliding) took
    ~16.4-18.0 s per ~100-150-row micro-batch against a 10 s trigger
    (BASELINE.md, q4_streaming.ipynb warnings).  Measure the same 3-query
    workload here: one micro-batch of ``n_rows`` sensor readings processed
    to completion by all three queries concurrently.

    Measurement protocol (matched to the batch tier after the r3 2.3×
    phantom regression, VERDICT r3 item 3): one small warm-up pass pays
    state-store + memory-sink + file-listing init, then best-of-2 measured
    passes at ``n_rows``; per-query processAllAvailable splits are reported
    so a state-store or listing stall is attributable."""
    import datetime as dt
    import shutil
    import tempfile
    import time

    from hadoop_pyspark_streaming_analytics_spark.sources.readers import (
        read_sensor_stream,
    )
    from hadoop_pyspark_streaming_analytics_spark.streaming.harness import MemorySinkRun
    from hadoop_pyspark_streaming_analytics_spark.streaming.queries import (
        running_sensor_stats,
        sliding_window_max,
        tumbling_window_stats,
        with_event_time,
    )

    def write_batch(watch: str, rows: int) -> None:
        base = dt.datetime(2024, 1, 16)
        with open(f"{watch}/batch0.json", "w") as f:
            for i in range(rows):
                ts = (base + dt.timedelta(seconds=i % 1800)).isoformat()
                f.write(
                    '{"sensor_id": "S%03d", "temperature": %.1f, "timestamp": "%s"}\n'
                    % (i % 10 + 1, 50.0 + (i % 400) / 10.0, ts)
                )

    def run_once(rows: int) -> tuple[float, dict[str, float]]:
        watch = tempfile.mkdtemp(prefix="bench_stream_")
        write_batch(watch, rows)
        runs, splits = [], {}
        try:
            t0 = time.perf_counter()
            stream = with_event_time(read_sensor_stream(spark, watch))
            runs = [
                ("running", MemorySinkRun(spark, running_sensor_stats(stream), output_mode="update")),
                ("tumbling", MemorySinkRun(spark, tumbling_window_stats(stream), output_mode="update")),
                ("sliding", MemorySinkRun(spark, sliding_window_max(stream), output_mode="update")),
            ]
            for qname, r in runs:
                q0 = time.perf_counter()
                r.process_all()
                splits[qname] = round(time.perf_counter() - q0, 3)
            wall = round(time.perf_counter() - t0, 3)
        finally:
            for _, r in runs:
                r.stop()
            shutil.rmtree(watch, ignore_errors=True)
        return wall, splits

    run_once(2_000)  # warm-up: state-store / sink / listing init
    wall, splits = run_once(n_rows)
    wall2, splits2 = run_once(n_rows)
    if wall2 < wall:
        wall, splits = wall2, splits2
    splits["adc_retrieval"] = _bench_streaming_retrieval(spark)
    return {
        "streaming_3query_rows": n_rows,
        "streaming_3query_wall_sec": wall,
        "streaming_query_splits_sec": splits,
    }


def _bench_streaming_retrieval(spark, n_queries: int = 32) -> float:
    """Online ANN retrieval: one micro-batch of ``n_queries`` external
    query embeddings scored against the PQ-compressed corpus via the
    foreachBatch ADC handler, reading the MATERIALIZED codes table (built
    once, outside the timed window — the build-once/query-forever split
    that is the point of PQ at scale).  Best-of-2 after a warm-up, same
    protocol as the other streaming figures."""
    import json as _json
    import shutil
    import tempfile
    import time

    from hadoop_pyspark_streaming_analytics_spark.operators.similarity import (
        materialize_pq_index,
    )
    from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table
    from hadoop_pyspark_streaming_analytics_spark.streaming.extensions import (
        foreach_batch_adc_topk,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idx = tempfile.mkdtemp(prefix="bench_pq_idx_")
    watch = tempfile.mkdtemp(prefix="bench_adc_q_")
    try:
        materialize_pq_index(spark, sf_dir, idx)
        qrows = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .limit(n_queries)
            .collect()
        )
        with open(f"{watch}/q0.json", "w") as f:
            for r in qrows:
                f.write(
                    _json.dumps(
                        {
                            "query_id": int(r["vec_id"]) + 10_000_000,
                            "q_emb": [float(x) for x in r["embedding"]],
                        }
                    )
                    + "\n"
                )

        def run_once() -> float:
            ckpt = tempfile.mkdtemp(prefix="bench_adc_ck_")
            out = tempfile.mkdtemp(prefix="bench_adc_out_")
            try:
                t0 = time.perf_counter()
                q = (
                    spark.readStream.schema("query_id bigint, q_emb array<float>")
                    .json(watch)
                    .writeStream.foreachBatch(
                        foreach_batch_adc_topk(sf_dir, out, codes_path=idx)
                    )
                    .option("checkpointLocation", ckpt)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                return time.perf_counter() - t0
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
                shutil.rmtree(out, ignore_errors=True)

        run_once()  # warm-up
        return round(min(run_once(), run_once()), 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(watch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
