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
    for spec in specs:
        try:
            spec.builder(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

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
        timings[spec.name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
