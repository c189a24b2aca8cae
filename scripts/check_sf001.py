#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run every oracle-backed
catalog query on Spark AND DuckDB at sf0.01 and diff.

``--vanilla`` replicates the driver's exact environment — a stock
SparkSession with NONE of session.py's configs (the engine must pin its
runtime requirements itself, e.g. the nanos-timestamp conf in
sources/readers.py) — the strictest pre-driver check.  Oracle-less
entries (the HLL sketch tier) get the driver's weaker rows-only check.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG
from tests.oracle import compare

args = [a for a in sys.argv[1:] if not a.startswith("--")]
VANILLA = "--vanilla" in sys.argv
SF = args[0] if args else "/root/testdata/sf0.01"
#: --only=name1,name2 runs just those entries (iteration aid).
ONLY = {
    n
    for a in sys.argv[1:]
    if a.startswith("--only=")
    for n in a.split("=", 1)[1].split(",")
    if n
}


def main() -> int:
    if VANILLA:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "sf001-check-vanilla"
        ).getOrCreate()
    else:
        from hadoop_pyspark_streaming_analytics_spark.session import get_spark

        spark = get_spark(app_name="sf001-check")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for spec in CATALOG:
        if ONLY and spec.name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.builder(spark, SF).count()
                print(f"ROWS {spec.name}: {n} ({time.perf_counter() - t0:.1f}s)")
                continue
            compare(spec, spark, SF)
            print(f"OK   {spec.name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL {spec.name}: {str(exc)[:500]}")
    spark.stop()
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
