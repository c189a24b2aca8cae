#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run every oracle-backed
catalog query on Spark AND DuckDB at sf0.01 and diff."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG
from hadoop_pyspark_streaming_analytics_spark.session import get_spark
from tests.oracle import compare

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark(app_name="sf001-check")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for spec in CATALOG:
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        try:
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
