"""CLI entry point — the engine's equivalent of the reference's
``spark-submit q2_ecommerce_analysis.py <path>`` scripts (reference:
q2_ecommerce_analysis.py:313-321, README.md:45).

Usage:
    python -m hadoop_pyspark_streaming_analytics_spark list
    python -m hadoop_pyspark_streaming_analytics_spark run <query> \
        [--sf-dir DIR] [--limit N] [--csv OUT] [--parquet OUT] [--explain]

``run`` executes any catalog query by name, shows the first N rows, and
optionally writes the full result (CSV kept single-file for parity with
the reference's ``coalesce(1)`` artifacts — pass --parquet for the scale
path).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="hadoop_pyspark_streaming_analytics_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries")
    run = sub.add_parser("run", help="run a catalog query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--csv", help="write full result as a single CSV file")
    run.add_argument("--parquet", help="write full result as parquet")
    run.add_argument("--explain", action="store_true", help="print the physical plan")
    args = parser.parse_args(argv)

    from .plans.catalog import CATALOG, get

    if args.cmd == "list":
        for spec in CATALOG:
            marks = "".join(
                m for m, on in (("*", spec.headline), ("o", spec.oracle is not None)) if on
            )
            print(f"{spec.name:35s} [{','.join(spec.tags)}] {marks}")
        return 0

    try:
        spec = get(args.query)
    except KeyError:
        print(f"unknown query: {args.query!r} (see `list`)", file=sys.stderr)
        return 2

    from .session import get_spark
    from .sources.sinks import write_csv, write_parquet

    spark = get_spark(app_name=f"cli:{spec.name}")
    spark.sparkContext.setLogLevel("WARN")
    df = spec.builder(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    if args.csv:
        write_csv(df, args.csv, single_file=True)
        print(f"wrote CSV to {args.csv}")
    if args.parquet:
        write_parquet(df, args.parquet)
        print(f"wrote parquet to {args.parquet}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
