#!/usr/bin/env python3
"""Catalog plan census: parquet-scan and Exchange counts per entry, plus
optional ``explain("formatted")`` dumps for before/after evidence.

One command for both censuses (VERDICT r15 item 7): for every catalog
entry (or the names given), build the DataFrame at ``--sf-dir`` and count

* ``Scan parquet`` node headers in the formatted plan (each parquet scan
  prints one ``(n) Scan parquet`` header; the details section repeats the
  string, so only tree-line headers ``(n) Scan parquet`` are counted);
* ``Exchange`` node headers (shuffles), and ``ReusedExchange`` separately.

Builders that localCheckpoint eagerly execute their pinned subtrees at
build time, exactly as the driver/bench sees them — the counts reflect
the plan of the RETURNED frame, i.e. what re-executes per action at
scale.

Usage:
  python scripts/plan_census.py [--sf-dir DIR] [--dump-dir DIR --suffix S]
                                [name ...]
With ``--dump-dir`` the formatted plan of each named entry is written to
``<dump-dir>/<name>_<suffix>.txt`` (the round's plans/r16 evidence files).
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="entry names (default: all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--min-scans", type=int, default=0,
                    help="only print entries with at least this many scans")
    ap.add_argument("--dups", action="store_true",
                    help="group scan nodes by parquet path and print only "
                         "entries scanning the SAME table more than once — "
                         "raw scan counts include legitimate multi-table "
                         "joins, so this is the amplification signal "
                         "(round-17 census mode)")
    args = ap.parse_args()

    from hadoop_pyspark_streaming_analytics_spark.plans import CATALOG
    from hadoop_pyspark_streaming_analytics_spark.session import get_spark

    spark = get_spark(app_name="plan_census")
    spark.sparkContext.setLogLevel("ERROR")

    want = set(args.names)
    specs = [s for s in CATALOG if not want or s.name in want]
    missing = want - {s.name for s in specs}
    if missing:
        raise SystemExit(f"unknown entry name(s): {sorted(missing)}")

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)

    node = re.compile(r"^\s*\(\d+\) (\w[\w ]*)", re.MULTILINE)
    loc = re.compile(r"Location: \w+ \[file:([^\]]+)\]")
    rows = []
    for spec in specs:
        try:
            df = spec.builder(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 - census must not abort
            rows.append((spec.name, None, None, None, f"{type(exc).__name__}: {exc}"))
            continue
        if args.dups:
            from collections import Counter

            tables = Counter(
                p.rsplit("/", 1)[-1] for p in loc.findall(plan)
            )
            dups = {t: c for t, c in tables.items() if c > 1}
            if dups:
                print(f"{spec.name:42s} {dups}")
            continue
        heads = node.findall(plan)
        scans = sum(1 for h in heads if h.startswith("Scan parquet"))
        exch = sum(1 for h in heads if h.startswith("Exchange"))
        reused = sum(1 for h in heads if h.startswith("ReusedExchange"))
        rows.append((spec.name, scans, exch, reused, None))
        if args.dump_dir:
            out = os.path.join(args.dump_dir, f"{spec.name}_{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)

    if not args.dups:
        print(f"{'entry':42s} {'scans':>5s} {'exch':>4s} {'reuse':>5s}")
    for name, scans, exch, reused, err in rows:
        if err is not None:
            print(f"{name:42s}   ERR {err}")
        elif scans >= args.min_scans:
            print(f"{name:42s} {scans:5d} {exch:4d} {reused:5d}")


if __name__ == "__main__":
    main()
