"""Adjudicate BENCH_r11's one live streaming flag (VERDICT r11 item 4):
the 3-query wall read 4.721 s on the round-11 driver run vs 2.913 s in the
prior capture — raw 1.62x / drift-adjusted 1.44x, flagged by bench.py's own
two-bar basis.

Hypothesis under test (named, falsifiable): round 11 ALSO changed the
sampling protocol for this figure — from back-to-back best-of-2 to
interleaved round-robin with the four other streaming samplers (ADC
retrieval x2, lexical BM25, curation).  Under interleaving, each 3-query
sample runs AFTER the other samplers' work, which perturbs page cache,
JVM/GC state, and the shared local scheduler — so the r10 and r11 captures
measured DIFFERENT protocols, and the 1.62x may be protocol-induced
systematic cost rather than host state or an engine regression.

Method: ONE session (bench's own get_spark), the other samplers' setup +
warm-up paid up front exactly as bench.py does, then alternating samples:

  isolated:    run_once(50k) with nothing between samples
  interleaved: adc(); adcp(); lex(); cur(); then run_once(50k)
               (the bench protocol's per-round companion work)

Alternation (I, X, I, X, ...) puts host drift equally on both arms.
Verdict rule (three branches, covering the outcome space):
1. median(interleaved)/median(isolated) >= 1.3 → the flag is CLOSED as
   protocol-systematic (named diff: the r11 interleaving change itself);
2. ratio < 1.3 AND the isolated arm sits inside the documented same-code
   spread (3.3-5.7 s, SCALE.md r11 session walls) → the protocol
   hypothesis is REFUTED and the flag is CLOSED as host state: the
   flagged driver reading is a typical draw of the same-code
   distribution the isolated arm reproduces, and the prior capture was
   a fast-end draw;
3. ratio < 1.3 AND the isolated arm sits OUTSIDE that spread → neither
   explanation holds; the flag stays open pending BENCH_r12.
(The run that adjudicated BENCH_r11's flag measured ratio 1.17 with the
isolated arm at 4.1-4.5 s — branch 2.)

Usage: python scripts/adjudicate_3query_wall.py [n_pairs]
Writes one JSON line to stdout; paste the result into SCALE.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module; reuses its samplers verbatim)
from hadoop_pyspark_streaming_analytics_spark.session import get_spark  # noqa: E402
from hadoop_pyspark_streaming_analytics_spark.sources.readers import (  # noqa: E402
    read_sensor_stream,
)
from hadoop_pyspark_streaming_analytics_spark.streaming.harness import (  # noqa: E402
    MemorySinkRun,
)
from hadoop_pyspark_streaming_analytics_spark.streaming.queries import (  # noqa: E402
    running_sensor_stats,
    sliding_window_max,
    tumbling_window_stats,
    with_event_time,
)

N_ROWS = 50_000


def write_batch(watch: str, rows: int) -> None:
    # Byte-for-byte the bench.py micro-batch generator.
    base = dt.datetime(2024, 1, 16)
    with open(f"{watch}/batch0.json", "w") as f:
        for i in range(rows):
            ts = (base + dt.timedelta(seconds=i % 1800)).isoformat()
            f.write(
                '{"sensor_id": "S%03d", "temperature": %.1f, "timestamp": "%s"}\n'
                % (i % 10 + 1, 50.0 + (i % 400) / 10.0, ts)
            )


def run_once(spark, rows: int) -> float:
    watch = tempfile.mkdtemp(prefix="adjudicate_stream_")
    write_batch(watch, rows)
    runs = []
    try:
        t0 = time.perf_counter()
        stream = with_event_time(read_sensor_stream(spark, watch))
        # append one-by-one so a constructor failure mid-list still leaves
        # every already-started query in `runs` for the finally to stop —
        # a leaked query would contaminate every later A/B sample.
        for q in (running_sensor_stats, tumbling_window_stats, sliding_window_max):
            runs.append(MemorySinkRun(spark, q(stream), output_mode="update"))
        for r in runs:
            r.process_all()
        return round(time.perf_counter() - t0, 3)
    finally:
        for r in runs:
            r.stop()
        shutil.rmtree(watch, ignore_errors=True)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="adjudicate-3query-wall")
    spark.sparkContext.setLogLevel("WARN")
    isolated: list[float] = []
    interleaved: list[float] = []
    with (
        bench._streaming_retrieval_sampler(spark) as adc,
        bench._streaming_retrieval_sampler(spark, nprobe=2) as adcp,
        bench._streaming_lexical_sampler(spark) as lex,
        bench._streaming_curation_sampler(spark) as cur,
    ):
        run_once(spark, 2_000)  # state-store / sink / listing init
        for _ in range(n_pairs):
            isolated.append(run_once(spark, N_ROWS))
            adc()
            adcp()
            lex()
            cur()
            interleaved.append(run_once(spark, N_ROWS))
    med_i = statistics.median(isolated)
    med_x = statistics.median(interleaved)
    ratio = round(med_x / med_i, 4) if med_i else None
    print(
        json.dumps(
            {
                "metric": "streaming_3query_wall_protocol_ab",
                "n_rows": N_ROWS,
                "isolated_sec": isolated,
                "interleaved_sec": interleaved,
                "median_isolated_sec": med_i,
                "median_interleaved_sec": med_x,
                "interleaved_over_isolated": ratio,
                "protocol": "alternating I,X pairs, one session, "
                "samplers' setup+warmup paid up front (bench parity)",
            }
        )
    )


if __name__ == "__main__":
    main()
