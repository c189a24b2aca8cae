"""Binned non-equi interval join (operators/intervals.py) and the
asymmetric containment dedup (operators/dedup.py:containment_pairs).

The oracle-parity of the two catalog entries is covered by
test_catalog_oracle; here we pin (a) the join semantics against a naive
cross-join spelling, (b) the plan shape (no nested-loop/cartesian), and
(c) the containment-vs-Jaccard asymmetry that motivates the operator.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from hadoop_pyspark_streaming_analytics_spark.operators import dedup
from hadoop_pyspark_streaming_analytics_spark.operators.intervals import (
    binned_interval_join,
    error_bursts,
    purchases_during_error_bursts,
)

from .test_plan_shapes import plan_of


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )


def test_binned_join_matches_naive_cross_join(spark):
    """The binned equi-join must produce exactly the rows of the naive
    ``BETWEEN`` cross join — for every bin width, including widths far
    smaller and far larger than the intervals (bin width is an efficiency
    knob, never a correctness knob)."""
    points = spark.createDataFrame(
        [Row(pid=i, ts=_ts(i * 7)) for i in range(30)]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=1, j_start=_ts(5), j_end=_ts(45)),
            Row(iid=2, j_start=_ts(40), j_end=_ts(80)),  # overlaps iid=1
            Row(iid=3, j_start=_ts(200), j_end=_ts(200)),  # zero-width, no hits
        ]
    )
    naive = (
        points.crossJoin(intervals)
        .filter(F.col("ts").between(F.col("j_start"), F.col("j_end")))
        .select("pid", "iid")
    )
    expected = sorted(map(tuple, naive.collect()))
    assert len(expected) > 0
    # a point inside the iid=1/iid=2 overlap must appear under BOTH
    assert len({p for p, _ in expected}) < len(expected)
    for width in (60, 600, 3600, 86400):
        got = binned_interval_join(
            points, intervals, "ts", bin_seconds=width
        ).select("pid", "iid")
        assert sorted(map(tuple, got.collect())) == expected, f"width={width}"


def test_binned_join_plan_has_no_nested_loop(spark, sf_dir):
    """The whole point of binning: the non-equi time predicate must NOT
    plan as BroadcastNestedLoopJoin or CartesianProduct — the bin equi-key
    carries the join; the BETWEEN runs as a post-join filter."""
    plan = plan_of(purchases_during_error_bursts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_error_bursts_split_at_midnight(spark):
    """The scale contract: bursts are day-partitioned (parallel
    sessionization), so a run of errors straddling midnight yields one
    burst per calendar day."""
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1, 23, 58) + dt.timedelta(minutes=i),
                event_type="error",
                user_id=1,
                value=1.0,
            )
            for i in range(5)  # 23:58 .. 00:02 — one gap-free run
        ]
    )
    got = sorted(
        error_bursts(ev, gap="5 minutes").collect(), key=lambda r: r.burst_start
    )
    assert [r.n_errors for r in got] == [2, 3]
    assert got[0].burst_end.day == 1 and got[1].burst_start.day == 2


def test_containment_catches_subdocument_jaccard_misses(spark):
    """A short doc fully embedded in a much larger one: containment 1.0,
    Jaccard well under any useful threshold — the pair the symmetric
    operator is blind to."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{chr(97 + i)} pad{chr(97 + i)} word{chr(97 + i)}" for i in range(20))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=small), Row(doc_id=2, text=big)]
    )
    sh = dedup.doc_shingles(docs, 3)
    got = dedup.containment_pairs_from_shingles(sh, df_cap=5, threshold=0.8).collect()
    assert len(got) == 1
    row = got[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.containment >= 0.999
    # the same pair is invisible to Jaccard >= 0.5
    jac = row.intersection / (row.size_a + row.size_b - row.intersection)
    assert jac < 0.5


def test_containment_df_cap_blocks_hot_shingle_candidates(spark):
    """Docs sharing ONLY an above-cap shingle must not pair (the bounded-
    fan-out guarantee); docs paired via a rare shingle still count hot
    shingles toward the intersection."""
    hot = "common boiler plate"
    docs = spark.createDataFrame(
        # 6 docs all containing the hot shingle (df=6 > cap=5), otherwise
        # disjoint — no pair may form.
        [Row(doc_id=i, text=f"{hot} unique{i} only{i} here{i}") for i in range(6)]
    )
    sh = dedup.doc_shingles(docs, 3)
    assert dedup.containment_pairs_from_shingles(sh, df_cap=5, threshold=0.1).count() == 0
    # add a pair sharing a rare shingle AND the hot one: candidate forms
    # via the rare shingle; the hot shingle still counts in intersection.
    docs2 = spark.createDataFrame(
        [Row(doc_id=i, text=f"{hot} unique{i} only{i} here{i}") for i in range(6)]
        + [
            Row(doc_id=10, text=f"{hot} rare pair shingle"),
            Row(doc_id=11, text=f"{hot} rare pair shingle trailing extra words"),
        ]
    )
    sh2 = dedup.doc_shingles(docs2, 3)
    got = {
        (r.doc_a, r.doc_b): r
        for r in dedup.containment_pairs_from_shingles(
            sh2, df_cap=5, threshold=0.5
        ).collect()
    }
    assert set(got) == {(10, 11)}
    # doc 10's full shingle set ("common boiler plate", "boiler plate rare",
    # "plate rare pair", "rare pair shingle") is contained in doc 11's.
    assert got[(10, 11)].containment >= 0.999
    assert got[(10, 11)].intersection == got[(10, 11)].size_a
