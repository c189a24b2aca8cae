"""Temporal join operators — the canonical "operators Spark lacks"
(as-of join, interval/range join, range window frames), each composed
scale-first from stock DataFrame primitives over the ``events`` table.
Beyond the reference surface (SURVEY.md §2.4 lists no theta/range/as-of
joins; §2.6 lists no range frames).

Scale shapes:

- **as-of join** = union both sides, ONE shuffle on the key, then a
  running ``last(..., ignorenulls)`` over an ordered window.  This is the
  sort-merge as-of: no range-condition join (which Spark would plan as a
  broadcast-nested-loop or an exploding banded join), no per-row probe.
  State per key is one carried row — the same shape TimescaleDB/kdb use.
- **interval join** = equi-join on the key + range predicate pushed into
  the join condition; Spark plans the equi part as a hash/sort-merge join
  and applies the band filter on matches.  Bounded fan-out: only pairs
  within the band survive.  (For band >> key cardinality, bucket the time
  axis and join on (key, bucket ± 1) — noted, not needed at this band.)
- **range window frame** = ``RANGE BETWEEN <interval> PRECEDING`` over an
  event-time ordering: per-key time-decayed counts without any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_events


def _dedup_right(clicks: DataFrame) -> DataFrame:
    """Deterministic right side: one row per (user, ts) — ties collapse to
    the highest event_id (both engines pick the same winner)."""
    return clicks.groupBy("user_id", "ts").agg(
        F.max("event_id").alias("click_event_id"),
        F.expr("max_by(value, event_id)").alias("click_value"),
    )


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: each 'error' event matched to the same user's most
    recent 'click' at-or-before it (inclusive), plus seconds elapsed.

    Composition: union click/error rows, one hash partition by user,
    order by (ts, kind) — clicks sort before a same-instant error so the
    match is inclusive — and carry the last non-null click forward.  The
    DuckDB oracle is its native ``ASOF LEFT JOIN``; the hash match proves
    the composition implements the operator exactly."""
    ev = load_events(spark, sf_dir)
    clicks = _dedup_right(ev.filter(F.col("event_type") == "click"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id",
        F.col("ts").alias("t"),
        "click_event_id",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("kind"),
    ).unionByName(
        errors.select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(None).cast("bigint").alias("click_event_id"),
            "event_id",
            F.lit(1).alias("kind"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("t")), ignorenulls=True).over(w),
    ).withColumn(
        "last_click_id",
        F.last("click_event_id", ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("ts"),
            "last_click_ts",
            "last_click_id",
            F.round(
                (F.unix_micros("t") - F.unix_micros("last_click_ts")) / 1e6, 3
            ).alias("secs_since_click"),
        )
    )


def click_error_pairs(
    spark: SparkSession, sf_dir: str, band_minutes: int = 5
) -> DataFrame:
    """INTERVAL (banded range) JOIN: (click, error) pairs for the same user
    where the error follows the click within ``band_minutes`` (exclusive
    zero — simultaneous events don't pair)."""
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    band_us = band_minutes * 60 * 1_000_000
    gap_us = F.unix_micros("error_ts") - F.unix_micros("click_ts")
    return (
        clicks.join(errors, "user_id")
        .filter((gap_us > 0) & (gap_us <= band_us))
        .select(
            "user_id",
            "click_id",
            "error_id",
            F.round(gap_us / 1e6, 3).alias("secs_between"),
        )
    )


def clicks_in_trailing_window(
    spark: SparkSession, sf_dir: str, minutes: int = 5
) -> DataFrame:
    """RANGE window frame: for every event, how many clicks the same user
    made in the trailing ``minutes`` (inclusive of now) — per-key trailing
    aggregation with NO join, the frame slides over event time."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-minutes * 60 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("clicks_trailing"),
    )
