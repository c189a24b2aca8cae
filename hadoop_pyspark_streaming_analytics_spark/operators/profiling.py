"""Dataset profiling and distribution-drift monitoring: the operational
tier a 100 TB ingest runs BEFORE trusting a new snapshot — per-column
profiles (nulls / cardinality / bounds) and population-stability-index
(PSI) drift between two time halves of the stream, numeric and
categorical.

PSI is the standard model-monitoring drift score (Siddiqi, "Credit Risk
Scorecards"): PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref), with the
conventional reading <0.1 stable / 0.1–0.25 shifting / >0.25 drifted.
Counts are Laplace-smoothed (+0.5 per bin) so empty bins stay finite.

Scale notes (100 TB):
* ``column_profile`` is ONE scan: every metric for every column is a
  single ``agg(...)`` row (map-side partial aggregation; the only shuffle
  carries per-partition partials), exploded to per-column rows afterwards
  — never a scan per column.  Exact ``count_distinct`` is the one
  corpus-proportional term (its partials carry per-column distinct sets);
  ``approx=True`` swaps in HLL ``approx_count_distinct`` for the
  monitoring path where ±2% is fine — the oracle gates the exact
  spelling.
* The drift reports make three passes over events (ts bounds → reference
  value bounds → binned counts), each a full-scan aggregate with 1-row
  broadcast results attached to the next pass — no corpus-sized join or
  window anywhere; the fused/report tables are bins- or category-grain.
* The time split is the epoch midpoint (min+max)/2 — a pure column
  expression both engines evaluate identically (no quantile, no
  per-partition state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round2, round4
from ..sources.readers import load_events, load_table

#: PSI histogram width (shared with the DuckDB oracles — ADVICE r5
#: constants discipline).
PSI_BINS = 10

#: Profiled table and its type-aware min/max renderings: every engine
#: formatter has an oracle twin in plans/llm_catalog.py keyed off this
#: list, so adding a column here without an oracle arm is a test failure,
#: not a silent gap.
PROFILE_TABLE = "orders"
PROFILE_COLUMNS = (
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "money"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
)


def _render(col: Column, kind: str) -> Column:
    """Cross-engine-stable string rendering for min/max values.  Doubles
    go through the money rounding (decimal(18,2)) because a raw
    double→string cast is formatted differently by Spark ("1.0E7") and
    DuckDB; timestamps are formatted explicitly for the same reason (the
    r3 timestamp-flavor drift)."""
    if kind == "money":
        return round2(col).cast("decimal(18,2)").cast("string")
    if kind == "timestamp":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def column_profile(
    spark: SparkSession,
    sf_dir: str,
    table: str = PROFILE_TABLE,
    columns: tuple[tuple[str, str], ...] = PROFILE_COLUMNS,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile of one table — (col_name, n_rows, n_null,
    n_distinct, min_value, max_value) — computed in a single scan.

    ``approx=True`` is the 100 TB monitoring spelling: HLL cardinalities
    (bounded-size partials) instead of exact distinct sets.
    """
    return profile_frame(load_table(spark, sf_dir, table), columns, approx)


def profile_frame(
    df: DataFrame,
    columns: tuple[tuple[str, str], ...] = PROFILE_COLUMNS,
    approx: bool = False,
) -> DataFrame:
    """The single-scan profile core over an arbitrary frame — shared by
    the batch catalog entry and the streaming per-micro-batch monitor
    (streaming/extensions.py:foreach_batch_profile_monitor), so the two
    faces compute identical metrics."""
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in columns:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nnull"),
            distinct(c).alias(f"{c}__ndist"),
            _render(F.min(c), kind).alias(f"{c}__min"),
            _render(F.max(c), kind).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"{c}__nnull").alias("n_null"),
                    F.col(f"{c}__ndist").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c, _ in columns
            ]
        )
    ).alias("p")
    return one.select(rows).select(
        "p.col_name",
        "p.n_rows",
        "p.n_null",
        "p.n_distinct",
        "p.min_value",
        "p.max_value",
    )


def _events_with_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + ``is_ref`` (first time half).  The midpoint is a 1-row
    aggregate attached by broadcast — checkpoint-pinned (round-16
    census): every drift consumer that executes the split frame more
    than once (numeric PSI's ref-bounds + binning passes, the rollup's
    four report aggregates) was silently re-running the midpoint's own
    full ts scan per execution.  Pinned, the midpoint costs exactly one
    ts-only pass regardless of how many passes the consumer makes."""
    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2.0)
        ).alias("mid")
    ).localCheckpoint(eager=True)
    return ev.crossJoin(F.broadcast(mid)).withColumn(
        "is_ref", F.unix_micros(F.col("ts")) < F.col("mid")
    )


def numeric_drift_psi(
    spark: SparkSession, sf_dir: str, n_bins: int = PSI_BINS
) -> DataFrame:
    """PSI of ``events.value`` between the two time halves, binned on
    ``n_bins`` fixed-width bins over the REFERENCE half's [min, max]
    (current-half outliers clamp to the edge bins — the production
    convention, so a drifted tail registers as edge-bin mass, not a
    crash).  NULL values drop from both halves symmetrically.

    Output is the full per-bin report (a bin spine keeps empty bins
    visible) plus the repeated ``psi_total`` so the single headline number
    needs no second query.
    """
    e = _events_with_split(spark, sf_dir).select("value", "is_ref")
    return _numeric_psi_from(spark, e, n_bins)


def _numeric_psi_from(
    spark: SparkSession, e: DataFrame, n_bins: int = PSI_BINS
) -> DataFrame:
    """PSI-report core over a prepared (value, is_ref) frame — split out
    so the degenerate-range guard is testable on a constructed constant
    fixture without a parquet detour.

    Degenerate-range guard (ADVICE r6): a constant reference half makes
    the bin width (rmax - rmin) / n_bins = 0, and 0/0 is NaN — Spark
    sorts NaN greatest, so every row would silently land in the top bin
    (and DuckDB's NaN handling could diverge from the oracle).  A width
    floor of 1.0 when rmax == rmin keeps the expression defined: the
    reference mass lands in bin 0 and drifted current-half values clamp
    through the same least/greatest edges as any other outlier.  The
    oracle carries the identical CASE guard."""
    # Round-16 census fix: the report tail below consumes ``filled``
    # twice (totals + probs) and ``rb`` feeds the corpus-sized binning
    # pass — unpinned, the executedPlan re-ran the events subtree per
    # consumer (8 scans; with the midpoint pin in _events_with_split the
    # minimum this three-pass algorithm admits is midpoint → ref bounds
    # → binned counts = 3).  Both frames are 1-row / n_bins-row — the
    # corpus.py:260 "N consumers, one scan" checkpoint convention.
    rb = (
        e.filter("is_ref")
        .agg(F.min("value").alias("rmin"), F.max("value").alias("rmax"))
        .localCheckpoint(eager=True)
    )
    span = F.col("rmax") - F.col("rmin")
    width = F.when(span == 0, F.lit(1.0)).otherwise(span / n_bins)
    binned = e.crossJoin(F.broadcast(rb)).select(
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("value") - F.col("rmin")) / width),
            ),
        )
        .cast("int")
        .alias("bin_idx"),
        "is_ref",
    )
    counts = binned.groupBy("bin_idx").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin_idx"))
    filled = (
        spine.join(counts, "bin_idx", "left")
        .select(
            "bin_idx",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .localCheckpoint(eager=True)
    )
    totals = filled.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    probs = filled.crossJoin(F.broadcast(totals)).select(
        "bin_idx",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * n_bins)).alias("pr"),
        ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * n_bins)).alias("pc"),
    )
    terms = probs.withColumn(
        "term", (F.col("pc") - F.col("pr")) * F.log(F.col("pc") / F.col("pr"))
    )
    w = Window.partitionBy()  # bins-grain: n_bins rows total
    return terms.select(
        "bin_idx",
        "n_ref",
        "n_cur",
        round4(F.col("pr")).alias("ref_frac"),
        round4(F.col("pc")).alias("cur_frac"),
        F.round(F.col("term") + F.lit(1e-8), 6).alias("psi_term"),
        F.round(F.sum("term").over(w) + F.lit(1e-8), 6).alias("psi_total"),
    )


def psi_report(
    counts: DataFrame, key: str, by: tuple[str, ...] = ()
) -> DataFrame:
    """Categorical PSI over a pre-counted (key, n_ref, n_cur) table —
    ONE definition of the smoothing/score math, shared by the batch
    midpoint report, the streaming per-micro-batch monitor
    (streaming/extensions.py:foreach_batch_drift_monitor), and the
    batch-grain rollup twin, so the faces cannot drift.  The category
    space is the table's own key set, Laplace-smoothed by its size; the
    input is category-grain (bounded), so the totals row(s) and the
    window are trivially small.

    ``by`` (optional grouping keys, e.g. ``("batch_id",)``) computes one
    independent PSI per group — totals, category count, and the score
    window all partition on it, exactly as if :func:`psi_report` ran
    per group (pytest-pinned equivalence)."""
    totals = counts.groupBy(*by).agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("k_cats"),
    )
    probs = (
        counts.join(F.broadcast(totals), list(by))
        if by
        else counts.crossJoin(F.broadcast(totals))
    ).select(
        *by,
        key,
        "n_ref",
        "n_cur",
        (
            (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("k_cats"))
        ).alias("pr"),
        (
            (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("k_cats"))
        ).alias("pc"),
    )
    terms = probs.withColumn(
        "term", (F.col("pc") - F.col("pr")) * F.log(F.col("pc") / F.col("pr"))
    )
    w = Window.partitionBy(*by)  # category-grain rows
    return terms.select(
        *by,
        key,
        "n_ref",
        "n_cur",
        round4(F.col("pr")).alias("ref_frac"),
        round4(F.col("pc")).alias("cur_frac"),
        F.round(F.col("term") + F.lit(1e-8), 6).alias("psi_term"),
        F.round(F.sum("term").over(w) + F.lit(1e-8), 6).alias("psi_total"),
    )


def categorical_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical PSI of the ``event_type`` mix between the two time
    halves — the schema-free twin of :func:`numeric_drift_psi` (the bin
    space is the observed category set, Laplace-smoothed by its own
    size).  The category-grain counts are checkpoint-pinned:
    :func:`psi_report` consumes its input twice (totals + probs), and
    unpinned each consumer re-executed the corpus pass — 4 events scans
    in the executedPlan (round-15 census), now zero with the counts
    materialized once."""
    e = _events_with_split(spark, sf_dir).select("event_type", "is_ref")
    counts = (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
        )
        .localCheckpoint(eager=True)
    )
    return psi_report(counts, "event_type")


#: Quantile probes for the binless drift report (shared with the oracle).
#: IQR is defined from the 0.25/0.75 entries — keep both in the tuple.
DRIFT_QS = (0.25, 0.5, 0.75, 0.9)


def quantile_shift_drift(
    spark: SparkSession, sf_dir: str, qs: tuple[float, ...] = DRIFT_QS
) -> DataFrame:
    """BINLESS numeric drift between the two time halves: per probe
    quantile, the reference and current exact values, the absolute
    shift, and the shift in units of the reference IQR — the
    scale-free number a monitor thresholds (|shift| > 0.5 IQR at the
    median is a real move regardless of the column's units).

    Complements :func:`numeric_drift_psi`: PSI sees MASS moving between
    fixed bins (and needs the bin-edge choices); quantile shift sees the
    distribution's SHAPE sliding and needs no binning at all — a slow
    uniform creep that PSI smears across bins shows up crisply as a
    median shift.

    Plan: ONE scan, ONE aggregate — both halves' quantile arrays come
    from conditional ``percentile(CASE WHEN ...)`` expressions in a
    single agg row (nulls drop per half symmetrically), then the probe
    rows explode from the two arrays.  Exact percentile is the
    oracle-parity spelling; ``approx_percentile`` is the 100 TB
    monitoring twin (same trade as column_profile).  A degenerate
    reference IQR (constant middle half) reports shift_iqr 0.0 instead
    of dividing by zero — the PSI width-floor discipline."""
    e = _events_with_split(spark, sf_dir).select("value", "is_ref")
    arr = ", ".join(repr(q) + "D" for q in qs)
    one = e.agg(
        F.expr(
            f"percentile(CASE WHEN is_ref THEN value END, array({arr}))"
        ).alias("rq"),
        F.expr(
            f"percentile(CASE WHEN NOT is_ref THEN value END, array({arr}))"
        ).alias("cq"),
    )
    return _quantile_report_from(one, qs)


def quantile_reference(
    df: DataFrame, value_col: str = "value", qs: tuple[float, ...] = DRIFT_QS
) -> list[float]:
    """The frozen reference quantile array from a trusted snapshot — the
    build-once artifact the streaming quantile monitor compares every
    micro-batch against (one bounded collect of ``len(qs)`` doubles)."""
    arr = ", ".join(repr(q) + "D" for q in qs)
    row = df.agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("rq")
    ).collect()[0]
    return [float(v) for v in row["rq"]]


def _quantile_report_from(
    one: DataFrame, qs: tuple[float, ...], by: tuple[str, ...] = ()
) -> DataFrame:
    """The shared report tail over a frame carrying ``rq``/``cq``
    quantile arrays (1 row, or 1 row per ``by`` group) — one definition
    for the batch midpoint report, the streaming per-micro-batch
    monitor, and the batch-grain rollup twin, so the shift math
    (including the degenerate-IQR guard) cannot drift between faces."""
    i25, i75 = qs.index(0.25) + 1, qs.index(0.75) + 1
    iqr = F.element_at("rq", i75) - F.element_at("rq", i25)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("quantile"),
                    F.element_at("rq", i + 1).alias("rv"),
                    F.element_at("cq", i + 1).alias("cv"),
                )
                for i, q in enumerate(qs)
            ]
        )
    ).alias("p")
    return (
        one.select(*by, rows, iqr.alias("ref_iqr"))
        .select(
            *by,
            F.col("p.quantile").alias("quantile"),
            round4(F.col("p.rv")).alias("ref_value"),
            round4(F.col("p.cv")).alias("cur_value"),
            round4(F.col("p.cv") - F.col("p.rv")).alias("abs_shift"),
            F.when(F.col("ref_iqr") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("p.cv") - F.col("p.rv")) / F.col("ref_iqr")
                    + F.lit(1e-8),
                    4,
                )
            )
            .alias("shift_iqr"),
        )
        .orderBy(*by, "quantile")
    )


# ---------------------------------------------------------------------------
# Monitor rollup / alerting (VERDICT r7 item 3)
# ---------------------------------------------------------------------------

#: Alert thresholds per rollup metric (shared with the DuckDB oracle —
#: the constants discipline).  psi_total: the conventional >0.25 =
#: drifted reading; max_quantile_shift_iqr: a probe quantile moving by
#: more than half the reference IQR is a real shape move regardless of
#: units; null_rate_value: >5% nulls in a value column is a schema-ish
#: ingest failure (the excursion the profile monitor exists to catch).
MONITOR_THRESHOLDS = {
    "psi_total": 0.25,
    "max_quantile_shift_iqr": 0.5,
    "null_rate_value": 0.05,
}


def monitor_alert_rollup_from_reports(
    psi_reports: DataFrame,
    quantile_reports: DataFrame,
    profile_reports: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """The composed ALERTING face over the three monitor report stores
    (VERDICT r7 "what's missing" #3): per (metric, batch_id) — the
    batch's headline value, its threshold, whether it breached, and the
    metric's FIRST breach batch id (the question an on-call actually
    asks: "when did this start?").

    Inputs are report-shaped frames each carrying ``batch_id``:
    ``psi_reports`` category-grain rows with ``psi_total`` (repeated per
    category — max collapses it), ``quantile_reports`` probe-grain rows
    with ``shift_iqr``, ``profile_reports`` column-grain rows with
    ``n_rows``/``n_null`` (the ``value_col`` row feeds the null-rate
    metric).  Headlines: max(psi_total), max(|shift_iqr|),
    n_null/n_rows.

    Scale shape: report stores are batches × categories/probes/columns —
    metadata-sized by construction, never corpus-sized — so the rollup
    is a tiny read + three map-side-combined groupBys + one
    metric-partitioned window for first-breach.  Breach is evaluated on
    the 4dp-rounded headline (the oracle-parity discipline: both engines
    threshold the same rounded number, so a boundary value cannot flap
    between them)."""
    thr = MONITOR_THRESHOLDS

    def one_metric(per_batch: DataFrame, metric: str) -> DataFrame:
        return per_batch.select(
            F.lit(metric).alias("metric"),
            F.col("batch_id").cast("int").alias("batch_id"),
            round4(F.col("value")).alias("value"),
            F.lit(float(thr[metric])).alias("threshold"),
        )

    m_psi = one_metric(
        psi_reports.groupBy("batch_id").agg(
            F.max("psi_total").alias("value")
        ),
        "psi_total",
    )
    m_q = one_metric(
        quantile_reports.groupBy("batch_id").agg(
            F.max(F.abs(F.col("shift_iqr"))).alias("value")
        ),
        "max_quantile_shift_iqr",
    )
    m_null = one_metric(
        profile_reports.filter(F.col("col_name") == value_col)
        .groupBy("batch_id")
        .agg(
            (F.sum("n_null") / F.sum("n_rows")).alias("value")
        ),
        "null_rate_value",
    )
    w = Window.partitionBy("metric")
    # NULL-safe: an empty batch's profile report yields n_rows=0 and a
    # NULL null-rate — no evidence of a breach, so it must read as
    # unbreached (a NULL breached flag would also poison the first-
    # breach window).  The oracle's pseudo-batches are never empty, so
    # the coalesce is invisible to the parity gate.
    breached = F.coalesce(F.col("value") > F.col("threshold"), F.lit(False))
    return (
        m_psi.unionByName(m_q)
        .unionByName(m_null)
        .select(
            "metric",
            "batch_id",
            "value",
            "threshold",
            breached.alias("breached"),
            F.min(F.when(breached, F.col("batch_id")))
            .over(w)
            .cast("int")
            .alias("first_breach_batch"),
        )
        .orderBy("metric", "batch_id")
    )


def monitor_alert_rollup_from_store(
    spark: SparkSession,
    psi_path: str,
    quantile_path: str,
    profile_path: str,
    value_col: str = "value",
) -> DataFrame:
    """Read the three batch_id-partitioned report stores the streaming
    monitors write (streaming/extensions.py: foreach_batch_drift_monitor
    / foreach_batch_quantile_monitor / foreach_batch_profile_monitor)
    and roll them into the alert frame — the operational spelling a
    pipeline's on-call reads after N micro-batches."""
    return monitor_alert_rollup_from_reports(
        spark.read.option("basePath", psi_path).parquet(psi_path),
        spark.read.option("basePath", quantile_path).parquet(quantile_path),
        spark.read.option("basePath", profile_path).parquet(profile_path),
        value_col=value_col,
    )


#: Pseudo-batch count for the catalog entry's batch twin (shared with
#: the oracle).
ROLLUP_BATCHES = 4


def monitor_alert_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog spelling of the monitor rollup — a fully deterministic
    batch twin over ``events``: the reference is the first time half
    (the :func:`_events_with_split` convention every drift entry
    shares), the second half splits into :data:`ROLLUP_BATCHES`
    pseudo-batches by ``pmod(event_id, k)`` (scale-free, no global
    window — real deployments get real batch ids from the store), and
    each pseudo-batch's PSI / quantile-shift / null-rate reports come
    from the SAME shared cores as the streaming monitors
    (:func:`psi_report` and :func:`_quantile_report_from` with
    ``by=("batch_id",)`` — grouped-equals-per-group is pytest-pinned),
    then roll up through :func:`monitor_alert_rollup_from_reports`.

    Plan shape: five passes over events total — the pinned midpoint's
    ts-only scan (shared via :func:`_events_with_split`), then per
    time-half one pass for the categorical counts and one for the value
    aggregates (per-batch exact quantiles + null counts fused in a
    single groupBy) — category/probe-grain everything after
    (checkpoint-pinned, see below), one tiny window for first-breach."""
    e = _events_with_split(spark, sf_dir)
    ref = e.filter(F.col("is_ref"))
    cur = e.filter(~F.col("is_ref")).withColumn(
        "batch_id", F.pmod(F.col("event_id"), F.lit(ROLLUP_BATCHES))
    )

    # --- categorical PSI per pseudo-batch (category space = per-batch
    # union of reference and batch categories, the monitor's contract)
    # Round-15 census fix: the report-grain frames below are each
    # consumed MORE THAN ONCE (cur_counts by batches + the full_outer
    # join; counts twice inside psi_report's totals/probs split; the
    # batch-grain quantile+profile agg by both the qshift and the
    # null-rate faces), and unpinned the plan re-executed the
    # corpus-sized subtree per consumer — 18 events scans in the
    # executedPlan, i.e. ~8 needless full passes at 100 TB.  Each is
    # localCheckpoint-pinned (the corpus.py:260 "N consumers, one scan"
    # convention; all three are batch x category / batch-grain,
    # metadata-sized by construction), and the quantile + null-rate
    # aggregates FUSE into one groupBy so the cur half is scanned once
    # for both.  Post-fix the events corpus is read exactly 4 times —
    # two passes per time-half (counts + quantiles), the minimum these
    # different-grain aggregates admit — pytest plan-pinned.
    ref_counts = ref.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cur_counts = (
        cur.groupBy("batch_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .localCheckpoint(eager=True)
    )
    batches = cur_counts.select("batch_id").distinct()
    counts = (
        batches.crossJoin(F.broadcast(ref_counts))
        .join(cur_counts, ["batch_id", "event_type"], "full_outer")
        .select(
            "batch_id",
            "event_type",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .localCheckpoint(eager=True)
    )
    psi = psi_report(counts, "event_type", by=("batch_id",))

    # --- binless quantile shift per pseudo-batch vs the frozen ref
    # array, FUSED with the profile (null rate) agg: same batch_id
    # grain, one cur scan feeds both report faces off the checkpoint
    arr = ", ".join(repr(q) + "D" for q in DRIFT_QS)
    rq = ref.agg(F.expr(f"percentile(value, array({arr}))").alias("rq"))
    cq_prof = (
        cur.groupBy("batch_id")
        .agg(
            F.expr(f"percentile(value, array({arr}))").alias("cq"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
        )
        .localCheckpoint(eager=True)
    )
    qshift = _quantile_report_from(
        cq_prof.select("batch_id", "cq").crossJoin(F.broadcast(rq)),
        DRIFT_QS,
        by=("batch_id",),
    )
    profile = cq_prof.select(
        "batch_id", F.lit("value").alias("col_name"), "n_rows", "n_null"
    )

    return monitor_alert_rollup_from_reports(psi, qshift, profile)
