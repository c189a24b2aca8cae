"""Sinks (SURVEY.md §2.2, K1-K5).

The reference writes single-file CSVs via ``coalesce(1)``
(q2_ecommerce_analysis.py:271-275, q3_json_processing.py:116-119) — a
driver-bottleneck anti-pattern at scale.  Here single-file output is an
explicit opt-in; the default leaves Spark's parallel writers alone and the
primary sink is partitioned parquet (the reference shows parquet commented
out, bonus.py:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """CSV writer (K1). ``single_file=True`` reproduces the reference's
    ``coalesce(1)`` artifact shape for golden-file parity; default keeps one
    file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet writer (K3) with optional partition columns — partitioned
    layout is what makes partition pruning possible on the read side at
    100 TB."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str],
    target_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized parquet: directory-partition on ``partition_by``
    (partition pruning), then CLUSTER rows on ``cluster_by`` inside each
    file via repartition + sortWithinPartitions.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    statistics, and a pushed-down predicate on a clustered column skips
    whole row groups (and with one value-range per file, whole files) —
    but ONLY if rows arrive at the writer sorted.  An unsorted write
    scatters every key range across every row group, making the stats
    useless.  ``repartition(partition_by)`` additionally aligns executor
    partitions with output directories so each directory is written by few
    tasks (avoiding the small-files explosion of N tasks x M directories),
    which is also why this is repartition + sortWithinPartitions, NOT a
    global orderBy — a total sort would add a range-exchange over the full
    dataset for no extra pruning power.
    """
    parts = (
        df.repartition(target_partitions, *[df[c] for c in partition_by])
        if target_partitions
        else df.repartition(*[df[c] for c in partition_by])
    )
    # Sort by partition cols FIRST, then cluster cols: the dynamic-partition
    # writer requires rows ordered by partition columns and would inject its
    # own (non-stable) sort otherwise, destroying the cluster order.  With
    # the prefix already sorted, the writer reuses this sort and each
    # output file stays cluster-ordered.
    (
        parts.sortWithinPartitions(*partition_by, *cluster_by)
        .write.mode(mode)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC writer — the other columnar format with native Spark support
    (vectorized reader, predicate pushdown, min/max stripes).  Same surface
    as :func:`write_parquet` so pipelines can switch formats per table."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files sized
    ~``target_file_mb`` and return the output file-partition count.

    Streaming ingest (per-trigger appends) and over-parallel writes leave
    thousands of KB-sized files; at 100 TB the resulting scan-planning and
    file-open overhead dominates query time (every file costs a footer
    read + task schedule).  Compaction sizes output by the DATA, not the
    parallelism: bytes-on-disk / target -> coalesce() (narrow, no shuffle)
    when shrinking file count, repartition() only when growing it.
    Partitioned layouts re-partition by the directory columns so each
    directory is written by few tasks.
    """
    from pathlib import Path

    total_bytes = sum(
        f.stat().st_size for f in Path(src_path).rglob("*.parquet")
    )
    n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if partition_by:
        out = df.repartition(n, *[df[c] for c in partition_by])
        (
            out.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(dst_path)
        )
    else:
        current = df.rdd.getNumPartitions()
        out = df.coalesce(n) if n <= current else df.repartition(n)
        out.write.mode("overwrite").parquet(dst_path)
    return n


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """The Z-order (Morton) value of ``cols`` as a codegen Column: each
    column is min/max-scaled into ``bits``-bit integer space (one tiny
    scalar aggregate, literal-embedded), then the bits interleave —
    ``bit i of col j`` lands at position ``i * n_cols + j``.  Pure
    column arithmetic, whole-stage-codegen'd; no UDF.

    Returns (zval_column, stats) where stats maps col -> (min, max) for
    reuse/debugging.

    The interleave must fit a signed 64-bit value: bit ``bits-1`` of the
    last column lands at position ``bits * n_cols - 1``, and Java's
    shiftleft wraps its shift amount mod 64, so ``bits * n_cols > 63``
    would silently fold high bits onto low positions and break Morton
    monotonicity (ADVICE r6).  ``bits`` auto-shrinks per column so the
    widest interleave always stays inside 63 bits (bit 63 is the sign)."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_value needs at least one column")
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}): 63 bits max")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    stats = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[c]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top)
                ).cast("bigint"),
            )
        )
    z = F.lit(0).cast("bigint")
    n = len(cols)
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z, stats


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering — the Z-ORDER layout single-column
    clustering (:func:`write_clustered_parquet`) cannot give: rows sort
    by the interleaved-bit Morton value of ``zorder_by``, so EVERY listed
    column exhibits per-file/per-row-group locality and a predicate on
    ANY of them skips most files via parquet min/max statistics.  A
    single-column sort gives perfect locality on that column and NONE on
    the others (their per-file ranges stay ~global); Z-order trades a
    little per-column tightness for locality on all dimensions — the
    standard lakehouse layout for multi-predicate fact tables (Delta
    OPTIMIZE ZORDER BY / Iceberg sort orders).

    Physical shape: ``repartitionByRange(zval)`` gives each output file a
    CONTIGUOUS z-range (range exchange over the z value only), then
    ``sortWithinPartitions(zval)`` orders row groups inside the file; the
    helper column is dropped before the write.  At 100 TB, pair with
    directory partitioning on a coarse time column exactly like
    write_clustered_parquet, and recompute the min/max scaling from the
    partition being rewritten (stale global stats skew the interleave,
    they never break correctness)."""
    z, _ = zorder_value(df, zorder_by, bits)
    staged = df.withColumn("__zval", z)
    staged = (
        staged.repartitionByRange(target_files, "__zval")
        if target_files
        else staged.repartitionByRange("__zval")
    )
    (
        staged.sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode(mode)
        .parquet(path)
    )
