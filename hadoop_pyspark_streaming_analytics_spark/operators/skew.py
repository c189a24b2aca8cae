"""Skew mitigation primitives (SCALE.md "Joins"): explicit salting for the
cases AQE's skew-join splitting cannot reach, and a bucketing helper that
makes large-large joins shuffle-free.

AQE (`spark.sql.adaptive.skewJoin`) splits oversized SORT-MERGE join
partitions at runtime — but it cannot split a skewed GROUP BY key, and it
does nothing for a shuffle-hash join picked early.  Salting is the
explicit fix: spread one logical key over ``n_salts`` physical keys,
process, then merge.

- ``salted_join(big, small, key, n_salts)``: big side gets a random-ish
  (deterministic: ``pmod(hash(row), n)``) salt; the SMALL side is
  replicated ``n_salts`` times with every salt value, so each (key, salt)
  partition joins locally.  Replication cost = |small| × n_salts — use for
  a skewed big side against a modest dim table when broadcast is too big.
- ``salted_count(df, key, n_salts)``: two-phase aggregation through a
  salted intermediate — the groupBy equivalent (count/sum only need the
  merge to be associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions.  Result is column-identical to ``big.join(small, key,
    how)`` (the salt column never escapes).

    Only inner/left/semi/anti are supported: with a right/full join each
    unmatched small-side replica would emit its own null-padded row.
    """
    if how.replace("outer", "").strip("_") not in ("inner", "left", "leftsemi", "left_semi", "leftanti", "left_anti"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # salt on a per-row id, not row content: duplicate hot-key rows must
    # still spread across salts (content hashes collide on duplicates)
    big_s = big.withColumn(
        SALT,
        F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on=[key, SALT], how=how).drop(SALT)


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """count(*) per key through a salted two-phase aggregation: partial
    counts per (key, salt) — bounded partition size even for a key holding
    half the table — then an associative merge over n_salts rows per key."""
    partial = (
        df.withColumn(
            SALT,
            F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)),
        )
        .groupBy(key, SALT)
        .agg(F.count(F.lit(1)).alias("partial_cnt"))
    )
    return partial.groupBy(key).agg(F.sum("partial_cnt").alias("cnt"))
