"""Multi-way star-schema analytics — TPC-H-shaped queries over the driver
tables (beyond the reference surface: SURVEY.md §2.4 has only single-key
equi-joins on CustomerID; these exercise broadcast-dim join CHAINS, the
bread-and-butter plan shape at 100 TB).

Plan-shape intent per query (asserted in tests/test_plan_shapes.py):

* pricing_summary — pure scan→filter→partial/final hash agg on a 2×2-value
  key; the shipdate filter must reach the parquet scan (PushedFilters), no
  join at all.  The canonical "does partial aggregation work" probe.
* shipping_priority — big⋈big (orders⋈lineitem) shuffled on orderkey, with
  the FILTERED customer segment (1/5 of customers) broadcast; top-10 via
  orderBy+limit plans TakeOrderedAndProject, never a global sort.
* local_supplier_volume — 6-table chain; region(5)⋈nation(25)⋈supplier
  are broadcast so the only shuffles are the orders⋈lineitem equi-join and
  the final 25-group agg.  The c_nationkey = s_nationkey predicate is a
  post-join filter, exactly as TPC-H Q5 specifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round2, round4
from ..sources.readers import load_table

#: Predicate constants (testdata dates span 1995-01..2001-11, 5 segments,
#: 5 regions — TESTDATA.md).
PRICING_CUTOFF = "1999-12-31"
SHIP_SEGMENT = "BUILDING"
SHIP_DATE = "1998-06-01"
VOLUME_REGION = "ASIA"
VOLUME_START = "1996-01-01"
VOLUME_END = "1999-01-01"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped pricing report over lineitem with a shipdate
    cutoff.  All aggregates are Catalyst built-ins → one partial/final
    HashAggregate pair; the filter pushes into the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            round2(F.sum(disc_price)).alias("sum_disc_price"),
            round2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            round4(F.avg("l_quantity")).alias("avg_qty"),
            round4(F.avg("l_extendedprice")).alias("avg_price"),
            round4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: top-K unshipped orders by revenue for one market
    segment.  The segment filter shrinks customer 5× BEFORE the join and the
    result is explicitly broadcast; orderBy+limit gives TakeOrderedAndProject
    (per-partition top-K, no global sort).  Ties broken by o_orderkey so the
    K-boundary is deterministic cross-engine."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == SHIP_SEGMENT)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(SHIP_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(SHIP_DATE).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(k)
    )


def big_spender_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (existence filter, no fan-out): orders whose customer
    has a high account balance, summarized by priority.  Semi-join is the
    right operator when the probe side only gates — an inner join would
    duplicate orders if the build side ever had duplicate keys, and carries
    the build columns through the shuffle for nothing.  The filtered
    customer key set broadcasts."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round2(F.sum("o_totalprice")).alias("total_value"),
        )
        .orderBy("o_orderpriority")
    )


def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with NO order in the window — the
    retention / backfill-gap query shape.  Anti-join streams the big side
    through a broadcast hash lookup of the (distinct, window-filtered)
    order keys; the NOT-IN spelling would need null-safe special-casing
    and the EXCEPT spelling loses the customer's columns."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(VOLUME_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(VOLUME_END).cast("timestamp"))
        )
        .select("o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(
            F.broadcast(orders), cust.c_custkey == orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where customer and supplier share
    a nation, within one region and a date band.  region→nation→supplier are
    broadcast dims; customer is mid-size (broadcast at test SF, shuffled at
    100 TB — AQE decides); orders⋈lineitem is the one unavoidable big
    shuffle."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == VOLUME_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    local_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(local_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(VOLUME_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(VOLUME_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )
