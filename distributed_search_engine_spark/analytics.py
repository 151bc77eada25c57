"""Classic warehouse analytics over the TPC-H-shaped tables — the
"analytics engine" face of the repo next to the search/index face.
Three canonical shapes (TPC-H Q1/Q3/Q5 analogs), written the way they
must run at 100 TB:

  - money math in DECIMAL: per-row casts are exact (the synthetic data
    is exact 2-decimal), decimal sums are EXACT and order-independent —
    so distributed aggregation is bit-reproducible and the DuckDB
    oracle hash-matches without float-tolerance games. Doubles appear
    only at the final rounded output boundary.
  - dimensions broadcast: region/nation/customer/supplier joins carry
    an explicit broadcast() — the fact table (lineitem) never shuffles
    for a dim join (plan-asserted in tests).
  - top-k via ordered limit, ranks assigned over the k survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

D2 = "decimal(12,2)"  # line-item money/qty columns (< 1e10, 2dp exact)
D_RATE = "decimal(5,2)"  # discount/tax rates


def _li_measures(li: DataFrame) -> DataFrame:
    """lineitem + exact decimal measure columns (disc_price, charge)."""
    one = F.lit(1.00).cast(D_RATE)
    disc_price = F.col("l_extendedprice").cast(D2) * (
        one - F.col("l_discount").cast(D_RATE)
    )
    charge = disc_price * (one + F.col("l_tax").cast(D_RATE))
    return li.withColumn("disc_price", disc_price).withColumn("charge", charge)


def pricing_summary(li: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary over
    shipped lineitems. Exact decimal sums; averages = one double
    division over exact inputs, rounded 6dp."""
    x = _li_measures(li.where(F.col("l_shipdate") <= cutoff))
    agg = x.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(D2)).alias("_sq"),
        F.sum(F.col("l_extendedprice").cast(D2)).alias("_sb"),
        F.sum("disc_price").alias("_sd"),
        F.sum("charge").alias("_sc"),
        F.sum(F.col("l_discount").cast(D_RATE)).alias("_sdisc"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("_sb").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("_sd").cast("double"), 4).alias("sum_disc_price"),
        F.round(F.col("_sc").cast("double"), 6).alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("_sb").cast("double") / n, 6).alias("avg_price"),
        F.round(F.col("_sdisc").cast("double") / n, 6).alias("avg_disc"),
        "count_order",
    )


def top_revenue_orders(
    li: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    date: str = "1997-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders of a market segment by
    outstanding revenue. Customer dim BROADCAST; revenue summed in
    exact decimal, rounded before the rank."""
    cust = F.broadcast(
        customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    )
    o = orders.where(F.col("o_orderdate") < date).join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    )
    x = _li_measures(li.where(F.col("l_shipdate") > date)).join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    )
    rev = x.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum("disc_price").alias("_rev")
    )
    scored = rev.select(
        "l_orderkey",
        F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
        F.round(F.col("o_orderdate").cast("timestamp").cast("double"), 6).alias(
            "o_orderdate_epoch"
        ),
        "o_orderpriority",
    )
    top = scored.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def regional_revenue(
    li: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where customer and supplier
    share the nation, within one region and order-date year. The small
    dimensions (region -> nation -> supplier) are BROADCAST; customer
    is left to AQE (it is a large dim at real scale — forcing a
    broadcast there would be wrong at 100 TB), so the shuffling joins
    are lineitem ⋈ orders ⋈ customer only."""
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", F.col("n_nationkey").alias("sn_key"), "n_name")
    cust = customer.select("c_custkey", "c_nationkey")
    o = orders.where(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    ).select("o_orderkey", "o_custkey")
    x = (
        _li_measures(li)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("sn_key"))
    )
    return (
        x.groupBy("n_name")
        .agg(F.sum("disc_price").alias("_rev"))
        .select("n_name", F.round(F.col("_rev").cast("double"), 4).alias("revenue"))
    )


def forecast_revenue_change(
    li: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discount elimination — a pure
    scan + filter + one exact-decimal sum (every predicate pushes down
    to the parquet scan; no join, no shuffle beyond the final 1-row
    agg)."""
    x = li.where(
        (F.col("l_shipdate") >= date_lo)
        & (F.col("l_shipdate") < date_hi)
        & (F.col("l_discount").cast(D_RATE) >= F.lit(disc_lo).cast(D_RATE))
        & (F.col("l_discount").cast(D_RATE) <= F.lit(disc_hi).cast(D_RATE))
        & (F.col("l_quantity") < max_qty)
    )
    rev = F.sum(
        F.col("l_extendedprice").cast(D2) * F.col("l_discount").cast(D_RATE)
    )
    return x.agg(
        F.round(rev.cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
