"""Star-schema join/aggregation queries (extension surface — the
reference has NO joins, SURVEY.md §2.6; these cover the standard
hash/sort-merge/broadcast/semi/anti variants over the driver's
TPC-H-ish tables).

Scale notes (100 TB): fact tables (lineitem/orders) are the big
sides; dimensions (region/nation/customer/supplier/part) are
broadcast explicitly so no fact-side shuffle happens for dimension
joins. Fact-fact joins (orders⋈lineitem) shuffle on the join key
once and AQE handles skew. Filters sit directly on the scans so
Catalyst pushes them into parquet (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → one shuffle, 8 aggregates
    sharing a single partial-agg pass."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim into orders,
    shuffle-join lineitem on l_orderkey, top-10 revenue.

    The limit-after-sort is a TakeOrderedAndProject — each partition
    keeps only its local top-10, so no global sort materializes."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    return (
        li.join(
            ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier
    share the nation. All dimensions broadcast; lineitem only ever
    shuffles once (on l_orderkey against orders)."""
    dim = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                ).select("n_nationkey", "n_name")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey", "c_nationkey", "n_name")
    )
    ords = orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    li = lineitem.join(
        F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
        lineitem.l_suppkey == F.col("s_suppkey"),
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def customer_order_totals(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-customer order count + total spend, joined to the customer
    dim (broadcast). Aggregates BEFORE the join so the join input is
    pre-shrunk — at scale this is aggregate-then-join, not the
    reverse."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
    )
    return per_cust.join(
        F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
        per_cust.o_custkey == F.col("c_custkey"),
    ).select("c_custkey", "c_name", "c_mktsegment", "n_orders", "total_spent")


def top10_orders(orders: DataFrame) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, no full sort."""
    return (
        orders.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI join (reference has no joins at all; SURVEY.md §2.6).
    Anti join broadcasts the distinct key set when small; at scale it
    is a shuffled hash anti-join with null-safe semantics."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def orders_with_big_lineitem(orders: DataFrame, lineitem: DataFrame, min_price: float = 90000.0) -> DataFrame:
    """LEFT SEMI join: orders having at least one expensive line item."""
    big = lineitem.filter(F.col("l_extendedprice") > min_price)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


def parts_by_brand_type(part: DataFrame) -> DataFrame:
    """Multi-column group with distinct-count (covers COUNT(DISTINCT))."""
    return part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )
