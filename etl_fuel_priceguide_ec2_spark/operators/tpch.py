"""Classic TPC-H query shapes (Q7/Q8/Q10/Q13/Q17/Q22 analogues) adapted
to the fixture's trimmed schema (no partsupp/commitdate/shipmode).

Each exists for the PLAN PATTERN it pins, not the business question:
dual broadcast-dim chains (Q7), conditional-aggregate share (Q8),
decimal-exact top-k (Q10), outer-join histogram (Q13), decorrelated
per-group scalar threshold (Q17), scalar-subquery broadcast + anti-join
(Q22). Money follows the house float discipline (NOTES.md): DECIMAL
sums internally, cast to double at the edge, shares as double division
of decimal-exact numerators/denominators rounded 6 — bit-identical
across engines regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(c: str):
    return F.col(c).cast("decimal(12,2)")


_REV = None  # revenue expr built per-use: dec(price) * (1 - dec(discount))


def _revenue():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str,
    nation_b: str,
) -> DataFrame:
    """Q7: revenue between two nations by (supp_nation, cust_nation,
    year), both directions. Supplier/customer/nation all broadcast —
    the fact table shuffles once (orders join); the nation-pair filter
    lands on broadcast outputs so it prunes before the shuffle."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region_key: int,
    share_nation: str,
) -> DataFrame:
    """Q8: the share of a region's market supplied by one nation, per
    year. Numerator and denominator are decimal-exact sums cast to
    double; the share is one double division rounded 6 — deterministic
    across engines and summation orders."""
    n_cust = nation.filter(F.col("n_regionkey") == region_key).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n_supp = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    base = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
    )
    rev = _revenue()
    shares = base.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == share_nation, rev).otherwise(F.lit(0).cast("decimal(12,2)")))
        .cast("double")
        .alias("nation_rev"),
        F.sum(rev).cast("double").alias("total_rev"),
    )
    return shares.select(
        "o_year",
        F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
    )


def returned_top_customers(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, year: int, k: int = 20
) -> DataFrame:
    """Q10: revenue lost to returns per customer in one year, top-k.
    Ranking happens on the DECIMAL-exact revenue with a key tiebreak
    (NOTES.md top-k discipline) so the cut is engine-stable; the cast to
    double happens after the limit."""
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.year("o_orderdate") == year),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(_revenue()).alias("__rev_dec"))
    )
    return (
        rev.orderBy(F.col("__rev_dec").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.col("__rev_dec").cast("double").alias("revenue"),
        )
    )


def order_count_distribution(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Q13: distribution of per-customer order counts, including the
    zero bucket (LEFT OUTER from customer). Two hash aggregates; the
    second groups a relation of one row per customer — tiny."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def small_quantity_revenue(lineitem: DataFrame, years: int = 7) -> DataFrame:
    """Q17: average yearly revenue from small-quantity lines
    (quantity < 20% of the part's average). The correlated scalar
    average decorrelates to one per-part aggregate joined back; the
    threshold test is the integer-exact cross-multiplied form
    ``5·qty·cnt < sum`` — no float-boundary flakiness (quantities are
    integral)."""
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt_qty")
    )
    return (
        lineitem.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") * 5 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            # decimal-exact sum -> double -> divide: decimal DIVISION is
            # avoided entirely (scale rules differ across engines)
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / float(years), 2
            ).alias("avg_yearly")
        )
    )


def idle_customers(
    orders: DataFrame, customer: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Q22: customers with above-average (positive) balances and no
    orders since ``since``, grouped by market segment. The global
    average is a decimal-exact 1-row aggregate broadcast into the
    filter; the no-recent-orders test is a left anti-join on the key
    column only (the date filter prunes the orders scan first)."""
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__avg")
        )
    )
    keys = (
        orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select(F.col("o_custkey"))
        .distinct()
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
