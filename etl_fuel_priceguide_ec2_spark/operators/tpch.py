"""Classic TPC-H query shapes adapted to the fixture's trimmed schema
(no partsupp/commitdate/shipmode). With Q1/Q3/Q5/Q14 analogues living
elsewhere (pricing_summary, shipping_priority_top10, revenue_by_nation,
promo_revenue_share), this module completes the 22-query shape set.

Each exists for the PLAN PATTERN it pins, not the business question:
correlated-min join-back (Q2), date-pruned semi-join (Q4), scan-filter
aggregate (Q6), dual broadcast-dim chains (Q7), conditional-aggregate
share (Q8), profit expression over a 5-way join (Q9), decimal-exact
top-k (Q10), group-agg vs global scalar threshold (Q11), conditional
counts by line attribute (Q12), outer-join histogram (Q13), agg-view +
scalar-max equality (Q15), anti-filtered distinct-count (Q16),
decorrelated per-group scalar threshold (Q17), group-having join-back
(Q18), dominant-share nested aggregates (Q20), only-offender
exists/not-exists counts (Q21), scalar-subquery broadcast + anti-join
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


def min_balance_supplier_per_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region_key: int = 2,
    p_type: str = "SMALL",
    max_size: int = 5,
) -> DataFrame:
    """Q2 shape: for each qualifying part, the supplier(s) achieving the
    per-part MIN over a correlated attribute. Without partsupp, the
    shipped-part bridge is ``DISTINCT (l_partkey, l_suppkey)`` and the
    minimized attribute is s_acctbal. The correlated scalar MIN
    decorrelates to one per-part aggregate joined back on
    ``(part, min_val)`` — keeps ties, exactly like the spec query. Part
    and supplier/nation prune on broadcast sides before the bridge
    aggregate; equality on a parquet-loaded double is exact."""
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    parts = part.filter((F.col("p_size") <= max_size) & (F.col("p_type") == p_type)).select(
        "p_partkey", "p_name"
    )
    n = nation.filter(F.col("n_regionkey") == region_key).select("n_nationkey", "n_name")
    cand = (
        bridge.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    per_part_min = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("s_acctbal").alias("__min_bal")
    )
    return cand.join(
        per_part_min,
        (F.col("p_partkey") == F.col("__pk")) & (F.col("s_acctbal") == F.col("__min_bal")),
    ).select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")


def order_priority_check(
    lineitem: DataFrame,
    orders: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
) -> DataFrame:
    """Q4: orders in a date window having at least one problem line
    (adapted: a returned line, l_returnflag = 'R' — the fixture has no
    commitdate/receiptdate), counted by priority. The date filter prunes
    the orders scan before the LEFT SEMI join; the semi join never
    widens rows, so the shuffle carries order keys only."""
    problem_keys = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(problem_keys, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def forecast_revenue(
    lineitem: DataFrame,
    year: int = 1996,
    disc_min: float = 0.02,
    disc_max: float = 0.06,
    qty_max: float = 24.0,
) -> DataFrame:
    """Q6: revenue increase if discounts in a band were dropped — a pure
    scan → filter → 1-row aggregate, the canonical pushdown/codegen
    probe. revenue = price × discount on DECIMALs (exact), cast double
    at the edge. At 100 TB this is the query that must show PushedFilters
    on every predicate and a single partial/final agg pair."""
    amount = _dec("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)")
    return (
        lineitem.filter(
            (F.year("l_shipdate") == year)
            & (F.col("l_discount") >= disc_min)
            & (F.col("l_discount") <= disc_max)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            F.sum(amount).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "widget",
) -> DataFrame:
    """Q9: profit by (supplier nation, order year) for parts matching a
    name token. Without partsupp, cost = p_retailprice × quantity.
    Revenue and cost are summed as separate exact DECIMALs and
    subtracted as doubles at the edge (decimal subtraction scale rules
    differ across engines). The part filter lands on the broadcast side
    — at scale it prunes the fact shuffle to matching lines only."""
    parts = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(_revenue()).cast("double") - F.sum(cost).cast("double"), 2
            ).alias("profit")
        )
    )


def important_parts(lineitem: DataFrame, factor: float = 1.5) -> DataFrame:
    """Q11 shape: parts whose revenue exceeds ``factor ×`` the mean
    per-part revenue (the spec's fixed fraction is made scale-free so
    the selectivity survives a 100× scale-up). One per-part aggregate;
    the global mean is a 1-row broadcast into the filter — no second
    pass over the fact table."""
    pv = lineitem.groupBy("l_partkey").agg(F.sum(_revenue()).alias("__v_dec"))
    mean = pv.agg(
        (F.sum(F.col("__v_dec")).cast("double") / F.count(F.lit(1))).alias("__mean")
    )
    return (
        pv.crossJoin(F.broadcast(mean))
        .filter(F.col("__v_dec").cast("double") > factor * F.col("__mean"))
        .select("l_partkey", F.col("__v_dec").cast("double").alias("part_value"))
    )


def priority_shipping_lines(
    lineitem: DataFrame, orders: DataFrame, year: int = 1996
) -> DataFrame:
    """Q12: lines shipped in a year counted by line status (the fixture's
    stand-in for shipmode), split into high/low order-priority counts —
    the conditional-aggregate join shape. The year predicate prunes the
    fact scan; priorities evaluate post-join as two CASE sums in one
    aggregate pass."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q15: supplier(s) achieving the maximum quarterly revenue. The
    revenue view aggregates once; the scalar MAX is a 1-row broadcast
    and the equality test runs on the exact DECIMAL (never the double)
    so ties and the cut are engine-stable."""
    sr = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("__rev_dec"))
    )
    mx = sr.agg(F.max("__rev_dec").alias("__max_dec"))
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev_dec") == F.col("__max_dec"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("__rev_dec").cast("double").alias("total_revenue")
        )
    )


def part_supplier_variety(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#5",
    excl_type: str = "PROMO",
) -> DataFrame:
    """Q16: how many distinct suppliers shipped each (brand, type, size),
    excluding one brand, one type, and blocklisted suppliers (adapted:
    negative account balance). The bridge dedups (part, supplier) BEFORE
    the dim joins so the distinct-count shuffle carries key pairs only;
    the supplier blocklist is a broadcast anti-join."""
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    parts = part.filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blocked = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        bridge.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(blocked), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    qty_threshold: float = 200.0,
    k: int = 100,
) -> DataFrame:
    """Q18: customers with orders above a total-quantity threshold. The
    HAVING aggregate runs on lineitem alone (orderkey shuffle), and only
    the few surviving keys join back to orders/customer — the join-back
    carries the filtered set, not the fact table. Quantities are
    integral doubles, so sums are exact in any order; top-k cuts on
    (qty desc, orderkey asc) for an engine-stable boundary."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
    )


def dominant_part_shippers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    year: int = 1996,
    frac: float = 0.3,
    name_prefix: str = "red",
) -> DataFrame:
    """Q20 shape: suppliers who shipped more than ``frac`` of a part's
    yearly volume, for parts matching a name prefix (partsupp's availqty
    test becomes a dominant-share test). Two aggregates over the same
    year-pruned scan — per (supplier, part) and per part — joined on the
    part key; the matching-parts filter broadcasts into the narrower
    aggregate. Output is the DISTINCT supplier set with dims attached."""
    year_lines = lineitem.filter(F.year("l_shipdate") == year)
    matching = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    sp = (
        year_lines.join(F.broadcast(matching), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__sq"))
    )
    pt = year_lines.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("l_quantity").alias("__tq")
    )
    dominant = (
        sp.join(pt, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("__sq") > frac * F.col("__tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


def waiting_suppliers(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame, k: int = 25
) -> DataFrame:
    """Q21 shape: in finalized multi-supplier orders, the supplier who is
    the ONLY one with a returned line (the sole offender). The spec's
    EXISTS / NOT EXISTS pair decorrelates to one per-order aggregate —
    distinct suppliers and distinct offending suppliers — joined to the
    offending lines; at scale that is two orderkey shuffles instead of
    two correlated re-scans. Top-k on (count desc, name asc)."""
    oa = lineitem.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.count_distinct("l_suppkey").alias("__ns"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("__nr"),
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(oa, F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("__ns") > 1) & (F.col("__nr") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
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
