"""TPC-H classic shapes on the trimmed fixture schema.

Round 2 added Q7/Q8/Q10/Q13/Q17/Q19/Q22; round 4 completes the set
with Q2/Q4/Q6/Q9/Q11/Q12/Q15/Q16/Q18/Q20/Q21 analogues (Q1/Q3/Q5/Q14
shapes live in the analytics modules as pricing_summary /
shipping_priority_top10 / revenue_by_nation / promo_revenue_share).
Registered AFTER the frozen round-4 window — they lead round 5's
priority list per the register-then-verify invariant."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    tpch,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# TPC-H classic shapes (Q7/Q8/Q10/Q13/Q17/Q22 analogues on the trimmed
# fixture schema) — operators/tpch.py; added round 2 for analytics breadth
# ---------------------------------------------------------------------------

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q_q7_volume_shipping(spark, sf_dir):
    from pyspark.sql import functions as F

    out = tpch.volume_shipping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        "NATION_1",
        "NATION_2",
    )
    return out.withColumn("l_year", F.col("l_year").cast("long"))


@register(
    "q8_market_share",
    f"""
    WITH base AS (
      SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
             {_REV_SQL} AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey AND n2.n_regionkey = 0
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
    )
    SELECT o_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q_q8_market_share(spark, sf_dir):
    from pyspark.sql import functions as F

    out = tpch.market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        region_key=0,
        share_nation="NATION_3",
    )
    return out.withColumn("o_year", F.col("o_year").cast("long"))


@register(
    "q10_returned_top_customers",
    f"""
    SELECT c_custkey, c_name, c_acctbal, CAST(rev AS DOUBLE) AS revenue
    FROM (
      SELECT c_custkey, c_name, c_acctbal, SUM({_REV_SQL}) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey AND year(o_orderdate) = 1996
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3
      ORDER BY rev DESC, c_custkey ASC
      LIMIT 20
    )
    """,
)
def q_q10_returned_top_customers(spark, sf_dir):
    return tpch.returned_top_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        year=1996,
        k=20,
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_q13_order_count_distribution(spark, sf_dir):
    return tpch.order_count_distribution(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH pp AS (
      SELECT l_partkey AS pk, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY 1
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly
    FROM lineitem JOIN pp ON l_partkey = pk
    WHERE l_quantity * 5 * cnt_qty < sum_qty
    """,
)
def q_q17_small_quantity_revenue(spark, sf_dir):
    return tpch.small_quantity_revenue(load_table(spark, sf_dir, "lineitem"), years=7)


@register(
    "q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-01-01'
                              AND o_custkey IS NOT NULL)
    GROUP BY c_mktsegment
    """,
)
def q_q22_idle_customers(spark, sf_dir):
    return tpch.idle_customers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )



@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 shape: disjunctive multi-clause predicate over a broadcast
    dim join. The per-table conjuncts (p_brand/p_size on part,
    l_quantity on lineitem) are what Catalyst can factor out and push
    below the join; the cross-table OR evaluates post-join — exactly
    the split a 100 TB scan needs."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    cond = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: the remaining classic shapes (registered after the
# frozen round-4 window; they lead round 5's priority list)
# ---------------------------------------------------------------------------


@register(
    "q2_min_balance_supplier",
    """
    WITH br AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      FROM br
      JOIN part ON l_partkey = p_partkey AND p_size <= 5 AND p_type = 'SMALL'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 2
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM cand
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = cand.p_partkey)
    """,
)
def q_q2_min_balance_supplier(spark, sf_dir):
    return tpch.min_balance_supplier_per_part(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        region_key=2,
        p_type="SMALL",
        max_size=5,
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority(spark, sf_dir):
    return tpch.order_priority_check(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        "1996-01-01",
        "1996-07-01",
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark, sf_dir):
    return tpch.forecast_revenue(
        load_table(spark, sf_dir, "lineitem"), 1996, 0.02, 0.06, 24.0
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE)
                 - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) *
                            CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE),
                 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def q_q9_product_type_profit(spark, sf_dir):
    from pyspark.sql import functions as F

    out = tpch.product_type_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        name_token="widget",
    )
    return out.withColumn("o_year", F.col("o_year").cast("long"))


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey, SUM({_REV_SQL}) AS v_dec
      FROM lineitem GROUP BY 1
    ),
    m AS (SELECT CAST(SUM(v_dec) AS DOUBLE) / COUNT(*) AS mean_v FROM pv)
    SELECT l_partkey, CAST(v_dec AS DOUBLE) AS part_value
    FROM pv, m
    WHERE CAST(v_dec AS DOUBLE) > 1.5 * mean_v
    """,
)
def q_q11_important_parts(spark, sf_dir):
    return tpch.important_parts(load_table(spark, sf_dir, "lineitem"), factor=1.5)


@register(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1996
    GROUP BY l_linestatus
    """,
)
def q_q12_priority_shipping(spark, sf_dir):
    return tpch.priority_shipping_lines(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        year=1996,
    )


@register(
    "q15_top_supplier",
    f"""
    WITH sr AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
    FROM sr JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_dec = (SELECT MAX(rev_dec) FROM sr)
    """,
)
def q_q15_top_supplier(spark, sf_dir):
    return tpch.top_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        "1996-01-01",
        "1996-04-01",
    )


@register(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) br
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_q16_part_supplier_variety(spark, sf_dir):
    return tpch.part_supplier_variety(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        excl_brand="Brand#5",
        excl_type="PROMO",
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey AS big_ok, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 200
    ) big
    JOIN orders ON big_ok = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY sum_qty DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_q18_large_volume_customers(spark, sf_dir):
    return tpch.large_volume_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        qty_threshold=200.0,
        k=100,
    )


@register(
    "q20_dominant_shippers",
    """
    WITH yl AS (SELECT * FROM lineitem WHERE year(l_shipdate) = 1996),
    sp AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS sq
      FROM yl JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
      GROUP BY 1, 2
    ),
    pt AS (SELECT l_partkey AS pk, SUM(l_quantity) AS tq FROM yl GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM sp
    JOIN pt ON l_partkey = pk
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE sq > 0.3 * tq
    """,
)
def q_q20_dominant_shippers(spark, sf_dir):
    return tpch.dominant_part_shippers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        year=1996,
        frac=0.3,
        name_prefix="red",
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH oa AS (
      SELECT l_orderkey AS ok,
             COUNT(DISTINCT l_suppkey) AS ns,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS nr
      FROM lineitem GROUP BY 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
    JOIN oa ON l_orderkey = ok
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_returnflag = 'R' AND ns > 1 AND nr = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 25
    """,
)
def q_q21_waiting_suppliers(spark, sf_dir):
    return tpch.waiting_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        k=25,
    )
