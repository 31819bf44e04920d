"""TPC-H classic shapes (Q7/Q8/Q10/Q13/Q17/Q19/Q22 analogues on the trimmed fixture schema)."""

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
