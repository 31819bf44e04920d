"""Phase-3 analytics (hash aggs, star join, top-k, rollup, set ops, windows) and EP1, the composed reference pipeline."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    FIXED_NOW,
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    aggregates,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Phase-3 analytics — hash aggs, star join, top-k, rollup, set ops, windows
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.pricing_summary(li, ship_cutoff="2024-06-01 00:00:00")


@register(
    "revenue_by_nation",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q_revenue_by_nation(spark, sf_dir):
    return aggregates.revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        region_name="EUROPE",
    )


@register(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders
    )
    WHERE rank <= 3
    """,
)
def q_top_orders_per_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = aggregates.top_k_per_group(
        orders, group_cols=["o_orderpriority"], order_col="o_totalprice", k=3, tiebreak_cols=["o_orderkey"]
    )
    return out.select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")


@register(
    "rollup_brand_stats",
    """
    SELECT p_brand, COUNT(*) AS n_parts,
           ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
    FROM part
    GROUP BY ROLLUP (p_brand)
    ORDER BY p_brand NULLS FIRST
    """,
)
def q_rollup_brand_stats(spark, sf_dir):
    return aggregates.rollup_stats(load_table(spark, sf_dir, "part"))


@register(
    "set_ops_symmetric_diff",
    """
    (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      UNION
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    EXCEPT
    (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q_set_ops_symmetric_diff(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct().subtract(a.intersect(b))


@register(
    "distinct_users_by_type",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users_by_type(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "json_props_agg",
    """
    SELECT event_type,
           ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_json_props_agg(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.functions import scalar

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type", scalar.json_field(F.col("props"), "$.k").cast("bigint").alias("k")
    ).groupBy("event_type").agg(
        F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("avg_k")
    )


@register(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS running_value
    FROM events
    """,
)
def q_window_running_sum(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 6).alias("running_value")
    )


# ---------------------------------------------------------------------------
# EP1 — the composed reference pipeline (index.js:29-60) on fixtures
# ---------------------------------------------------------------------------


@register(
    "etl_pipeline_dim",
    f"""
    WITH src AS (
      SELECT c_custkey AS Codigo, c_name AS Nome, c_mktsegment AS Marca,
             strftime(TIMESTAMP '{FIXED_NOW}', '%Y-%m-%d %H:%M:%S') AS CreateTimestamp,
             strftime(TIMESTAMP '{FIXED_NOW}', '%Y-%m-%d %H:%M:%S') AS UpdateTimestamp
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE c_name IS NOT NULL
    ),
    dim AS (SELECT * FROM src WHERE Codigo % 2 = 0)
    SELECT Codigo, Nome, Marca, CreateTimestamp, UpdateTimestamp FROM dim
    UNION ALL
    SELECT Codigo, Nome, Marca, CreateTimestamp, UpdateTimestamp FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.Codigo = s.Codigo)
    """,
)
def q_etl_pipeline_dim(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.plans import pipeline

    src = pipeline.build_station_dim_src(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        now_ts=FIXED_NOW,
    ).drop("Morada")  # struct column: DuckDB view comparison is on scalars
    dim = src.filter(F.col("Codigo") % 2 == 0)
    return pipeline.merge_station_dim(src, dim).select(
        "Codigo", "Nome", "Marca", "CreateTimestamp", "UpdateTimestamp"
    )




# ---------------------------------------------------------------------------
# Round-6 addition (post-freeze -> leads the round-7 window): frequent-pair
# affinity mining (Apriori-2 with support/confidence/lift)
# ---------------------------------------------------------------------------

from etl_fuel_priceguide_ec2_spark.operators import affinity as _affinity

_BASKETS_SQL = "SELECT l_orderkey AS basket, l_partkey AS item FROM lineitem"


@register(
    "part_affinity_lift",
    _affinity.pair_affinity_oracle_sql(_BASKETS_SQL, min_support=2, topk=20),
)
def q_part_affinity_lift(spark, sf_dir):
    """Market-basket affinity over orders: part pairs co-ordered in
    >= 2 orders, ranked by lift (top-20, (item_a, item_b) tiebreak) —
    the association-rule shape ("customers who buy X buy Y"); on a
    documents/tokens relation the same operator mines collocations
    and boilerplate templates. Apriori prune runs BEFORE the pair
    self-join, the pair aggregate shuffle carries only (a, b, partial
    count), and the basket total is a broadcast 1-row aggregate; the
    float edges are single products/divisions of exact integers, so
    the ranking hash-matches the DuckDB replay."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    aff = _affinity.pair_affinity(baskets, min_support=2)
    w = Window.orderBy(
        F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    )
    return (
        aff.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "item_a", "item_b", "support", "support_a", "support_b",
            "confidence_ab", "confidence_ba", "lift", "rank",
        )
    )
