"""Correlated subquery, date battery, null-semantics battery."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Correlated subquery, date battery, null-semantics battery
# ---------------------------------------------------------------------------


@register(
    "correlated_subquery_max_order",
    """
    SELECT c_custkey, c_name,
           (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS max_order_price
    FROM customer c
    WHERE c_custkey < 500
    """,
)
def q_correlated_subquery_max_order(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates it into a
    left outer aggregate join (one shuffle), never a per-row probe."""
    from etl_fuel_priceguide_ec2_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey)
                 AS max_order_price
        FROM customer c
        WHERE c_custkey < 500
        """
    )


@register(
    "date_function_battery",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow_sunday1,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since_2024
    FROM orders
    """,
)
def q_date_function_battery(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.dayofweek("o_orderdate").alias("dow_sunday1"),
        F.last_day("o_orderdate").alias("month_end"),
        F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS"),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_2024"
        ),
    ).withColumnRenamed("o_orderdate + INTERVAL '3' MONTH", "plus_3m")


@register(
    "null_semantics_battery",
    """
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'view'), 'filtered') AS type_or_default,
           CASE WHEN value IS DISTINCT FROM 0.0 THEN value ELSE NULL END AS nonzero_value,
           IFNULL(NULLIF(CAST(FLOOR(value) AS INT), 0), -1) AS int_or_minus1,
           (NULLIF(event_type, 'view') IS NULL) AS was_view
    FROM events
    """,
)
def q_null_semantics_battery(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("filtered")).alias("type_or_default"),
        F.when(~F.col("value").eqNullSafe(F.lit(0.0)), F.col("value")).alias("nonzero_value"),
        F.ifnull(F.nullif(F.floor("value").cast("int"), F.lit(0)), F.lit(-1)).alias("int_or_minus1"),
        F.nullif("event_type", F.lit("view")).isNull().alias("was_view"),
    )


