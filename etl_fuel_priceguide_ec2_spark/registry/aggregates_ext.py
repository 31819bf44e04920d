"""Extended aggregate/function surface: pivot, exact percentiles, min_by/max_by, json aggs."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    AS_OF,
    register,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# More aggregate/function surface: pivot, exact percentiles, min_by/max_by,
# string + array batteries, from_json struct parse, semi join
# ---------------------------------------------------------------------------


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
    FROM events GROUP BY user_id
    """,
)
def q_pivot_event_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .select(
            "user_id",
            *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in ["click", "view", "purchase"]],
        )
    )


@register(
    "percentile_prices",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_prices(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "latest_via_max_by",
    f"""
    SELECT user_id, value AS latest_value, ts AS latest_ts
    FROM (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '{AS_OF}'
    ) WHERE rn = 1
    """,
)
def q_latest_via_max_by(spark, sf_dir):
    """W1 as an AGGREGATE instead of a window: max_by over the
    (ts, event_id) struct order. Compiles to SortAggregate (struct
    comparators aren't hash-aggregable) but the partial aggregate still
    runs map-side — the shuffle carries one partial row per key instead
    of the fact rows. Cheapest strategy when only the latest value (not
    the whole row) is needed."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts") <= F.lit(AS_OF).cast("timestamp"))
    return ev.groupBy("user_id").agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("latest_value"),
        F.max("ts").alias("latest_ts"),
    )


@register(
    "string_battery",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           replace(c_mktsegment, 'ING', '*') AS seg_repl,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           length(c_name) AS name_len,
           concat_ws('|', c_mktsegment, c_name) AS joined
    FROM customer
    """,
)
def q_string_battery(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_mktsegment"), F.lit("ING"), F.lit("*")).alias("seg_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
    )


@register(
    "array_battery",
    """
    SELECT o_custkey,
           list_aggr(list_sort(list(o_orderpriority)), 'string_agg', '|') AS priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_array_battery(spark, sf_dir):
    """collect_list + sort_array + array_join: deterministic per-group
    array build (bare collect_list order is partition-dependent; sorting
    restores determinism). The array is serialized to a '|'-joined string
    on BOTH sides because the driver's pandas canonicalizer cannot hash
    list-typed cells — the joined string is an equivalent canonical form."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderpriority")), "|").alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "json_struct_parse",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_struct_parse(spark, sf_dir):
    """from_json with an explicit schema (F5 read side): full structured
    parse, not string extraction — the scalable path when many fields
    are consumed (one parse, many accesses)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k_val"),
    )


@register(
    "semi_join_active_customers",
    f"""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase'
            AND e.ts <= TIMESTAMP '{AS_OF}'
    )
    """,
)
def q_semi_join_active_customers(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("ts") <= F.lit(AS_OF).cast("timestamp"))
    )
    return cust.join(
        ev, cust.c_custkey == ev.user_id, "left_semi"
    ).select("c_custkey", "c_name")




@register(
    "ohlc_daily_values",
    """
    SELECT user_id, CAST(ts AS DATE) AS day,
           ROUND(min_by(value, ts), 6) AS open_v,
           ROUND(MAX(value), 6) AS high_v,
           ROUND(MIN(value), 6) AS low_v,
           ROUND(max_by(value, ts), 6) AS close_v,
           COUNT(*) AS n_events
    FROM events
    WHERE user_id < 30
    GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def q_ohlc_daily_values(spark, sf_dir):
    """OHLC downsampling (the hypertable/candlestick resample): per key
    per day, first/last value by (ts, id) order plus min/max — all four
    as ONE hash aggregate with struct-ordered min_by/max_by partials
    (no window, no sort, one shuffle of constant-size state; the
    windowed first_value construction would sort every group).

    The Spark side orders by (ts, event_id) for total determinism; the
    oracle orders by ts alone (DuckDB min_by takes no struct key) —
    equivalent because (user_id, ts) is verified unique at every
    fixture SF."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    ord_struct = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.round(F.min_by("value", ord_struct), 6).alias("open_v"),
            F.round(F.max("value"), 6).alias("high_v"),
            F.round(F.min("value"), 6).alias("low_v"),
            F.round(F.max_by("value", ord_struct), 6).alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
