"""Streaming batch-mode mirror, as-of JOIN, change deltas, sessionization (W-family depth)."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    asof,
    windows,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# §2.7 — streaming semantics, batch-mode mirror (windowed counts)
# ---------------------------------------------------------------------------


@register(
    "stream_window_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_window_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )


# ---------------------------------------------------------------------------
# As-of JOIN, change deltas, sessionization (W-family depth)
# ---------------------------------------------------------------------------


@register(
    "asof_join_orders_events",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           last_t AS asof_ts, last_v AS asof_value
    FROM (
      SELECT o_orderkey, o_custkey, o_orderdate, side,
             last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY k ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_t,
             last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY k ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_v
      FROM (
        SELECT o_orderkey, o_custkey, o_orderdate,
               o_custkey AS k, o_orderdate AS t, NULL::DOUBLE AS v, 1 AS side,
               NULL::BIGINT AS tb
        FROM orders WHERE o_custkey < 150
        UNION ALL
        SELECT NULL, NULL, NULL, user_id AS k, ts AS t, value AS v, 0 AS side,
               event_id AS tb
        FROM events
      )
    )
    WHERE side = 1
    """,
)
def q_asof_join_orders_events(spark, sf_dir):
    """As-of join: each order (of a user with events) picks up the
    latest event value at or before its order date."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150).select(
        "o_orderkey", "o_custkey", "o_orderdate", F.col("o_custkey").alias("user_id")
    )
    events = load_table(spark, sf_dir, "events")
    out = asof.asof_join(
        orders,
        events,
        key_col="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        right_vals=["ts", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_ts"),
        F.col("asof_value").alias("asof_value"),
    )


@register(
    "price_change_deltas",
    """
    SELECT user_id, event_type, ts, value,
           ROUND(value - LAG(value) OVER w, 6) AS delta,
           value <> LAG(value) OVER w AS changed
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
    """,
)
def q_price_change_deltas(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return windows.change_deltas(
        ev, key_cols=["user_id", "event_type"], ts_col="ts", value_col="value", tiebreak_cols=["event_id"]
    )


@register(
    "sessionize_events",
    """
    SELECT user_id, ts,
           CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 1 HOUR
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
    FROM (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      FROM events
    )
    """,
)
def q_sessionize_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return windows.sessionize(ev, key_col="user_id", ts_col="ts", gap="1 hour", tiebreak_cols=["event_id"])




@register(
    "asof_join_tolerance_7d",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CASE WHEN last_t >= t - INTERVAL 7 DAY THEN last_t END AS asof_ts,
           CASE WHEN last_t >= t - INTERVAL 7 DAY THEN last_v END AS asof_value
    FROM (
      SELECT o_orderkey, o_custkey, o_orderdate, t, side,
             last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY k ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_t,
             last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY k ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_v
      FROM (
        SELECT o_orderkey, o_custkey, o_orderdate,
               o_custkey AS k, o_orderdate AS t, NULL::DOUBLE AS v, 1 AS side,
               NULL::BIGINT AS tb
        FROM orders WHERE o_custkey < 150
        UNION ALL
        SELECT NULL, NULL, NULL, user_id AS k, ts AS t, value AS v, 0 AS side,
               event_id AS tb
        FROM events
      )
    )
    WHERE side = 1
    """,
)
def q_asof_join_tolerance_7d(spark, sf_dir):
    """As-of join with a 7-day staleness bound (merge_asof tolerance):
    matches older than 7 days before the order date mask to NULL as one
    row (ts and value together, never torn apart)."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150).select(
        "o_orderkey", "o_custkey", "o_orderdate", F.col("o_custkey").alias("user_id")
    )
    events = load_table(spark, sf_dir, "events")
    out = asof.asof_join_within(
        orders,
        events,
        key_col="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        right_vals=["value"],
        right_tiebreak="event_id",
        tolerance="7 days",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_ts"),
        F.col("asof_value"),
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transition_matrix(spark, sf_dir):
    """Per-user event-sequence transition matrix (the Markov-chain
    building block): LAG over (ts, event_id)-ordered events per user,
    then a global (prev, next) count. One shuffle on user_id for the
    window, one tiny aggregate over |event_types|^2 keys — the
    deterministic tiebreak on event_id makes the LAG engine-stable when
    timestamps collide."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
