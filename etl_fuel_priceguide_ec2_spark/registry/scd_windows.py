"""SCD Type-2 + time travel, range frames, ranking/session windows, unpivot, grouping sets/cube, numeric/stats batteries, gap fill, EXISTS."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    windows,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# SCD Type-2 versioning + time travel, range-frame + ranking windows
# ---------------------------------------------------------------------------

SCD_T1 = "2024-01-10 00:00:00"
SCD_T2 = "2024-01-20 00:00:00"


@register(
    "scd2_dim_versions",
    f"""
    WITH v1 AS (
      SELECT c_custkey AS Id, c_name AS Nome, c_mktsegment AS Marca FROM customer
    ), v2 AS (
      SELECT c_custkey AS Id, c_name AS Nome,
             CASE WHEN c_custkey % 5 = 0 THEN 'SEGMENT_CHANGED' ELSE c_mktsegment END AS Marca
      FROM customer
    )
    SELECT Id, Nome, Marca,
           TIMESTAMP '{SCD_T1}' AS valid_from, TIMESTAMP '{SCD_T2}' AS valid_to, FALSE AS is_current
    FROM v1 WHERE Id % 5 = 0
    UNION ALL
    SELECT Id, Nome, Marca,
           TIMESTAMP '{SCD_T2}', NULL, TRUE FROM v2 WHERE Id % 5 = 0
    UNION ALL
    SELECT Id, Nome, Marca,
           TIMESTAMP '{SCD_T1}', NULL, TRUE FROM v1 WHERE Id % 5 <> 0
    """,
)
def q_scd2_dim_versions(spark, sf_dir):
    """Type-2 merge over a snapshot where every 5th customer changed
    segment: changed keys get a closed v1 row + an open v2 row;
    unchanged keys keep their open v1 row."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import scd

    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("Id"), F.col("c_name").alias("Nome"), F.col("c_mktsegment").alias("Marca")
    )
    v2 = v1.withColumn(
        "Marca", F.when(F.col("Id") % 5 == 0, "SEGMENT_CHANGED").otherwise(F.col("Marca"))
    )
    dim = scd.scd2_init(v1, "Id", SCD_T1)
    return scd.scd2_merge(dim, v2, "Id", tracked_cols=["Nome", "Marca"], effective_ts=SCD_T2)


@register(
    "scd2_time_travel",
    f"""
    WITH v1 AS (
      SELECT c_custkey AS Id, c_name AS Nome, c_mktsegment AS Marca FROM customer
    )
    SELECT Id, Nome, Marca FROM v1
    """,
)
def q_scd2_time_travel(spark, sf_dir):
    """As-of read at a time between the two versions returns exactly the
    v1 state for every key (changed keys' v2 rows are not yet valid)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import scd

    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("Id"), F.col("c_name").alias("Nome"), F.col("c_mktsegment").alias("Marca")
    )
    v2 = v1.withColumn(
        "Marca", F.when(F.col("Id") % 5 == 0, "SEGMENT_CHANGED").otherwise(F.col("Marca"))
    )
    dim = scd.scd2_merge(
        scd.scd2_init(v1, "Id", SCD_T1), v2, "Id", tracked_cols=["Nome", "Marca"], effective_ts=SCD_T2
    )
    return scd.scd2_asof(dim, "2024-01-15 00:00:00").select("Id", "Nome", "Marca")


@register(
    "moving_avg_range_frame",
    """
    SELECT user_id, ts,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 6)
             AS avg_7d
    FROM events
    """,
)
def q_moving_avg_range_frame(spark, sf_dir):
    """RANGE frame over event time (trailing 7 days) — time-based, not
    row-based: each row aggregates a data-dependent number of
    predecessors. Decimal sum / count keeps it oracle-exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("avg_7d"),
    )


@register(
    "ranking_battery",
    """
    SELECT o_orderkey, o_orderpriority,
           dense_rank()  OVER w AS drank,
           ntile(4)      OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS prank,
           ROUND(cume_dist()    OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_ranking_battery(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "session_window_agg",
    """
    WITH seq AS (
      SELECT user_id, ts, value,
             SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 1 HOUR
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM (
        SELECT user_id, ts, value, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events
      )
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM seq GROUP BY user_id, session_seq
    """,
)
def q_session_window_agg(spark, sf_dir):
    """Native session windows (F.session_window, 1h gap): Spark merges
    events into dynamic per-key sessions; the oracle rebuilds identical
    sessions with the lag+cumsum construction — same boundaries, so
    min(ts)/count/sum agree exactly."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


@register(
    "unpivot_line_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS metric_value
    FROM lineitem WHERE l_orderkey < 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def q_unpivot_line_metrics(spark, sf_dir):
    """UNPIVOT/melt: wide metric columns to long (metric, value) rows —
    the inverse of pivot_event_counts; one narrow projection per metric,
    no shuffle."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    ).withColumn("metric", F.expr("substring(metric, 3)"))


@register(
    "grouping_sets_customer",
    """
    SELECT n_name, c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
)
def q_grouping_sets_customer(spark, sf_dir):
    """Explicit GROUPING SETS with GROUPING() markers (distinguishes a
    real NULL key from a superaggregate row) — one pass, Spark expands
    to a single Expand + hash aggregate."""
    from etl_fuel_priceguide_ec2_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_segment
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


@register(
    "normalize_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                '\s+', ' ', 'g')) AS norm_text,
           CAST(len(string_split(trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                '\s+', ' ', 'g')), ' ')) AS INT) AS n_norm_tokens
    FROM documents
    """,
)
def q_normalize_text(spark, sf_dir):
    """Text normalization pipeline: lowercase → strip non-alnum →
    collapse whitespace — the canonical pre-tokenization cleaner, all
    JVM-side regexp."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).alias("n_norm_tokens"),
    )


@register(
    "numeric_battery",
    """
    SELECT event_id,
           abs(value - 50) AS abs_dev,
           CAST(ceil(value) AS BIGINT) AS ceil_v,
           CAST(floor(value) AS BIGINT) AS floor_v,
           ROUND(sqrt(value), 6) AS sqrt_v,
           ROUND(ln(value + 1), 6) AS log1p_v,
           ROUND(power(value, 2), 6) AS sq_v,
           CAST(sign(value - 50) AS INT) AS sign_v,
           CAST(CAST(FLOOR(value) AS BIGINT) % 7 AS BIGINT) AS mod7
    FROM events
    """,
)
def q_numeric_battery(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.abs(F.col("value") - 50).alias("abs_dev"),
        F.ceil("value").alias("ceil_v"),
        F.floor("value").alias("floor_v"),
        F.round(F.sqrt("value"), 6).alias("sqrt_v"),
        F.round(F.log(F.col("value") + 1), 6).alias("log1p_v"),
        F.round(F.pow("value", F.lit(2)), 6).alias("sq_v"),
        F.signum(F.col("value") - 50).cast("int").alias("sign_v"),
        (F.floor("value").cast("bigint") % 7).alias("mod7"),
    )


@register(
    "join_types_matrix",
    """
    WITH active AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    c AS (SELECT c_custkey FROM customer WHERE c_custkey < 200)
    SELECT
      (SELECT COUNT(*) FROM c JOIN active ON c_custkey = user_id)       AS n_inner,
      (SELECT COUNT(*) FROM c LEFT JOIN active ON c_custkey = user_id)  AS n_left,
      (SELECT COUNT(*) FROM c RIGHT JOIN active ON c_custkey = user_id) AS n_right,
      (SELECT COUNT(*) FROM c FULL JOIN active ON c_custkey = user_id)  AS n_full,
      (SELECT COUNT(*) FROM c SEMI JOIN active ON c_custkey = user_id)  AS n_semi,
      (SELECT COUNT(*) FROM c ANTI JOIN active ON c_custkey = user_id)  AS n_anti,
      (SELECT COUNT(*) FROM c CROSS JOIN active)                        AS n_cross
    """,
)
def q_join_types_matrix(spark, sf_dir):
    """Every join type over the same key pair, counted in one row —
    the join-semantics conformance check."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    active = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200).select("c_custkey")
    cond = c.c_custkey == active.user_id
    counts = {
        "n_inner": c.join(active, cond, "inner").count(),
        "n_left": c.join(active, cond, "left").count(),
        "n_right": c.join(active, cond, "right").count(),
        "n_full": c.join(active, cond, "full").count(),
        "n_semi": c.join(active, cond, "left_semi").count(),
        "n_anti": c.join(active, cond, "left_anti").count(),
        "n_cross": c.crossJoin(active).count(),
    }
    return spark.createDataFrame([tuple(counts.values())], list(counts.keys()))


@register(
    "cube_nation_segment",
    """
    SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, c_mktsegment)
    """,
)
def q_cube_nation_segment(spark, sf_dir):
    """CUBE completes the multi-dim aggregate trio (rollup + grouping
    sets + cube): all 4 grouping combinations in one Expand pass."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .cube("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("avg_acctbal"),
        )
    )


@register(
    "value_window_battery",
    """
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS running_last_v,
           nth_value(value, 2) OVER w AS second_v,
           lead(value) OVER w AS next_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_value_window_battery(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("running_last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
        F.lead("value").over(wl).alias("next_v"),
    )


@register(
    "regexp_extract_groups",
    """
    SELECT doc_id, source,
           regexp_extract(source, '([a-z]+)(\\d+)', 1) AS src_kind,
           CAST(regexp_extract(source, '([a-z]+)(\\d+)', 2) AS BIGINT) AS src_num
    FROM documents
    """,
)
def q_regexp_extract_groups(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.regexp_extract("source", r"([a-z]+)(\d+)", 1).alias("src_kind"),
        F.regexp_extract("source", r"([a-z]+)(\d+)", 2).cast("bigint").alias("src_num"),
    )


@register(
    "stats_battery",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_pop(l_quantity, l_discount), 6) AS covar_pop_qty_disc,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_samp_qty_disc,
           ROUND(stddev_pop(l_quantity), 6) AS stddev_pop_qty,
           ROUND(stddev_samp(l_quantity), 6) AS stddev_samp_qty,
           ROUND(var_pop(l_quantity), 6) AS var_pop_qty,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_on_qty,
           ROUND(median(l_quantity), 6) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_battery(spark, sf_dir):
    """Statistical aggregate surface (corr/covariance/stddev/variance/
    regression/median). All second-moment accumulators are
    map-side-combinable in Spark (partial HashAggregate), so this stays
    a single shuffle on the group key at any scale. Rounding keeps the
    double accumulation-order noise below the hash compare threshold."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_pop_qty_disc"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_samp_qty_disc"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("stddev_pop_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_samp_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_pop_qty"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias(
            "slope_price_on_qty"
        ),
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
    )


@register(
    "gap_fill_forward",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, ROUND(MAX(value), 6) AS day_max
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), span AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
    ), spine AS (
      SELECT s.user_id, g.d::DATE AS d
      FROM span s, UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS g(d)
    )
    SELECT sp.user_id, sp.d,
           last_value(dl.day_max IGNORE NULLS) OVER (
             PARTITION BY sp.user_id ORDER BY sp.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           dl.day_max IS NULL AS is_gap
    FROM spine sp
    LEFT JOIN daily dl ON sp.user_id = dl.user_id AND sp.d = dl.d
    """,
)
def q_gap_fill_forward(spark, sf_dir):
    """Time-series gap filling (see windows.gap_fill_daily): per-key
    daily spine + forward fill, one shuffle chain on the key."""
    ev = load_table(spark, sf_dir, "events")
    return windows.gap_fill_daily(ev, "user_id", "ts", "value")


@register(
    "exists_segments",
    """
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
           COUNT(*) FILTER (WHERE NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders,
           COUNT(*) AS n_customers
    FROM customer c
    GROUP BY c_mktsegment
    """,
)
def q_exists_segments(spark, sf_dir):
    """EXISTS / NOT EXISTS decorrelation: expressed as left-semi and
    left-anti joins (what Catalyst rewrites the subqueries to). Both
    probe the same build side; at scale this is one shuffle of orders'
    distinct custkeys against customer."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = cust.c_custkey == orders.o_custkey
    semi = (
        cust.join(orders, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    anti = (
        cust.join(orders, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    total = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return (
        total.join(semi, "c_mktsegment", "left")
        .join(anti, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
            "n_customers",
        )
    )


