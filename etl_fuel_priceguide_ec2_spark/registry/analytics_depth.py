"""Lateral top-k, INTERSECT ALL, int8 ANN, revenue shares, key-skew profile, rolling distinct, cohort retention, explode_outer, mode."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    aggregates,
    similarity,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

@register(
    "lateral_topk_orders",
    """
    SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
)
def q_lateral_topk_orders(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 orders per customer).
    Catalyst decorrelates the per-row subquery into the set-based
    WindowGroupLimit top-k + one join — the nested-loop the SQL implies
    never executes; orderkey tiebreak keeps the cut deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


@register(
    "intersect_all_multiset",
    """
    SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
    INTERSECT ALL
    SELECT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    """,
)
def q_intersect_all_multiset(spark, sf_dir):
    """INTERSECT ALL (multiset semantics — duplicates kept up to the
    min multiplicity on each side), completing the set-op family with
    except_all/union/intersect. Planned as an aggregate on the row
    value with per-side counts, one shuffle."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("ts") < "2024-01-20").select("user_id", "event_type")
    b = ev.filter(F.col("ts") >= "2024-01-10").select("user_id", "event_type")
    return a.intersectAll(b)


@register(
    "similarity_topk_int8",
    """
    WITH nrm AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                              (a, b) -> a + b)) AS nm
      FROM embeddings
    ), q8 AS (
      -- bit-identical mirror of similarity.quantize_int8: same double
      -- widening, same left-fold norm order, same HALF_UP rounding
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x / nm * 127) AS DOUBLE)) AS q
      FROM nrm
    )
    SELECT query_id, neighbor_id, rank, approx_cosine FROM (
      SELECT s.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY s.vec_id
               ORDER BY ROUND(list_dot_product(c.q, s.q) / (127.0 * 127.0), 6) DESC,
                        c.vec_id ASC) AS rank,
             ROUND(list_dot_product(c.q, s.q) / (127.0 * 127.0), 6) AS approx_cosine
      FROM q8 c CROSS JOIN q8 s
      WHERE s.vec_id < 10 AND s.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
)
def q_similarity_topk_int8(spark, sf_dir):
    """Scalar-quantized (int8) ANN — the storage/bandwidth scale path:
    4× smaller vectors, exact integer scoring (order-independent, so
    ranking cuts are deterministic under any partitioning)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_int8(emb, queries, "vec_id", "embedding", k=5)


@register(
    "revenue_share_by_nation",
    """
    WITH rev AS (
      SELECT n_name,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS revenue_dec
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(revenue_dec AS DOUBLE) AS revenue,
           ROUND(CAST(revenue_dec AS DOUBLE) /
                 CAST(SUM(revenue_dec) OVER () AS DOUBLE), 6) AS share
    FROM rev
    """,
)
def q_revenue_share_by_nation(spark, sf_dir):
    """Percent-of-total (ratio-to-report): group aggregate + an
    unpartitioned window over the AGGREGATED output — the global window
    is safe because it runs over |groups| rows (25 nations), never the
    fact table. Share computed on the exact decimal totals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("revenue_dec")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("revenue_dec").cast("double").alias("revenue"),
        F.round(
            F.col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(w).cast("double"),
            6,
        ).alias("share"),
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
                 6) AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY date_trunc('month', l_shipdate)
    """,
)
def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (promotion revenue share by month): conditional
    decimal sums in one aggregate pass — the numerator CASE folds into
    the same partial-aggregate state as the denominator; part joins as
    a broadcast."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "key_skew_profile",
    """
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           MAX(n) AS max_per_key,
           ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS mean_per_key,
           ROUND(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 6) AS skew_ratio,
           CAST(median(n) AS DOUBLE) AS median_per_key
    FROM per_key
    """,
)
def q_key_skew_profile(spark, sf_dir):
    """Key-skew diagnostic: per-key counts folded to (max/mean) skew
    ratio + median — the profile you run BEFORE deciding on salting /
    AQE skew thresholds for a join key. Two partial-aggregable passes;
    the second runs over |keys| rows only."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 6).alias("mean_per_key"),
        F.round(
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n"), 6
        ).alias("skew_ratio"),
        F.median("n").alias("median_per_key"),
    )


@register(
    "rolling_7d_distinct_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM du)
    SELECT dd.d, COUNT(DISTINCT du.user_id) AS active_7d
    FROM days dd
    JOIN du ON du.d BETWEEN dd.d - INTERVAL 6 DAY AND dd.d
    GROUP BY dd.d
    """,
)
def q_rolling_7d_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct actives (the MAU/WAU family). COUNT
    DISTINCT can't ride a sliding window, so: dedup to (day, user)
    grain FIRST (collapses N events to ≤ K·days rows), then replicate
    each observation to the ≤7 report days it supports and count
    distinct per day. Replication factor is the window length — bounded
    and known — and everything downstream of the dedup runs on day-
    grain data, not events."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contributes = du.select(
        "user_id",
        F.explode(F.sequence("d", F.date_add("d", 6))).alias("report_d"),
    )
    days = du.select(F.col("d").alias("report_d")).distinct()
    return (
        contributes.join(days, "report_d")
        .groupBy(F.col("report_d").alias("d"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@register(
    "cohort_retention",
    """
    WITH fp AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), cohorts AS (
      SELECT user_id, CAST(date_trunc('week', cohort_d) AS DATE) AS cohort_week
      FROM fp
    ), activity AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE) AS act_week
      FROM events e WHERE e.event_type = 'purchase'
    )
    SELECT c.cohort_week,
           CAST((act_week - cohort_week) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM cohorts c JOIN activity a ON c.user_id = a.user_id
    WHERE act_week >= cohort_week
    GROUP BY c.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-purchase week,
    counted distinct per (cohort, weeks-since) cell — the standard
    product-analytics triangle. Cohort assignment is one aggregate;
    the matrix is one join on user_id + one distinct count, all keyed."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.to_date("ts"))).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy("cohort_week",
                 (F.datediff("act_week", "cohort_week") / 7).cast("bigint").alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "explode_outer_null_preserving",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> len(t) > 6) AS longs
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, tok FROM (
      SELECT t.doc_id, u.tok FROM toks t, UNNEST(t.longs) AS u(tok)
      UNION ALL
      SELECT doc_id, NULL AS tok FROM toks WHERE len(longs) = 0
    )
    """,
)
def q_explode_outer_null_preserving(spark, sf_dir):
    """explode_outer: rows with empty arrays survive as (id, NULL)
    instead of vanishing — the generator form of a LEFT join, needed
    whenever downstream counts must still see every parent row. (DuckDB
    has no outer unnest; the oracle union-alls the empty-array rows.)"""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    longs = F.filter(F.split("text", " "), lambda t: F.length(t) > 6)
    return (
        docs.filter(F.col("doc_id") < 100)
        .select("doc_id", F.explode_outer(longs).alias("tok"))
    )


@register(
    "most_frequent_event_type",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS top_type, n AS n_events
    FROM (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
)
def q_most_frequent_event_type(spark, sf_dir):
    """Deterministic per-key mode: count per (key, value), keep the
    top-1 by (count desc, value asc). Bare mode() breaks ties
    arbitrarily across engines AND across partitionings — the explicit
    tie-break is what makes the answer stable at any scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), F.col("n").alias("n_events"))
    )




@register(
    "salted_event_value_agg",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(MIN(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q_salted_event_value_agg(spark, sf_dir):
    """Two-phase salted aggregation (hot-key defence): phase 1 groups by
    (event_type, salt-of-event_id) spreading any single hot key across
    16 reducers, phase 2 merges the mergeable states. The oracle is the
    PLAIN one-phase GROUP BY — proving the decomposition is exact."""
    ev = load_table(spark, sf_dir, "events")
    return aggregates.salted_two_phase_agg(
        ev, "event_type", "value", salt_col="event_id", buckets=16
    )


@register(
    "incremental_monthly_rollup",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS s,
             MIN(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS mn,
             MAX(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, strftime(d, '%Y-%m') AS month,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(s) AS DOUBLE) AS sum_value,
           CAST(MIN(mn) AS DOUBLE) AS min_value,
           CAST(MAX(mx) AS DOUBLE) AS max_value,
           ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6) AS avg_value
    FROM daily
    GROUP BY user_id, strftime(d, '%Y-%m')
    """,
)
def q_incremental_monthly_rollup(spark, sf_dir):
    """Mergeable-state re-aggregation: daily partials (what an
    incremental pipeline persists per run) rolled to months without
    re-reading raw rows. The oracle replays the same two-level merge —
    count/sum/min/max as mergeable states, avg re-derived at the edge."""
    ev = load_table(spark, sf_dir, "events")
    return aggregates.incremental_rollup(ev, "user_id", "ts", "value")


@register(
    "distinct_users_salted",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users_salted(spark, sf_dir):
    """Exact distinct-count via disjoint salting (salt = hash of the
    DISTINCT column, so per-cell sets never overlap and SUM of cell
    counts is exact) — the scale pattern for one hot key whose distinct
    set exceeds a single reducer. Oracle = the plain COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    return aggregates.salted_distinct_count(ev, "event_type", "user_id", buckets=16)


@register(
    "pandas_udaf_user_trend",
    """
    SELECT user_id,
           ROUND(regr_slope(value, epoch(ts)), 9) AS slope,
           ROUND(regr_intercept(value, epoch(ts)), 4) AS intercept,
           COUNT(*) AS n
    FROM events WHERE user_id < 50
    GROUP BY user_id
    """,
)
def q_pandas_udaf_user_trend(spark, sf_dir):
    """Grouped-map pandas UDAF (§2.8, driver-visible form): per-user
    least-squares trend of value over event time via applyInPandas +
    numpy, oracled against DuckDB's regr_slope/regr_intercept. The
    rounding margins are deliberate: slope magnitudes are ~1e-5 with
    cross-engine summation noise ~1e-17 (9dp safe); intercepts inherit
    slope noise scaled by epoch ~1.7e9 (4dp safe)."""
    import pandas as pd

    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "value")
    )

    def _trend(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # normalize the datetime unit explicitly (Arrow hands pandas
        # datetime64[ns]); micros -> epoch seconds as double, exactly
        # DuckDB's epoch(ts)
        x = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
        y = pdf["value"].to_numpy(dtype="float64")
        n = len(pdf)
        xm, ym = x.mean(), y.mean()
        dx = x - xm
        denom = float((dx * dx).sum())
        if n < 2 or denom == 0.0:
            slope, intercept = None, None
        else:
            slope = float((dx * (y - ym)).sum() / denom)
            intercept = round(ym - slope * xm, 4)
            slope = round(slope, 9)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "slope": [slope],
                "intercept": [intercept],
                "n": [n],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        _trend, "user_id bigint, slope double, intercept double, n bigint"
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.first_view
        AND e.ts <= v.first_view + INTERVAL 2 DAY
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        AND e.ts <= c.first_click + INTERVAL 2 DAY
      GROUP BY 1
    )
    SELECT v.user_id, v.first_view, c.first_click, p.first_purchase
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_funnel_view_click_purchase(spark, sf_dir):
    """Ordered 3-stage funnel (view -> click within 2 days -> purchase
    within 2 days of the click): per-user first-touch timestamps with
    NULLs where the user fell out. Each stage is ONE events scan with
    the (small) previous-stage relation broadcast into it and a
    per-user MIN — the stage relations shrink monotonically, so at
    100 TB the fact table is scanned once per stage and never
    self-joined row-to-row. The conversion counts (150 -> 96 -> 58 at
    sf0.01) fall out of the NULL structure."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    from etl_fuel_priceguide_ec2_spark.operators import windows

    return windows.funnel_first_touch(
        ev, "user_id", "ts", "event_type",
        stages=["view", "click", "purchase"], within="2 DAYS",
    )
