"""P1-P5 projections/filters, J1/J2/S4 joins+upsert, A1 keyed dedup, EP3 snapshot diff, F1-F7 scalar battery, A2/A3 run metrics."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    AS_OF,
    FIXED_NOW,
    SNAP_A_END,
    SNAP_B_END,
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    aggregates,
    asof,
    dedup,
    diff,
    joins,
    projections,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# P1–P5 — projections / filters / shaping (index.js:88-133, 356-367)
# ---------------------------------------------------------------------------


@register(
    "projection_rename",
    "SELECT s_suppkey AS id, s_name AS nome FROM supplier",
)
def q_projection_rename(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    return projections.project_rename(sup, {"s_suppkey": "id", "s_name": "nome"})


@register(
    "null_filter_shaping",
    f"""
    SELECT Id, Nome, acctbal,
           strftime(TIMESTAMP '{FIXED_NOW}', '%Y-%m-%d %H:%M:%S') AS CreateTimestamp,
           strftime(TIMESTAMP '{FIXED_NOW}', '%Y-%m-%d %H:%M:%S') AS UpdateTimestamp
    FROM (
      SELECT c_custkey AS Id,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_name END AS Nome,
             c_acctbal AS acctbal
      FROM customer
    )
    WHERE Nome IS NOT NULL
    """,
)
def q_null_filter_shaping(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    shaped = cust.select(
        F.col("c_custkey").alias("Id"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_name")).alias("Nome"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment"),
    )
    filtered = projections.reject_nulls(shaped, ["Nome"])
    pruned = projections.prune_for_dim(filtered, ["c_mktsegment"])  # P4
    return projections.with_audit_columns(pruned, FIXED_NOW)


# ---------------------------------------------------------------------------
# J1/J2/S4 — joins and upsert (index.js:112-141, 368, 269-283)
# ---------------------------------------------------------------------------


@register(
    "enrichment_join",
    """
    SELECT c.c_custkey AS id, c.c_name AS nome, n.n_name AS nation, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_enrichment_join(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    detail = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    out = joins.enrich(cust, detail, on=[("c_nationkey", "n_nationkey")])
    return out.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("nome"),
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region_name"),
    )


@register(
    "upsert_new_keys",
    """
    SELECT DISTINCT user_id AS Id FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id AND c.c_custkey >= 50)
    """,
)
def q_upsert_new_keys(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("Id")).distinct()
    # dim holds only keys >= 50, so users 0..49 are genuinely new inserts
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") >= 50)
    return joins.new_keys(ev, cust, src_key="Id", dim_key="c_custkey")


@register(
    "upsert_merged_dim",
    """
    SELECT c_custkey AS Id, c_name AS Nome FROM customer WHERE c_custkey >= 50
    UNION ALL
    SELECT user_id AS Id, NULL AS Nome FROM (
      SELECT DISTINCT user_id FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = e.user_id AND c.c_custkey >= 50)
    )
    """,
)
def q_upsert_merged_dim(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("Id")).distinct()
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= 50)
        .select(F.col("c_custkey").alias("Id"), F.col("c_name").alias("Nome"))
    )
    return joins.upsert_plan(ev, dim, src_key="Id", dim_key="Id")


# ---------------------------------------------------------------------------
# A1 — keyed dedup, last-wins (index.js:67-75)  /  EP3 — snapshot diff
# ---------------------------------------------------------------------------


@register(
    "dedup_last_wins",
    """
    SELECT user_id, event_type, ts, value
    FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q_dedup_last_wins(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = dedup.dedup_last_wins(
        ev, key_cols=["user_id", "event_type"], order_col="ts", tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "event_type", "ts", "value")


@register(
    "snapshot_diff",
    f"""
    WITH snap AS (
      SELECT * FROM (
        SELECT user_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{SNAP_B_END}'
      ) WHERE rn = 1
    ),
    old_snap AS (
      SELECT * FROM (
        SELECT user_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{SNAP_A_END}'
      ) WHERE rn = 1
    )
    SELECT user_id, event_type, value FROM snap
    EXCEPT
    SELECT user_id, event_type, value FROM old_snap
    """,
)
def q_snapshot_diff(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cols = ["user_id", "event_type", "value"]
    new_snap = asof.latest_per_key(ev, ["user_id"], "ts", SNAP_B_END, ["event_id"]).select(*cols)
    old_snap = asof.latest_per_key(ev, ["user_id"], "ts", SNAP_A_END, ["event_id"]).select(*cols)
    return diff.snapshot_diff(new_snap, old_snap)


@register(
    "keyed_changes",
    f"""
    WITH snap AS (
      SELECT * FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{SNAP_B_END}'
      ) WHERE rn = 1
    ),
    old_snap AS (
      SELECT * FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{SNAP_A_END}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(n.user_id, o.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                WHEN n.event_type IS DISTINCT FROM o.event_type
                     OR n.value IS DISTINCT FROM o.value THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM snap n FULL OUTER JOIN old_snap o ON n.user_id = o.user_id
    """,
)
def q_keyed_changes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cols = ["user_id", "event_type", "value"]
    new_snap = asof.latest_per_key(ev, ["user_id"], "ts", SNAP_B_END, ["event_id"]).select(*cols)
    old_snap = asof.latest_per_key(ev, ["user_id"], "ts", SNAP_A_END, ["event_id"]).select(*cols)
    return diff.keyed_changes(new_snap, old_snap, key_cols=["user_id"])


# ---------------------------------------------------------------------------
# F1–F7 — scalar-function battery  /  A2/A3 — run metrics
# ---------------------------------------------------------------------------


@register(
    "scalar_battery",
    f"""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           'https://api.example.test/station/' || CAST(user_id AS VARCHAR) AS detail_url,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(FLOOR((epoch(TIMESTAMP '{AS_OF}') - epoch(date_trunc('second', ts))) / 60) AS BIGINT)
             AS minutes_to_cutoff,
           CASE WHEN event_type = 'purchase' THEN 'conversion' ELSE 'engagement' END AS type_class
    FROM events
    """,
)
def q_scalar_battery(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.functions import scalar

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        scalar.format_ts("ts").alias("ts_str"),
        scalar.url_for_id("https://api.example.test/station/", "user_id").alias("detail_url"),
        scalar.json_field(F.col("props"), "$.k").cast("bigint").alias("prop_k"),
        scalar.minutes_between(F.col("ts"), F.lit(AS_OF).cast("timestamp")).alias("minutes_to_cutoff"),
        F.when(F.col("event_type") == "purchase", "conversion").otherwise("engagement").alias("type_class"),
    )


@register(
    "run_metrics",
    f"""
    SELECT (SELECT COUNT(*) FROM events) AS n_raw,
           (SELECT COUNT(*) FROM events WHERE ts <= TIMESTAMP '{AS_OF}') AS n_filtered,
           CAST(FLOOR((epoch(TIMESTAMP '{FIXED_NOW}') - epoch(TIMESTAMP '{AS_OF}')) / 60) AS BIGINT)
             AS duration_minutes
    """,
)
def q_run_metrics(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    filtered = ev.filter(F.col("ts") <= F.lit(AS_OF).cast("timestamp"))
    return aggregates.run_metrics(ev, filtered, start_ts=AS_OF, end_ts=FIXED_NOW)


