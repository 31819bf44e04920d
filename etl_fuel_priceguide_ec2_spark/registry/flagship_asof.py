"""W1/W2/W3 — as-of latest-per-key (reference flagship, index.js:301-321)."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    AS_OF,
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    asof,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# W1/W2/W3 — as-of latest-per-key (reference flagship, index.js:301-321)
# ---------------------------------------------------------------------------


@register(
    "asof_latest_per_key",
    f"""
    SELECT user_id, ts, event_type, value
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts <= TIMESTAMP '{AS_OF}'
    )
    WHERE rn = 1
    """,
)
def q_asof_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = asof.latest_per_key(
        ev, key_cols=["user_id"], ts_col="ts", as_of=AS_OF, tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "ts", "event_type", "value")


@register(
    "asof_point_lookup",
    f"""
    SELECT user_id, ts, event_type, value
    FROM events
    WHERE user_id = 7 AND ts <= TIMESTAMP '{AS_OF}'
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
)
def q_asof_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = asof.latest_for_key(
        ev, key_col="user_id", key_value=7, ts_col="ts", as_of=AS_OF, tiebreak_cols=["event_id"]
    )
    return out.select("user_id", "ts", "event_type", "value")


