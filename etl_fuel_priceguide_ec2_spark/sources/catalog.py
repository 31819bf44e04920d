"""Parquet fixture catalog (S6-equivalent scan source).

The reference reads from DynamoDB (keyed range read,
reference ``index.js:210-232``); here the storage layer is parquet and
Catalyst pushes key predicates and column pruning into the scan
(``PushedFilters`` / ``ReadSchema`` in ``.explain``), which is the Spark
equivalent of DynamoDB evaluating the ``KeyConditionExpression``
server-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by callers are
    pushed into this scan by Catalyst — callers should NOT cache or
    materialize here, or pushdown is lost."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # build this arrives as either a raw long of nanos (when
        # spark.sql.legacy.parquet.nanosAsLong applies) or TIMESTAMP_NTZ
        # truncated to micros (Spark >= 4.1.2 reads nanos natively).
        # Normalize both to TimestampType truncated to micros with the
        # file's wall clock as the UTC-anchored epoch — exactly the
        # value DuckDB's naive TIMESTAMP read compares as, so oracles
        # agree (verified value-identical over the full sf0.01 table).
        # Timezone stability (code-review r16): timestamp_micros is
        # epoch-anchored and already session-tz-independent, but a
        # bare NTZ->timestamp cast interprets the wall clock in the
        # SESSION tz (epoch W - offset), so the two build paths
        # diverged by the session offset anywhere but UTC —
        # from_utc_timestamp(cast, sessionTz) adds the offset back
        # (empirically verified: collect() renders via the driver's
        # system tz, so the EPOCH is the comparison-stable quantity;
        # identity under UTC, the pinned driver/test environment;
        # tz-stability test-pinned).
        #
        # Session side effect, BY DESIGN: the nanosAsLong conf must
        # remain set for the life of any returned events scan —
        # SQLConf is captured when the query EXECUTES, so a
        # save-restore around this lazy read would break the scan at
        # action time. Other nanos-parquet reads in the same session
        # will also see longs; use this catalog for such reads.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        tz = spark.conf.get("spark.sql.session.timeZone")
        return df.withColumn(
            "ts",
            F.from_utc_timestamp(F.col("ts").cast("timestamp"), tz),
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
