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
        # Normalize both to TimestampType truncated to micros — exactly
        # what DuckDB's TIMESTAMP read does, so oracles agree (verified
        # value-identical over the full sf0.01 table).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
