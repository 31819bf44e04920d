"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-at-scale first:
  * AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
  * UTC session timezone (oracle comparisons must not depend on host tz)
  * Arrow for any pandas interchange (vectorized UDF path)
  * shuffle partitions sized from the local core count; on a real cluster
    AQE coalesces the excess, so a generous initial number is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "etl-fuel-priceguide-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Respects an already-running session's master; otherwise uses
    ``local[$SPARK_GRAFT_CPUS]`` (driver harness contract).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", n))

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Small local fixtures → tiny files; keep scan tasks reasonable.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# Documented starting points for real deployments (local[k] testing uses
# get_session's defaults). Rationale per 100 TB-scan job:
#   * shuffle.partitions ≈ 2-3× total cores so AQE coalesces DOWN (it
#     never splits up); keeps the largest post-shuffle partition under
#     executor memory even with moderate skew.
#   * 256 MB scan splits amortize task overhead at 1000+ executors
#     without starving parallelism — 100 TB / 256 MB ≈ 400k scan tasks.
#   * Kryo + compressed shuffle: the dedup/similarity operators move
#     hashes and ids, which compress extremely well.
CLUSTER_PRESETS: dict[str, dict[str, str]] = {
    "batch-100tb": {
        "spark.sql.shuffle.partitions": "8000",
        "spark.sql.files.maxPartitionBytes": "268435456",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "104857600",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.shuffle.compress": "true",
        "spark.sql.parquet.filterPushdown": "true",
    },
    "streaming": {
        "spark.sql.shuffle.partitions": "512",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    },
}
