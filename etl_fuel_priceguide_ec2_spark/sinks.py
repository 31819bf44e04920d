"""S4/S5 — sinks: dimension upsert and append-only fact snapshots.

Reference semantics:
  * S4 conditional-upsert of the station dimension — DynamoDB ``put``
    with ``ConditionExpression: attribute_not_exists(Id)``
    (``index.js:242-294``, condition ``index.js:368``): insert if
    absent, never overwrite.
  * S5 unconditional append of `(Id, Combustiveis, Timestamp)` price
    snapshots (``index.js:178-200``, ``329-345``).

Spark-first storage design (100 TB):
  * Fact table: parquet, append mode, partitioned by run date
    (``run_date=YYYY-MM-DD``) — every as-of/latest query with a time
    bound prunes partitions; a re-run of the same run_ts overwrites
    only its own partition (idempotent replay, fixing the reference's
    non-idempotent append noted in SURVEY.md §4).
  * Dimension: anti-join + append per run (core Spark). This is
    MERGE-WHEN-NOT-MATCHED; with Delta/Iceberg available the same
    ``upsert_plan`` DataFrame feeds ``MERGE INTO`` for transactional
    semantics. Non-atomicity of the plain-parquet variant is documented
    here deliberately (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import joins


def append_fact(
    snapshot: DataFrame, path: str, run_ts_col: str = "run_ts"
) -> None:
    """S5: append a run's snapshot rows, partitioned by run date.
    Uses dynamic partition overwrite so replaying the same run is
    idempotent (replaces only that run's partition)."""
    out = snapshot.withColumn("run_date", F.to_date(F.col(run_ts_col)))
    # sort by key inside each partition file: parquet row-group min/max
    # stats then skip row groups on Id point lookups (W1 reads), the
    # file-level complement to run_date partition pruning
    out = out.sortWithinPartitions("Id") if "Id" in out.columns else out
    (
        out.write.partitionBy("run_date")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def read_fact(spark: SparkSession, path: str) -> DataFrame:
    """Scan the fact table; date predicates prune run_date partitions."""
    return spark.read.parquet(path)


def upsert_dim(src: DataFrame, path: str, key: str) -> None:
    """S4: insert-if-absent into the dimension table at ``path``.

    First run bootstraps the table; later runs append only rows whose
    key is absent (anti-join against current keys — only the key column
    of the existing dim is ever shuffled/broadcast, not its payload).
    """
    spark = src.sparkSession
    try:
        existing = spark.read.parquet(path)
    except Exception:
        src.write.mode("overwrite").parquet(path)
        return
    inserts = joins.new_keys(src, existing, src_key=key, dim_key=key)
    inserts.write.mode("append").parquet(path)


def compact(spark: SparkSession, path: str, target_partitions: int = 8) -> int:
    """Small-file compaction: rewrite a table directory into
    ``target_partitions`` files per partition dir. Long-running append
    pipelines (S5) accrete one file per run per partition; at 100 TB the
    scan's file-listing and task-scheduling overhead grows with file
    count, so periodic compaction is part of the sink contract.
    Returns the new file count. (With a table format — Delta/Iceberg —
    this is OPTIMIZE; on plain parquet it is rewrite-and-swap.)
    """
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    partition_cols = [c for c in df.columns if c == "run_date"]
    tmp = path.rstrip("/") + ".compacting"
    writer = df.repartition(target_partitions, *partition_cols) if partition_cols else df.coalesce(target_partitions)
    w = writer.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def expire_partitions(spark: SparkSession, path: str, before_date: str) -> int:
    """Retention: drop fact partitions with run_date < before_date.
    Partition-dir removal — no rewrite of surviving data (the reason the
    fact table partitions on run_date in the first place). Returns the
    number of dropped partitions."""
    import re
    import shutil
    from pathlib import Path

    dropped = 0
    for child in Path(path).iterdir():
        m = re.match(r"run_date=(.+)$", child.name)
        if m and m.group(1) < before_date:
            shutil.rmtree(child)
            dropped += 1
    return dropped
