"""Operator-level utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure CPU-heavy per-row stages get cluster-wide parallelism.

    Small fixture tables arrive as a single parquet row group → one
    input split → one task, serializing heavy higher-order-function
    work (shingling, minhash, dot products) onto one core. At real
    scale the scan already yields thousands of splits and this is a
    no-op (we only repartition when the input has FEWER partitions than
    the cluster's parallelism — never an extra shuffle on big inputs).
    """
    if df.isStreaming:
        # streaming relations can't be partition-probed (df.rdd is a
        # batch-only API) and get their parallelism from the source's
        # partitioning per micro-batch — pass through untouched so every
        # map-only operator here stays streaming-compatible
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
