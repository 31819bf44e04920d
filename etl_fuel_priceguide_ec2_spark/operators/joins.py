"""J1–J3 — enrichment join, upsert anti-join, key probes.

Reference semantics:
  * J1 lookup/enrichment join: station list × per-id detail fetch with
    inner-join semantics on Id (``index.js:112-141``). The reference does
    N sequential network round-trips; here it is one broadcast hash join.
  * J2 anti-join: "insert only stations whose Id is not already in the
    dimension" — the ``attribute_not_exists(Id)`` conditional put
    (``index.js:368``, duplicate-key branch ``index.js:269-283``).

Scale notes: dimension sides that fit in memory are broadcast
(``F.broadcast``) so the fact side never shuffles; when both sides are
large, AQE picks sort-merge and splits skewed partitions. The anti-join
shuffles only the (small) key projection of the dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    list_df: DataFrame,
    detail_df: DataFrame,
    on: list[tuple[str, str]],
    broadcast_detail: bool = True,
) -> DataFrame:
    """J1: inner enrichment join; rows without a detail match are dropped
    (matches the reference dropping stations whose detail fetch fails).

    ``on`` is a list of (list_col, detail_col) equi-pairs.
    """
    right = F.broadcast(detail_df) if broadcast_detail else detail_df
    cond = None
    for lc, rc in on:
        p = list_df[lc] == right[rc]
        cond = p if cond is None else (cond & p)
    return list_df.join(right, cond, "inner")


def new_keys(src: DataFrame, dim: DataFrame, src_key: str, dim_key: str) -> DataFrame:
    """J2: rows of ``src`` whose key is absent from ``dim`` — the insert
    set of the reference's conditional put (MERGE WHEN NOT MATCHED)."""
    dim_keys = dim.select(F.col(dim_key).alias(src_key)).distinct()
    return src.join(F.broadcast(dim_keys), on=src_key, how="left_anti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src_col: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side's hot keys are spread over
    ``salts`` sub-keys (deterministic salt from ``salt_src_col`` so
    results are reproducible); the small side is replicated once per
    salt. The shuffle then has ``salts``× the partitions per hot key —
    no straggler task. Use when AQE's skew splitting isn't available
    (e.g. the skewed side feeds an aggregation in the same stage) and
    the small side is too big to broadcast outright but cheap to
    replicate ``salts`` times.
    """
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(salts)))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salts)]))
    )
    out = salted_big.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def interval_join_recent(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_days: int,
) -> DataFrame:
    """Range join: pair each left row with the right rows of the same
    key whose ``right_ts`` lies in ``[left_ts - lookback, left_ts]``.

    Naive ``ON key AND ts BETWEEN ...`` makes Spark pick a broadcast
    nested-loop (or worse) and re-checks every pair. Scalable shape:
    bucket both sides by day, replicate the LEFT side over its
    ``lookback_days + 1`` candidate day-buckets, equi-join on
    (key, day_bucket) — a plain hash join whose cardinality tracks the
    true matches — then apply the exact range predicate as a cheap
    post-filter. Replication factor is the lookback window, not the
    table size.
    """
    lb = left.withColumn(
        "__day",
        F.explode(
            F.sequence(
                F.datediff(F.col(left_ts), F.lit("1970-01-01").cast("date")) - lookback_days,
                F.datediff(F.col(left_ts), F.lit("1970-01-01").cast("date")),
            )
        ),
    )
    rb = right.withColumn(
        "__day", F.datediff(F.col(right_ts), F.lit("1970-01-01").cast("date"))
    )
    joined = lb.join(rb, on=[key, "__day"], how="inner").filter(
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback_days} DAYS"))
    )
    return joined.drop("__day")


def upsert_plan(src: DataFrame, dim: DataFrame, src_key: str, dim_key: str) -> DataFrame:
    """S4: the full insert-if-absent result — existing dim rows unioned
    with the to-insert rows (core-Spark MERGE; with Delta this is
    ``MERGE INTO dim USING src ON ... WHEN NOT MATCHED THEN INSERT``)."""
    inserts = new_keys(src, dim, src_key, dim_key)
    return dim.unionByName(
        inserts.withColumnRenamed(src_key, dim_key), allowMissingColumns=True
    )
