"""A2/A3 + Phase-3 analytics — hash aggregates, rollup, top-k per group,
set ops, run metrics.

The reference computes only counts and a duration metric
(``index.js:94,143,167`` and ``index.js:27,55-56``), but "same
capabilities" for a price guide implies min/max/avg-per-group analytics
over the fact table (SURVEY.md §2.4); these map to the TPC-H-ish
fixtures.

Scale notes: every groupBy here is a hash aggregate with map-side
partial aggregation (one shuffle of partial states, not rows). Money
math runs on DECIMAL (exact, order-insensitive) and is cast to DOUBLE
only in the output so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_cutoff: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over the fact table.

    Money columns are 2-decimal, so DECIMAL(12,2)/(4,2) suffice: the
    disc-price product has precision 17 → stays on Spark's compact
    long-backed decimal path (no Int128 multiply), ~4× faster than
    wide decimals while remaining exact."""
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")))
            .cast("double")
            .alias("sum_disc_price"),
            # avg as exact-decimal sum / count in double: identical rounding
            # in Spark and DuckDB (decimal AVG scale rules differ between
            # engines, sum/count does not)
            F.round(F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
) -> DataFrame:
    """TPC-H Q5-shaped star join: revenue per nation within a region.
    nation/region/customer are broadcast — the lineitem side (the 100 TB
    table) shuffles once, for the orders join, and AQE converts even that
    to broadcast when orders is small enough."""
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, tiebreak_cols: list[str]
) -> DataFrame:
    """W3 generalized: top-k rows per group by ``order_col`` desc, total
    deterministic order via tiebreaks. One shuffle; rank inside each
    partition (no global sort)."""
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rollup_stats(part: DataFrame) -> DataFrame:
    """ROLLUP aggregate: count + avg retail price per (brand) and grand
    total. Spark emits NULL group keys for the total rows, matching
    SQL ROLLUP."""
    return (
        part.rollup("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
        )
        .orderBy(F.col("p_brand").asc_nulls_first())
    )


def run_metrics(raw: DataFrame, filtered: DataFrame, start_ts: str, end_ts: str) -> DataFrame:
    """A2/A3: cardinality + duration metrics of an ETL run
    (index.js:94,143 counts; index.js:55-56 minutes diff)."""
    n_raw = raw.count()
    n_filtered = filtered.count()
    spark = raw.sparkSession
    return spark.createDataFrame(
        [(n_raw, n_filtered)], "n_raw bigint, n_filtered bigint"
    ).select(
        "n_raw",
        "n_filtered",
        F.floor(
            (
                F.unix_timestamp(F.lit(end_ts).cast("timestamp"))
                - F.unix_timestamp(F.lit(start_ts).cast("timestamp"))
            )
            / 60
        ).alias("duration_minutes"),
    )


def salted_two_phase_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed/high-fanin keys: phase 1 groups
    by (key, salt) — the salt (a hash of a row-unique column, so it is
    deterministic and partition-independent) spreads one hot key's rows
    over ``buckets`` reducers; phase 2 merges the partial states per
    key. Counts merge by SUM, sums by SUM (decimal — exact and
    order-free), min/max by MIN/MAX.

    At 100 TB this is the standard defence when ONE key holds >1
    executor-memory of rows: the first shuffle fans the hot key out,
    the second shuffle moves only ``buckets`` partial rows per key.
    (For joins the same idea lives in joins.salted_join; AQE's skew
    handling covers sort-merge joins but not single-key hash aggs.)

    Honest scope note: for purely algebraic states like these, Spark's
    map-side partial aggregation already caps the hot reducer's input
    at one partial per map task — salting is the lever when that
    defence fails: non-combinable or memory-heavy states
    (collect_list/set, exact distinct counts, percentile buffers) or
    a combine defeated by high per-task key cardinality. The algebraic
    demo here is chosen because its oracle (the plain one-phase GROUP
    BY) proves the decomposition exact."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    dec = F.round(F.col(value_col).cast("double"), 6).cast("decimal(18,6)")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec).alias("_sum"),
            F.min(dec).alias("_min"),
            F.max(dec).alias("_max"),
        )
    )
    return (
        partial.groupBy(key_col)
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_sum").cast("double").alias("sum_value"),
            F.min("_min").cast("double").alias("min_value"),
            F.max("_max").cast("double").alias("max_value"),
        )
    )


def incremental_rollup(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Incremental re-aggregation: daily partial aggregates (the state a
    pipeline would persist per run/partition) merged into a monthly
    rollup WITHOUT touching raw rows again. count->SUM, sum->SUM
    (decimal, exact), min->MIN, max->MAX are the classic mergeable
    aggregate states; avg is re-derived from merged sum/count at the
    edge (never averaged-of-averages).

    At 100 TB the daily relation is what an incremental pipeline stores
    (one partition per run, reference index.js:329-345's per-run
    snapshots); each new day appends one partial and the monthly merge
    reads partials only — this query IS that merge, demonstrating the
    state schema supports exact re-aggregation."""
    dec = F.round(F.col(value_col).cast("double"), 6).cast("decimal(18,6)")
    daily = (
        df.withColumn("_day", F.to_date(ts_col))
        .groupBy(key_col, "_day")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec).alias("_sum"),
            F.min(dec).alias("_min"),
            F.max(dec).alias("_max"),
        )
    )
    return (
        daily.withColumn("month", F.date_format("_day", "yyyy-MM"))
        .groupBy(key_col, "month")
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_sum").cast("double").alias("sum_value"),
            F.min("_min").cast("double").alias("min_value"),
            F.max("_max").cast("double").alias("max_value"),
            F.round(F.sum("_sum").cast("double") / F.sum("_n"), 6).alias("avg_value"),
        )
    )


def salted_distinct_count(
    df: DataFrame, key_col: str, distinct_col: str, buckets: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT) at scale via disjoint salting: salt =
    hash(distinct_col) % buckets, so every distinct value lands in
    EXACTLY one (key, salt) cell — per-cell distinct counts are
    disjoint and their plain SUM per key is exact (no overlap to
    over-count, unlike salting on a row-unique column).

    This is the case where salting genuinely beats Spark's built-in
    path: a distinct aggregate must materialize the distinct SET, which
    map-side combine cannot compress below its cardinality — one hot
    key's set lands on one reducer. Bucketing by the distinct value
    splits that set ``buckets`` ways while staying exact."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    per_cell = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("_nd"))
    )
    return per_cell.groupBy(key_col).agg(F.sum("_nd").alias("n_distinct"))
