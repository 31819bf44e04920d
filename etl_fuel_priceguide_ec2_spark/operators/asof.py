"""W1 — as-of "latest record per key" (the reference's flagship query).

Reference semantics (``index.js:301-321``): for a station,
``Id = :id AND Timestamp <= :t``, sorted descending by the sort key
(``ScanIndexForward: false``, ``index.js:313``), ``Limit: 1``
(``index.js:314``) → most recent snapshot at or before time ``t``.

Spark-first design notes (100 TB):
  * The all-keys form is ONE shuffle on the key (window or max_by agg);
    never a per-key loop. ``max_by(struct(...))`` compiles to a hash
    aggregate with map-side partial aggregation — cheaper than the
    window's sort when only the top row is needed.
  * The point-lookup form keeps ``key = v AND ts <= t`` as pushed-down
    parquet filters (check ``PushedFilters`` in ``.explain``); at scale
    the fact table is partitioned by date so the ``ts`` bound also prunes
    partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    as_of: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Latest row per key at-or-before ``as_of`` (all-keys form of W1).

    Implemented with a descending ``row_number`` window so ordering is
    total and deterministic (``tiebreak_cols`` break ts ties), matching
    the DuckDB oracle exactly. Equivalent to the reference's query+limit
    per key, vectorized across all keys.
    """
    if as_of is not None:
        df = df.filter(F.col(ts_col) <= F.lit(as_of).cast("timestamp"))
    order: list[Column] = [F.col(ts_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).desc())
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """True as-of JOIN: for every left row, attach the latest right row
    of the same key with ``right_ts <= left_ts`` (the all-pairs
    generalization of the reference's per-key query, index.js:301-321).

    Implemented with the merge-union pattern: tag both sides, union,
    then one window pass per key ordered by time carries the most recent
    right ROW forward — as a single struct of all ``right_vals``, so the
    attached values always come from one right row even when some of its
    value columns are NULL (carrying each column independently with
    ``last(..., ignorenulls)`` would mix columns from different right
    rows and resurrect stale non-NULL values). A genuinely-NULL field in
    the latest right row is attached as NULL. Keep left rows.
    ONE shuffle on the key — never a per-key loop, never a range
    cross-join; at 100 TB both sides co-partition on the key and the
    window sort is the only cost. Spark lacks a native as-of join (Pandas
    API has merge_asof; this is the DataFrame-native equivalent).
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    tb_cols = [F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []
    rt = (
        right.select(
            F.col(key_col),
            F.col(right_ts).alias("__t"),
            *tb_cols,
            *[F.col(c) for c in right_vals],
        )
        .withColumn("__side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    if not right_tiebreak:
        merged = merged.withColumn("__tb", F.lit(0))
    # right rows sort before left rows at equal timestamps (__side asc),
    # so a right row at exactly left_ts is visible to that left row (<=);
    # __tb makes the winner among equal-(key, ts) right rows
    # deterministic (largest tiebreak wins, matching last-wins)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct per right row (NULL on left rows): last(..., ignorenulls)
    # skips left rows but never tears a right row apart field-wise
    right_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in right_vals])
    )
    carried = merged.select(
        "*", F.last(right_struct, ignorenulls=True).over(w).alias("__asof")
    )
    out_cols = [c for c in left.columns] + [
        F.col("__asof").getField(c).alias(f"asof_{c}") for c in right_vals
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def latest_for_key(
    df: DataFrame,
    key_col: str,
    key_value,
    ts_col: str,
    as_of: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Point-lookup form of W1 (``Id = :v AND ts <= :t`` desc limit 1,
    reference ``index.js:305-314``). The equality + range predicates are
    pushed into the parquet scan; sort+limit is a TakeOrderedAndProject.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols or []]
    return (
        df.filter((F.col(key_col) == F.lit(key_value)) & (F.col(ts_col) <= F.lit(as_of).cast("timestamp")))
        .orderBy(*order)
        .limit(1)
    )


def asof_join_within(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_tiebreak: str | None = None,
    tolerance: str = "7 days",
) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof's
    ``tolerance``): identical to :func:`asof_join`, but a match older
    than ``tolerance`` before the left timestamp is discarded — every
    ``asof_*`` column masks to NULL together (the match is one right
    ROW; masking per-column would tear it).

    Same single-shuffle merge-union plan as asof_join: the bound is a
    post-carry per-row predicate, not a range-join blowup."""
    vals = list(dict.fromkeys([right_ts, *right_vals]))
    out = asof_join(
        left, right, key_col, left_ts, right_ts, vals, right_tiebreak
    )
    fresh = F.col(f"asof_{right_ts}") >= (
        F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
    )
    for c in vals:
        out = out.withColumn(f"asof_{c}", F.when(fresh, F.col(f"asof_{c}")))
    return out
