"""SCD Type-2 dimension versioning.

The reference keeps one row per station with Create/UpdateTimestamp
audit columns and never updates it (insert-if-absent only,
``index.js:356-368``) — losing history when a station's attributes
change. The engine offers the standard warehouse upgrade: Type-2
history (validity intervals), with the reference's behavior as the
degenerate "never changes" case.

Representation: one row per (key, version) with
``valid_from``/``valid_to`` timestamps and ``is_current`` flag;
``valid_to`` is NULL on the open version.

Scale notes: the merge is ONE full-outer-shaped join between current
rows and the incoming batch, keyed on the dimension key — both sides
shuffle once; history rows (closed versions) are untouched and never
move. At 100 TB the dim is stored partitioned/bucketed by key so the
join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(src: DataFrame, key: str, effective_ts: str) -> DataFrame:
    """Bootstrap a Type-2 dim from a first snapshot."""
    return src.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    src: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_ts: str,
) -> DataFrame:
    """Merge a new snapshot into a Type-2 dim:

      * unchanged keys  → current row kept as-is
      * changed keys    → current row CLOSED (valid_to = ts), new
                          version opened
      * new keys        → first version opened
      * closed history  → passes through untouched

    Pure DataFrame MERGE: with Delta this maps to one ``MERGE INTO``
    with matched/not-matched clauses; here it is the equivalent
    union of disjoint row sets from a single keyed join.
    """
    ts = F.lit(effective_ts).cast("timestamp")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    src_cols = [c for c in src.columns]
    cur = current.alias("cur")
    new = src.alias("new")
    joined = cur.join(new, F.col(f"cur.{key}") == F.col(f"new.{key}"), "full_outer")

    changed_pred = None
    for c in tracked_cols:
        p = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"new.{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)

    matched = joined.filter(F.col(f"cur.{key}").isNotNull() & F.col(f"new.{key}").isNotNull())
    unchanged = matched.filter(~changed_pred).select("cur.*")
    closed = matched.filter(changed_pred).select("cur.*").withColumn(
        "valid_to", ts
    ).withColumn("is_current", F.lit(False))
    reopened = matched.filter(changed_pred).select("new.*").select(
        *src_cols,
        ts.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    born = joined.filter(F.col(f"cur.{key}").isNull()).select("new.*").select(
        *src_cols,
        ts.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # keys absent from src keep their current row (the reference never
    # deletes stations); a soft-delete variant would close them instead
    departed = joined.filter(F.col(f"new.{key}").isNull()).select("cur.*")

    return history.unionByName(unchanged).unionByName(closed).unionByName(
        reopened
    ).unionByName(born).unionByName(departed)


def scd2_asof(dim: DataFrame, at_ts: str) -> DataFrame:
    """Time-travel read: the dimension as it looked at ``at_ts`` —
    rows whose validity interval covers the instant. With the dim
    partitioned on is_current/valid_to date, old as-of reads prune to
    the history partitions only."""
    ts = F.lit(at_ts).cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= ts) & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )
