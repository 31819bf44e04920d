"""P1–P6 — projections, renames, null filters, computed audit columns.

Reference semantics:
  * P1 projection+rename ``{Id, Nome} -> {id, nome}`` (``index.js:88-92``)
  * P2 null-rejecting conjunctive filter (``index.js:118-120``)
  * P3 wide projection / schema shaping (``index.js:123-133``)
  * P4 column pruning before the dimension write (``index.js:356-367``)
  * P5 computed audit timestamps (``index.js:364-365``)

All are single narrow ``select``/``filter`` stages — no shuffle; Catalyst
collapses them into the scan (column pruning + predicate pushdown), so at
100 TB these cost exactly one pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1/P3: project ``mapping`` keys, renaming to the values."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def reject_nulls(df: DataFrame, cols: list[str]) -> DataFrame:
    """P2: keep rows where every listed column is non-null
    (``Nome/Morada/Combustiveis`` check, index.js:118-120)."""
    cond = None
    for c in cols:
        p = F.col(c).isNotNull()
        cond = p if cond is None else (cond & p)
    return df.filter(cond)


def with_audit_columns(df: DataFrame, now_ts: str | None = None) -> DataFrame:
    """P5: add ``CreateTimestamp``/``UpdateTimestamp`` formatted
    ``yyyy-MM-dd HH:mm:ss`` (index.js:364-365). Pass ``now_ts`` for a
    deterministic instant; default is ``current_timestamp()``."""
    ts = F.lit(now_ts).cast("timestamp") if now_ts else F.current_timestamp()
    fmt = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    return df.withColumn("CreateTimestamp", fmt).withColumn("UpdateTimestamp", fmt)


def prune_for_dim(df: DataFrame, drop_cols: list[str]) -> DataFrame:
    """P4: drop columns not persisted to the dimension row
    (``Utilizacao``, ``Combustiveis`` dropped at index.js:356-367)."""
    return df.drop(*drop_cols)
