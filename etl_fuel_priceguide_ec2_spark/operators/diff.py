"""EP3 — price-change detection between two snapshots.

Reference semantics (latent, unfinished): ``checkClientPrices``
(``index.js:63-79``) dedups the last-imported and current price lists by
``DataAtualizacao`` and was meant to emit the changed rows (TODO at
``index.js:272``). Completed here as a set difference on the deduped
snapshots — rows present in the new snapshot but not the old are the
new/changed prices.

Scale: EXCEPT compiles to a hash-based left-anti on all columns; with
both snapshots partitioned by the key, AQE keeps it a co-partitioned
shuffle. For keyed diffs (changed vs added) use a full outer join on the
key instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(new_snap: DataFrame, old_snap: DataFrame) -> DataFrame:
    """Rows in ``new_snap`` absent from ``old_snap`` (EXCEPT DISTINCT —
    both snapshots are already one-row-per-key after A1 dedup)."""
    return new_snap.subtract(old_snap)


def keyed_changes(
    new_snap: DataFrame, old_snap: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Full-outer keyed diff classifying each key as added / removed /
    changed / unchanged."""
    n = new_snap.alias("n")
    o = old_snap.alias("o")
    cond = None
    for k in key_cols:
        p = F.col(f"n.{k}") == F.col(f"o.{k}")
        cond = p if cond is None else cond & p
    value_cols = [c for c in new_snap.columns if c not in key_cols]
    changed = None
    for c in value_cols:
        p = ~F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
        changed = p if changed is None else changed | p
    return (
        n.join(o, cond, "full_outer")
        .select(
            *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols],
            F.when(F.col(f"o.{key_cols[0]}").isNull(), "added")
            .when(F.col(f"n.{key_cols[0]}").isNull(), "removed")
            .when(changed, "changed")
            .otherwise("unchanged")
            .alias("change_type"),
        )
    )
