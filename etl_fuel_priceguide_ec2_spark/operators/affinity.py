"""Frequent-pair (2-itemset) affinity mining: support, confidence, lift.

Not in the reference (a row-store ETL); extension-tier. Market-basket
co-occurrence over (basket, item) facts is the classic Apriori-2 shape;
the identical relation mines collocations when the basket is a document
and the item a token — the training-data analog (phrase candidates,
template detection) of "which parts are ordered together".

Scale discipline (the parts that survive 100 TB):
- (basket, item) is DISTINCT-ed FIRST, so multiplicity inside a basket
  never inflates the pair blowup.
- Apriori prune: items below min_support are dropped BEFORE the
  pair-generating self-join — the only quadratic step runs on the
  pruned stream, and its fan-out per basket is bounded by basket size.
- The pair aggregate is a plain groupBy count: map-side combined, the
  shuffle carries (item_a, item_b, partial count), never baskets.
- The basket total is a 1-row aggregate cross-joined back (broadcast
  by construction — the sanctioned crossJoin shape), never a driver
  round-trip inside the plan.

Engine portability: all counting is exact BIGINT; lift and the two
confidences are each ONE division (or one double product then one
division) of exactly-representable integers — every intermediate is
correctly rounded IEEE double in both engines, so the relation
hash-matches the DuckDB replay. Products are computed in DOUBLE
(c_ab * n_baskets as a BIGINT product would overflow at 100 TB row
counts; the double product loses nothing below 2^53 and degrades
gracefully, identically in both engines, above it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators.util import round_like_duckdb


def pair_affinity(
    baskets: DataFrame,
    basket: str = "basket",
    item: str = "item",
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Mine item pairs co-occurring in >= min_support baskets.
    Output: (item_a, item_b, support, support_a, support_b,
    confidence_ab, confidence_ba, lift) with item_a < item_b.

    confidence_ab = P(b | a), lift = P(ab) / (P(a) * P(b)) — lift > 1
    means the pair co-occurs more than independence predicts.

    ``max_basket_size`` is the production fan-out guard (VERDICT r06):
    the pair self-join is quadratic in basket size, and the Apriori
    item prune does NOT bound it — when the basket is a document and
    the items its distinct tokens, one 50k-token document contributes
    1.25B pair rows. Baskets with more than ``max_basket_size``
    distinct items are dropped ENTIRELY (from n_baskets, the single
    supports, and the pairs — the output stays internally consistent);
    count the exclusions with ``oversized_baskets`` on the same
    arguments. None (default) mines everything — correct for bounded
    baskets like order line-parts."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if max_basket_size is not None and max_basket_size < 2:
        raise ValueError("max_basket_size must be >= 2 (pairs need 2 items)")
    bi = baskets.select(
        F.col(basket).alias("_bk"), F.col(item).alias("_it")
    ).distinct()
    if max_basket_size is not None:
        keep = (
            bi.groupBy("_bk")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_basket_size)
            .select("_bk")
        )
        bi = bi.join(keep, "_bk")
    n_baskets = bi.select(F.col("_bk")).distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    singles = bi.groupBy("_it").agg(F.count(F.lit(1)).alias("_c"))
    freq = singles.filter(F.col("_c") >= min_support)
    # prune BEFORE the self-join: infrequent items cannot be in a
    # frequent pair (the Apriori property)
    bi_f = bi.join(freq.select("_it"), "_it").select("_bk", "_it")
    left = bi_f.select("_bk", F.col("_it").alias("item_a"))
    right = bi_f.select("_bk", F.col("_it").alias("item_b"))
    pairs = (
        left.join(right, "_bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    ca = freq.select(F.col("_it").alias("item_a"), F.col("_c").alias("support_a"))
    cb = freq.select(F.col("_it").alias("item_b"), F.col("_c").alias("support_b"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "support",
            "support_a",
            "support_b",
            round_like_duckdb(
                F.col("support").cast("double") / F.col("support_a").cast("double"),
                9,
            ).alias("confidence_ab"),
            round_like_duckdb(
                F.col("support").cast("double") / F.col("support_b").cast("double"),
                9,
            ).alias("confidence_ba"),
            round_like_duckdb(
                (F.col("support").cast("double") * F.col("_n").cast("double"))
                / (
                    F.col("support_a").cast("double")
                    * F.col("support_b").cast("double")
                ),
                9,
            ).alias("lift"),
        )
    )


def oversized_baskets(
    baskets: DataFrame,
    basket: str = "basket",
    item: str = "item",
    max_basket_size: int = 1000,
) -> DataFrame:
    """The exclusion report for ``pair_affinity(max_basket_size=...)``:
    ONE row (n_baskets_dropped, max_basket_size_seen) over the same
    distinct (basket, item) relation — so a capped mining run can state
    exactly what it skipped instead of silently truncating coverage."""
    bi = baskets.select(
        F.col(basket).alias("_bk"), F.col(item).alias("_it")
    ).distinct()
    sizes = bi.groupBy("_bk").agg(F.count(F.lit(1)).alias("_sz"))
    # coalesce: an EMPTY basket relation reports (0, 0), not (NULL,
    # NULL) — same contract as overfrequent_grams (ADVICE r08)
    return sizes.agg(
        F.coalesce(
            F.sum((F.col("_sz") > max_basket_size).cast("long")), F.lit(0)
        ).alias("n_baskets_dropped"),
        F.coalesce(F.max("_sz"), F.lit(0)).alias("max_basket_size_seen"),
    )


def pair_affinity_oracle_sql(
    baskets_sql: str,
    min_support: int = 2,
    topk: int | None = None,
    max_basket_size: int | None = None,
) -> str:
    """DuckDB replay of ``pair_affinity``: identical prune, pair
    aggregate, basket-size cap, and single-rounding float edges.
    ``baskets_sql`` must produce (basket, item). Appends the
    deterministic (lift DESC, item_a, item_b) top-k ranking when
    ``topk`` is given."""
    if max_basket_size is not None:
        bi_cte = f"""bi0 AS (SELECT DISTINCT basket AS bk, item AS it FROM ({baskets_sql})),
    bi AS (
      SELECT bk, it FROM bi0 WHERE bk IN (
        SELECT bk FROM bi0 GROUP BY bk HAVING COUNT(*) <= {max_basket_size}
      )
    ),"""
    else:
        bi_cte = f"bi AS (SELECT DISTINCT basket AS bk, item AS it FROM ({baskets_sql})),"
    base = f"""{bi_cte}
    nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM bi),
    singles AS (
      SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY it
    ),
    freq AS (SELECT it, c FROM singles WHERE c >= {min_support}),
    bif AS (SELECT bi.bk, bi.it FROM bi JOIN freq ON freq.it = bi.it),
    pairs AS (
      SELECT b1.it AS item_a, b2.it AS item_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM bif b1 JOIN bif b2 ON b1.bk = b2.bk AND b1.it < b2.it
      GROUP BY b1.it, b2.it
      HAVING COUNT(*) >= {min_support}
    ),
    result AS (
      SELECT p.item_a, p.item_b, p.support,
             fa.c AS support_a, fb.c AS support_b,
             ROUND(CAST(p.support AS DOUBLE) / CAST(fa.c AS DOUBLE), 9)
               AS confidence_ab,
             ROUND(CAST(p.support AS DOUBLE) / CAST(fb.c AS DOUBLE), 9)
               AS confidence_ba,
             ROUND((CAST(p.support AS DOUBLE) * CAST(nb.n AS DOUBLE))
                   / (CAST(fa.c AS DOUBLE) * CAST(fb.c AS DOUBLE)), 9) AS lift
      FROM pairs p
      JOIN freq fa ON fa.it = p.item_a
      JOIN freq fb ON fb.it = p.item_b
      CROSS JOIN nb
    )"""
    cols = (
        "item_a, item_b, support, support_a, support_b, "
        "confidence_ab, confidence_ba, lift"
    )
    if topk is None:
        return f"WITH {base} SELECT {cols} FROM result"
    return f"""WITH {base}
    SELECT {cols}, CAST(rnk AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift DESC, item_a ASC, item_b ASC) AS rnk
      FROM result
    ) WHERE rnk <= {topk}
"""
