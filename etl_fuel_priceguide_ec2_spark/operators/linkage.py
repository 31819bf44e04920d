"""Fuzzy record linkage / entity resolution over string keys.

The reference's ETL surface is exact-key upserts (index.js:242-294 keys
dims on exact ids); production dims accumulate dirty near-key rows —
typos, OCR noise, one-digit id drift — that exact joins silently fork
into duplicate entities. This module adds the scale-correct fuzzy-join
primitive: SymSpell symmetric-delete blocking, where every string emits
its 1-deletion neighborhood (the string itself plus |s| variants) and
two strings within Damerau-free edit distance 1 are GUARANTEED to share
a variant (substitution at i: both delete i; insert/delete: the shorter
IS a deletion of the longer; equality: the identity variant). Candidates
come from an equi-join on 8-byte hashed variants — never an all-pairs
levenshtein — and are then verified with the exact built-in
`levenshtein`, so recall is exactly 1.0 at distance <= 1 and false
candidates (e.g. transpositions, distance 2) are filtered.

100 TB shape: |s|+1 variant rows per distinct string, hashed to longs
before the shuffle; the distinct-string aggregate collapses the corpus
to its name vocabulary first (Heaps' law: vocab << rows), so the join
input is vocabulary-sized. `min_len` keeps degenerate short strings —
whose deletion neighborhoods collide pathologically — out of the
blocking join entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _delete_at(s, i):
    # character-i deletion; i = 0 is the identity (substring(s,1,-1) =
    # '' both engines, so the concat reproduces s)
    return F.concat(
        F.substring(s, 1, i - F.lit(1)),
        s.substr(i + F.lit(1), F.length(s)),
    )


def symspell_pairs(
    df: DataFrame,
    str_col: str,
    min_len: int = 4,
    max_variant_freq: int | None = None,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance <= ``max_dist`` pairs (1 or 2) over the DISTINCT
    values of ``str_col``: (s_a, s_b, cnt_a, cnt_b, dist) with
    s_a < s_b, dist <= max_dist, and cnt_* the input multiplicity of
    each string (callers re-link rows by joining back on the string).
    Symmetric-delete candidate generation + exact levenshtein verify;
    recall 1.0 by the pigeonhole argument in the module docstring,
    which extends to depth d: if lev(a, b) <= d then deleting (at
    most) the d positions each side touches in an optimal alignment
    lands both strings on a common variant, so their depth-d deletion
    neighborhoods intersect.

    ``max_dist=2`` generates the depth-2 neighborhood — ~L²/2 variants
    per length-L string vs L+1 at depth 1 (for the 18-char fixture
    names: ~172 vs 19; SCALE.md has the count table). Still
    vocabulary-sized (Heaps' law), but the quadratic-in-L factor is
    why production SymSpell stops at d=2 and why the hot-bucket cap
    matters more here: deeper deletions collapse more of the
    vocabulary into shared variants.

    ``max_variant_freq``: optional hot-bucket cap (the LSH band-cap
    pattern) — deletion variants shared by more than this many distinct
    strings are dropped before the self-join. Exactness then degrades
    only on those saturated buckets (recall loss is reported by the
    caller comparing candidate counts, not silent data corruption —
    every emitted pair is still verified); the default None keeps the
    exact contract.
    """
    if max_dist not in (1, 2):
        raise ValueError(f"symspell_pairs supports max_dist 1 or 2, got {max_dist}")
    strs = (
        df.filter(F.length(F.col(str_col)) >= min_len)
        .groupBy(F.col(str_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    d1 = strs.select(
        "s",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.length("s"))).alias("i"),
    ).select("s", "cnt", _delete_at(F.col("s"), F.col("i")).alias("d"))
    if max_dist == 2:
        # second deletion over the depth-1 strings; (i=0, j=0) keeps the
        # identity, mixed terms give every 1-deletion, and the distinct
        # collapses the i/j orderings of each 2-deletion
        d1 = d1.select(
            "s",
            "cnt",
            F.explode(F.sequence(F.lit(0), F.length("d"))).alias("j"),
            F.col("d").alias("d0"),
        ).select("s", "cnt", _delete_at(F.col("d0"), F.col("j")).alias("d"))
    variants = d1.select("s", "cnt", F.xxhash64(F.col("d")).alias("dh"))
    if max_dist == 2:
        # the depth-2 expansion repeats variants ~L ways (orderings +
        # repeated characters); dedup the vocab-sized relation BEFORE
        # the self-join so bucket joins see set semantics, not an
        # L^2-inflated multiset (depth 1 skips the exchange — its few
        # repeated-character dups are cheaper than a shuffle)
        variants = variants.distinct()
    if max_variant_freq is not None:
        hot = (
            variants.groupBy("dh")
            .agg(F.count_distinct("s").alias("vf"))
            .filter(F.col("vf") > max_variant_freq)
            .select("dh")
        )
        variants = variants.join(F.broadcast(hot), "dh", "left_anti")
    a = variants.select(F.col("s").alias("s_a"), F.col("cnt").alias("cnt_a"), "dh")
    b = variants.select(F.col("s").alias("s_b"), F.col("cnt").alias("cnt_b"), "dh")
    return (
        a.join(b, "dh")
        .filter(F.col("s_a") < F.col("s_b"))
        .select("s_a", "s_b", "cnt_a", "cnt_b")
        .distinct()
        .withColumn("dist", F.levenshtein("s_a", "s_b").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )


def symspell_oracle_sql(
    corpus_sql: str, str_col: str, min_len: int = 4, max_dist: int = 1
) -> str:
    """DuckDB replay: string-valued variant join (no hashing — the hash
    only compresses shuffle keys, the candidate set is identical absent
    64-bit collisions) + the same levenshtein verify. ``max_dist=2``
    unrolls the second deletion level with the same dedup."""
    if max_dist not in (1, 2):
        raise ValueError(f"symspell_oracle_sql supports max_dist 1 or 2, got {max_dist}")
    var1 = """
      SELECT s, cnt,
             substring(s, 1, i.i - 1) || substring(s, i.i + 1) AS d
      FROM strs CROSS JOIN unnest(generate_series(0, length(s))) AS i(i)
    """
    if max_dist == 2:
        var = f"""var1 AS MATERIALIZED ({var1}),
    var AS MATERIALIZED (
      SELECT DISTINCT s, cnt,
             substring(d, 1, j.j - 1) || substring(d, j.j + 1) AS d
      FROM var1 CROSS JOIN unnest(generate_series(0, length(d))) AS j(j)
    )"""
    else:
        var = f"var AS ({var1})"
    return f"""
    WITH strs AS (
      SELECT {str_col} AS s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({corpus_sql})
      WHERE length({str_col}) >= {min_len}
      GROUP BY {str_col}
    ), {var}, cand AS (
      SELECT DISTINCT a.s AS s_a, b.s AS s_b, a.cnt AS cnt_a, b.cnt AS cnt_b
      FROM var a JOIN var b ON a.d = b.d AND a.s < b.s
    )
    SELECT s_a, s_b, cnt_a, cnt_b, CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(s_a, s_b) <= {max_dist}
"""


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 4,
    max_dist: int = 2,
    sort_reversed: bool = False,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo merge/purge): sort
    records by the normalized key and compare each record only to its
    ``window`` successors in sort order, verifying with the exact
    built-in ``levenshtein``. The complementary blocking family to
    SymSpell (``symspell_pairs``): SNM catches *prefix-preserving*
    dirt (suffix typos, trailing id drift) at O(n * w) comparisons
    with NO neighborhood expansion, but misses first-character errors
    that sort far apart — production merge/purge runs several passes
    with different key orderings; this operator is one pass, and
    ``sorted_neighborhood_multipass`` below is the standard two-pass
    composition. ``sort_reversed`` sorts by the REVERSED normalized
    key (suffix-first order) while still emitting and verifying the
    normal key — levenshtein is reversal-invariant, so the emitted
    relation is directly unionable with the forward pass.

    Emits (id_a, id_b, key_a, key_b, dist) with id_a < id_b and
    dist <= ``max_dist``.

    100 TB shape: the sort is a range-repartition (parallel
    per-partition sorts, never one task), ranks come from
    ``global_row_number``'s two-pass offset trick, and the
    neighborhood forms as an equi-join on rank (each side exploded at
    most ``window`` ways) — co-partitioned shuffle on a dense long
    key, no skew (ranks are unique), candidate volume exactly
    n * window.
    """
    from etl_fuel_priceguide_ec2_spark.operators.util import global_row_number

    recs = df.select(
        F.col(id_col).alias("_id"),
        F.lower(F.trim(F.col(key_col))).alias("_k"),
    )
    if sort_reversed:
        recs = recs.withColumn("_sk", F.reverse(F.col("_k")))
    else:
        recs = recs.withColumn("_sk", F.col("_k"))
    ranked = global_row_number(recs, ["_sk", "_id"], out_col="_rn").drop("_sk")
    probe = ranked.select(
        F.col("_id").alias("_ida"),
        F.col("_k").alias("_ka"),
        F.col("_rn").alias("_rn0"),
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("_off"),
    ).select("_ida", "_ka", (F.col("_rn0") + F.col("_off")).alias("_rn"))
    return (
        probe.join(
            ranked.select(
                F.col("_id").alias("_idb"), F.col("_k").alias("_kb"), "_rn"
            ),
            "_rn",
        )
        .withColumn("dist", F.levenshtein("_ka", "_kb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            F.when(F.col("_ida") < F.col("_idb"), F.col("_ka"))
            .otherwise(F.col("_kb"))
            .alias("key_a"),
            F.when(F.col("_ida") < F.col("_idb"), F.col("_kb"))
            .otherwise(F.col("_ka"))
            .alias("key_b"),
            "dist",
        )
    )


def sorted_neighborhood_oracle_sql(
    corpus_sql: str,
    id_col: str,
    key_col: str,
    window: int = 4,
    max_dist: int = 2,
) -> str:
    """DuckDB replay: one global ``row_number`` over the same strict
    (key, id) order, a rank-difference self-join, and the same
    levenshtein verify. The single-partition window is fine HERE —
    the oracle runs at oracle scale; the Spark side uses the
    distributed two-pass rank."""
    return f"""
    WITH recs AS (
      SELECT {id_col} AS id, lower(trim({key_col})) AS k
      FROM ({corpus_sql})
    ), ranked AS (
      SELECT id, k, ROW_NUMBER() OVER (ORDER BY k, id) AS rn FROM recs
    )
    SELECT least(a.id, b.id) AS id_a,
           greatest(a.id, b.id) AS id_b,
           CASE WHEN a.id < b.id THEN a.k ELSE b.k END AS key_a,
           CASE WHEN a.id < b.id THEN b.k ELSE a.k END AS key_b,
           CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
    FROM ranked a
    JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND {window}
    WHERE levenshtein(a.k, b.k) <= {max_dist}
"""


def sorted_neighborhood_multipass(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 4,
    max_dist: int = 2,
) -> DataFrame:
    """Multi-pass sorted-neighborhood (the production merge/purge
    form, Hernandez-Stolfo 1995): the forward key-order pass catches
    suffix dirt, the REVERSED key-order pass catches first-character/
    prefix dirt that sorts far apart forward — the union is the
    two-pass candidate relation, deduplicated (a pair found by both
    passes emits once; key_a/key_b/dist are pass-invariant because
    levenshtein is reversal-invariant and both passes emit the normal
    key). Still O(n * w) comparisons per pass, two full-data range
    exchanges total."""
    fwd = sorted_neighborhood_pairs(
        df, id_col, key_col, window=window, max_dist=max_dist
    )
    rev = sorted_neighborhood_pairs(
        df, id_col, key_col, window=window, max_dist=max_dist,
        sort_reversed=True,
    )
    return fwd.unionByName(rev).distinct()


def sorted_neighborhood_multipass_oracle_sql(
    corpus_sql: str,
    id_col: str,
    key_col: str,
    window: int = 4,
    max_dist: int = 2,
) -> str:
    """DuckDB replay of the two-pass union: one ranked CTE per sort
    order, the same rank-difference join each, UNION + DISTINCT."""

    def _pass(order: str) -> str:
        return f"""
      SELECT least(a.id, b.id) AS id_a,
             greatest(a.id, b.id) AS id_b,
             CASE WHEN a.id < b.id THEN a.k ELSE b.k END AS key_a,
             CASE WHEN a.id < b.id THEN b.k ELSE a.k END AS key_b,
             CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
      FROM {order} a
      JOIN {order} b ON b.rn - a.rn BETWEEN 1 AND {window}
      WHERE levenshtein(a.k, b.k) <= {max_dist}"""

    return f"""
    WITH recs AS (
      SELECT {id_col} AS id, lower(trim({key_col})) AS k
      FROM ({corpus_sql})
    ), fwd AS (
      SELECT id, k, ROW_NUMBER() OVER (ORDER BY k, id) AS rn FROM recs
    ), rev AS (
      SELECT id, k, ROW_NUMBER() OVER (ORDER BY reverse(k), id) AS rn FROM recs
    )
    SELECT DISTINCT id_a, id_b, key_a, key_b, dist FROM (
      {_pass("fwd")}
      UNION ALL
      {_pass("rev")}
    )
"""
