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


def symspell_pairs(
    df: DataFrame,
    str_col: str,
    min_len: int = 4,
    max_variant_freq: int | None = None,
) -> DataFrame:
    """Edit-distance-1 pairs over the DISTINCT values of ``str_col``:
    (s_a, s_b, cnt_a, cnt_b, dist) with s_a < s_b, dist == 1, and
    cnt_* the input multiplicity of each string (callers re-link rows
    by joining back on the string). Symmetric-delete candidate
    generation + exact levenshtein verify; recall 1.0 by the pigeonhole
    argument in the module docstring.

    ``max_variant_freq``: optional hot-bucket cap (the LSH band-cap
    pattern) — deletion variants shared by more than this many distinct
    strings are dropped before the self-join. Exactness then degrades
    only on those saturated buckets (recall loss is reported by the
    caller comparing candidate counts, not silent data corruption —
    every emitted pair is still verified); the default None keeps the
    exact contract.
    """
    strs = (
        df.filter(F.length(F.col(str_col)) >= min_len)
        .groupBy(F.col(str_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # i = 0 is the identity variant (substring(s,1,-1) = '' both engines);
    # i in 1..len deletes character i.
    variants = strs.select(
        "s",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.length("s"))).alias("i"),
    ).select(
        "s",
        "cnt",
        F.xxhash64(
            F.concat(
                F.substring(F.col("s"), 1, F.col("i") - F.lit(1)),
                F.col("s").substr(F.col("i") + F.lit(1), F.length("s")),
            )
        ).alias("dh"),
    )
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
        .filter(F.col("dist") <= 1)
    )


def symspell_oracle_sql(corpus_sql: str, str_col: str, min_len: int = 4) -> str:
    """DuckDB replay: string-valued variant join (no hashing — the hash
    only compresses shuffle keys, the candidate set is identical absent
    64-bit collisions) + the same levenshtein verify."""
    return f"""
    WITH strs AS (
      SELECT {str_col} AS s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({corpus_sql})
      WHERE length({str_col}) >= {min_len}
      GROUP BY {str_col}
    ), var AS (
      SELECT s, cnt,
             substring(s, 1, i.i - 1) || substring(s, i.i + 1) AS d
      FROM strs CROSS JOIN unnest(generate_series(0, length(s))) AS i(i)
    ), cand AS (
      SELECT DISTINCT a.s AS s_a, b.s AS s_b, a.cnt AS cnt_a, b.cnt AS cnt_b
      FROM var a JOIN var b ON a.d = b.d AND a.s < b.s
    )
    SELECT s_a, s_b, cnt_a, cnt_b, CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(s_a, s_b) <= 1
"""
