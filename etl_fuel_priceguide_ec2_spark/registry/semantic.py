"""Semantic clustering tier (round 3): deterministic k-means over the
embedding column and k-means-blocked semantic near-dup pairs — the
cluster-then-pair pattern that keeps semantic dedup out of O(n^2) at
corpus scale. Fully DuckDB-oracled: init is the k smallest
md5-of-id hashes (deterministic uniform draw, no RNG),
centroid updates quantize to 6dp and sum as DECIMAL (order-free), so
the oracle replays the exact same Lloyd's iterations in SQL."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import register
from etl_fuel_priceguide_ec2_spark.operators import clustering
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

K = 8
ITERS = 2
DIM = 64

_DIST = (
    "list_sum(list_transform(range(1, {dim1}), "
    "i -> ({a}.v[i] - {b}.v[i]) * ({a}.v[i] - {b}.v[i])))"
)


def _kmeans_cte(k: int, iters: int, dim: int) -> str:
    """Build the WITH-chain replaying Lloyd's: c0 -> (a_i, u_i, c_{i+1})
    per iteration -> final assignment against the last centroids."""
    dist_bc = _DIST.format(a="b", b="c", dim1=dim + 1)
    parts = [
        "WITH base AS (\n"
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings\n"
        "), c0 AS (\n"
        # init mirrors the operator: the k smallest md5-of-id hashes (a
        # deterministic uniform draw — lowest-id init is pathological on
        # id-correlated corpora); centroid index = hash order
        "  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v FROM (\n"
        "    SELECT vec_id, v,\n"
        "           CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)"
        " AS BIGINT) AS h\n"
        f"    FROM base ORDER BY h, vec_id LIMIT {k}\n"
        "  )\n"
        ")"
    ]
    for it in range(iters):
        parts.append(
            f", a{it} AS (\n"
            "  SELECT vec_id, cid, d FROM (\n"
            "    SELECT vec_id, cid, d,\n"
            "           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn\n"
            f"    FROM (SELECT b.vec_id, c.cid, {dist_bc} AS d\n"
            f"          FROM base b CROSS JOIN c{it} c) x\n"
            "  ) y WHERE rn = 1\n"
            ")"
        )
        parts.append(
            f", u{it} AS (\n"
            "  SELECT a.cid, t.i,\n"
            "         ROUND(CAST(SUM(CAST(ROUND(b.v[t.i], 6) AS DECIMAL(18,6)))"
            " AS DOUBLE) / COUNT(*), 9) AS m\n"
            f"  FROM a{it} a JOIN base b USING (vec_id)\n"
            f"  CROSS JOIN unnest(generate_series(1, {dim})) AS t(i)\n"
            "  GROUP BY a.cid, t.i\n"
            ")"
        )
        parts.append(
            f", c{it + 1} AS (\n"
            f"  SELECT c{it}.cid, COALESCE(u.v, c{it}.v) AS v\n"
            f"  FROM c{it} LEFT JOIN (SELECT cid, list(m ORDER BY i) AS v\n"
            f"                        FROM u{it} GROUP BY cid) u USING (cid)\n"
            ")"
        )
    parts.append(
        ", afinal AS (\n"
        "  SELECT vec_id, cid, d FROM (\n"
        "    SELECT vec_id, cid, d,\n"
        "           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn\n"
        f"    FROM (SELECT b.vec_id, c.cid, {dist_bc} AS d\n"
        f"          FROM base b CROSS JOIN c{iters} c) x\n"
        "  ) y WHERE rn = 1\n"
        ")"
    )
    return "".join(parts)


_KMEANS_ORACLE = (
    _kmeans_cte(K, ITERS, DIM)
    + """
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, ROUND(d, 6) AS sq_dist
    FROM afinal
"""
)


@register("semantic_kmeans_clusters", _KMEANS_ORACLE)
def q_semantic_kmeans_clusters(spark, sf_dir):
    """Deterministic Lloyd's k-means assignment over embeddings (k=8,
    2 iterations, hash-spread init). The oracle replays the identical
    iterations as a recursive-free SQL CTE chain."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_assign(emb, "vec_id", "embedding", k=K, iters=ITERS)


PROBES = 2

_PAIR_DIST = _DIST.format(a="ba", b="bb", dim1=DIM + 1)

_SEMANTIC_PAIRS_ORACLE = (
    _kmeans_cte(K, ITERS, DIM)
    + f"""
    , aprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
              FROM base b CROSS JOIN c{ITERS} c) x
      ) y WHERE rn <= {PROBES}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM aprobe a JOIN aprobe b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND({_PAIR_DIST}, 6) AS sq_dist
    FROM cand
    JOIN base ba ON ba.vec_id = id_a
    JOIN base bb ON bb.vec_id = id_b
    WHERE {_PAIR_DIST} <= 1.2
"""
)


@register("semantic_dedup_pairs", _SEMANTIC_PAIRS_ORACLE)
def q_semantic_dedup_pairs(spark, sf_dir):
    """Semantic near-dup pairs blocked by the k-means assignment, with
    2-probe indexing (each vector under its 2 nearest centroids): the
    per-block self-join replaces the all-pairs scan; pairs at squared
    L2 <= 1.2."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup_pairs(
        emb, "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES
    )


def _lloyds_frag(src: str, k: int, iters: int, dim: int, p: str) -> str:
    """CTE fragments (no leading WITH) replaying Lloyd's over table
    ``src`` (columns vec_id, v): {p}c0 .. {p}c{iters}, {p}afinal."""
    dist = _DIST.format(a="b", b="c", dim1=dim + 1)
    out = [
        f", {p}c0 AS (\n"
        "  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v FROM (\n"
        "    SELECT vec_id, v,\n"
        "           CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)"
        " AS BIGINT) AS h\n"
        f"    FROM {src} ORDER BY h, vec_id LIMIT {k}\n"
        "  )\n"
        ")"
    ]
    for it in range(iters):
        out.append(
            f", {p}a{it} AS (\n"
            "  SELECT vec_id, cid FROM (\n"
            "    SELECT vec_id, cid,\n"
            "           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn\n"
            f"    FROM (SELECT b.vec_id, c.cid, {dist} AS d\n"
            f"          FROM {src} b CROSS JOIN {p}c{it} c) x\n"
            "  ) y WHERE rn = 1\n"
            ")"
        )
        out.append(
            f", {p}u{it} AS (\n"
            "  SELECT a.cid, t.i,\n"
            "         ROUND(CAST(SUM(CAST(ROUND(b.v[t.i], 6) AS DECIMAL(18,6)))"
            " AS DOUBLE) / COUNT(*), 9) AS m\n"
            f"  FROM {p}a{it} a JOIN {src} b USING (vec_id)\n"
            f"  CROSS JOIN unnest(generate_series(1, {dim})) AS t(i)\n"
            "  GROUP BY a.cid, t.i\n"
            ")"
        )
        out.append(
            f", {p}c{it + 1} AS (\n"
            f"  SELECT {p}c{it}.cid, COALESCE(u.v, {p}c{it}.v) AS v\n"
            f"  FROM {p}c{it} LEFT JOIN (SELECT cid, list(m ORDER BY i) AS v\n"
            f"                        FROM {p}u{it} GROUP BY cid) u USING (cid)\n"
            ")"
        )
    out.append(
        f", {p}afinal AS (\n"
        "  SELECT vec_id, cid FROM (\n"
        "    SELECT vec_id, cid,\n"
        "           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn\n"
        f"    FROM (SELECT b.vec_id, c.cid, {dist} AS d\n"
        f"          FROM {src} b CROSS JOIN {p}c{iters} c) x\n"
        "  ) y WHERE rn = 1\n"
        ")"
    )
    return "".join(out)


def _probe_frag(src: str, cents: str, probes: int, dim: int, name: str) -> str:
    dist = _DIST.format(a="b", b="c", dim1=dim + 1)
    return (
        f", {name} AS (\n"
        "  SELECT vec_id, cid FROM (\n"
        "    SELECT vec_id, cid,\n"
        "           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn\n"
        f"    FROM (SELECT b.vec_id, c.cid, {dist} AS d\n"
        f"          FROM {src} b CROSS JOIN {cents} c) x\n"
        f"  ) y WHERE rn <= {probes}\n"
        ")"
    )


K2 = 8

_TWO_LEVEL_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    ")"
    + _lloyds_frag("base", K, ITERS, DIM, "f1")
    + (
        # residuals vs the PRIMARY coarse cell's final centroid
        ", rbase AS (\n"
        f"  SELECT b.vec_id, list_transform(range(1, {DIM + 1}),"
        " i -> b.v[i] - c.v[i]) AS v\n"
        "  FROM base b\n"
        "  JOIN f1afinal a ON a.vec_id = b.vec_id\n"
        f"  JOIN f1c{ITERS} c ON c.cid = a.cid\n"
        ")"
    )
    + _lloyds_frag("rbase", K2, ITERS, DIM, "f2")
    + _probe_frag("base", f"f1c{ITERS}", PROBES, DIM, "p1")
    + _probe_frag("rbase", f"f2c{ITERS}", PROBES, DIM, "p2")
    + f"""
    , mem AS (
      SELECT p1.vec_id, p1.cid * {K2} + p2.cid AS block
      FROM p1 JOIN p2 USING (vec_id)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM mem a JOIN mem b ON a.block = b.block AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND({_PAIR_DIST}, 6) AS sq_dist
    FROM cand
    JOIN base ba ON ba.vec_id = id_a
    JOIN base bb ON bb.vec_id = id_b
    WHERE {_PAIR_DIST} <= 1.2
"""
)


@register("semantic_dedup_pairs_two_level", _TWO_LEVEL_ORACLE)
def q_semantic_dedup_pairs_two_level(spark, sf_dir):
    """Two-level (coarse cell x residual cell) blocked semantic pairs —
    the extreme-scale form: assignment cost O(n*(k1+k2)) instead of a
    flat sqrt(n)-sized codebook, k1*k2 blocks. Oracle replays BOTH
    Lloyd's fits (vectors, then residuals) plus the two probe layers."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup_pairs_two_level(
        emb, "vec_id", "embedding", k1=K, k2=K2, iters=ITERS, threshold=1.2, probes=PROBES
    )
