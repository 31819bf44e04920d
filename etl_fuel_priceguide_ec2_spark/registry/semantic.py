"""Semantic clustering tier (round 3): deterministic k-means over the
embedding column and k-means-blocked semantic near-dup pairs — the
cluster-then-pair pattern that keeps semantic dedup out of O(n^2) at
corpus scale. Fully DuckDB-oracled: init is the k smallest
md5-of-id hashes (deterministic uniform draw, no RNG),
centroid updates quantize to 6dp and sum as DECIMAL (order-free), so
the oracle replays the exact same Lloyd's iterations in SQL."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import register
from etl_fuel_priceguide_ec2_spark.registry.stores import corpus_store
from etl_fuel_priceguide_ec2_spark.operators import clustering
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

K = 8
ITERS = 2
DIM = 64

# per-corpus fitted codebook cache — the catalog pattern (same
# amortization as dedup_family._SKEW_STATS_CACHE): at "ingest" the
# corpus codebook is fitted ONCE and every semantic query over that
# corpus reuses it, instead of re-running the iters full scans +
# driver actions per query. Keyed on the corpus dir; the fit itself is
# deterministic, so caching changes cost, never results. ASSUMES the
# data under a dir is immutable for the process lifetime (true for the
# parquet fixtures and for any ingest-once corpus layout); a caller
# that rewrites a fixture dir in-process must call
# clear_codebook_cache() or the cached centroids go stale vs a refit
# oracle (ADVICE r04).
_CODEBOOK_CACHE: dict[str, list] = {}


def clear_codebook_cache() -> None:
    """Drop every cached per-corpus codebook — for callers that rewrite
    data under a previously-fitted corpus dir within one process."""
    _CODEBOOK_CACHE.clear()


def _corpus_cov_means(spark, sf_dir: str):
    """Per-corpus (covariance matrix, means, dim) triple — the fit
    state every PCA/ZCA-chain query shares, collected ONCE per corpus
    dir (the codebook-cache pattern applied to the second-moment
    tier: in production this state is persisted at ingest and read
    back; re-collecting it per query re-scans the corpus). Same
    immutability assumption and clear function as the codebooks.
    An empty corpus collects to ``()`` (falsy, cacheable — the
    consumers' empty branch), so the empty case is cached like any
    other fit instead of re-scanning per query (ADVICE r12)."""
    key = f"{sf_dir}:embeddings:cov_means"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = _emb._collect_cov_means(
            emb, "vec_id", "embedding"
        )
    return _CODEBOOK_CACHE[key]


def _corpus_codebook(spark, sf_dir: str) -> list:
    key = f"{sf_dir}:embeddings:{K}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_centroids(
            emb, "vec_id", "embedding", k=K, iters=ITERS
        )
    return _CODEBOOK_CACHE[key]

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
    return clustering.kmeans_assign(
        emb, "vec_id", "embedding", k=K, iters=ITERS,
        centroids=_corpus_codebook(spark, sf_dir),
    )


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
        emb, "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES,
        centroids=_corpus_codebook(spark, sf_dir),
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


# --- composed pipeline: pairs -> CC -> canonical keep-list ---
# the end-to-end semantic-dedup chain (examples/semantic_dedup.py) as
# ONE oracled relation: every vector with its dup-component id and the
# keep decision (kept iff it IS the component's canonical min-id rep).
_KEEPLIST_ORACLE = (
    _kmeans_cte(K, ITERS, DIM).replace("WITH base", "WITH RECURSIVE base", 1)
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
    ), spairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN base ba ON ba.vec_id = id_a
      JOIN base bb ON bb.vec_id = id_b
      WHERE {_PAIR_DIST} <= 1.2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION SELECT id_b, id_a FROM spairs
    ), walk AS (
      SELECT src AS node, src AS reach FROM edges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node, MIN(reach) AS component_id
      FROM (SELECT node, reach FROM walk UNION SELECT src, dst FROM edges)
      GROUP BY node
    )
    SELECT b.vec_id,
           COALESCE(c.component_id, b.vec_id) AS component_id,
           COALESCE(c.component_id, b.vec_id) = b.vec_id AS kept
    FROM base b LEFT JOIN comp c ON c.node = b.vec_id
"""
)


@register("semantic_dedup_keeplist", _KEEPLIST_ORACLE)
def q_semantic_dedup_keeplist(spark, sf_dir):
    """The COMPOSED semantic-dedup pipeline as one relation: k-means
    blocking -> multi-probe pair search -> HashMin connected components
    -> canonical keep-list (kept iff the vector is its component's
    min-id representative; singletons are their own component and
    always kept). Oracle replays the full chain, with the CC fixpoint
    as a recursive CTE."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = clustering.semantic_dedup_pairs(
        emb, "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES,
        centroids=_corpus_codebook(spark, sf_dir),
    )
    comp = dedup.connected_components(pairs, "id_a", "id_b")
    return (
        emb.select("vec_id")
        .join(
            comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
        )
        .withColumn("component_id", F.coalesce("component_id", F.col("vec_id")))
        .withColumn("kept", F.col("component_id") == F.col("vec_id"))
    )


# --- semantic contamination: train-vs-eval embedding near-dup ---
# eval/benchmark side = every 25th vector (deterministic, ~4% of the
# corpus); train side = the rest. Catches paraphrased leakage the
# n-gram-exact contamination_check cannot see.
_CONTAM_DIST = _DIST.format(a="bt", b="be", dim1=DIM + 1)

_CONTAMINATION_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    "), ebase AS (\n  SELECT * FROM base WHERE vec_id % 25 = 0\n"
    "), tbase AS (\n  SELECT * FROM base WHERE vec_id % 25 <> 0\n)"
    + _lloyds_frag("ebase", K, ITERS, DIM, "e")
    # eval indexed under its PRIMARY cell; train probed under 2 cells
    + _probe_frag("ebase", f"ec{ITERS}", 1, DIM, "eidx")
    + _probe_frag("tbase", f"ec{ITERS}", PROBES, DIM, "tprobe")
    + f"""
    , cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM tprobe t JOIN eidx e ON t.cid = e.cid
    )
    SELECT train_id, eval_id, ROUND({_CONTAM_DIST}, 6) AS sq_dist
    FROM cand
    JOIN base bt ON bt.vec_id = train_id
    JOIN base be ON be.vec_id = eval_id
    WHERE {_CONTAM_DIST} <= 1.2
"""
)


def _eval_codebook(spark, sf_dir: str) -> list:
    """Per-corpus cached codebook fitted on the EVAL slice
    (vec_id % 25 == 0) — shared by the three contamination queries
    (pairs, decontaminated ids, attribution) instead of re-running the
    eval-side Lloyd's fit per query. Deterministic fit: cached and
    uncached results are identical; the oracle always replays the
    fit."""
    from pyspark.sql import functions as F

    key = f"{sf_dir}:embeddings:eval25:{K}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_centroids(
            emb.filter(F.col("vec_id") % 25 == 0), "vec_id", "embedding",
            k=K, iters=ITERS,
        )
    return _CODEBOOK_CACHE[key]


@register("semantic_contamination", _CONTAMINATION_ORACLE)
def q_semantic_contamination(spark, sf_dir):
    """Embedding-space train-vs-eval contamination (paraphrased
    benchmark leakage): k-means fit on the SMALL eval side only, eval
    indexed by primary cell, the train side probed under its 2 nearest
    cells via a broadcast codebook — the train corpus is scanned once
    and never self-joined. Pairs at squared L2 <= 1.2."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_contamination_pairs(
        emb.filter(F.col("vec_id") % 25 != 0),
        emb.filter(F.col("vec_id") % 25 == 0),
        "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES,
        centroids=_eval_codebook(spark, sf_dir),
    )


K2 = 8
# codebooks train on a deterministic 40% md5-hash sample (VERDICT r03:
# bound the fit — the standard IVF-PQ recipe trains on a sample, only
# the assignment pass is full-corpus); 4000 of 10000 buckets
FIT_FRACTION = 0.4
_FIT_HASHB = (
    "(CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    " % 10000) < 4000"
)

_TWO_LEVEL_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    f"), fbase AS (\n  SELECT * FROM base WHERE {_FIT_HASHB}\n)"
    + _lloyds_frag("fbase", K, ITERS, DIM, "f1")
    # full-corpus PRIMARY assignment vs the sampled-fit coarse codebook
    + _probe_frag("base", f"f1c{ITERS}", 1, DIM, "a1full")
    + (
        # residuals vs the PRIMARY coarse cell's final centroid
        ", rbase AS (\n"
        f"  SELECT b.vec_id, list_transform(range(1, {DIM + 1}),"
        " i -> b.v[i] - c.v[i]) AS v\n"
        "  FROM base b\n"
        "  JOIN a1full a ON a.vec_id = b.vec_id\n"
        f"  JOIN f1c{ITERS} c ON c.cid = a.cid\n"
        ")"
        f", frbase AS (\n  SELECT * FROM rbase WHERE {_FIT_HASHB}\n)"
    )
    + _lloyds_frag("frbase", K2, ITERS, DIM, "f2")
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


def _two_level_codebooks(spark, sf_dir: str) -> tuple[list, list]:
    """Per-corpus cached (coarse, residual) codebook pair — fitted once
    per corpus on the deterministic 40% md5-hash sample and shared by
    every two-level query over that corpus (pairs AND ANN search)."""
    key = f"{sf_dir}:embeddings:two_level:{K}:{K2}:{ITERS}:{FIT_FRACTION}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_two_level_codebooks(
            emb, "vec_id", "embedding", k1=K, k2=K2, iters=ITERS,
            fit_fraction=FIT_FRACTION,
        )
    return _CODEBOOK_CACHE[key]


@register("semantic_dedup_pairs_two_level", _TWO_LEVEL_ORACLE)
def q_semantic_dedup_pairs_two_level(spark, sf_dir):
    """Two-level (coarse cell x residual cell) blocked semantic pairs —
    the extreme-scale form: assignment cost O(n*(k1+k2)) instead of a
    flat sqrt(n)-sized codebook, k1*k2 blocks. Both codebooks fit on a
    deterministic 40% md5-hash sample (fit bounded; only the assignment
    pass is full-corpus). Oracle replays BOTH sampled Lloyd's fits plus
    the full-corpus assignment and the two probe layers."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup_pairs_two_level(
        emb, "vec_id", "embedding", k1=K, k2=K2, iters=ITERS,
        threshold=1.2, probes=PROBES, fit_fraction=FIT_FRACTION,
        codebooks=_two_level_codebooks(spark, sf_dir),
    )


# --- IVF-SQ8 ANN: coarse cells + int8 scalar-quantized scoring ---
# the composed ANN scale path (probe ~nprobe/cells of the corpus, read
# 4x-smaller int8 codes, exact integer scores). The oracle replays the
# coarse Lloyd's fit, assigns the corpus to primary cells, probes each
# query under its 2 nearest cells, and ranks by the identical integer
# dot product — candidates never need dedup because every corpus
# vector lives in exactly one cell.
_IVF_SQ8_TOPK = 5
_IVF_SQ8_NPROBE = 2

_IVF_SQ8_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n)"
    + _lloyds_frag("base", K, ITERS, DIM, "s")
    + _probe_frag("base", f"sc{ITERS}", 1, DIM, "cellassign")
    + f"""
    , qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
              FROM base b CROSS JOIN sc{ITERS} c WHERE b.vec_id < 10) x
      ) y WHERE rn <= {_IVF_SQ8_NPROBE}
    ), nrm AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nm
      FROM base
    ), q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x / nm * 127) AS DOUBLE)) AS q
      FROM nrm
    )
    SELECT query_id, neighbor_id, rank, approx_cosine FROM (
      SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY qp.vec_id
               ORDER BY ROUND(list_dot_product(cc.q, qq.q) / (127.0 * 127.0), 6) DESC,
                        ca.vec_id ASC) AS rank,
             ROUND(list_dot_product(cc.q, qq.q) / (127.0 * 127.0), 6) AS approx_cosine
      FROM qprobe qp
      JOIN cellassign ca ON qp.cid = ca.cid
      JOIN q8 cc ON cc.vec_id = ca.vec_id
      JOIN q8 qq ON qq.vec_id = qp.vec_id
      WHERE qp.vec_id <> ca.vec_id
    ) WHERE rank <= {_IVF_SQ8_TOPK}
"""
)


@register("similarity_topk_ivf_sq8", _IVF_SQ8_ORACLE)
def q_similarity_topk_ivf_sq8(spark, sf_dir):
    """IVF-SQ8 ANN top-k (coarse k-means cells + int8 codes + integer
    scoring): composes the cell-probe scan reduction with the 4x
    quantized storage path; reuses the per-corpus cached codebook."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_ivf_sq8(
        emb, queries, "vec_id", "embedding",
        k=_IVF_SQ8_TOPK, cells=K, iters=ITERS, nprobe=_IVF_SQ8_NPROBE,
        centroids=_corpus_codebook(spark, sf_dir),
    )


# --- two-stage retrieval: IVF-SQ8 candidates + exact float rerank ---
_RERANK_M = 30

_IVF_SQ8_RERANK_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n)"
    + _lloyds_frag("base", K, ITERS, DIM, "s")
    + _probe_frag("base", f"sc{ITERS}", 1, DIM, "cellassign")
    + f"""
    , qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
              FROM base b CROSS JOIN sc{ITERS} c WHERE b.vec_id < 10) x
      ) y WHERE rn <= {_IVF_SQ8_NPROBE}
    ), nrm AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nm
      FROM base
    ), q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x / nm * 127) AS DOUBLE)) AS q
      FROM nrm
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qp.vec_id
                 ORDER BY ROUND(list_dot_product(cc.q, qq.q) / (127.0 * 127.0), 6) DESC,
                          ca.vec_id ASC) AS rank
        FROM qprobe qp
        JOIN cellassign ca ON qp.cid = ca.cid
        JOIN q8 cc ON cc.vec_id = ca.vec_id
        JOIN q8 qq ON qq.vec_id = qp.vec_id
        WHERE qp.vec_id <> ca.vec_id
      ) WHERE rank <= {_RERANK_M}
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(cn.v, qn.v) / (cn.nm * qn.nm) DESC,
                        neighbor_id ASC) AS rank,
             ROUND(list_dot_product(cn.v, qn.v) / (cn.nm * qn.nm), 4) + 0.0 AS cosine
      FROM cand
      JOIN nrm cn ON cn.vec_id = neighbor_id
      JOIN nrm qn ON qn.vec_id = query_id
    ) WHERE rank <= {_IVF_SQ8_TOPK}
"""
)


@register("similarity_topk_ivf_sq8_rerank", _IVF_SQ8_RERANK_ORACLE)
def q_similarity_topk_ivf_sq8_rerank(spark, sf_dir):
    """Two-stage ANN (the production retrieval shape): IVF-SQ8
    candidate generation — quarter-width int8 codes, nprobe/cells of
    the corpus — then full-precision cosine rerank of only the top-30
    candidates per query. Both cut boundaries deterministic (integer
    scores, id tiebreaks)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_ivf_sq8_rerank(
        emb, queries, "vec_id", "embedding",
        k=_IVF_SQ8_TOPK, cells=K, iters=ITERS, nprobe=_IVF_SQ8_NPROBE,
        rerank_m=_RERANK_M, centroids=_corpus_codebook(spark, sf_dir),
    )


# --- two-level IVF-SQ8 ANN: (coarse x residual) composite cells ---
# the search-path form of the two-level decomposition docs/SCALE.md
# flags as IVF-SQ8's asymptotic fix: a flat IVF needs ~sqrt(n) cells
# (O(n*sqrt(n)) assignment); two codebooks of ~n^(1/3) centroids cut
# assignment to O(n*(k1+k2)) with the same k1*k2 cell granularity.
# Corpus vectors live in ONE composite cell (primary coarse, primary
# residual-of-primary); queries probe the nprobe composite cells ranked
# best by combined d1+d2 (a probe BUDGET at cost parity with flat IVF,
# not an nprobe^2 grid; residual taken once, against the query's
# primary coarse cell). The oracle replays both sampled Lloyd's fits,
# the full-corpus composite assignment, the combined-distance probe
# ranking, and the identical int8 integer scoring.
# nprobe is a BUDGET over k1*k2=64 composite cells; 8 cells = the same
# corpus volume as the flat 8-cell IVF probing one cell — composite
# granularity means the budget scales with the cell count, not with
# the flat variant's nprobe
_IVF2_NPROBE = 8

_IVF2_SQ8_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    f"), fbase AS (\n  SELECT * FROM base WHERE {_FIT_HASHB}\n)"
    + _lloyds_frag("fbase", K, ITERS, DIM, "f1")
    + _probe_frag("base", f"f1c{ITERS}", 1, DIM, "a1full")
    + (
        ", rbase AS (\n"
        f"  SELECT b.vec_id, list_transform(range(1, {DIM + 1}),"
        " i -> b.v[i] - c.v[i]) AS v\n"
        "  FROM base b\n"
        "  JOIN a1full a ON a.vec_id = b.vec_id\n"
        f"  JOIN f1c{ITERS} c ON c.cid = a.cid\n"
        ")"
        f", frbase AS (\n  SELECT * FROM rbase WHERE {_FIT_HASHB}\n)"
    )
    + _lloyds_frag("frbase", K2, ITERS, DIM, "f2")
    + _probe_frag("rbase", f"f2c{ITERS}", 1, DIM, "a2full")
    + f"""
    , cellassign AS (
      SELECT a1.vec_id, a1.cid * {K2} + a2.cid AS block
      FROM a1full a1 JOIN a2full a2 USING (vec_id)
    ), qd1 AS (
      SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
      FROM base b CROSS JOIN f1c{ITERS} c
      WHERE b.vec_id < 10
    ), qd2 AS (
      SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
      FROM rbase b CROSS JOIN f2c{ITERS} c
      WHERE b.vec_id < 10
    ), qmem AS (
      SELECT vec_id, block FROM (
        SELECT q1.vec_id, q1.cid * {K2} + q2.cid AS block,
               row_number() OVER (PARTITION BY q1.vec_id
                 ORDER BY q1.d + q2.d, q1.cid, q2.cid) AS rn
        FROM qd1 q1 JOIN qd2 q2 USING (vec_id)
      ) y WHERE rn <= {_IVF2_NPROBE}
    ), nrm AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nm
      FROM base
    ), q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x / nm * 127) AS DOUBLE)) AS q
      FROM nrm
    )
    SELECT query_id, neighbor_id, rank, approx_cosine FROM (
      SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY qp.vec_id
               ORDER BY ROUND(list_dot_product(cc.q, qq.q) / (127.0 * 127.0), 6) DESC,
                        ca.vec_id ASC) AS rank,
             ROUND(list_dot_product(cc.q, qq.q) / (127.0 * 127.0), 6) AS approx_cosine
      FROM qmem qp
      JOIN cellassign ca ON qp.block = ca.block
      JOIN q8 cc ON cc.vec_id = ca.vec_id
      JOIN q8 qq ON qq.vec_id = qp.vec_id
      WHERE qp.vec_id <> ca.vec_id
    ) WHERE rank <= {_IVF_SQ8_TOPK}
"""
)


@register("similarity_topk_ivf2_sq8", _IVF2_SQ8_ORACLE)
def q_similarity_topk_ivf2_sq8(spark, sf_dir):
    """Two-level IVF-SQ8 ANN top-k: (coarse x residual) composite
    cells + int8 integer scoring — the O(n*(k1+k2))-assignment form of
    similarity_topk_ivf_sq8 for corpora where a flat codebook would
    need sqrt(n) centroids. Reuses the per-corpus cached two-level
    codebook pair (same fit as semantic_dedup_pairs_two_level)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_ivf2_sq8(
        emb, queries, "vec_id", "embedding",
        k=_IVF_SQ8_TOPK, nprobe=_IVF2_NPROBE,
        codebooks=_two_level_codebooks(spark, sf_dir),
    )


# --- decontaminated train set: the contamination pairs APPLIED ---
# every train vector with its contaminated flag — the relation a
# training-data build anti-joins before tokenization (the action that
# semantic_contamination's pair evidence exists to drive).
_DECONTAM_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    "), ebase AS (\n  SELECT * FROM base WHERE vec_id % 25 = 0\n"
    "), tbase AS (\n  SELECT * FROM base WHERE vec_id % 25 <> 0\n)"
    + _lloyds_frag("ebase", K, ITERS, DIM, "e")
    + _probe_frag("ebase", f"ec{ITERS}", 1, DIM, "eidx")
    + _probe_frag("tbase", f"ec{ITERS}", PROBES, DIM, "tprobe")
    + f"""
    , cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM tprobe t JOIN eidx e ON t.cid = e.cid
    ), contam AS (
      SELECT DISTINCT train_id
      FROM cand
      JOIN base bt ON bt.vec_id = train_id
      JOIN base be ON be.vec_id = eval_id
      WHERE {_CONTAM_DIST} <= 1.2
    )
    SELECT tb.vec_id AS train_id,
           (c.train_id IS NOT NULL) AS contaminated
    FROM tbase tb LEFT JOIN contam c ON c.train_id = tb.vec_id
"""
)


# --- contamination attribution: the per-benchmark leakage report ---
# production decontamination needs more than pair evidence: WHICH eval
# benchmark leaked, how many train rows it touches, and how bad the
# worst near-dup is — per eval slice, including slices with zero
# leakage (a benchmark's absence from the report must mean "clean",
# not "not checked"). Two deterministic eval slices partition the
# existing eval side (vec_id % 25 == 0): heldout_a = % 50 == 0,
# heldout_b = % 50 == 25. One codebook is fitted on the COMBINED eval
# side — same fit, index and probe as semantic_contamination, so at
# scale the report is a tiny aggregate over the same pair relation.
_ATTRIBUTION_ORACLE = (
    "WITH base AS (\n"
    "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "  FROM embeddings\n"
    "), ebase AS (\n  SELECT * FROM base WHERE vec_id % 25 = 0\n"
    "), tbase AS (\n  SELECT * FROM base WHERE vec_id % 25 <> 0\n)"
    + _lloyds_frag("ebase", K, ITERS, DIM, "e")
    + _probe_frag("ebase", f"ec{ITERS}", 1, DIM, "eidx")
    + _probe_frag("tbase", f"ec{ITERS}", PROBES, DIM, "tprobe")
    + f"""
    , cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM tprobe t JOIN eidx e ON t.cid = e.cid
    ), pairs AS (
      SELECT train_id, eval_id, ROUND({_CONTAM_DIST}, 6) AS sq_dist
      FROM cand
      JOIN base bt ON bt.vec_id = train_id
      JOIN base be ON be.vec_id = eval_id
      WHERE {_CONTAM_DIST} <= 1.2
    ), slices AS (
      SELECT * FROM (VALUES ('heldout_a', 0), ('heldout_b', 25)) AS t(eval_set, rem)
    )
    SELECT s.eval_set,
           CAST(COUNT(DISTINCT p.train_id) AS BIGINT) AS n_train_contaminated,
           CAST(COUNT(p.train_id) AS BIGINT) AS n_pairs,
           ROUND(MIN(p.sq_dist), 6) AS worst_sq_dist
    FROM slices s
    LEFT JOIN pairs p ON p.eval_id % 50 = s.rem
    GROUP BY s.eval_set
"""
)


@register("contamination_attribution", _ATTRIBUTION_ORACLE)
def q_contamination_attribution(spark, sf_dir):
    """Per-benchmark contamination report: for each eval slice, how
    many distinct train rows leak into it, the pair count, and the
    worst (smallest) squared distance — one row per slice, zero-filled
    for clean slices (absence means clean, not unchecked). Same
    asymmetric fit/index/probe as semantic_contamination; the report
    itself is a two-row aggregate over the pair relation."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = clustering.semantic_contamination_pairs(
        emb.filter(F.col("vec_id") % 25 != 0),
        emb.filter(F.col("vec_id") % 25 == 0),
        "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES,
        centroids=_eval_codebook(spark, sf_dir),
    )
    slices = spark.createDataFrame(
        [("heldout_a", 0), ("heldout_b", 25)], "eval_set string, rem int"
    )
    return (
        slices.join(pairs, pairs["eval_id"] % 50 == slices["rem"], "left")
        .groupBy("eval_set")
        .agg(
            F.count_distinct("train_id").alias("n_train_contaminated"),
            F.count("train_id").alias("n_pairs"),
            F.round(F.min("sq_dist"), 6).alias("worst_sq_dist"),
        )
    )


@register("decontaminated_train_ids", _DECONTAM_ORACLE)
def q_decontaminated_train_ids(spark, sf_dir):
    """The contamination check APPLIED: every train vector with its
    contaminated flag (near an eval/benchmark vector in embedding
    space) — the relation a training-data build anti-joins before
    tokenization. Same broadcast-codebook probe as
    semantic_contamination; the flag join moves only train ids."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 25 != 0)
    pairs = clustering.semantic_contamination_pairs(
        train,
        emb.filter(F.col("vec_id") % 25 == 0),
        "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2, probes=PROBES,
        centroids=_eval_codebook(spark, sf_dir),
    )
    flagged = pairs.select("train_id").distinct().withColumn(
        "contaminated", F.lit(True)
    )
    return (
        train.select(F.col("vec_id").alias("train_id"))
        .join(flagged, "train_id", "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
    )


# --- round-9 addition: second-moment tier ------------------------------
# Covariance / PCA over the embedding column — the standard
# embedding-space diagnostics (anisotropy, dimension collapse) and the
# cheapest corpus-triage projection. Both bit-exact-oracled via the
# clustering tier's quantize+DECIMAL-sum contract; the PCA oracle
# unrolls the power iteration as a MATERIALIZED CTE chain (the
# HITS-oracle lesson).

from etl_fuel_priceguide_ec2_spark.operators import embeddings as _emb


@register(
    "embedding_covariance",
    _emb.covariance_oracle_sql("embeddings", "embedding"),
)
def q_embedding_covariance(spark, sf_dir):
    """Population covariance of the 64-dim embedding column, upper
    triangle (2 080 rows regardless of corpus size). Zero-join plan:
    each task folds its rows' outer products into one d(d+1)/2-row
    integer-microunit partial (Arrow-batched mapInPandas) and the
    exchange merges partials; sums are DECIMAL-exact over
    9dp-quantized terms, so the result is addition-order-free."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.embedding_covariance(emb, "vec_id", "embedding")


@register(
    "pca_top_component_scores",
    _emb.pca_oracle_sql("embeddings", "vec_id", "embedding", dim=DIM, iters=8),
)
def q_pca_top_component_scores(spark, sf_dir):
    """First-principal-component score per vector: covariance
    aggregate -> driver power iteration in integer microunits (the
    codebook pattern — d x d is the only driver-side state) ->
    broadcast component, map-only centered projection. The
    all-positive uniform init fixes the eigenvector sign, so scores
    are deterministic and the oracle replays the identical unrolled
    iteration."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.pca_top_component_scores(emb, "vec_id", "embedding", iters=8)


# --- round-10 addition: top-k subspace + embedding outlier gate -------
# Registered AFTER the round-10 freeze — these lead the round-11
# window per the standing discipline. Deflation extends the power
# iteration to a K-component whitening/triage subspace (component 1
# bit-identical to pca_top_component_scores); the diagonal-Mahalanobis
# z-distance is the embedding-space outlier gate (VERDICT r09 item 8),
# an id-keyed signal the curation layer can compose.


@register(
    "pca_top2_subspace_scores",
    _emb.pca_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", dim=DIM, n_components=2, iters=8
    ),
)
def q_pca_top2_subspace_scores(spark, sf_dir):
    """Top-2 principal-component scores per vector (id, pc1, pc2):
    power iteration + Hotelling deflation on the driver (the covariance
    and per-dim means are the only driver-side state), components
    broadcast back for ONE map-only projection pass with two aggregate
    expressions sharing the centered array. The oracle unrolls both
    iteration chains and the deflation as MATERIALIZED CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.pca_component_scores(
        emb, "vec_id", "embedding", n_components=2, iters=8,
        cov_means=_corpus_cov_means(spark, sf_dir),
    )


@register(
    "embedding_outlier_zscores",
    _emb.zscore_outliers_oracle_sql("embeddings", "vec_id", "embedding"),
)
def q_embedding_outlier_zscores(spark, sf_dir):
    """Diagonal-Mahalanobis outlier distance per vector against the
    corpus's own per-dimension mean/variance: (id, zdist2,
    n_dims_used). One d-row stats aggregate, a sanctioned d-row
    collect, then a map-only scoring pass — the corpus never shuffles.
    A percentile cut on zdist2 flags junk/out-of-domain vectors for
    curation triage."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.embedding_zscore_outliers(emb, "vec_id", "embedding")


@register(
    "embedding_covariance_from_state",
    _emb.covariance_oracle_sql("embeddings", "embedding"),
)
def q_embedding_covariance_from_state(spark, sf_dir):
    """The covariance's DAILY-INGEST form: three slices (vec_id % 3)
    each contribute their persisted moment state (d(d+1)/2 + d rows
    per slice, any slice size), the states merge by plain
    groupBy-SUM — decimal addition is associative, so the merged
    relation is BIT-IDENTICAL to the from-scratch covariance, which is
    exactly the oracle used here. History vectors are never
    re-scanned."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_slice", (F.col("vec_id") % 3).cast("long")
    )
    # One corpus pass per state kind (r16 optimization): slice_col keys
    # the partial accumulators / group keys on the slice id, producing
    # the three slices' states stacked — row-identical to the previous
    # filter-per-slice loop (exact integer/decimal accumulation; pinned
    # by test_embeddings), but 1 MapInPandas pass instead of 3 and
    # 1 explode pass instead of 3 (the before-plan scanned the corpus
    # 18x: each slice chain re-expanded under every consumer). The
    # merge ignores the extra _slice column by construction (it groups
    # by the dim keys alone).
    sij_slices = _emb.embedding_second_moment_state(
        emb, "vec_id", "embedding", slice_col="_slice"
    )
    si_slices = _emb.embedding_first_moment_state(
        emb, "vec_id", "embedding", slice_col="_slice"
    )
    # si feeds BOTH broadcast sides of the final join; pin the 3d-row
    # state so the explode pass runs once, not twice
    si_slices = si_slices.localCheckpoint(eager=True)
    return _emb.embedding_covariance_from_state(sij_slices, si_slices)


def _pca_zorder_oracle() -> str:
    """Oracle for ``embedding_pca_zorder_layout``: the full PCA-top2
    replay as a subquery, scores quantized to integer 1e-6 microunits
    (exact — pc values are 6dp-rounded doubles), then the identical
    bounded-domain scaling + Morton interleave the layout tier uses
    (layout.zorder_sql's expression shapes, DuckDB spellings)."""
    pca = _emb.pca_topk_oracle_sql(
        "embeddings", "vec_id", "embedding", dim=DIM, n_components=2, iters=8
    )
    bits = 20
    top = (1 << bits) - 1
    normed = []
    for c in ("q1", "q2"):
        normed.append(
            f"(CASE WHEN b.max_{c} = b.min_{c} THEN 0 "
            f"ELSE ((t.{c} - b.min_{c}) * {top}) // (b.max_{c} - b.min_{c}) END)"
        )
    terms = []
    for j, x in enumerate(normed):
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * 2 + j})")
    z = " + ".join(terms)
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             CAST(ROUND(pc1 * 1e6, 0) AS BIGINT) AS q1,
             CAST(ROUND(pc2 * 1e6, 0) AS BIGINT) AS q2
      FROM ({pca}) p
    ), b AS (
      SELECT MIN(q1) AS min_q1, MAX(q1) AS max_q1,
             MIN(q2) AS min_q2, MAX(q2) AS max_q2
      FROM q
    )
    SELECT t.vec_id, CAST({z} AS BIGINT) AS z
    FROM q t CROSS JOIN b
"""


@register("embedding_pca_zorder_layout", _pca_zorder_oracle())
def q_embedding_pca_zorder_layout(spark, sf_dir):
    """ANN-friendly storage layout: each vector's Z-order (Morton) key
    over its quantized top-2 PCA scores — writing the corpus sorted by
    this key clusters semantically similar vectors into the same
    parquet row groups, so IVF-style probes and range reads prune at
    the row-group level (the embedding-space analogue of
    zorder_layout_lineitem). Scale shape: the PCA projection is
    map-only (components broadcast), the min/max bounds are a 1-row
    aggregate inlined as literals, and the curve value is pure per-row
    codegen — the only shuffle a writer adds is the range sort it
    would do anyway."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import layout

    emb = load_table(spark, sf_dir, "embeddings")
    scores = _emb.pca_component_scores(
        emb, "vec_id", "embedding", n_components=2, iters=8,
        cov_means=_corpus_cov_means(spark, sf_dir),
    )
    q = scores.select(
        "vec_id",
        F.round(F.col("pc1") * 1e6, 0).cast("long").alias("q1"),
        F.round(F.col("pc2") * 1e6, 0).cast("long").alias("q2"),
    )
    return q.select(
        "vec_id", layout.zorder_value(q, ["q1", "q2"], bits=20).alias("z")
    )


def _zorder_ann_oracle(prefix_bits: int = 4, total_bits: int = 40, k: int = 10) -> str:
    shift = total_bits - prefix_bits
    return f"""
    WITH zk AS MATERIALIZED (
      SELECT * FROM ({_pca_zorder_oracle()}) zz
    ), e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), cb AS (
      SELECT e.vec_id, e.v, e.nrm, (zk.z >> {shift}) AS bucket
      FROM e JOIN zk USING (vec_id)
    ), q AS (SELECT * FROM cb WHERE vec_id < 5),
    probes AS (
      SELECT q.vec_id, q.v, q.nrm, q.bucket + o.o AS bucket
      FROM q CROSS JOIN (VALUES (-1), (0), (1)) o(o)
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                ORDER BY ROUND(list_dot_product(c.v, p.v) / (c.nrm * p.nrm), 4) + 0.0 DESC,
                                         c.vec_id ASC) AS rank,
             ROUND(list_dot_product(c.v, p.v) / (c.nrm * p.nrm), 4) + 0.0 AS cosine
      FROM cb c JOIN probes p ON c.bucket = p.bucket
      WHERE p.vec_id <> c.vec_id
    ) WHERE rank <= {k}
"""


@register("similarity_topk_zorder", _zorder_ann_oracle())
def q_similarity_topk_zorder(spark, sf_dir):
    """The LAYOUT-DRIVEN ANN rung of the similarity ladder: candidates
    come from the Z-order prefix (quadtree cell over the PCA subspace)
    of each vector's Morton key — the query probes its own cell and
    both Morton-adjacent cells, then exact cosine + top-k within
    candidates. The query-side payoff of the Z-ordered layout
    (``embedding_pca_zorder_layout``): a cell is a contiguous range of
    the sorted file, so a probe reads ~3/2^prefix_bits of the corpus
    with no index structure at all — IVF arithmetic where the
    'index' is the storage order itself."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import layout, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    scores = _emb.pca_component_scores(
        emb, "vec_id", "embedding", n_components=2, iters=8,
        cov_means=_corpus_cov_means(spark, sf_dir),
    )
    q = scores.select(
        "vec_id",
        F.round(F.col("pc1") * 1e6, 0).cast("long").alias("q1"),
        F.round(F.col("pc2") * 1e6, 0).cast("long").alias("q2"),
    )
    # Materialize the key relation once PER CORPUS: the probe joins
    # corpus AND query sides against it (plus the adjacent-cell
    # expansion), and in production zkeys IS the persisted Z-order
    # layout (embedding_pca_zorder_layout's output) read back, not a
    # live recomputation per join branch or per query.
    zkeys = corpus_store(
        spark,
        sf_dir,
        "zkeys20",
        lambda: q.select(
            "vec_id", layout.zorder_value(q, ["q1", "q2"], bits=20).alias("z")
        ),
    )
    return similarity.cosine_topk_zorder(
        emb,
        emb.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        zkeys,
        prefix_bits=4,
        total_bits=40,
        k=10,
    )


from etl_fuel_priceguide_ec2_spark.operators import sketches as _sk


@register(
    "embedding_zdist_quantiles",
    _sk.dd_quantiles_oracle_sql(
        "("
        + _emb.zscore_outliers_oracle_sql("embeddings", "vec_id", "embedding")
        + ") zsrc",
        "zdist2",
    ),
)
def q_embedding_zdist_quantiles(spark, sf_dir):
    """p50/p90/p99 of the embedding z-distances via the DDSketch bin
    table — HOW the outlier gate's fixed threshold gets picked at
    100 TB: a true percentile of zdist2 would need a global sort of
    every vector's score, while the sketch is one more fixed-size
    (~500-bin) mergeable aggregate on top of the map-only scoring
    pass. Composes two audited tiers (second-moment scoring + the X6
    sketch family); the estimate is engine-exact, not approximate-
    per-engine (integer bin math both sides)."""
    emb = load_table(spark, sf_dir, "embeddings")
    z = _emb.embedding_zscore_outliers(emb, "vec_id", "embedding")
    return _sk.dd_quantiles(z, "zdist2")


@register(
    "embedding_fisher_scores",
    _emb.fisher_scores_oracle_sql("embeddings", "vec_id", "embedding", "label"),
)
def q_embedding_fisher_scores(spark, sf_dir):
    """Per-dimension Fisher separability of the labeled embedding
    corpus (between-class vs within-class variance, ratio NULL on
    constant dims) — the labeled-data triage report: one scan into a
    |classes| x d DECIMAL-sum aggregate, arithmetic on that tiny
    relation only; the corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.embedding_fisher_scores(emb, "vec_id", "embedding", "label")


@register(
    "pca_residual_outliers",
    _emb.pca_residual_oracle_sql(
        "embeddings", "vec_id", "embedding", dim=DIM, n_components=2, iters=8
    ),
)
def q_pca_residual_outliers(spark, sf_dir):
    """PCA reconstruction-residual per vector: the centered energy OFF
    the top-2 subspace plus the kept-energy fraction — the complement
    of the diagonal z-gate (flags vectors large in directions the
    principal subspace does not span, where mislabeled/junk vectors
    hide). Same two-scan map-only shape as the subspace scores; the
    oracle reuses the identical unrolled chain with one extra
    aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.pca_residual_scores(
        emb, "vec_id", "embedding", n_components=2, iters=8,
        cov_means=_corpus_cov_means(spark, sf_dir),
    )


# --- round-11 addition: ZCA whitening -----------------------------------
# Registered AFTER the round-11 freeze — leads the round-12 window per
# the standing discipline.


@register(
    "zca_whitened_scores",
    _emb.zca_oracle_sql(
        "embeddings", "vec_id", "embedding", dim=DIM, n_out=4, iters=12
    ),
)
def q_zca_whitened_scores(spark, sf_dir):
    """ZCA-whitened coordinates per vector (id, zca1..zca4): the
    symmetric inverse-sqrt of the (ridged, trace-normalized)
    covariance fitted DRIVER-SIDE by a coupled Newton-Schulz iteration
    in integer microunits — the iterative-matmul analogue of the PCA
    power iteration (a Cholesky's data-dependent pivoting would not be
    SQL-replayable), and the natural consumer of
    embedding_covariance_from_state. W broadcasts back as literals for
    ONE map-only projection pass; the oracle unrolls all 12 iterations
    as matmul CTEs over the (r, c, x) matrix relation. W Sigma W' ~ I
    is pinned by a numpy property test, not assumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.zca_whitening_scores(
        emb, "vec_id", "embedding", n_out=4, iters=12,
        cov_means=_corpus_cov_means(spark, sf_dir),
    )


# --- round-13 addition: IVF-PQ ADC ANN (post-freeze -> leads round 14) --
# VERDICT r12 item 5: m-subspace product quantization with asymmetric-
# distance tables — the one classical ANN compression the nine-rung
# ladder lacked (SQ8 is scalar, IVF2 is coarse x residual). The oracle
# replays the coarse Lloyd's fit, SIXTEEN per-subspace Lloyd's fits
# (the same fragment at dim 4 over list slices), the corpus encode,
# the per-query ADC tables as 9dp-DECIMAL terms (exact + order-free,
# so SQL may GROUP the terms the Spark side chains), the ADC candidate
# cut, and the full-precision rerank.

_PQ_M = 16
_PQ_KS = 16
_PQ_SUB = DIM // _PQ_M
_PQ_NPROBE = 6
_PQ_RERANK = 100
_PQ_TOPK = 5


def _pq_oracle_sql() -> str:
    dist_sub = _DIST.format(a="b", b="c", dim1=_PQ_SUB + 1)
    parts = [
        "WITH base AS (\n"
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings\n)",
        _lloyds_frag("base", K, ITERS, DIM, "s"),
        _probe_frag("base", f"sc{ITERS}", 1, DIM, "cellassign"),
        f"""
    , qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
              FROM base b CROSS JOIN sc{ITERS} c WHERE b.vec_id < 10) x
      ) y WHERE rn <= {_PQ_NPROBE}
    )""",
    ]
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(
            f", pqb{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM base)"
        )
        parts.append(_lloyds_frag(f"pqb{s}", _PQ_KS, ITERS, _PQ_SUB, f"p{s}"))
        parts.append(_probe_frag(f"pqb{s}", f"p{s}c{ITERS}", 1, _PQ_SUB, f"code{s}"))
        parts.append(
            f"""
    , qd{s} AS (
      SELECT b.vec_id AS query_id, c.cid,
             CAST(ROUND({dist_sub}, 9) AS DECIMAL(18,9)) AS t
      FROM pqb{s} b CROSS JOIN p{s}c{ITERS} c WHERE b.vec_id < 10
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT q.query_id, c.vec_id AS neighbor_id, q.t"
        f" FROM code{s} c JOIN qd{s} q ON q.cid = c.cid"
        for s in range(_PQ_M)
    )
    pair = _DIST.format(a="cb", b="qb2", dim1=DIM + 1)
    parts.append(
        f"""
    , adcparts AS (
      {union}
    ), adcsum AS (
      SELECT query_id, neighbor_id, SUM(t) AS adc
      FROM adcparts GROUP BY query_id, neighbor_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qp.vec_id
                 ORDER BY a.adc ASC, ca.vec_id ASC) AS crank
        FROM qprobe qp
        JOIN cellassign ca ON qp.cid = ca.cid
        JOIN adcsum a ON a.query_id = qp.vec_id AND a.neighbor_id = ca.vec_id
        WHERE qp.vec_id <> ca.vec_id
      ) WHERE crank <= {_PQ_RERANK}
    )
    SELECT query_id, neighbor_id, rank, sq_dist FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY {pair} ASC, neighbor_id ASC) AS rank,
             ROUND({pair}, 6) AS sq_dist
      FROM cand
      JOIN base cb ON cb.vec_id = neighbor_id
      JOIN base qb2 ON qb2.vec_id = query_id
    ) WHERE rank <= {_PQ_TOPK}
"""
    )
    return "".join(parts)


def _corpus_pq_codebooks(spark, sf_dir: str) -> list:
    """Per-corpus cached per-subspace PQ codebooks (fitted once, like
    the coarse codebook and the two-level pair — persisted-at-ingest
    state in production). Uses the fused one-scan-per-iteration fit
    (``fit_pq_codebooks`` — bit-identical to m independent fits,
    test-pinned; 1 corpus scan per Lloyd's step instead of m)."""
    key = f"{sf_dir}:embeddings:pq:{_PQ_M}:{_PQ_KS}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_pq_codebooks(
            emb, "vec_id", "embedding", m=_PQ_M, ks=_PQ_KS, iters=ITERS
        )
    return _CODEBOOK_CACHE[key]


# --- round-14 addition: residual IVF-PQ (post-freeze -> leads round 15)
# VERDICT r13 item 3: the classical FAISS IVF,PQ form — sub-codes
# quantize (v - own-cell centroid) and each probed cell's ADC table
# subtracts THAT cell's centroid from the query, so candidate and table
# share the residual frame (the cell equi-join guarantees it). The
# oracle extends the raw-form replay with a residual-frame CTE: coarse
# fit -> cellassign -> rbase (v minus own centroid) -> SIXTEEN
# per-subspace Lloyd's fits over residual slices -> per-(query, probed
# cell) ADC tables -> the same decimal-exact term sum, cut, and
# full-precision rerank.


def _materialized(frag: str, name: str) -> str:
    """Inject DuckDB's MATERIALIZED hint into a generated CTE fragment
    — and FAIL LOUDLY if the expected text was not found (code-review
    r14): a silent no-op replace after a `_probe_frag` reformat would
    quietly drop the load-bearing hint and the residual oracle would
    replay the coarse fit ~50x instead of erroring."""
    needle = f", {name} AS ("
    hinted = frag.replace(needle, f", {name} AS MATERIALIZED (", 1)
    if hinted == frag:
        raise AssertionError(
            f"_materialized: {needle!r} not found — _probe_frag output "
            "changed shape; the MATERIALIZED hint would silently vanish"
        )
    return hinted


def _pq_residual_oracle_sql() -> str:
    dist_sub = _DIST.format(a="b", b="c", dim1=_PQ_SUB + 1)
    parts = [
        "WITH base AS (\n"
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings\n)",
        _lloyds_frag("base", K, ITERS, DIM, "s"),
        # cellassign feeds rbase plus all 16 adcparts joins — same
        # inlining hazard as rbase below, so force materialization
        _materialized(
            _probe_frag("base", f"sc{ITERS}", 1, DIM, "cellassign"),
            "cellassign",
        ),
        # residual frame: every corpus vector minus its OWN cell's
        # centroid — the relation the per-subspace fits AND the corpus
        # encode both read (exactly fit_pq_codebooks(residuals_of=...)).
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
        # rbase (which embeds the whole coarse fit + assignment chain)
        # is referenced by all 16 per-subspace fit chains — inlined it
        # replays the coarse Lloyd's ~50x and the query never finishes.
        f"""
    , rbase AS MATERIALIZED (
      SELECT b.vec_id,
             list_transform(range(1, {DIM + 1}), i -> b.v[i] - c.v[i]) AS v
      FROM base b
      JOIN cellassign ca ON ca.vec_id = b.vec_id
      JOIN sc{ITERS} c ON c.cid = ca.cid
    ), qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {_DIST.format(a="b", b="c", dim1=DIM + 1)} AS d
              FROM base b CROSS JOIN sc{ITERS} c WHERE b.vec_id < 10) x
      ) y WHERE rn <= {_PQ_NPROBE}
    ), qresid AS MATERIALIZED (
      SELECT qp.vec_id, qp.cid AS pcell,
             list_transform(range(1, {DIM + 1}), i -> b.v[i] - c.v[i]) AS v
      FROM qprobe qp
      JOIN base b ON b.vec_id = qp.vec_id
      JOIN sc{ITERS} c ON c.cid = qp.cid
    )""",
    ]
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(
            f", rpqb{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM rbase)"
        )
        parts.append(_lloyds_frag(f"rpqb{s}", _PQ_KS, ITERS, _PQ_SUB, f"rp{s}"))
        parts.append(
            _probe_frag(f"rpqb{s}", f"rp{s}c{ITERS}", 1, _PQ_SUB, f"rcode{s}")
        )
        parts.append(
            f"""
    , rqd{s} AS (
      SELECT b.vec_id AS query_id, b.pcell, c.cid,
             CAST(ROUND({dist_sub}, 9) AS DECIMAL(18,9)) AS t
      FROM (SELECT vec_id, pcell, v[{lo}:{hi}] AS v FROM qresid) b
      CROSS JOIN rp{s}c{ITERS} c
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT q.query_id, c.vec_id AS neighbor_id, q.t"
        f" FROM rcode{s} c"
        f" JOIN cellassign ca ON ca.vec_id = c.vec_id"
        f" JOIN rqd{s} q ON q.cid = c.cid AND q.pcell = ca.cid"
        for s in range(_PQ_M)
    )
    pair = _DIST.format(a="cb", b="qb2", dim1=DIM + 1)
    parts.append(
        f"""
    , adcparts AS (
      {union}
    ), adcsum AS (
      SELECT query_id, neighbor_id, SUM(t) AS adc
      FROM adcparts GROUP BY query_id, neighbor_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY adc ASC, neighbor_id ASC) AS crank
        FROM adcsum WHERE query_id <> neighbor_id
      ) WHERE crank <= {_PQ_RERANK}
    )
    SELECT query_id, neighbor_id, rank, sq_dist FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY {pair} ASC, neighbor_id ASC) AS rank,
             ROUND({pair}, 6) AS sq_dist
      FROM cand
      JOIN base cb ON cb.vec_id = neighbor_id
      JOIN base qb2 ON qb2.vec_id = query_id
    ) WHERE rank <= {_PQ_TOPK}
"""
    )
    return "".join(parts)


def _corpus_pq_residual_codebooks(spark, sf_dir: str) -> list:
    """Per-corpus cached RESIDUAL PQ codebooks — fitted over
    (v - own-cell centroid) via ``fit_pq_codebooks(residuals_of=...)``
    against the shared coarse codebook; reconstruction error strictly
    better than the raw fit is test-pinned."""
    key = f"{sf_dir}:embeddings:pqres:{_PQ_M}:{_PQ_KS}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_pq_codebooks(
            emb, "vec_id", "embedding", m=_PQ_M, ks=_PQ_KS, iters=ITERS,
            residuals_of=_corpus_codebook(spark, sf_dir),
        )
    return _CODEBOOK_CACHE[key]


@register("similarity_topk_ivf_pq_residual", _pq_residual_oracle_sql())
def q_similarity_topk_ivf_pq_residual(spark, sf_dir):
    """Residual IVF-PQ ANN (FAISS's IVF,PQ) — ladder rung #10's
    driver-facing form: sub-codes quantize the residual v minus the
    own-cell centroid (tighter codebooks: the coarse layer removes the
    between-cell variance before quantization), queries build one ADC
    table per PROBED CELL (subtracting that cell's centroid so the
    table lives in the candidates' residual frame — the cell equi-join
    makes the frames agree by construction), then the same
    decimal-exact ADC cut + full-precision rerank as the raw rung.
    Same (query_id, neighbor_id, rank, sq_dist) contract; costs one
    extra subtraction per probe row and per-cell (not per-query) table
    broadcast rows vs the raw form."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.topk_ivf_pq(
        emb, queries, "vec_id", "embedding",
        k=_PQ_TOPK, cells=K, iters=ITERS, nprobe=_PQ_NPROBE,
        m=_PQ_M, ks=_PQ_KS, rerank_m=_PQ_RERANK,
        centroids=_corpus_codebook(spark, sf_dir),
        pq_codebooks=_corpus_pq_residual_codebooks(spark, sf_dir),
        residual=True,
    )


@register("similarity_topk_ivf_pq", _pq_oracle_sql())
def q_similarity_topk_ivf_pq(spark, sf_dir):
    """IVF-PQ ANN with ADC scoring + exact rerank — the ninth ladder
    rung: corpus vectors stored as a coarse cell + 16 sub-codes (64
    bits ~ 64x smaller than float64), queries probe their 6 nearest
    cells, candidates score by 16 ADC table LOOKUPS (9dp-DECIMAL term
    sums: exact, order-free, deterministic cut), and the top-100 per
    query rerank at full precision. Recall >= 0.9 vs the exact
    brute-force top-5 on this fixture is test-pinned — note the
    fixture's embeddings are uniform random unit vectors, the
    recall-hostile case for IVF (true neighbors spread evenly over
    cells, so nprobe/cells bounds recall); clustered production
    embeddings need far smaller probe fractions for the same recall."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.topk_ivf_pq(
        emb, queries, "vec_id", "embedding",
        k=_PQ_TOPK, cells=K, iters=ITERS, nprobe=_PQ_NPROBE,
        m=_PQ_M, ks=_PQ_KS, rerank_m=_PQ_RERANK,
        centroids=_corpus_codebook(spark, sf_dir),
        pq_codebooks=_corpus_pq_codebooks(spark, sf_dir),
    )


# --- round-14 additions (post-freeze -> lead round 15) ----------------
# The evaluation + monitoring pair for the embedding tier: recall@k of
# the PQ rung against the exact brute-force top-k ('measure, don't
# guess' as an oracled relation), and the per-dimension snapshot-drift
# monitor a pipeline runs between ingest waves.


def _pq_recall_oracle_sql() -> str:
    exact_dist = _DIST.format(a="q", b="c", dim1=DIM + 1)
    return f"""
    WITH apx AS (
      SELECT query_id, neighbor_id FROM ({_pq_oracle_sql()}) pq
    ), bb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), ext AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {exact_dist}, c.vec_id) AS rn
        FROM bb q CROSS JOIN bb c
        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
      ) t WHERE rn <= {_PQ_TOPK}
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS recall
    FROM ext e
    LEFT JOIN apx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
"""


@register("ann_recall_ivf_pq", _pq_recall_oracle_sql())
def q_ann_recall_ivf_pq(spark, sf_dir):
    """Per-query recall@5 of the registered IVF-PQ rung against the
    exact brute-force squared-L2 top-5 — the ladder's quality gate as
    a driver-facing relation instead of a buried test assertion. At
    100 TB recall is always estimated on a bounded query sample; here
    the sample is the rung's own probe set, the exact side broadcasts
    it across one corpus scan, and the id-keyed join back to the
    approximate relation touches k rows per query. Deterministic end
    to end (hash-seeded fits, decimal ADC sums, id tiebreaks), so the
    recall column is a replayable number, not a statistical claim."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    approx = q_similarity_topk_ivf_pq(spark, sf_dir)
    return similarity.ann_recall_report(
        emb, queries, approx, "vec_id", "embedding", k=_PQ_TOPK
    )


@register(
    "embedding_snapshot_drift",
    _emb.snapshot_drift_oracle_sql(
        "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)",
        "(SELECT * FROM embeddings WHERE vec_id % 2 = 1)",
        "embedding",
    ),
)
def q_embedding_snapshot_drift(spark, sf_dir):
    """Per-dimension mean drift between two corpus snapshots (stand-in
    split: even/odd vec_id — in production, two ingest waves or two
    encoder versions): the distribution-shift monitor that catches an
    embedding-model update or source-mix change before it reaches a
    training run. One scan per snapshot into a d-row DECIMAL-sum
    aggregate; the corpus never shuffles."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    return _emb.embedding_snapshot_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "vec_id",
        "embedding",
    )


# --- round-15 additions (post-freeze -> lead round 16) ----------------
# VERDICT r14 items 3 and 6: the drift -> refit decision over the PQ
# store (codebook staleness as an oracled relation), and a standing
# recall row for the layout-driven z-order rung (the one whose recall
# depends on the data distribution, not just parameters).

_STALE_THR = 1.2


def _stale_codebook(spark, sf_dir: str) -> list:
    """Coarse codebook fitted on the OLD snapshot only (even vec_ids —
    the fit-time corpus): the staleness report re-encodes the NEW wave
    against exactly these, never a refit."""
    from pyspark.sql import functions as F

    key = f"{sf_dir}:embeddings:stalecoarse:{K}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_centroids(
            emb.filter(F.col("vec_id") % 2 == 0), "vec_id", "embedding",
            k=K, iters=ITERS,
        )
    return _CODEBOOK_CACHE[key]


def _stale_pq_codebooks(spark, sf_dir: str) -> list:
    from pyspark.sql import functions as F

    key = f"{sf_dir}:embeddings:stalepq:{_PQ_M}:{_PQ_KS}:{ITERS}"
    if key not in _CODEBOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _CODEBOOK_CACHE[key] = clustering.fit_pq_codebooks(
            emb.filter(F.col("vec_id") % 2 == 0), "vec_id", "embedding",
            m=_PQ_M, ks=_PQ_KS, iters=ITERS,
        )
    return _CODEBOOK_CACHE[key]


def _pq_staleness_oracle_sql() -> str:
    """Replay of pq_reconstruction_report over the even/odd snapshot
    split: coarse + 16 sub-codebooks fitted on the OLD (even) snapshot,
    per-vector reconstruction error = sum over subspaces of the
    9dp-DECIMAL-rounded min squared distance to that subspace's
    codewords, per-cell means compared old vs new. Every
    multiply-referenced fit CTE is MATERIALIZED (the round-14 lesson:
    DuckDB inlines plain CTEs, and each sub-codebook is read by BOTH
    snapshots' error scans — inlined, the 17 Lloyd's fits would replay
    ~2x each and the coarse chain inside them many more)."""
    dist_sub = _DIST.format(a="b", b="c", dim1=_PQ_SUB + 1)
    parts = [
        "WITH obase AS MATERIALIZED (\n"
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings WHERE vec_id % 2 = 0\n)",
        ", nbase AS MATERIALIZED (\n"
        "  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings WHERE vec_id % 2 = 1\n)",
        _materialized(
            _lloyds_frag("obase", K, ITERS, DIM, "st"), f"stc{ITERS}"
        ),
        _materialized(
            _probe_frag("obase", f"stc{ITERS}", 1, DIM, "ocell"), "ocell"
        ),
        _materialized(
            _probe_frag("nbase", f"stc{ITERS}", 1, DIM, "ncell"), "ncell"
        ),
    ]
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(
            f", stq{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM obase)"
        )
        parts.append(
            _materialized(
                _lloyds_frag(f"stq{s}", _PQ_KS, ITERS, _PQ_SUB, f"sp{s}"),
                f"sp{s}c{ITERS}",
            )
        )
        for tag, src in (("o", "obase"), ("n", "nbase")):
            parts.append(
                f"""
    , {tag}err{s} AS (
      SELECT b.vec_id, CAST(ROUND(MIN({dist_sub}), 9) AS DECIMAL(18,9)) AS t
      FROM (SELECT vec_id, v[{lo}:{hi}] AS v FROM {src}) b
      CROSS JOIN sp{s}c{ITERS} c
      GROUP BY b.vec_id
    )"""
            )
    ounion = "\n      UNION ALL ".join(
        f"SELECT vec_id, t FROM oerr{s}" for s in range(_PQ_M)
    )
    nunion = "\n      UNION ALL ".join(
        f"SELECT vec_id, t FROM nerr{s}" for s in range(_PQ_M)
    )
    parts.append(
        f"""
    , oerrsum AS (SELECT vec_id, SUM(t) AS e FROM ({ounion}) GROUP BY vec_id)
    , nerrsum AS (SELECT vec_id, SUM(t) AS e FROM ({nunion}) GROUP BY vec_id)
    , ostat AS (
      SELECT oc.cid AS cell, COUNT(*) AS n,
             ROUND(CAST(SUM(e) AS DOUBLE) / COUNT(*), 9) AS err
      FROM oerrsum s JOIN ocell oc USING (vec_id) GROUP BY oc.cid
    ), nstat AS (
      SELECT nc.cid AS cell, COUNT(*) AS n,
             ROUND(CAST(SUM(e) AS DOUBLE) / COUNT(*), 9) AS err
      FROM nerrsum s JOIN ncell nc USING (vec_id) GROUP BY nc.cid
    )
    SELECT COALESCE(o.cell, n2.cell) AS cell,
           CAST(o.n AS BIGINT) AS n_old, CAST(n2.n AS BIGINT) AS n_new,
           o.err AS err_old, n2.err AS err_new,
           -- err_old = 0 special case mirrored from
           -- pq_reconstruction_report (ADVICE r15): DuckDB's double
           -- division yields inf where Spark yields NULL, so guard it
           -- identically on both sides — growth NULL, refit err_new>0
           CASE WHEN o.err = 0 THEN NULL
                ELSE ROUND(n2.err / o.err, 6) END AS err_growth,
           CASE WHEN o.err IS NULL OR n2.err IS NULL THEN NULL
                WHEN o.err = 0 THEN (n2.err > 0)
                ELSE (ROUND(n2.err / o.err, 6) > {_STALE_THR}) END AS refit
    FROM ostat o FULL OUTER JOIN nstat n2 ON o.cell = n2.cell
"""
    )
    return "".join(parts)


@register("pq_codebook_staleness", _pq_staleness_oracle_sql())
def q_pq_codebook_staleness(spark, sf_dir):
    """The drift -> refit DECISION over the persisted PQ index
    (VERDICT r14 item 3): `embedding_snapshot_drift` says the corpus
    moved; this says whether the movement broke the quantizer. The
    coarse + sub-codebooks are fitted on the OLD snapshot (even
    vec_ids — the fit-time corpus); both snapshots re-encode against
    those fixed codebooks, and each coarse cell reports its mean PQ
    reconstruction error old vs new with the growth ratio and a
    refit flag (threshold 1.2). Completes the serving loop: index ->
    batch/stream search -> recall -> drift -> refit decision. Scale
    shape: two corpus scans into a cells-row aggregate; codebooks are
    broadcast literals; shuffles carry (cell, error) only — at 100 TB
    a flagged cell refits its own sub-codebooks and re-encodes only
    its partitions of the code store."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_reconstruction_report(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "vec_id",
        "embedding",
        _stale_codebook(spark, sf_dir),
        _stale_pq_codebooks(spark, sf_dir),
        growth_threshold=_STALE_THR,
    )


def _zorder_recall_oracle_sql(k: int = 10) -> str:
    return f"""
    WITH apx AS (
      SELECT query_id, neighbor_id FROM ({_zorder_ann_oracle()}) z
    ), e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), ext AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.v, q.v) / (c.nrm * q.nrm) DESC,
                          c.vec_id ASC) AS rn
        FROM e q CROSS JOIN e c
        WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
      ) t WHERE rn <= {k}
    )
    SELECT x.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS recall
    FROM ext x
    LEFT JOIN apx a
      ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
    GROUP BY x.query_id
"""


@register("ann_recall_zorder", _zorder_recall_oracle_sql())
def q_ann_recall_zorder(spark, sf_dir):
    """Per-query recall@10 of the layout-driven z-order rung against
    the exact brute-force COSINE top-10 (the rung's own metric —
    measuring a cosine rung against L2 ground truth would fold metric
    disagreement into the number on an unnormalized corpus). The
    z-order rung is the ladder's most data-distribution-dependent:
    its candidate pool is whatever the PCA-subspace Morton cells
    happen to contain, so this recall row is the one that moves when
    the corpus shape changes even if every parameter stays fixed —
    exactly why it deserves a standing measurement (VERDICT r14
    item 6). Same bounded-sample shape as ann_recall_ivf_pq."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = q_similarity_topk_zorder(spark, sf_dir)
    return similarity.ann_recall_report(
        emb, queries, approx, "vec_id", "embedding", k=10, metric="cosine"
    )
