"""Semantic clustering over embedding columns: deterministic Lloyd's
k-means, the standard front-end for semantic dedup at corpus scale
(cluster first, then near-dup only within clusters — turns the O(n^2)
semantic-pair search into per-cluster work).

Not in the reference (a row-store ETL, ``index.js``); mandated by the
LLM-data-pipeline extension tier. Design for 100 TB: the only
driver-side state is the k x dim centroid matrix (tiny, broadcast back
as a literal); every per-row step is a JVM-side higher-order-function
expression over the vector column — no Python UDFs, no shuffle except
the k*dim-sized centroid update aggregate.

Determinism contract (the correctness gate hashes values, and an
external DuckDB oracle must reproduce the run bit-for-bit):

- init = the vectors of the ``k`` smallest md5-of-id hashes — a
  deterministic uniform draw over the corpus (no RNG, no id-order
  pathology);
- assignment = argmin of squared L2 distance, ties broken by the lower
  centroid index;
- the centroid UPDATE quantizes vector elements to 6 decimals and sums
  them as DECIMAL(18,6) — exact and addition-order-free — then divides
  in double and rounds to 9 decimals. A raw double sum would be
  partition-order-dependent (fp addition is not associative), which
  breaks repeated-execution determinism *and* any cross-engine oracle;
- assignment distances are computed in double over the full-precision
  vector; distinct clusters are separated by O(1) while cross-engine
  fp summation noise is O(1e-13), so argmin is stable (documented
  residual risk: a pathological exact tie).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign(df: DataFrame, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster_id`` / ``sq_dist`` columns: nearest centroid by
    squared L2, computed as a JVM-side fold (zip_with + aggregate) per
    centroid — whole-stage-codegen friendly, no shuffle."""
    # ONE nested array literal, not k*dim Literal nodes: the nested
    # expression tree made Janino compile multi-second generated code
    # per job (measured — the k-means fit was codegen-bound, not
    # data-bound); a single constant keeps codegen flat
    cent_lit = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with("_v", c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    return (
        df.withColumn("_d", dists)
        .withColumn("sq_dist", F.array_min("_d"))
        # ties break to the LOWER centroid index (array_position returns
        # the first match) — mirrored in the oracle's (dist, cid) sort
        .withColumn("cluster_id", (F.array_position("_d", F.col("sq_dist")) - 1).cast("long"))
        .drop("_d")
    )


def _fit_centroids(
    base: DataFrame, id_col: str, k: int, iters: int
) -> list[list[float]]:
    """Run the deterministic Lloyd's iterations; returns the final
    centroid matrix. The k x dim doubles are the ONLY data that touch
    the driver — at 100 TB the per-iteration cost is one scan + one
    (cluster, position)-keyed aggregate of k*dim cells.

    NOT persisted: a same-session A/B at sf0.1 measured persist() of the
    working set 1.1-1.3x SLOWER than recomputing the scan per action
    (materialization barrier + cache write beat the trivial re-scan —
    the same recompute-beats-cache result as the minhash shingle
    subplan, NOTES.md round 1). On a 100 TB corpus where the scan
    dominates, callers should persist/checkpoint the projected (id,
    vector) relation BEFORE calling fit."""
    # init = the k smallest md5-of-id values: a deterministic uniform
    # draw over the corpus. Lowest-id init was measured pathological on
    # id-correlated data (a 5x-replicated corpus put every centroid in
    # replica 0, whole clouds collapsed into one block and the blocked
    # pair search went quadratic, 2.7s -> 32s); real corpora correlate
    # ids with source/time the same way. Hash order is engine-portable
    # (same expression exists in DuckDB), so oracles replay it exactly.
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    init_rows = base.orderBy(h.asc(), F.col(id_col).asc()).limit(k).collect()
    if not init_rows:
        return []  # empty input: no centroids; callers emit empty results
    centroids = [list(r["_v"]) for r in init_rows]
    dim = len(centroids[0])  # one collect serves init AND dim — no extra job

    for _ in range(iters):
        assigned = _assign(base, id_col, centroids)
        # quantize elements to 6dp, sum as DECIMAL (exact, order-free),
        # divide in double, round to 9dp — the cross-engine-stable mean
        upd = (
            assigned.select("cluster_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .withColumn("m", F.round("m", 9))
            .collect()
        )
        new_cent = {cid: [0.0] * dim for cid in {r["cluster_id"] for r in upd}}
        for r in upd:
            new_cent[r["cluster_id"]][r["pos"]] = r["m"]
        # empty clusters keep their previous centroid (mirrored by the
        # oracle's LEFT JOIN + COALESCE)
        centroids = [new_cent.get(i, centroids[i]) for i in range(k)]
    return centroids


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic Lloyd's k-means; returns (id, cluster_id, sq_dist
    rounded to 6). ``iters`` full assign+update cycles, then a final
    assignment against the last centroids.

    Sizing ``k`` for blocked pair search: choose k ~ sqrt(n) — it
    balances the O(n*k) assignment against the O(n^2/k) per-block
    self-join at n^1.5 each; both mis-sizings were measured quadratic
    (docs/SCALE.md, vector scaling study). Raise ``probes`` alongside k
    (finer blocks lose more straddling pairs); at extreme scale prefer
    a two-level coarse-then-fine quantizer over one giant flat k."""
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    centroids = _fit_centroids(base, id_col, k, iters)
    if not centroids:  # empty input: empty result, stable schema
        return base.select(
            id_col,
            F.lit(None).cast("long").alias("cluster_id"),
            F.lit(None).cast("double").alias("sq_dist"),
        )
    return (
        _assign(base, id_col, centroids)
        .select(id_col, "cluster_id", F.round("sq_dist", 6).alias("sq_dist"))
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.15,
    probes: int = 2,
) -> DataFrame:
    """Semantic near-dup pairs: k-means block, then pair search ONLY
    within shared blocks (each block self-join is |block|^2 instead of
    n^2 — the clustering IS the blocking structure).

    Multi-probe blocking: each vector is indexed under its ``probes``
    nearest centroids, and a pair materializes if the two share ANY
    probed block — the standard IVF recall lever for clusters that
    overlap (single-assignment blocking loses near pairs that straddle
    a centroid boundary; measured 0.30 -> ~0.8 recall on the fixture
    at probes=2). Cost scales linearly in ``probes``, never O(n^2)."""
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    centroids = _fit_centroids(base, id_col, k, iters)
    if not centroids:  # empty input: empty result, stable schema
        return base.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(None).cast("double").alias("sq_dist"),
        ).filter(F.lit(False))
    # ONE nested array literal, not k*dim Literal nodes: the nested
    # expression tree made Janino compile multi-second generated code
    # per job (measured — the k-means fit was codegen-bound, not
    # data-bound); a single constant keeps codegen flat
    cent_lit = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with("_v", c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    ranked = F.array_sort(
        F.zip_with(
            dists,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda d, i: F.struct(d.alias("d"), i.alias("cid")),
        )
    )
    probed = base.withColumn(
        "block",
        F.explode(
            F.transform(F.slice(ranked, 1, probes), lambda s: s["cid"].cast("long"))
        ),
    )
    left = probed.select(
        F.col(id_col).alias("id_a"), "block", F.col("_v").alias("va")
    )
    right = probed.select(F.col(id_col).alias("id_b"), "block")
    cand = (
        left.join(right, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs_b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand.join(vecs_b, "id_b")
        .withColumn(
            "sq_dist",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        .filter(F.col("sq_dist") <= threshold)
        .select("id_a", "id_b", F.round("sq_dist", 6).alias("sq_dist"))
    )


def semantic_dedup_pairs_two_level(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    threshold: float = 0.15,
    probes: int = 2,
) -> DataFrame:
    """Two-level blocked semantic pairs — the flat-k replacement at
    extreme scale (docs/SCALE.md: one flat k must be ~sqrt(n), which at
    10^10 vectors means 10^5 centroids and an O(n*k) assignment; two
    levels of ~n^(1/3) each cut assignment to O(n*(k1+k2)) while the
    block count k1*k2 keeps blocks small).

    Level 1: Lloyd's over the vectors (coarse cells). Level 2: Lloyd's
    over the RESIDUALS v - c1(v) with one shared codebook (the IVF-PQ
    coarse/fine split, minus the compression). Block key = (coarse
    cell, residual cell); candidates must share BOTH, multi-probed on
    each level (probes^2 block memberships per vector). Residuals are
    always taken against the PRIMARY coarse cell — the standard IVF
    approximation — so a pair straddling two coarse cells is found via
    the coarse probe, not a recomputed residual."""
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    c1 = _fit_centroids(base, id_col, k1, iters)
    if not c1:
        return base.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(None).cast("double").alias("sq_dist"),
        ).filter(F.lit(False))
    cent1 = F.lit([[float(x) for x in c] for c in c1])
    d1 = F.transform(
        cent1,
        lambda c: F.aggregate(
            F.zip_with("_v", c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    primary = (F.array_position(d1, F.array_min(d1)) - 1).cast("int")
    resid = F.zip_with(
        "_v", F.element_at(cent1, primary + F.lit(1)), lambda x, c: x - c
    )
    resid_df = base.select(F.col(id_col), resid.alias("_v"))
    c2 = _fit_centroids(resid_df, id_col, k2, iters)
    cent2 = F.lit([[float(x) for x in c] for c in c2])

    def _probe_blocks(vec_expr, cent_lit, k):
        d = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with(vec_expr, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, dd: acc + dd,
            ),
        )
        ranked = F.array_sort(
            F.zip_with(
                d,
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda dd, i: F.struct(dd.alias("d"), i.alias("cid")),
            )
        )
        return F.transform(F.slice(ranked, 1, probes), lambda s: s["cid"].cast("long"))

    probed = (
        base.withColumn("_resid", resid)
        .withColumn("_b1", F.explode(_probe_blocks(F.col("_v"), cent1, k1)))
        .withColumn("_b2", F.explode(_probe_blocks(F.col("_resid"), cent2, k2)))
        .withColumn("block", F.col("_b1") * k2 + F.col("_b2"))
    )
    left = probed.select(F.col(id_col).alias("id_a"), "block", F.col("_v").alias("va"))
    right = probed.select(F.col(id_col).alias("id_b"), "block")
    cand = (
        left.join(right, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs_b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand.join(vecs_b, "id_b")
        .withColumn(
            "sq_dist",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        .filter(F.col("sq_dist") <= threshold)
        .select("id_a", "id_b", F.round("sq_dist", 6).alias("sq_dist"))
    )
