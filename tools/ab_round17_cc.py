"""Round-17 interleaved A/B: broadcast-labels for connected_components
(guide §3.1) — REJECTED by measurement; the operator keeps the keyed
join. Record (min-of-4, same session, order-rotated, bit-identity
asserted first):

  32 cores: dedup_clusters 2.030 (smj) vs 1.971 (bc) — flat;
            semantic keep-list 5.185 vs 4.894 — ~6%, inside the band.
  8 cores:  dedup_clusters 2.688 vs 2.920 — bc ~8% WORSE;
            semantic keep-list 5.457 vs 5.462 — dead even.

Why it loses where pagerank/hits win: CC pins (re-materializes) the
label relation every probe cycle anyway, so the broadcast build is an
EXTRA per-cycle job on top of the pin instead of replacing a lazy
chain's shuffle; plus the auto-gate pays an edge-count job per call.
The variant here is a local copy of the CC loop with the hint, so the
A/B stays reproducible without the rejected operator parameter.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import clustering, dedup
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table


def _cc_bcast(pairs: DataFrame, id_a="id_a", id_b="id_b", max_iter=20) -> DataFrame:
    """connected_components with the label/neighbor-min sides
    broadcast-hinted (the rejected variant), hops_per_probe='auto'."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _hop(work: DataFrame) -> DataFrame:
        neighbor_min = (
            edges.join(F.broadcast(work), edges.dst == work.node)
            .groupBy("src")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        new_min = F.least(
            F.col("component_id"),
            F.coalesce(F.col("nbr_min"), F.col("component_id")),
        )
        return work.join(
            F.broadcast(neighbor_min), work.node == neighbor_min.src, "left"
        ).select(
            "node",
            new_min.alias("component_id"),
            (new_min != F.col("component_id")).alias("_lastch"),
        )

    labels = None
    for it in range(max_iter):
        hops = 1 if it < 2 else 2
        if labels is None:
            work = edges.groupBy(F.col("src").alias("node")).agg(
                F.min("dst").alias("_nm")
            ).select(
                "node",
                F.least(F.col("node"), F.col("_nm")).alias("component_id"),
                (F.col("_nm") < F.col("node")).alias("_lastch"),
            )
            for _ in range(hops - 1):
                work = _hop(work)
        else:
            work = labels.withColumn("_lastch", F.lit(True))
            for _ in range(hops):
                work = _hop(work)
        work = work.localCheckpoint(eager=True)
        changed = work.filter(F.col("_lastch")).limit(1).count()
        labels = work.drop("_lastch")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "component_id")


def _clusters(spark, sf_dir, bcast):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
    )
    cc = _cc_bcast if bcast else dedup.connected_components
    return cc(pairs)


def _sem_keeplist(spark, sf_dir, bcast):
    from etl_fuel_priceguide_ec2_spark.registry.semantic import (
        ITERS,
        K,
        PROBES,
        _corpus_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = clustering.semantic_dedup_pairs(
        emb, "vec_id", "embedding", k=K, iters=ITERS, threshold=1.2,
        probes=PROBES, centroids=_corpus_codebook(spark, sf_dir),
    )
    cc = _cc_bcast if bcast else dedup.connected_components
    comp = cc(pairs, "id_a", "id_b")
    return (
        emb.select("vec_id")
        .join(comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("vec_id")))
        .withColumn("kept", F.col("component_id") == F.col("vec_id"))
    )


BUILDERS = {
    "clusters_smj": lambda s, d: _clusters(s, d, False),
    "clusters_bc": lambda s, d: _clusters(s, d, True),
    "semkeep_smj": lambda s, d: _sem_keeplist(s, d, False),
    "semkeep_bc": lambda s, d: _sem_keeplist(s, d, True),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab_r17_cc")
    spark.sparkContext.setLogLevel("ERROR")

    for a, b in (("clusters_smj", "clusters_bc"), ("semkeep_smj", "semkeep_bc")):
        ra = sorted(map(tuple, BUILDERS[a](spark, sf_dir).collect()))
        rb = sorted(map(tuple, BUILDERS[b](spark, sf_dir).collect()))
        assert ra == rb and ra, f"{a} vs {b}: outputs differ"
        print(f"bit-identity OK {a} vs {b} over {len(ra)} rows")

    reps = 4
    times: dict[str, list[float]] = {n: [] for n in BUILDERS}
    order = list(BUILDERS)
    for r in range(reps):
        for name in order if r % 2 == 0 else order[::-1]:
            t0 = time.perf_counter()
            BUILDERS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:12s} min {min(ts):6.3f}  reps {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
