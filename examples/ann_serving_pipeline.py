"""ANN serving + evaluation, end to end: persist the PQ index once,
serve queries batch AND streaming off the stored codes, and measure —
never guess — the recall the compression bought.

The round-14 similarity story as an executable build:

    embeddings
      → coarse codebook + residual PQ codebooks   (fitted once)
      → pq_encode (id, cell, code0..15)           (written to parquet —
                                                   the 64x-compressed
                                                   serving index)
      → batch search:      topk_ivf_pq(codes=stored, residual=True)
      → streaming search:  feeds.ann_query_stream over the same store,
                           queries chopped into micro-batches
        → assert: streaming union == batch, bit for bit
      → evaluation:        ann_recall_report vs exact brute force
        → assert: mean recall clears the rung's pinned floor
      → monitoring:        embedding_snapshot_drift across the two
                           query waves (even/odd stand-in)
      → refit decision:    pq_reconstruction_report — identical waves
                           report growth ≈ 1 (no refit); a planted
                           encoder drift (wave scaled 1.5x) flips the
                           per-cell refit flags (round 15: the loop's
                           closing step — drift MEASURED, refit DECIDED)

Run: ``python examples/ann_serving_pipeline.py [sf_dir]``

At 100 TB: the index build scans the corpus a bounded number of times
and persists 8 bytes per vector; every later search reads
~nprobe/cells of the code store and reranks a fixed candidate count
per query — serving cost is per-query, not per-corpus, which is why
the streaming mirror equals the batch relation however the query
stream is chopped.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    clustering,
    embeddings as emb_ops,
    similarity,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402
from etl_fuel_priceguide_ec2_spark.streaming import feeds  # noqa: E402

# the recall/cost knobs, demonstrably: on the sf0.001 uniform-vector
# fixture (recall-hostile for IVF) these m=8/ks=8 codes measure ~0.43
# mean recall@5 at nprobe=4/rerank=50 and ~0.72 at nprobe=6/rerank=100
# — the registered rung's heavier m=16/ks=16/nprobe=6/rerank=100
# clears 0.9 (test-pinned). The example runs the mid-point so the
# evaluation step has something real to measure.
K, NPROBE, RERANK, M, KS = 5, 6, 100, 8, 8


def main(sf_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_session(
        "ann-serving-example", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_vectors = emb.count()
    queries = emb.filter(F.col("vec_id") < 12)

    work = Path(tempfile.mkdtemp(prefix="ann_serving_example_"))
    try:
        # 1. fit once, persist the compressed index once (ingest time)
        cents = clustering.fit_centroids(emb, "vec_id", "embedding", k=8, iters=2)
        books = clustering.fit_pq_codebooks(
            emb, "vec_id", "embedding", m=M, ks=KS, iters=2, residuals_of=cents
        )
        codes_path = str(work / "codes")
        # partitionBy("cell"): the store layout that lets every probe
        # prune to its nprobe cells at the PARTITION level (the
        # streaming server pushes a static IN filter — plan-pinned)
        similarity.pq_encode(
            emb, "vec_id", "embedding", cents, books, residual=True
        ).write.partitionBy("cell").parquet(codes_path)
        codes = spark.read.parquet(codes_path)

        # 2. batch serving off the stored codes
        def batch_search(qdf):
            return similarity.topk_ivf_pq(
                emb, qdf, "vec_id", "embedding",
                k=K, nprobe=NPROBE, rerank_m=RERANK, m=M, ks=KS,
                centroids=cents, pq_codebooks=books,
                codes=codes, residual=True,
            )

        approx = batch_search(queries)
        batch = sorted(map(tuple, approx.collect()))
        assert len(batch) > 0

        # 3. streaming serving: same store, queries in 3 micro-batches
        src = str(work / "qstream")
        for i in range(3):
            queries.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        out_path = str(work / "topk")
        feeds.ann_query_stream(
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            codes_path, emb, out_path, str(work / "ckpt"),
            "vec_id", "embedding", cents, books,
            k=K, nprobe=NPROBE, rerank_m=RERANK, residual=True,
        ).awaitTermination(300)
        streamed = sorted(
            map(tuple, spark.read.parquet(out_path).drop("_batch").collect())
        )
        assert streamed == batch, "streaming serve diverged from batch"
        print(f"streaming == batch over {len(batch)} result rows")

        # 4. measure the recall the 64x compression actually bought
        report = similarity.ann_recall_report(
            emb, queries, approx, "vec_id", "embedding", k=K
        ).collect()
        mean_recall = sum(r.recall for r in report) / len(report)
        assert mean_recall >= 0.6, f"recall collapsed: {mean_recall}"
        print(f"mean recall@{K} vs exact: {mean_recall:.3f} "
              f"({len(report)} queries, nprobe={NPROBE}/8 cells)")

        # 5. drift monitor between the two query waves (stand-in split)
        drift = emb_ops.embedding_snapshot_drift(
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            "vec_id", "embedding",
        )
        max_shift = drift.agg(F.max(F.abs(F.col("shift")))).first()[0]
        print(f"max per-dim mean shift between waves: {max_shift:.6f}")

        # 6. the refit DECISION (round 15): re-encode a new wave
        # against the deployed codebooks and compare per-cell
        # reconstruction error to the fit-time baseline. Identical
        # waves -> growth ~ 1, nothing flagged; a planted encoder
        # drift (the wave scaled 1.5x) inflates the error and flips
        # the per-cell refit flags — drift measured, refit decided.
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        calm = similarity.pq_reconstruction_report(
            even, odd, "vec_id", "embedding", cents, books,
            growth_threshold=1.5, residual=True,
        ).collect()
        n_calm = sum(1 for r in calm if r.refit)
        drifted_wave = odd.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x * 1.5).alias(
                "embedding"
            ),
        )
        stale = similarity.pq_reconstruction_report(
            even, drifted_wave, "vec_id", "embedding", cents, books,
            growth_threshold=1.5, residual=True,
        ).collect()
        n_stale = sum(1 for r in stale if r.refit)
        assert n_stale > n_calm, "planted drift must flag refits"
        print(
            f"refit decision: {n_calm}/{len(calm)} cells flagged on the "
            f"calm wave, {n_stale}/{len(stale)} after the planted drift"
        )

        # deliberately no spark.stop(): get_session returns the
        # process's shared session (getOrCreate) — suite rule
        return {
            "n_vectors": n_vectors,
            "n_results": len(batch),
            "mean_recall": mean_recall,
            "max_drift": float(max_shift),
            "refit_flags_calm": n_calm,
            "refit_flags_drifted": n_stale,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
