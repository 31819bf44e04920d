"""Embedding-space corpus triage chained end-to-end — the round-10
second-moment tier the way a training-data build runs it:

    vectors
      → covariance diagnostics   (anisotropy: top variance dims,
                                  zero-join d(d+1)/2-row aggregate)
      → top-2 PCA subspace       (power iteration + deflation on the
                                  driver; map-only projection)
      → Z-order layout write     (vectors sorted by the Morton key of
                                  their quantized PCA scores — ANN
                                  probes prune at the row-group level)
      → outlier gate             (diagonal-Mahalanobis z-distance,
                                  fixed chi-square-scale threshold)
      → triage report            (kept / flagged ids, id-keyed only)

Run: ``python examples/embedding_triage_pipeline.py``

At 100 TB: the corpus is scanned three times (moments, projection,
score) and never shuffled except the layout writer's range sort; the
only driver-side state is the d x d covariance and the d-row stats.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import embeddings, layout  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

ZDIST_THRESHOLD = 160.0  # ~2.5x the 64-dim chi-square mean


def main(sf_dir: str | None = None) -> dict[str, int]:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_session("embedding-triage-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_vectors = emb.count()

    # 1. covariance diagnostics: the d(d+1)/2-row relation is the whole
    # cost; report the most/least spread dimensions (dimension collapse
    # shows up here long before any model does)
    cov = embeddings.embedding_covariance(emb, "vec_id", "embedding")
    diag = (
        cov.filter(F.col("dim_i") == F.col("dim_j"))
        .orderBy(F.col("cov").desc())
        .collect()
    )
    print(
        f"covariance: {len(diag)} dims, top variance dim {diag[0].dim_i} "
        f"({diag[0].cov:.4f}), floor dim {diag[-1].dim_i} ({diag[-1].cov:.4f})"
    )

    # 2. top-2 subspace scores (driver iteration; map-only projection)
    scores = embeddings.pca_component_scores(
        emb, "vec_id", "embedding", n_components=2, iters=8
    )

    # 3. layout write: vectors sorted by the Morton key of their
    # quantized scores — the ANN-locality clustering
    q = scores.select(
        "vec_id",
        F.round(F.col("pc1") * 1e6, 0).cast("long").alias("q1"),
        F.round(F.col("pc2") * 1e6, 0).cast("long").alias("q2"),
    )
    keyed = q.select(
        "vec_id", layout.zorder_value(q, ["q1", "q2"], bits=20).alias("z")
    )
    out_dir = tempfile.mkdtemp(prefix="emb-zorder-")
    (
        emb.join(keyed, "vec_id")
        .orderBy("z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    n_written = spark.read.parquet(out_dir).count()
    print(f"layout: {n_written} vectors written Z-ordered to {out_dir}")

    # 4. outlier gate: fixed threshold, map-only
    zd = embeddings.embedding_zscore_outliers(emb, "vec_id", "embedding")
    flagged = zd.filter(F.col("zdist2") >= ZDIST_THRESHOLD)
    n_flagged = flagged.count()
    kept = n_vectors - n_flagged
    print(
        f"outlier gate (zdist2 >= {ZDIST_THRESHOLD}): "
        f"{n_flagged} flagged, {kept} kept of {n_vectors}"
    )

    return {
        "n_vectors": n_vectors,
        "n_written": n_written,
        "n_flagged": n_flagged,
        "n_kept": kept,
    }


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
