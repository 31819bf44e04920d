"""Semantic dedup over the ``embeddings`` table — the round-3 extension
tier chained end-to-end the way an embedding-based corpus dedup runs:

    vectors
      → deterministic k-means   (lowest-id init, decimal-exact updates)
      → multi-probe blocking    (each vector under its 2 nearest
                                 centroids — the IVF recall lever)
      → blocked pair search     (per-block self-join, never O(n^2))
      → connected components    (HashMin label propagation)
      → canonical keep-list     (cluster representative = min id)

Run: ``python examples/semantic_dedup.py``

At 100 TB: the k-means fit touches the driver with only the k×dim
centroid matrix; blocking bounds the pair search to per-block work; CC
shuffles only the (tiny) edge list. The whole chain is DataFrame-native
— no Python UDFs anywhere.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import clustering, dedup  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None) -> dict[str, int]:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_session("semantic-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_vectors = emb.count()

    pairs = clustering.semantic_dedup_pairs(
        emb, "vec_id", "embedding", k=8, iters=2, threshold=1.2, probes=2
    )
    n_pairs = pairs.count()

    components = dedup.connected_components(pairs, "id_a", "id_b")
    n_grouped = components.count()
    n_clusters = components.select("component_id").distinct().count()

    # keep-list: every vector not in a dup group, plus each group's
    # canonical representative (min id = the component label)
    dupes_to_drop = components.filter(F.col("doc_id") != F.col("component_id"))
    keep = emb.join(
        dupes_to_drop.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    )
    n_keep = keep.count()

    out = {
        "vectors": n_vectors,
        "near_dup_pairs": n_pairs,
        "grouped_vectors": n_grouped,
        "dup_clusters": n_clusters,
        "kept": n_keep,
    }
    for k_, v in out.items():
        print(f"{k_:>18}: {v}")
    assert n_keep == n_vectors - (n_grouped - n_clusters)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
