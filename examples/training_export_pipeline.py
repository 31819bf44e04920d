"""The export terminal stage, end to end: curated documents leaving
the engine as training shards.

    documents
      → deterministic train split          (hash_split — membership is
                                            id-keyed, not partition luck)
      → chunk → pack into budget bins      (one training sequence per bin)
      → shard_positions                    (seeded global shuffle into N
                                            shards, dense in-shard order)
      → write_training_shards              (shard=K/ parquet, rows stored
                                            in position order)
      → shard_manifest                     (the loader's no-rescan
                                            integrity + size report)
      → contamination pre-flight           (per-shard benchmark-overlap
                                            counts — ship only clean shards)

Run: ``python examples/training_export_pipeline.py [sf_dir]``

Every stage is deterministic from the corpus ids alone, so a rerun on
a different cluster produces byte-identical shards — the property that
makes training-data builds auditable. At 100 TB the only full-data
shuffles are the pack window's group exchange and the sharder's ONE
range exchange; manifests are n_shards-row relations.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    export,
    sampling,
    textops,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

N_SHARDS = 4
SEED = "export-demo"


def main(sf_dir: str, out_dir: str | None = None) -> dict:
    spark = get_session("training-export-example")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )

    # 1. deterministic split: the keep-list stand-in
    train = (
        sampling.hash_split(
            docs, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
        )
        .filter(F.col("split") == "train")
        .drop("split")
    )
    n_train = train.count()

    # 2. chunk + pack: bins are the training sequences
    chunks = textops.chunk_documents(
        train, "doc_id", "text", chunk_tokens=32, overlap=8
    )
    packed = textops.pack_chunks(
        chunks, "doc_id", ["doc_id", "chunk_id"], "chunk_tokens", budget=128
    )
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("bin_tokens"),
    )

    # 3. shard + write + manifest
    sharded = export.shard_positions(
        bins, "bin_id", N_SHARDS, seed=SEED, check_unique_ids=True
    )
    out_path = out_dir or tempfile.mkdtemp(prefix="shards_")
    export.write_training_shards(sharded, out_path, N_SHARDS)
    manifest = export.shard_manifest(
        sharded, {"total_tokens": "bin_tokens"}
    ).collect()

    # 4. contamination pre-flight over the exported docs
    bench = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    flagged = (
        textops.contamination_check(
            train, bench, "doc_id", "text", "bench_id", "bench_text", n=5
        )
        .filter(F.col("doc_id") != F.col("bench_id"))
        .filter(F.col("contamination") >= 0.5)
        .count()
    )

    total_bins = bins.count()
    written = spark.read.parquet(out_path).count()
    summary = {
        "train_docs": n_train,
        "bins": total_bins,
        "shards": len(manifest),
        "written_rows": written,
        "manifest_docs": sum(r.n_docs for r in manifest),
        "manifest_tokens": sum(r.total_tokens for r in manifest),
        "dense": all(r.max_pos == r.n_docs for r in manifest),
        "contaminated_train_docs": flagged,
        "out_path": out_path,
    }
    for k, v in summary.items():
        print(f"{k}: {v}")
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
