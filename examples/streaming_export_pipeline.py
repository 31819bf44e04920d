"""Daily-ingest training export, end to end: micro-batched document
arrivals staged as they land, finalized into byte-identical shards.

    documents (3 ingest slices)
      → readStream, one slice per micro-batch
      → training_export_stage_stream       (pure-map (shard, __h) keys +
                                            _batch — APPEND, no rank,
                                            no state)
      → finalize_training_export           (replay dedupe + the batch
                                            sharder's global rank over
                                            everything staged)
      → write_training_shards + manifest   (shard=K/ parquet in position
                                            order, n_shards-row report)

Run: ``python examples/streaming_export_pipeline.py [sf_dir]``

The point this example proves: the total order (shard, __h, id) is
APPEND-STABLE, so however ingest was chopped into micro-batches, the
finalized (shard, shard_pos) assignments are bit-identical to a batch
``shard_positions`` over the same rows — verified inline. A training
run can therefore stage documents as they arrive all day and still
ship the exact shards a from-scratch batch build would have produced;
replays of a crashed micro-batch strip exactly on (_batch, id).

At 100 TB: staging is pure map work per micro-batch (no shuffle, no
streaming state store); the ONE range exchange happens at finalize
time, exactly once, over ids + hash keys.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import export  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402
from etl_fuel_priceguide_ec2_spark.streaming import feeds  # noqa: E402

N_SHARDS = 4
SEED = "stream-export-demo"


def main(sf_dir: str, out_dir: str | None = None) -> dict:
    spark = get_session("streaming-export-example")
    work = Path(out_dir or tempfile.mkdtemp(prefix="stream_export_"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    # 1. lay the corpus out as 3 ingest slices -> 3 micro-batches
    src = str(work / "ingest")
    docs.withColumn("_slice", F.col("doc_id") % 3).repartition(
        3, "_slice"
    ).drop("_slice").write.parquet(src)

    # 2. stage each micro-batch with pure-map shard keys
    staged = str(work / "staged")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    feeds.training_export_stage_stream(
        stream, "doc_id", N_SHARDS, staged, str(work / "ckpt"), seed=SEED
    ).awaitTermination(120)
    n_batches = (
        spark.read.parquet(staged).select("_batch").distinct().count()
    )

    # 3. finalize: replay-deduped positions over everything staged
    sharded = feeds.finalize_training_export(spark, staged, "doc_id")

    # 4. the append-stability proof: batch sharding over the same rows
    batch_form = export.shard_positions(
        spark.read.parquet(src), "doc_id", N_SHARDS, seed=SEED
    )
    key = ["doc_id", "shard", "shard_pos"]
    streamed_rows = sorted(map(tuple, sharded.select(*key).collect()))
    batch_rows = sorted(map(tuple, batch_form.select(*key).collect()))
    identical = streamed_rows == batch_rows

    # 5. ship: in-order partitioned write + manifest
    out_path = str(work / "shards")
    export.write_training_shards(sharded, out_path, N_SHARDS)
    manifest = export.shard_manifest(
        sharded, {"total_chars": "n_chars"}
    ).collect()

    summary = {
        "ingested_docs": docs.count(),
        "micro_batches": n_batches,
        "finalized_rows": len(streamed_rows),
        "identical_to_batch_sharding": identical,
        "shards": len(manifest),
        "manifest_docs": sum(r.n_docs for r in manifest),
        "dense": all(r.max_pos == r.n_docs for r in manifest),
        "out_path": out_path,
    }
    for k, v in summary.items():
        print(f"{k}: {v}")
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
