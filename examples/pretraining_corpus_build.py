"""The full pretraining-corpus build, one script: every pipeline stage
this engine ships, chained in production order with its integrity
properties asserted inline — the north star's complete story.

    raw documents
      → quality gate             (map-only heuristics — cheapest first)
      → repetition gate          (Gopher-style dup-n-gram / top-token caps)
      → exact dedup              (content hash, min-id survivor)
      → near-dup keep-list       (MinHash-LSH pairs → connected
                                  components → canonical member)
      → eval holdout             (balanced per-language stratified take)
      → decontamination          (drop train docs overlapping holdout
                                  5-grams — BEFORE packing, so no
                                  contaminated bytes ever reach a shard)
      → mixture allocation       (temperature tau=0.5 per-lang shares)
      → fractional-epoch mix     (upsample low-resource langs / thin
                                  high-resource ones; replicas become
                                  distinct units via replica_id)
      → chunk → pack             (token-budget bins = training sequences)
      → sharded export           (seeded global shuffle, dense in-shard
                                  positions, unique-id contract CHECKED)
      → manifests + pre-flight   (per-shard sizes + contamination counts
                                  a loader can trust without re-scanning)

Run: ``python examples/pretraining_corpus_build.py [sf_dir]``

Asserted end-to-end: (a) token conservation — every chunk token the
packer saw lands in exactly one bin, and the shard manifests account
for all of them; (b) decontamination — the per-shard pre-flight over
the EXPORTED corpus reports zero contaminated documents, because the
contaminated set was excised upstream; (c) density — every shard's
max position equals its row count; (d) id uniqueness — the sharder
runs with check_unique_ids=True, so a broken keep-list fails loudly
here rather than corrupting shard byte order.

Scale shape (the 100 TB argument, stage by stage): the gates and the
chunker are embarrassingly parallel map stages; dedup shuffles carry
hashes and ids, never text; the holdout/contamination benchmark side
broadcasts; allocation is a |langs|-row relation; the sharder performs
ONE range exchange; manifests and pre-flights are n_shards-row
aggregates off id-keyed joins.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    dedup,
    export,
    sampling,
    textops,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

N_SHARDS = 4
SEED = "pretrain-build"
CONTAM_THRESHOLD = 0.3
CHUNK_TOKENS = 48
PACK_BUDGET = 192


def main(sf_dir: str = "/root/testdata/sf0.001", out_dir: str | None = None) -> dict:
    spark = get_session("pretraining-corpus-build")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = out_dir or tempfile.mkdtemp(prefix="pretrain_build_")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    counts = {"raw_docs": docs.count()}

    # --- curation: gates, then dedup families ---------------------------
    scored = textops.quality_score(docs, "doc_id", "text")
    docs = docs.join(
        scored.filter(F.col("quality_score") >= 0.5).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    rep = textops.repetition_signals(docs, "doc_id", "text")
    docs = docs.join(
        rep.filter(
            (F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)) <= 0.5)
            & (F.coalesce(F.col("top_token_frac"), F.lit(1.0)) <= 0.3)
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    counts["after_gates"] = docs.count()

    docs = docs.join(
        dedup.dedup_exact(docs, "text", "doc_id").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clusters = dedup.connected_components(pairs)
    docs = docs.join(
        clusters.filter(F.col("doc_id") != F.col("component_id")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    counts["after_dedup"] = docs.count()

    # --- holdout + decontamination (before any packing) ------------------
    holdout = textops.stratified_take(docs, "lang", "doc_id", 5)
    counts["holdout_docs"] = holdout.count()
    bench = holdout.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    train = docs.join(holdout.select("doc_id"), "doc_id", "left_anti")
    contaminated = (
        textops.contamination_check(
            train, bench, "doc_id", "text", "bench_id", "bench_text", n=5
        )
        .filter(F.col("contamination") >= CONTAM_THRESHOLD)
        .select("doc_id")
        .distinct()
    )
    counts["contaminated_excised"] = contaminated.count()
    train = train.join(contaminated, "doc_id", "left_anti")
    counts["train_docs"] = train.count()

    # --- mixture: tau=0.5 allocation -> fractional-epoch factors ---------
    # budget ABOVE the pool size on purpose: temperature flattening gives
    # low-resource langs a super-proportional share, so their factor
    # exceeds 1 and the mix UPSAMPLES them (fractional epochs) while
    # high-resource langs thin - both directions through one operator.
    budget = max(int(counts["train_docs"] * 1.5), 1)
    alloc = sampling.temperature_allocation(train, "lang", budget=budget)
    # groups-scale collect (|langs| rows): planned_docs / n_docs is the
    # epochs factor, snapped to 1/10000 ticks (the samplers' grid)
    factors = {
        r["lang"]: round(10_000.0 * r["planned_docs"] / r["n_docs"]) / 10_000.0
        for r in alloc.collect()
        if r["n_docs"] > 0
    }
    mixed = sampling.mixture_upsample(train, "doc_id", "lang", factors)
    # replicas become distinct corpus units via the composite key -
    # every downstream stage (chunk ids, pack order, shard ids) is
    # keyed on replica_id, so "2.3 epochs of a doc" never collides
    mixed = mixed.withColumn(
        "replica_id", F.concat_ws("#", F.col("doc_id"), F.col("copy_idx"))
    )
    counts["mixed_replicas"] = mixed.count()
    counts["upsampled_langs"] = sum(1 for f in factors.values() if f > 1.0)

    # --- chunk -> pack: bins are the training sequences ------------------
    chunks = textops.chunk_documents(
        mixed, "replica_id", "text", chunk_tokens=CHUNK_TOKENS, overlap=8
    )
    packed = textops.pack_chunks(
        chunks, "replica_id", ["replica_id", "chunk_id"], "chunk_tokens",
        budget=PACK_BUDGET,
    )
    chunk_tokens = chunks.agg(F.sum("chunk_tokens")).first()[0] or 0
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("bin_tokens"),
    )
    counts["chunks"] = chunks.count()
    counts["bins"] = bins.count()

    # --- sharded export: unique-id contract checked LOUDLY ---------------
    sharded = export.shard_positions(
        bins, "bin_id", N_SHARDS, seed=SEED, check_unique_ids=True
    )
    shards_path = f"{out_dir}/shards"
    export.write_training_shards(sharded, shards_path, N_SHARDS)
    manifest = export.shard_manifest(sharded, {"total_tokens": "bin_tokens"}).collect()

    # --- per-shard contamination pre-flight over the EXPORTED corpus -----
    # bins carry docs through the pack membership relation; a shard is
    # contaminated iff any member doc of any of its bins is flagged.
    # Decontamination ran upstream, so this MUST report zero — the
    # pre-flight proves the property to the loader, n_shards rows.
    flagged_members = (
        packed.select(
            F.split(F.col("replica_id"), "#").getItem(0).cast("long").alias("doc_id"),
            "bin_id",
        )
        .join(contaminated, "doc_id", "left_semi")
        .select("bin_id")
        .distinct()
    )
    preflight = (
        sharded.join(
            flagged_members.withColumn("_flag", F.lit(1)), "bin_id", "left"
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.coalesce(F.col("_flag"), F.lit(0))).alias("n_contaminated"),
        )
        .collect()
    )

    # --- inline proofs ----------------------------------------------------
    manifest_tokens = sum(r.total_tokens for r in manifest)
    bin_tokens = bins.agg(F.sum("bin_tokens")).first()[0] or 0
    written = spark.read.parquet(shards_path).count()
    summary = {
        **counts,
        "shards": len(manifest),
        "written_bins": written,
        "tokens_chunked": int(chunk_tokens),
        "tokens_binned": int(bin_tokens),
        "tokens_in_manifest": int(manifest_tokens),
        "token_conservation": int(chunk_tokens)
        == int(bin_tokens)
        == int(manifest_tokens),
        "dense": all(r.max_pos == r.n_docs for r in manifest),
        "preflight_contaminated": int(sum(r.n_contaminated for r in preflight)),
        "out_dir": out_dir,
    }
    assert summary["token_conservation"], "pack/export lost or forged tokens"
    assert summary["dense"], "shard positions are not dense"
    assert summary["preflight_contaminated"] == 0, (
        "contaminated docs reached the export despite upstream excision"
    )
    assert summary["written_bins"] == summary["bins"]
    for k, v in summary.items():
        print(f"{k}: {v}")
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
