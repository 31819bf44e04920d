"""End-to-end LLM training-data curation over the ``documents`` table —
the north-star extension tier (X1-X4) chained the way a pretraining
corpus build actually runs:

    raw docs
      → quality gate        (length/stopword/alpha heuristics)
      → repetition gate     (Gopher-style dup n-gram / top-token caps)
      → unigram-LM gate     (corpus-unigram log-prob floor)
      → exact dedup         (sha2 content hash, keep min doc_id)
      → near-dup clustering (MinHash-LSH pairs → connected components,
                             keep each cluster's canonical doc)
      → contamination gate  (word-5-gram overlap vs the eval holdout
                             benchmark — dropped BEFORE training packs)
      → PII scrub           (email/phone/SSN masking)
      → chunk               (overlapping token windows)
      → pack                (greedy token-budget bin packing)
      → stratified sample   (balanced per-language eval holdout)

Run: ``python examples/training_data_curation.py [workdir]``

Every stage is a DataFrame transform — at 100 TB the only shuffles are
the dedup group-bys / LSH band join / pack window; the quality gate,
scrub, and chunker are embarrassingly parallel map stages.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_fuel_priceguide_ec2_spark.operators import dedup, textops
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001", workdir: str | None = None) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="curation-")
    spark = get_session("training-data-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    counts = {"raw": docs.count()}

    # 1. quality gate — drop bottom-quality docs before any pairwise
    # work (cheapest filter first: map-only, prunes the quadratic stages)
    scored = textops.quality_score(docs, "doc_id", "text")
    kept_ids = scored.filter(F.col("quality_score") >= 0.5).select("doc_id")
    docs = docs.join(kept_ids, "doc_id", "left_semi")
    counts["after_quality"] = docs.count()

    # 1b. repetition gate — drop template/spam-like docs (dup n-gram
    # and top-token caps); map-only like the quality gate
    rep = textops.repetition_signals(docs, "doc_id", "text")
    rep_ok = rep.filter(
        (F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)) <= 0.5)
        & (F.coalesce(F.col("top_token_frac"), F.lit(1.0)) <= 0.3)
    ).select("doc_id")
    docs = docs.join(rep_ok, "doc_id", "left_semi")
    counts["after_repetition"] = docs.count()

    # 1c. unigram-LM gate — drop the lowest-likelihood tail (gibberish
    # / OOV-heavy); the corpus itself is the model, no external deps
    lm = textops.unigram_logprob_score(docs, "doc_id", "text")
    floor = lm.approxQuantile("avg_logprob", [0.02], 0.001)[0]
    docs = docs.join(
        lm.filter(F.col("avg_logprob") >= floor).select("doc_id"), "doc_id", "left_semi"
    )
    counts["after_unigram_lm"] = docs.count()

    # 2. exact dedup — survivors carry min doc_id per content hash
    survivors = dedup.dedup_exact(docs, "text", "doc_id").select("doc_id")
    docs = docs.join(survivors, "doc_id", "left_semi")
    counts["after_exact_dedup"] = docs.count()

    # 3. near-dup: LSH candidate pairs → verify → cluster → keep the
    # canonical (min-id) member of each cluster
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clusters = dedup.connected_components(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("component_id")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    counts["after_near_dedup"] = docs.count()

    # 4. PII scrub — masked text + per-kind hit counts
    scrubbed = textops.scrub_pii(docs, "doc_id", "text")
    docs = docs.drop("text").join(
        scrubbed.select("doc_id", F.col("scrubbed_text").alias("text")), "doc_id"
    )
    counts["pii_hits"] = (
        scrubbed.agg(
            F.sum(F.col("n_email") + F.col("n_phone") + F.col("n_ssn")).alias("s")
        ).collect()[0].s
        or 0
    )

    # 5. chunk + 6. pack
    chunks = textops.chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=16)
    counts["chunks"] = chunks.count()
    packed = textops.pack_chunks(
        chunks, "doc_id", ["doc_id", "chunk_id"], "chunk_tokens", budget=256
    )
    counts["bins"] = packed.agg(F.countDistinct("bin_id")).collect()[0][0]
    packed_path = f"{workdir}/packed"
    packed.write.mode("overwrite").parquet(packed_path)

    # 7. balanced per-language eval holdout from the curated pool
    holdout = textops.stratified_take(docs, "lang", "doc_id", 5)
    counts["holdout"] = holdout.count()
    holdout.write.mode("overwrite").parquet(f"{workdir}/holdout")

    # 8. eval hygiene: flag training docs contaminated against the
    # holdout benchmark (>=30% of an item's 5-grams) — at 100 TB the
    # benchmark side broadcasts, the corpus scan stays shuffle-free
    bench = holdout.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    train = docs.join(holdout.select("doc_id"), "doc_id", "left_anti")
    contam = textops.contamination_check(
        train, bench, "doc_id", "text", "bench_id", "bench_text", n=5
    ).filter(F.col("contamination") >= 0.3)
    counts["contaminated_train_docs"] = contam.select("doc_id").distinct().count()

    counts["workdir"] = workdir
    return counts


if __name__ == "__main__":
    out = main(*(sys.argv[1:2] or []), *(sys.argv[2:3] or []))
    for k, v in out.items():
        print(f"{k}: {v}")
