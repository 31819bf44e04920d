"""Recall-vs-cost sweep for the LSH defaults (round-1 VERDICT item 10).

Evidence for the chosen parameters instead of inherited folklore:
  * MinHash-LSH (num_hashes, bands) vs the exact SSJoin pair set at
    t=0.5 on the sf0.1 documents corpus.
  * RP-LSH (n_bits, multiprobe radius) vs exact cosine top-10 on the
    sf0.1 embeddings corpus.

Prints a markdown table; results are pinned in docs/SCALE.md.
Run alone on the box (bench discipline: never two Spark sessions).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup, similarity
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs_set(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def main() -> None:
    spark = get_session("lsh-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    t0 = time.perf_counter()
    exact = pairs_set(
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False)
    )
    exact_s = time.perf_counter() - t0
    print(f"exact SSJoin: {len(exact)} pairs in {exact_s:.1f}s\n")

    print("## MinHash-LSH sweep (t=0.5, sf0.1 documents)\n")
    print("| num_hashes | bands | r | recall | wall s |")
    print("|---|---|---|---|---|")
    for num_hashes, bands in [(64, 16), (64, 32), (128, 16), (128, 32), (128, 64), (256, 64)]:
        t0 = time.perf_counter()
        got = pairs_set(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, num_hashes=num_hashes, bands=bands, threshold=0.5
            )
        )
        dt = time.perf_counter() - t0
        recall = len(got & exact) / len(exact) if exact else 1.0
        print(f"| {num_hashes} | {bands} | {num_hashes//bands} | {recall:.3f} | {dt:.1f} |")

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    t0 = time.perf_counter()
    exact_nn = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    print(f"\nexact cosine top-10 (50 queries): {time.perf_counter()-t0:.1f}s\n")

    print("## RP-LSH sweep (k=10, 50 queries, sf0.1 embeddings)\n")
    print("| planes | multiprobe | recall | wall s |")
    print("|---|---|---|---|")
    for planes in (4, 6, 8):
        for probe in (0, 1, 2):
            t0 = time.perf_counter()
            got = {
                (r.query_id, r.neighbor_id)
                for r in similarity.cosine_topk_rplsh(
                    emb, queries, "vec_id", "embedding", k=10,
                    planes=planes, multiprobe_hamming=probe,
                ).collect()
            }
            dt = time.perf_counter() - t0
            recall = len(got & exact_nn) / len(exact_nn)
            print(f"| {planes} | {probe} | {recall:.3f} | {dt:.1f} |")


if __name__ == "__main__":
    main()
