"""Reproduce the round-13 second-session ABAB A/B: the one-py4j-call
literal/fold fast paths vs the element-by-element F.lit + Python-lambda
HOF construction they replaced.

Methodology (NOTES.md benchmark discipline): ONE Spark session, fits
warmed first, then NEW/OLD/NEW/OLD blocks of min-of-3 per query — only
same-session back-to-back deltas are decisions on this hardware. "OLD"
is recovered by monkeypatching util.vec_sql/mat_sql to refuse rendering,
which routes every helper through its F.lit fallback and sq_dists_expr
through the HOF Column path (construction-identical to the pre-fast-path
code; results are bit-identical either way, which is what makes the A/B
clean).

Run:  python tools/ab_literal_fastpath.py   # from /root/repo, idle box
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "similarity_topk_ivf_pq",
    "similarity_topk_ivf2_sq8",
    "semantic_dedup_pairs",
    "zca_whitened_scores",
    "similarity_topk_ivf",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    from etl_fuel_priceguide_ec2_spark.operators import clustering, util
    from etl_fuel_priceguide_ec2_spark.registry import queries

    qs = queries()

    def measure(tag: str) -> dict[str, float]:
        out = {}
        for name in QUERIES:
            reps = []
            for _ in range(3):
                t = time.time()
                qs[name](spark, sf).collect()
                reps.append(time.time() - t)
            out[name] = min(reps)
        print(tag, {k: round(v, 2) for k, v in out.items()}, flush=True)
        return out

    def set_fastpath(on: bool) -> None:
        if on:
            util.vec_sql, util.mat_sql = real_vec, real_mat
            clustering.mat_sql = real_mat
        else:
            util.vec_sql = lambda v: None
            util.mat_sql = lambda r: None
            clustering.mat_sql = util.mat_sql

    real_vec, real_mat = util.vec_sql, util.mat_sql
    for name in QUERIES:  # warm the per-corpus fit caches once
        qs[name](spark, sf).collect()

    blocks: list[tuple[str, dict[str, float]]] = []
    for tag, on in (("NEW1", True), ("OLD1", False), ("NEW2", True), ("OLD2", False)):
        set_fastpath(on)
        blocks.append((tag, measure(tag)))
    set_fastpath(True)

    new = {n: min(b[n] for t, b in blocks if t.startswith("NEW")) for n in QUERIES}
    old = {n: min(b[n] for t, b in blocks if t.startswith("OLD")) for n in QUERIES}
    for n in QUERIES:
        print(f"{n}: new {new[n]:.2f}s old {old[n]:.2f}s ratio {new[n] / old[n]:.2f}x")
    tn, to = sum(new.values()), sum(old.values())
    print(f"TOTALS new {tn:.2f}s old {to:.2f}s ratio {tn / to:.3f}x")
    spark.stop()


if __name__ == "__main__":
    main()
