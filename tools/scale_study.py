"""Local scaling study: how do the dedup-family operators scale as the
documents corpus grows 1x -> 3x -> 10x?

Builds enlarged corpora by REPLICATING sf0.1 documents with offset ids
and a per-replica id-salt appended to the text (distinct docs — copies
would quadratically inflate the true pair count and measure the answer
size, not the algorithm), then times the headline dedup operators at
each size. Prints one JSON line per (operator, scale).

Run: python tools/scale_study.py  (writes corpora under /tmp)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import dedup  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"
WORK = Path("/tmp/spark_graft_scale")
SCALES = [1, 3, 10]


def build(spark, mult: int) -> str:
    out = WORK / f"docs_x{mult}.parquet"
    if out.exists():
        return str(out)
    base = spark.read.parquet(BASE)
    n = base.count()
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            # suffix-salt each replica: replicas of one doc stay NEAR
            # duplicates of each other (Jaccard ~0.99), so scaling mult
            # grows near-dup FAMILIES (size = mult) — the realistic
            # web-corpus shape (mirrors/templates). The answer therefore
            # grows ~quadratically in mult while input grows linearly;
            # report BOTH rows and seconds, and judge the operators on
            # time-vs-(input+output), not a naive time-vs-input slope.
            # (An inter-token salt giving disjoint replicas was tried
            # and rejected: it doubles every shingle array and turns the
            # salt into a corpus-wide hot token, distorting every
            # operator it was supposed to measure.)
            F.concat(
                F.col("text"), F.lit(f" replica{i} doc"), F.col("doc_id").cast("string")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(8).write.mode("overwrite").parquet(str(out))
    return str(out)


def main() -> None:
    WORK.mkdir(exist_ok=True)
    spark = get_session("scale-study")
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "dedup_exact": lambda d: dedup.dedup_exact(d, "text", "doc_id"),
        "ngram_naive": lambda d: dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
        ),
        "ngram_prefix": lambda d: dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True
        ),
        "minhash_lsh": lambda d: dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5),
        "simhash": lambda d: dedup.simhash_near_pairs(d, "doc_id", "text"),
    }

    results = []
    for mult in SCALES:
        path = build(spark, mult)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        for name, fn in ops.items():
            best, rows = 1e9, None
            for _ in range(2):
                t0 = time.perf_counter()
                out = fn(docs)
                rows = out.count()  # count() = full execution + answer size
                best = min(best, time.perf_counter() - t0)
            rec = {"op": name, "mult": mult, "docs": n_docs, "rows": rows, "sec": round(best, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # scaling exponents vs the 1x measurement: sec ~ docs^alpha
    import math

    base_t = {r["op"]: r["sec"] for r in results if r["mult"] == 1}
    print("\n# scaling exponents (alpha in sec ~ docs^alpha; 1.0 = linear)")
    for r in results:
        if r["mult"] == 1:
            continue
        alpha = math.log(r["sec"] / base_t[r["op"]]) / math.log(r["mult"])
        print(f"{r['op']:>14} x{r['mult']:<3} alpha={alpha:.2f}")


if __name__ == "__main__":
    main()
