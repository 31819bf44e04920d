"""Round-6 operator scaling study: KMV set sketch, BM25 retrieval,
BPE pair counting at sf0.001 / sf0.01 / sf0.1 (100x row growth).

Claims under test, printed as facts:
- kmv: the sketch STATE stays <= k rows while input grows 100x; wall
  time tracks the distinct-hash scan (alpha <= 1, overhead-bound at
  local scales).
- bm25: the scored relation is bounded by query-term postings (not
  corpus vocabulary) — out_rows stays topk*|queries| while the corpus
  grows 100x; time tracks the token scan.
- bpe: pair key space is bounded by |alphabet|^2 — the aggregate
  output is constant while input grows.

Run: python tools/scale_study_round6.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    retrieval,
    sketches,
    textops,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"
QUERY_TERMS = [(1, "spark"), (1, "query"), (2, "hash"), (2, "join"), (2, "merge")]


def main() -> None:
    spark = get_session("scale-study-r6", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark.createDataFrame(QUERY_TERMS, "query_id int, token string")
    results = []
    for sf in SFS:
        d = f"{ROOT}/{sf}"
        events = load_table(spark, d, "events")
        docs = load_table(spark, d, "documents")
        n_events = events.count()
        a = events.filter((F.col("event_type") == "click") & (F.col("user_id") < 100))
        b = events.filter((F.col("event_type") == "view") & (F.col("user_id") >= 50))
        cases = {
            "kmv_intersection": lambda: sketches.kmv_intersection_report(
                a, b, "user_id", "user_id", k=64
            ),
            "kmv_sketch_events": lambda: sketches.kmv_sketch(
                events, "event_id", k=256
            ),
            "bm25_topk": lambda: retrieval.bm25_topk(
                docs, queries, "doc_id", "text", topk=5
            ),
            "bpe_pairs": lambda: textops.bpe_merge_candidates(docs, "text", k=20),
        }
        for name, fn in cases.items():
            best = 9e9
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn().count()
                best = min(best, time.perf_counter() - t0)
            rec = {
                "op": name,
                "sf": sf,
                "events_rows": n_events,
                "out_rows": rows,
                "sec": round(best, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    base = {r["op"]: r["sec"] for r in results if r["sf"] == SFS[0]}
    print("\n# per-decade alpha (sec ~ rows^alpha; 1.0 = linear)")
    for r in results:
        if r["sf"] == SFS[0]:
            continue
        decades = math.log10({"sf0.01": 10, "sf0.1": 100}[r["sf"]])
        alpha = math.log(r["sec"] / base[r["op"]]) / (decades * math.log(10))
        print(f"{r['op']:>18} {r['sf']:<7} alpha={alpha:.2f} sec={r['sec']}")


if __name__ == "__main__":
    main()
