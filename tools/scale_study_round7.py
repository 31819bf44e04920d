"""Round-7 operator scaling study: exact-substring spans, span
coverage, and quality-classifier inference at sf0.001 / 0.01 / 0.1
(100x row growth).

Claims under test, printed as facts:
- exact_substring: candidate volume is bounded by the gram-frequency
  cap (sum of f^2 over surviving grams), NOT corpus^2 — with the
  planted-quote corpus the span count grows linearly with docs, and
  wall time tracks the gram scan (alpha ~ 1).
- span_coverage: adds one tiny spans-relation window on top — same
  scaling as the spans op itself.
- quality_classifier: broadcast-model inference — out_rows == docs,
  time tracks the token scan (alpha ~ 1, overhead-bound locally).

Run: python tools/scale_study_round7.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import dedup, textops  # noqa: E402
from etl_fuel_priceguide_ec2_spark.registry.curation import (  # noqa: E402
    _QC_BUCKETS,
    _QC_LEXICON,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"


def _planted_corpus(docs):
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    return docs.unionAll(twins)


def main() -> None:
    spark = get_session("scale-study-r7", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    lex = spark.createDataFrame(
        _QC_LEXICON, "term string, weight string"
    ).selectExpr("term", "CAST(weight AS DECIMAL(12,6)) AS weight")
    weights = textops.quality_classifier_weights(lex, n_buckets=_QC_BUCKETS)
    results = []
    for sf in SFS:
        d = f"{ROOT}/{sf}"
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        n_docs = docs.count()
        corpus = _planted_corpus(docs)
        cases = {
            "exact_substring_spans": lambda: dedup.exact_substring_spans(
                corpus, "doc_id", "text", k=8, min_span_tokens=30, max_gram_freq=64
            ),
            "span_coverage": lambda: dedup.duplicated_span_coverage(
                corpus, "doc_id", "text", k=8, min_span_tokens=30, max_gram_freq=64
            ),
            "quality_classifier": lambda: textops.quality_classifier_scores(
                docs, "doc_id", "text", weights, n_buckets=_QC_BUCKETS
            ),
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
                "docs_rows": n_docs,
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
        print(f"{r['op']:>22} {r['sf']:<7} alpha={alpha:.2f} sec={r['sec']}")


if __name__ == "__main__":
    main()
