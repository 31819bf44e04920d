"""Sketch-tier scaling study: the fixed-state claim, measured.

Every sketch here (HLL registers, CMS registers, DDSketch bins, Bloom
words) promises the same shape: input rows fold map-side into a
BOUNDED integer state, so wall time should track the SCAN (alpha <= 1
with small constants) while the shuffled state stays constant. This
study times each sketch at sf0.001 / sf0.01 / sf0.1 (100x row growth)
and prints the state-row count alongside, so the claim is a printed
fact, not prose.

Run: python tools/scale_study_sketches.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import sketches  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"


def main() -> None:
    spark = get_session("scale-study-sketches", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for sf in SFS:
        d = f"{ROOT}/{sf}"
        events = load_table(spark, d, "events")
        orders = load_table(spark, d, "orders")
        docs = load_table(spark, d, "documents")
        n_events = events.count()
        tokens = docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        ).filter(F.col("token") != "")
        cases = {
            # (builder, state-row relation for the size column)
            "hll_events": (
                lambda: sketches.hll_cardinality(events, "event_id", b=8),
                lambda: sketches.hll_registers(events, "event_id", b=8),
            ),
            "cms_tokens": (
                lambda: sketches.cms_point_counts(
                    tokens, "token", ["join", "hash", "scan"], d=4, w=512
                ),
                lambda: tokens.limit(0),  # d*w bound; probe result is the state user
            ),
            "dd_orders": (
                lambda: sketches.dd_quantiles(orders, "o_totalprice"),
                lambda: orders.filter(F.col("o_totalprice") > 0)
                .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("_c"))
                .select(F.length(F.bin("_c")).alias("bl"))
                .distinct(),
            ),
            "bloom_orders": (
                lambda: sketches.bloom_membership_report(
                    orders.filter(F.col("o_totalprice") > 400000),
                    load_table(spark, d, "lineitem"),
                    "o_orderkey",
                    "l_orderkey",
                ),
                lambda: orders.limit(0),  # n_words bound
            ),
        }
        for name, (fn, state_fn) in cases.items():
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
        decades = math.log10(
            {"sf0.01": 10, "sf0.1": 100}[r["sf"]]
        )
        alpha = math.log(r["sec"] / base[r["op"]]) / (decades * math.log(10))
        print(f"{r['op']:>14} {r['sf']:<7} alpha={alpha:.2f} sec={r['sec']}")


if __name__ == "__main__":
    main()
