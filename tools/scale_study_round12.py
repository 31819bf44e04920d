"""Round-12 operator scaling study: the mixture/export composition
tier + the pHash keep-list at sf0.001 / 0.01 / 0.1.

documents grows a true decade per step (500 -> 5 000 -> 50 000 at the
parquet level; fixtures load 500/10 000/10 000 doc rows per the
catalog's sf slicing — growth factors below use the ACTUAL loaded
row-count ratio sf0.01 -> sf0.1, verified at runtime, not assumed).

Claims under test, printed as facts:
- mixture_upsample_epochs: pure map + bounded explode — alpha ~ the
  scan, output rows ~ 1.47x input (0.5/2.5/1.25 mix over ~1/3 langs).
- training_mix_shard_manifest: map keys + an (8 x |langs|)-row
  aggregate; the report size is CONSTANT in corpus size.
- training_export_upsampled_manifest: upsample + ONE range exchange
  (global rank) + n_shards-row aggregates — the most expensive shape
  in the tier, still rank-bound, never window-per-shard.
- pack_fill_rates: the flat pack's single-reducer running-sum window
  dominates (the documented §4 caveat of flat pack_chunks); the
  report itself is <= 11 rows at every sf.
- image_phash_keeplist: Arrow-batched decode+DCT per image (map) +
  the banded pair join + CC — pair volume, not corpus volume, drives
  the tail.

Run: python tools/scale_study_round12.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_fuel_priceguide_ec2_spark import registry  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"
OPS = [
    "mixture_upsample_epochs",
    "training_mix_shard_manifest",
    "training_export_upsampled_manifest",
    "pack_fill_rates",
    "image_phash_keeplist",
]


def main() -> None:
    spark = get_session("scale-study-r12", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    growth = (
        load_table(spark, f"{ROOT}/sf0.1", "documents").count()
        / load_table(spark, f"{ROOT}/sf0.01", "documents").count()
    )
    print(f"# documents growth sf0.01 -> sf0.1: x{growth:.2f}")

    results = []
    for sf in SFS:
        d = f"{ROOT}/{sf}"
        for name in OPS:
            best = 9e9
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            rec = {"op": name, "sf": sf, "out_rows": rows, "sec": round(best, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n# alpha over the real growth step (sec ~ input^alpha; 1.0 = linear)")
    by = {(r["op"], r["sf"]): r for r in results}
    for name in OPS:
        a, b = by[(name, "sf0.01")], by[(name, "sf0.1")]
        alpha = math.log(b["sec"] / a["sec"]) / math.log(growth)
        print(
            f"{name:>38} sf0.01->sf0.1 (x{growth:.1f}) alpha={alpha:.2f} "
            f"sec {a['sec']} -> {b['sec']} rows {a['out_rows']} -> {b['out_rows']}"
        )


if __name__ == "__main__":
    main()
