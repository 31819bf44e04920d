"""Round-9 operator scaling study: the curation capstone and the
three closure queries at sf0.001 / 0.01 / 0.1.

The documents table is 500 rows at BOTH sf0.001 and sf0.01 and 5000
at sf0.1, so the only real decade is sf0.01 -> sf0.1 (alpha is
computed there); customers grow 150 -> 1500 -> 15000 (two decades for
the SymSpell tiers).

Claims under test, printed as facts:
- corpus_curation_decision: every stage is the already-audited plan of
  its signal operator; the composition adds id-keyed joins only, so
  wall time ~ the sum of parts and alpha tracks the dominant miner
  (the SSJoin), never corpus^2.
- containment_keeplist / image_ahash_keeplist: the CC closure adds a
  fixpoint over the (tiny) pair relation — alpha tracks pair mining.
- symspell d2 vs d1: the depth-2 neighborhood multiplies variant rows
  ~L/2 (L=18 fixture names), and out_rows grows with the lev<=2 pair
  density of the zero-padded vocabulary — the join stays
  vocabulary-sized at every sf.

Run: python tools/scale_study_round9.py
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

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"
OPS = [
    "corpus_curation_decision",
    "containment_keeplist",
    "image_ahash_keeplist",
    "symspell_edit1_pairs",
    "symspell_edit2_pairs",
]


def main() -> None:
    spark = get_session("scale-study-r9", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
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

    print("\n# alpha over the real decade (sec ~ input^alpha; 1.0 = linear)")
    by = {(r["op"], r["sf"]): r for r in results}
    for name in OPS:
        # documents-backed ops: the only real decade is sf0.01 -> sf0.1;
        # customer-backed (symspell): two decades from sf0.001
        lo, hi, decades = ("sf0.01", "sf0.1", 1.0)
        if name.startswith("symspell"):
            lo, hi, decades = ("sf0.001", "sf0.1", 2.0)
        a, b = by[(name, lo)], by[(name, hi)]
        alpha = math.log(b["sec"] / a["sec"]) / (decades * math.log(10))
        print(
            f"{name:>26} {lo}->{hi} alpha={alpha:.2f} "
            f"sec {a['sec']} -> {b['sec']} rows {a['out_rows']} -> {b['out_rows']}"
        )


if __name__ == "__main__":
    main()
