"""Round-10 operator scaling study: the embedding second-moment tier
at sf0.001 / 0.01 / 0.1.

The embeddings table is 500 rows at BOTH sf0.001 and sf0.01 and 2000
at sf0.1 (d = 64 everywhere), so the only real growth step is
sf0.01 -> sf0.1 and it is 4x, not 10x — alpha here is
log(t_hi/t_lo)/log(4). The outlier-gated capstone reads documents
(500 -> 5000, a true decade).

Claims under test, printed as facts:
- embedding_covariance: O(n*d^2) scan-bound; the result relation is
  d(d+1)/2 rows at every n, so alpha tracks the scan, never the
  output.
- pca_top2_subspace_scores: covariance + ONE more map-only projection
  scan; the driver iteration is O(d^2*iters*K) CONSTANT in n, so at
  these fixture sizes wall time is dominated by the fixed driver/plan
  overhead and alpha is sub-linear.
- embedding_outlier_zscores: one d-row stats aggregate + a map-only
  scoring pass — the cheapest op in the tier at every sf.
- embedding_pca_zorder_layout / similarity_topk_zorder: the PCA chain
  plus pure per-row codegen (layout) / a bucket equi-join whose
  candidate volume is ~3/16 of n per query (ANN probe).
- curation_decision_outlier_gated: the capstone's audited alpha plus
  one embeddings scan and an id-keyed broadcast join — the gate adds
  a constant, not a growth class.

Run: python tools/scale_study_round10.py
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
    "embedding_covariance",
    "embedding_covariance_from_state",
    "pca_top2_subspace_scores",
    "embedding_outlier_zscores",
    "embedding_pca_zorder_layout",
    "similarity_topk_zorder",
    "curation_decision_outlier_gated",
]
# growth factor of the op's input between sf0.01 and sf0.1
GROWTH = {name: 4.0 for name in OPS}
GROWTH["curation_decision_outlier_gated"] = 10.0  # documents-backed


def main() -> None:
    spark = get_session("scale-study-r10", extra_conf={"spark.ui.enabled": "false"})
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

    print("\n# alpha over the real growth step (sec ~ input^alpha; 1.0 = linear)")
    by = {(r["op"], r["sf"]): r for r in results}
    for name in OPS:
        a, b = by[(name, "sf0.01")], by[(name, "sf0.1")]
        alpha = math.log(b["sec"] / a["sec"]) / math.log(GROWTH[name])
        print(
            f"{name:>34} sf0.01->sf0.1 (x{GROWTH[name]:.0f}) alpha={alpha:.2f} "
            f"sec {a['sec']} -> {b['sec']} rows {a['out_rows']} -> {b['out_rows']}"
        )


if __name__ == "__main__":
    main()
