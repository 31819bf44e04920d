"""Round-13 operator scaling study: the audio near-dup family, the
IVF-PQ ADC rung, the by-lang fill-rate report, and the checksum
manifest at sf0.001 / 0.01 / 0.1.

The parquet fixtures hold documents 500/500/5 000 and embeddings
500/500/2 000 across sf0.001/0.01/0.1 — growth factors below use the
ACTUAL loaded row-count ratio sf0.01 -> sf0.1, verified at runtime,
not assumed (the loader overlays make the documents step a true x10);
the PQ rung's alpha is reported over the embeddings ratio.

Claims under test, printed as facts:
- audio_fingerprint_near_pairs: Arrow-batched WAV decode + band
  energies per clip (map) + the banded pair join — pair volume (class
  structure), not corpus volume, drives the tail.
- audio_fingerprint_keeplist: + HashMin CC on the pair relation only.
- similarity_topk_ivf_pq: fit cost amortized per corpus (cached); the
  timed search = encode scan + cell-probe join over codes + ADC
  lookups + rerank of 100 ids x 10 queries — candidate volume scales
  with nprobe/cells of the corpus, the report is top-k-bounded.
- pack_fill_rates_by_lang: per-lang packing windows in parallel; the
  report is <= 11 rows per lang at every sf.
- training_export_checksum_manifest: ONE range exchange (global rank)
  + a map-combined XOR aggregate; 8 rows out at every sf.

Run: python tools/scale_study_round13.py
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
    "audio_fingerprint_near_pairs",
    "audio_fingerprint_keeplist",
    "similarity_topk_ivf_pq",
    "pack_fill_rates_by_lang",
    "training_export_checksum_manifest",
]
# queries whose driver is the embeddings table, not documents
EMB_OPS = {"similarity_topk_ivf_pq"}


def main() -> None:
    spark = get_session("scale-study-r13", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    growth = {}
    for table in ("documents", "embeddings"):
        growth[table] = (
            load_table(spark, f"{ROOT}/sf0.1", table).count()
            / load_table(spark, f"{ROOT}/sf0.01", table).count()
        )
        print(f"# {table} growth sf0.01 -> sf0.1: x{growth[table]:.2f}")

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
        g = growth["embeddings" if name in EMB_OPS else "documents"]
        a, b = by[(name, "sf0.01")], by[(name, "sf0.1")]
        alpha = math.log(b["sec"] / a["sec"]) / math.log(g)
        print(
            f"{name:>38} sf0.01->sf0.1 (x{g:.1f}) alpha={alpha:.2f} "
            f"sec {a['sec']} -> {b['sec']} rows {a['out_rows']} -> {b['out_rows']}"
        )


if __name__ == "__main__":
    main()
