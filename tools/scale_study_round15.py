"""Round-15 operator scaling study: the refit-decision/CV-export tier
and the pruned code-store read fraction at sf0.001 / 0.01 / 0.1.

Claims under test, printed as facts:
- pq_codebook_staleness: after the per-corpus fits are cached (the
  persisted-state pattern — rep 1 pays them), the report is two
  snapshot scans into a cells-row aggregate. Expect alpha ~<= 1 over
  the embeddings growth step; the fits themselves are the same class
  as the registered PQ rungs.
- kfold_shard_manifest: kfold_assign is pure map, positions are the
  sharder's ONE range exchange, the manifest a k*n_shards-row
  aggregate. Expect the sharder's alpha over the documents step.
- ann_recall_zorder: exact-cosine ground truth = one broadcast-query
  corpus scan over a bounded sample, plus the z-order probe. Expect
  near-linear in the corpus (the exact pass dominates).
- prune_codes_to_probed_cells: the read fraction of a cell-partitioned
  code store under a SMALL query batch is ~|probed cells|/cells by ROW
  COUNT (the partition-level pruning the plan test pins) — printed per
  sf so the ~nprobe/cells claim is a measured number, not prose. The
  batch is 2 queries on purpose: on this uniform fixture a 10-query
  batch's probes cover all 8 cells (coupon-collector), which is itself
  the honest steady-state statement — per-TRIGGER pruning pays off at
  small batch-to-cell ratios (realistic at production cell counts of
  ~sqrt(n), e.g. 100k cells), while large batches amortize a full scan.

Run: python tools/scale_study_round15.py
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark import registry  # noqa: E402
from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    clustering,
    similarity,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"
EMB_OPS = ["pq_codebook_staleness", "ann_recall_zorder"]
DOC_OPS = ["kfold_shard_manifest"]


def _prune_fraction(spark, d: str, work: Path, nprobe: int) -> dict:
    """Write a cell-partitioned code store, prune it to a 2-query
    batch's probed cells, and report the surviving row fraction."""
    emb = load_table(spark, d, "embeddings")
    cents = clustering.fit_centroids(emb, "vec_id", "embedding", k=8, iters=1)
    books = clustering.fit_pq_codebooks(
        emb, "vec_id", "embedding", m=8, ks=8, iters=1
    )
    path = str(work / "codes")
    similarity.pq_encode(emb, "vec_id", "embedding", cents, books).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 2)
    pruned = similarity.prune_codes_to_probed_cells(
        stored, queries, "vec_id", "embedding", cents, nprobe
    )
    full_n, pruned_n = stored.count(), pruned.count()
    return {
        "nprobe": nprobe,
        "store_rows": full_n,
        "pruned_rows": pruned_n,
        "read_fraction": round(pruned_n / full_n, 4),
    }


def main() -> None:
    spark = get_session("scale-study-r15", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    growth = (
        load_table(spark, f"{ROOT}/sf0.1", "embeddings").count()
        / load_table(spark, f"{ROOT}/sf0.01", "embeddings").count()
    )
    doc_growth = (
        load_table(spark, f"{ROOT}/sf0.1", "documents").count()
        / load_table(spark, f"{ROOT}/sf0.01", "documents").count()
    )
    print(f"# embeddings growth sf0.01 -> sf0.1: x{growth:.2f}")
    print(f"# documents growth sf0.01 -> sf0.1: x{doc_growth:.2f}")

    results = []
    for sf in SFS:
        d = f"{ROOT}/{sf}"
        for name in EMB_OPS + DOC_OPS:
            best = 9e9
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            rec = {"op": name, "sf": sf, "out_rows": rows, "sec": round(best, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        work = Path(tempfile.mkdtemp(prefix=f"prune_{sf}_"))
        try:
            for nprobe in (1, 2):
                rec = {"op": "code_store_prune", "sf": sf}
                rec.update(_prune_fraction(spark, d, work, nprobe))
                results.append(rec)
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print("\n# alpha over the real growth step (sec ~ input^alpha; 1.0 = linear)")
    by = {(r["op"], r["sf"]): r for r in results}
    for name in EMB_OPS + DOC_OPS:
        g = doc_growth if name in DOC_OPS else growth
        a, b = by[(name, "sf0.01")], by[(name, "sf0.1")]
        alpha = math.log(b["sec"] / a["sec"]) / math.log(g)
        print(
            f"{name}: {a['sec']} -> {b['sec']} s, alpha {alpha:.2f} "
            f"(x{g:.1f} step)"
        )


if __name__ == "__main__":
    main()
