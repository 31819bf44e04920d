"""Round-14 operator scaling study: the residual IVF-PQ rung and the
streaming ANN query stream at sf0.001 / 0.01 / 0.1.

Claims under test, printed as facts:
- similarity_topk_ivf_pq_residual: same corpus-side cost class as the
  raw rung (the encode is per-corpus state; the search scans codes) —
  the residual form's extra cost is the per-probed-cell query ADC
  tables, which scale with nprobe x queries, NOT the corpus. Expect
  near-flat sec over the embeddings growth step, like the raw rung.
- ann_query_stream: per-micro-batch serving cost over the persisted
  code store — measured as the wall of a 3-batch availableNow run.
  Steady-state cost is per-query; the corpus enters only through the
  ~nprobe/cells code-scan fraction and the bounded rerank.

Run: python tools/scale_study_round14.py
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
from etl_fuel_priceguide_ec2_spark.streaming import feeds  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"
OPS = ["similarity_topk_ivf_pq", "similarity_topk_ivf_pq_residual"]
# the round-14 eval/monitoring tier: kfold + drift are map-shaped
# (expect alpha ~<= 1 over their driving table); the savings report is
# dominated by the keep-list mining; recall adds one broadcast exact
# pass over the corpus on top of the PQ search
DOC_OPS = ["kfold_assignments", "dedup_savings_report"]
EMB_OPS2 = ["ann_recall_ivf_pq", "embedding_snapshot_drift"]


def _stream_case(spark, d: str, work: Path) -> tuple[float, int]:
    """3-micro-batch availableNow ANN serve over a persisted code
    store; returns (wall sec, result rows)."""
    emb = load_table(spark, d, "embeddings")
    cents = clustering.fit_centroids(emb, "vec_id", "embedding", k=8, iters=1)
    books = clustering.fit_pq_codebooks(
        emb, "vec_id", "embedding", m=8, ks=8, iters=1
    )
    codes_path = str(work / "codes")
    similarity.pq_encode(emb, "vec_id", "embedding", cents, books).write.mode(
        "overwrite"
    ).parquet(codes_path)
    queries = emb.filter(F.col("vec_id") < 30)
    src = str(work / "queries")
    for i in range(3):
        queries.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(work / "topk")
    t0 = time.perf_counter()
    q = feeds.ann_query_stream(
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        codes_path,
        emb,
        out,
        str(work / "ckpt"),
        "vec_id",
        "embedding",
        cents,
        books,
        k=5,
        nprobe=2,
        rerank_m=50,
    )
    q.awaitTermination(300)
    sec = time.perf_counter() - t0
    return sec, spark.read.parquet(out).count()


def main() -> None:
    spark = get_session("scale-study-r14", extra_conf={"spark.ui.enabled": "false"})
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
        for name in OPS + DOC_OPS + EMB_OPS2:
            best = 9e9
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            rec = {"op": name, "sf": sf, "out_rows": rows, "sec": round(best, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        work = Path(tempfile.mkdtemp(prefix=f"annstream_{sf}_"))
        try:
            sec, rows = _stream_case(spark, d, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        rec = {
            "op": "ann_query_stream_3batches",
            "sf": sf,
            "out_rows": rows,
            "sec": round(sec, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n# alpha over the real growth step (sec ~ input^alpha; 1.0 = linear)")
    by = {(r["op"], r["sf"]): r for r in results}
    for name in OPS + EMB_OPS2 + ["ann_query_stream_3batches"] + DOC_OPS:
        g = doc_growth if name in DOC_OPS else growth
        a, b = by[(name, "sf0.01")], by[(name, "sf0.1")]
        alpha = math.log(b["sec"] / a["sec"]) / math.log(g)
        print(
            f"{name:>38} sf0.01->sf0.1 (x{g:.1f}) alpha={alpha:.2f} "
            f"sec {a['sec']} -> {b['sec']} rows {a['out_rows']} -> {b['out_rows']}"
        )


if __name__ == "__main__":
    main()
