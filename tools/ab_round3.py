"""Same-session A/B runs for round-3 perf decisions (VERDICT r02 items
6 and 7). This box shows ±60% session-to-session drift, so only
back-to-back runs inside ONE SparkSession are decisions (NOTES.md).

A: dedup_clusters — connected_components size_to_graph=True (per-plan
   repartition to the graph size) vs False (session shuffle.partitions).
B: skewed-corpus SSJoin — prefix_filter='auto' with cached corpus stats
   vs pinned prefix_filter=True on the same boilerplate corpus (the
   delta is the amortized probe cost, which should be ~0).

Usage: python tools/ab_round3.py [sf_dir]  (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_fuel_priceguide_ec2_spark import registry  # noqa: E402
from etl_fuel_priceguide_ec2_spark.operators import dedup  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 3


def timeit(label, thunk):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        thunk().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: min={min(times)} reps={times}", flush=True)
    return min(times)


def main():
    spark = get_session("ab-round3")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warmup
    qs["projection_rename"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    print(f"== A: dedup_clusters size_to_graph A/B at {SF_DIR} ==")

    def clusters(size_to_graph: bool):
        # mirrors the bench query q_dedup_clusters exactly
        docs = load_table(spark, SF_DIR, "documents")
        pairs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
        )
        return dedup.connected_components(pairs, size_to_graph=size_to_graph)

    # interleave to cancel slow drift: on, off, on, off ...
    a_on = timeit("clusters size_to_graph=True ", lambda: clusters(True))
    a_off = timeit("clusters size_to_graph=False", lambda: clusters(False))
    a_on2 = timeit("clusters size_to_graph=True #2", lambda: clusters(True))
    a_off2 = timeit("clusters size_to_graph=False #2", lambda: clusters(False))
    print(
        f"A verdict: on={min(a_on, a_on2)} off={min(a_off, a_off2)} "
        f"ratio on/off={min(a_on, a_on2) / min(a_off, a_off2):.2f}"
    )

    print(f"== B: skewed SSJoin auto(cached stats) vs pinned prefix at {SF_DIR} ==")
    from etl_fuel_priceguide_ec2_spark.registry import _boilerplate_docs

    docs = _boilerplate_docs(spark, SF_DIR)
    stats = dedup.corpus_skew_stats(docs, "doc_id", "text", n=3)
    print(f"corpus_skew_stats: {stats}")

    def ssjoin_auto():
        return dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5,
            prefix_filter="auto", skew_stats=stats,
        )

    def ssjoin_pinned():
        return dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True
        )

    b_auto = timeit("ssjoin auto+cached ", ssjoin_auto)
    b_pin = timeit("ssjoin pinned prefix", ssjoin_pinned)
    print(f"B verdict: auto={b_auto} pinned={b_pin} ratio={b_auto / b_pin:.2f}")


if __name__ == "__main__":
    main()
