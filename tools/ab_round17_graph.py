"""Round-17 interleaved A/B: broadcast-scores for pagerank / hits
(guide §3.1 — the score relations are node-sized; broadcasting them
leaves the edge relation unshuffled in every iteration join), measured
at the registry-query level on the sf0.1 trade graph.

Variants are the SAME operator code with broadcast_scores pinned
False (the r16 SMJ form) vs True (the r17 default under the node cap),
so the A/B isolates exactly the join-strategy change. Bit-identity
asserted on sorted rows before any timing (r16 evidence rules).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import graph
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table


def _pr_edges(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _hits_edges(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def build_pr(spark, sf_dir, bcast):
    ranks = graph.pagerank(
        _pr_edges(spark, sf_dir), iters=5, damping=0.85, broadcast_scores=bcast
    )
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )


def build_hits(spark, sf_dir, bcast):
    scores = graph.hits(_hits_edges(spark, sf_dir), iters=3, broadcast_scores=bcast)
    w = Window.orderBy(F.col("auth").desc(), F.col("node").asc())
    return (
        scores.orderBy(F.col("auth").desc(), F.col("node").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select("node", "hub", "auth", "rank")
    )


BUILDERS = {
    "pr_smj": lambda s, d: build_pr(s, d, False),
    "pr_bcast": lambda s, d: build_pr(s, d, True),
    "hits_smj": lambda s, d: build_hits(s, d, False),
    "hits_bcast": lambda s, d: build_hits(s, d, True),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab_r17_graph")
    spark.sparkContext.setLogLevel("ERROR")

    for a, b in (("pr_smj", "pr_bcast"), ("hits_smj", "hits_bcast")):
        ra = sorted(map(tuple, BUILDERS[a](spark, sf_dir).collect()))
        rb = sorted(map(tuple, BUILDERS[b](spark, sf_dir).collect()))
        assert ra == rb and ra, f"{a} vs {b}: outputs differ"
        print(f"bit-identity OK {a} vs {b} over {len(ra)} rows")

    reps = 4
    times: dict[str, list[float]] = {n: [] for n in BUILDERS}
    order = list(BUILDERS)
    for r in range(reps):
        for name in order if r % 2 == 0 else order[::-1]:
            t0 = time.perf_counter()
            BUILDERS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:10s} min {min(ts):6.3f}  reps {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
