"""Round-16 A/B: pagerank without per-iteration rank pinning vs the r15
pinned form, at the registry-query level (pagerank_supplier_customer's
exact edge relation at sf0.1). Same session, interleaved, noop-timed."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import graph as _graph
from etl_fuel_priceguide_ec2_spark.operators.util import round_like_duckdb
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_pagerank(edges, src="src", dst="dst", iters=5, damping=0.85) -> DataFrame:
    pin = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    e = pin(edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct())
    nodes = pin(
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    e_deg = pin(e.join(deg, "_s"))
    ranks = nodes.select(
        "node", round_like_duckdb(F.lit(1.0) / F.lit(float(n)), 12).alias("pr")
    )
    teleport = F.lit((1.0 - damping)) / F.lit(float(n))
    for _ in range(iters):
        contrib = (
            e_deg.join(ranks, e_deg["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                round_like_duckdb(F.col("pr") / F.col("_deg"), 12)
                .cast("decimal(38,12)")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s_c"))
        )
        ranks = pin(
            nodes.join(contrib, "node", "left").select(
                "node",
                round_like_duckdb(
                    teleport
                    + F.lit(float(damping))
                    * F.coalesce(F.col("_s_c").cast("double"), F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
        )
    return ranks


def main() -> None:
    spark = get_session("ab-r16-pr")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    pairs = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )

    def topk(ranks):
        w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
        return (
            ranks.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 20)
            .select("node", "pr", "rank")
        )

    a = sorted(map(tuple, topk(old_pagerank(edges)).collect()))
    b = sorted(map(tuple, topk(_graph.pagerank(edges, iters=5, damping=0.85)).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        topk(fn()).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(lambda: old_pagerank(edges)))
        news.append(run(lambda: _graph.pagerank(edges, iters=5, damping=0.85)))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
