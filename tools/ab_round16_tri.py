"""Round-16 A/B: triangle_counts — (a) corners as a 3-branch union of
the tri relation (r15 form: the wedge SMJ re-expands under each branch,
3 executions in the final plan) vs one explode pass; (b) additionally
pinning the mined pair relation so the 12-scan mining subtree stops
running under both the oe construction AND the final degree join. Same
session, interleaved, noop-timed, on the registry query's part co-order
graph at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import graph as _graph
from etl_fuel_priceguide_ec2_spark.operators.util import round_like_duckdb
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"
RANK_BASE = 1_000_000_000


def mined_pairs(spark):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("ok")
    )
    return (
        l1.join(l2, "ok")
        .filter(F.col("a") < F.col("b"))
        .join(urgent, "ok")
        .select("a", "b")
        .distinct()
    )


def tri_variant(pairs: DataFrame, corners_mode: str, pin_pairs: bool) -> DataFrame:
    e = pairs.select(F.col("a").alias("_a"), F.col("b").alias("_b"))
    if pin_pairs:
        e = e.localCheckpoint(eager=True)
    ends = e.select(F.col("_a").alias("node")).unionAll(
        e.select(F.col("_b").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    rk = deg.select(
        "node",
        (F.col("degree").cast("long") * F.lit(RANK_BASE) + F.col("node")).alias(
            "rankkey"
        ),
    )
    oe = (
        e.join(rk.select(F.col("node").alias("_a"), F.col("rankkey").alias("_rka")), "_a")
        .join(rk.select(F.col("node").alias("_b"), F.col("rankkey").alias("_rkb")), "_b")
        .select(
            F.when(F.col("_rka") < F.col("_rkb"), F.col("_a"))
            .otherwise(F.col("_b"))
            .alias("u"),
            F.when(F.col("_rka") < F.col("_rkb"), F.col("_b"))
            .otherwise(F.col("_a"))
            .alias("v"),
            F.greatest("_rka", "_rkb").alias("rkv"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = oe.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"), "rkv")
    e2 = oe.select(F.col("u").alias("w_u"), F.col("v").alias("w_w"), F.col("rkv").alias("rkw"))
    wedges = e1.join(e2, "w_u").filter(F.col("rkv") < F.col("rkw"))
    closing = oe.select(F.col("u").alias("w_v"), F.col("v").alias("w_w"))
    tri = wedges.join(closing, ["w_v", "w_w"]).select("w_u", "w_v", "w_w")
    if corners_mode == "union":
        corners = (
            tri.select(F.col("w_u").alias("node"))
            .unionAll(tri.select(F.col("w_v").alias("node")))
            .unionAll(tri.select(F.col("w_w").alias("node")))
        )
    else:
        corners = tri.select(
            F.explode(F.array("w_u", "w_v", "w_w")).alias("node")
        )
    per_node = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            round_like_duckdb(
                (F.coalesce(F.col("n_triangles"), F.lit(0)) * 2).cast("double")
                / (F.col("degree").cast("long") * (F.col("degree") - 1)).cast("double"),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def main() -> None:
    spark = get_session("ab-r16-tri")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = mined_pairs(spark)

    base = sorted(map(tuple, _graph.triangle_counts(pairs).collect()))
    expl = sorted(map(tuple, tri_variant(pairs, "explode", False).collect()))
    expl_pin = sorted(map(tuple, tri_variant(pairs, "explode", True).collect()))
    assert expl == base and expl_pin == base, "outputs differ!"
    print(f"outputs identical ({len(base)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cur, ex, exp = [], [], []
    for _ in range(4):
        cur.append(run(lambda: _graph.triangle_counts(pairs)))
        ex.append(run(lambda: tri_variant(pairs, "explode", False)))
        exp.append(run(lambda: tri_variant(pairs, "explode", True)))
    print("current      :", [round(x, 3) for x in cur], "min", round(min(cur), 3))
    print("explode      :", [round(x, 3) for x in ex], "min", round(min(ex), 3))
    print("explode+pin  :", [round(x, 3) for x in exp], "min", round(min(exp), 3))


if __name__ == "__main__":
    main()
