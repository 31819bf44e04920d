"""Round-16 A/B: hits() with per-phase pins (r15 form) vs fully-lazy
phases relying on runtime exchange reuse to dedupe the raw->(total,
next-join) diamond. Same session, interleaved, noop-timed, on the
registry query's trade graph at sf0.1 (iters=3)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import graph as _graph
from etl_fuel_priceguide_ec2_spark.operators.graph import round_like_duckdb
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def lazy_hits(edges: DataFrame, src="src", dst="dst", iters=3) -> DataFrame:
    """hits() with every per-phase pin removed (edge/node pins kept)."""
    pin = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    e = pin(edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct())
    nodes = pin(
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    _dec = "decimal(38,12)"

    def _norm(raw_col, tot_col):
        return F.when(tot_col.isNull() | (tot_col == 0), F.lit(0.0)).otherwise(
            round_like_duckdb(
                F.coalesce(raw_col, F.lit(0).cast(_dec)).cast("double")
                / tot_col.cast("double"),
                12,
            )
        )

    raw = nodes.select("node", F.lit(1).cast(_dec).alias("_raw"))
    tot = raw.agg(F.sum("_raw").alias("_t"))
    raw_a, tot_a = None, None

    def _phase(raw_prev, tot_prev, join_on, group_on):
        raw_i = (
            e.join(raw_prev, e[join_on] == raw_prev["node"])
            .crossJoin(F.broadcast(tot_prev))
            .select(
                F.col(group_on).alias("node"),
                _norm(F.col("_raw"), F.col("_t")).cast(_dec).alias("_r"),
            )
            .groupBy("node")
            .agg(F.sum("_r").alias("_raw"))
        )
        return raw_i, raw_i.agg(F.sum("_raw").alias("_t"))

    for _ in range(iters):
        raw_a, tot_a = _phase(raw, tot, "_s", "_d")
        raw, tot = _phase(raw_a, tot_a, "_d", "_s")

    def _complete(raw_f, tot_f, out):
        return (
            nodes.join(raw_f, "node", "left")
            .crossJoin(F.broadcast(tot_f))
            .select("node", _norm(F.col("_raw"), F.col("_t")).alias(out))
        )

    return (
        _complete(raw, tot, "hub")
        .join(_complete(raw_a, tot_a, "auth"), "node")
        .select("node", "hub", "auth")
    )


def main() -> None:
    spark = get_session("ab-r16-hits")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    edges = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )

    a = sorted(map(tuple, _graph.hits(edges, iters=3).collect()))
    b = sorted(map(tuple, lazy_hits(edges, iters=3).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(edges, iters=3).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(lambda e, iters: _graph.hits(e, iters=iters)))
        news.append(run(lambda e, iters: lazy_hits(e, iters=iters)))
    print("pinned:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("lazy:  ", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
