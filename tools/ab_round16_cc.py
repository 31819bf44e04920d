"""Round-16 A/B: connected_components fused-first-hop vs the r15 form.

Same session, interleaved A/B/A/B (min per variant), noop-sink timed.
Edge relation is mined once (ngram pairs at sf0.1) and localCheckpointed
so both variants consume identical materialized input.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_cc(pairs: DataFrame, id_a="id_a", id_b="id_b", max_iter=20) -> DataFrame:
    """The r15 form: distinct node init + join-per-hop from round 1."""
    pin = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    edges = pin(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component_id", F.col("node")
    )
    for it in range(max_iter):
        hops = 1 if it < 2 else 2
        work = labels.withColumn("_lastch", F.lit(True))
        for _ in range(hops):
            neighbor_min = (
                edges.join(work, edges.dst == work.node)
                .groupBy("src")
                .agg(F.min("component_id").alias("nbr_min"))
            )
            new_min = F.least(
                F.col("component_id"),
                F.coalesce(F.col("nbr_min"), F.col("component_id")),
            )
            work = work.join(
                neighbor_min, work.node == neighbor_min.src, "left"
            ).select(
                "node",
                new_min.alias("component_id"),
                (new_min != F.col("component_id")).alias("_lastch"),
            )
        work = pin(work)
        changed = work.filter(F.col("_lastch")).limit(1).count()
        labels = work.drop("_lastch")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "component_id")


def main() -> None:
    spark = get_session("ab-r16-cc")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
    ).localCheckpoint(eager=True)
    n = pairs.count()
    print(f"edge pairs: {n}")

    def run(fn):
        t0 = time.perf_counter()
        fn(pairs).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # verify identical output first
    a = sorted(map(tuple, old_cc(pairs).collect()))
    b = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    olds, news = [], []
    for i in range(4):
        olds.append(run(old_cc))
        news.append(run(dedup.connected_components))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
