"""Round-16 A/B: ngram_jaccard_pairs PPJoin path with the `ordered`
(prefix) relation pinned before the candidate self-join vs the r15
unpinned form. Same session, interleaved, noop-timed, on the skewed
boilerplate corpus the registry query uses (n=3, t=0.5, prefix path)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.operators.dedup import _shingle_array
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_jacc(df: DataFrame, id_col: str, text_col: str, n=3, threshold=0.5) -> DataFrame:
    """The r15 PPJoin prefix path: `ordered` left lazy, so each candidate
    side recomputes the df-aggregate + per-doc sort-struct chain."""
    sets = _shingle_array(df, id_col, text_col, n)
    hsets = sets.select(
        F.col(id_col),
        F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s))).alias(
            "shingles"
        ),
    )
    sh = hsets.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        sh.join(freq, "shingle")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("ord"))
        .select(
            F.col(id_col),
            F.size("ord").alias("set_size"),
            F.slice(
                F.transform("ord", lambda x: x["shingle"]),
                1,
                (F.size("ord") - F.ceil(F.lit(threshold) * F.size("ord")) + 1).cast(
                    "int"
                ),
            ).alias("prefix"),
        )
    )
    pre = ordered.select(
        F.col(id_col), "set_size", F.explode("prefix").alias("shingle")
    )
    candidates = (
        pre.select(
            F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "shingle"
        )
        .join(
            pre.select(
                F.col(id_col).alias("id_b"),
                F.col("set_size").alias("size_b"),
                "shingle",
            ),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("size_a", "size_b")
            >= F.lit(threshold) * F.greatest("size_a", "size_b")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = hsets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = hsets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def new_jacc(df, id_col, text_col, n=3, threshold=0.5):
    return dedup.ngram_jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, prefix_filter=True
    )


def main() -> None:
    spark = get_session("ab-r16-jacc")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.concat(
            F.trim(F.col("text")),
            F.lit(" legal disclaimer all rights reserved contact us"),
        ),
    )

    a = sorted(map(tuple, old_jacc(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, new_jacc(docs, "doc_id", "text").collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(old_jacc))
        news.append(run(new_jacc))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
