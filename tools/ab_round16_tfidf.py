"""Round-16 A/B: tfidf_topk_cosine_pairs with the kept-terms relation
pinned before the self-join vs the r15 unpinned form. Same session,
interleaved, noop-timed, registry-query parameters (ngram=2, k=5)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.operators.dedup import _tokens_lower
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_tfidf(df, id_col, text_col, k=5, threshold=0.7, ngram=1):
    toks = _tokens_lower(df, id_col, text_col, ngram=ngram)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "w",
            F.col("tf")
            * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + 1),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("w").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    nrm = w.groupBy(id_col).agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 12).cast("decimal(30,12)")).cast(
                "double"
            )
        ).alias("nn")
    )
    u = w.join(nrm, id_col).select(
        F.col(id_col), "token", (F.col("w") / F.col("nn")).alias("nw")
    )
    a = u.select(F.col(id_col).alias("id_a"), "token", F.col("nw").alias("nw_a"))
    b = u.select(F.col(id_col).alias("id_b"), "token", F.col("nw").alias("nw_b"))
    return (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(
                    F.round(F.col("nw_a") * F.col("nw_b") * F.lit(1e12), 0).cast("long")
                )
                / F.lit(1e12)
            ).alias("_cos")
        )
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def main() -> None:
    spark = get_session("ab-r16-tfidf")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    kw = dict(k=5, threshold=0.5, ngram=2)

    a = sorted(map(tuple, old_tfidf(docs, "doc_id", "text", **kw).collect()))
    b = sorted(
        map(tuple, dedup.tfidf_topk_cosine_pairs(docs, "doc_id", "text", **kw).collect())
    )
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(docs, "doc_id", "text", **kw).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(old_tfidf))
        news.append(run(dedup.tfidf_topk_cosine_pairs))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
