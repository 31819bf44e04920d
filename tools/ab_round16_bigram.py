"""Round-16 A/B: bigram_logprob_score — r15 form (context counts from a
SECOND full corpus explode) vs the rollup form (C(u,.) = sum_v C(u,v)
over the vocabulary-sized bigram-count relation). Same session,
interleaved, noop-timed."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import textops
from etl_fuel_priceguide_ec2_spark.operators.textops import _WS
from etl_fuel_priceguide_ec2_spark.operators.util import fan_out
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_bigram(df, id_col, text_col):
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS), lambda t: t != "")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = fan_out(df).select(F.col(id_col), F.explode(grams).alias("g"))
    big = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c_uv"))
    ctx = (
        bg.select(F.substring_index("g", " ", 1).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("c_u"))
    )
    vocab = (
        fan_out(df)
        .select(F.explode(toks).alias("t"))
        .filter(F.col("t") != "")
        .agg(F.count_distinct("t").alias("nv"))
    )
    model = (
        big.withColumn("u", F.substring_index("g", " ", 1))
        .join(ctx, "u")
        .crossJoin(F.broadcast(vocab))
        .select(
            "g",
            F.round(
                F.log((F.col("c_uv") + 1) / (F.col("c_u") + F.col("nv"))), 12
            ).alias("lp"),
        )
    )
    return (
        bg.join(model, "g")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("lp").cast("decimal(30,12)")).alias("_s"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .select(
            F.col(id_col),
            F.round(F.col("_s").cast("double") / F.col("n_bigrams"), 6).alias(
                "avg_logprob"
            ),
            "n_bigrams",
        )
    )


def main() -> None:
    spark = get_session("ab-r16-bigram")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    a = sorted(map(tuple, old_bigram(docs, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, textops.bigram_logprob_score(docs, "doc_id", "text").collect())
    )
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(old_bigram))
        news.append(run(textops.bigram_logprob_score))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
