"""Round-16 A/B: exact_substring_spans — freq-capped gram relation left
lazy (r15 form: tokenize+explode+cap-join recomputes under both
self-join sides; the cap aggregate adds a third pass) vs pinned once
before the diagonal join. Same session, interleaved, noop-timed, on the
registry query's planted corpus at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.operators.dedup import _positional_kgrams
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"
K, MIN_SPAN, CAP = 8, 30, 64


def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    return docs.unionAll(twins)


def spans(c, pin: bool):
    grams = _positional_kgrams(c, "doc_id", "text", K)
    keep = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") <= CAP)
        .select("_h")
    )
    grams = grams.join(keep, "_h")
    if pin:
        grams = grams.localCheckpoint(eager=True)
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "_h")
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "_h")
    m = a.join(b, "_h").filter(F.col("doc_a") < F.col("doc_b"))
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.select("doc_a", "doc_b", diag, "pa")
        .withColumn("_grp", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "_grp")
        .agg(F.min("pa").alias("a_start"), F.count(F.lit(1)).alias("_run"))
    )
    return (
        runs.filter(F.col("_run") + K - 1 >= MIN_SPAN)
        .select(
            "doc_a",
            "doc_b",
            "a_start",
            (F.col("a_start") - F.col("diag")).alias("b_start"),
            (F.col("_run") + F.lit(K) - 1).cast("long").alias("span_tokens"),
        )
    )


def main() -> None:
    spark = get_session("ab-r16-ess")
    spark.sparkContext.setLogLevel("ERROR")
    c = corpus(spark)

    base = sorted(
        map(
            tuple,
            dedup.exact_substring_spans(
                c, "doc_id", "text", k=K, min_span_tokens=MIN_SPAN, max_gram_freq=CAP
            ).collect(),
        )
    )
    a = sorted(map(tuple, spans(c, pin=False).collect()))
    b = sorted(map(tuple, spans(c, pin=True).collect()))
    assert a == base and b == base, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(p):
        t0 = time.perf_counter()
        spans(c, pin=p).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    lazies, pins = [], []
    for _ in range(4):
        lazies.append(run(False))
        pins.append(run(True))
    print("lazy:", [round(x, 3) for x in lazies], "min", round(min(lazies), 3))
    print("pin: ", [round(x, 3) for x in pins], "min", round(min(pins), 3))


if __name__ == "__main__":
    main()
