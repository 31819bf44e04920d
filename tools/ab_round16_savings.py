"""Round-16 A/B: dedup_savings_report — full text column carried
through the keep-list join (r15 form: the broadcast/shuffle payload is
the corpus text; the aggregate only ever reads length(text)) vs
projecting doc_id/lang/length(text) BEFORE the join. Same session,
interleaved, noop-timed, at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def keeplist(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.5
    )
    comp = dedup.connected_components(pairs, "id_a", "id_b")
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("doc_id")))
        .withColumn("kept", F.col("component_id") == F.col("doc_id"))
        .select("doc_id", "kept")
    )


def report(spark, narrow: bool):
    kl = keeplist(spark)
    docs = load_table(spark, SF_DIR, "documents")
    if narrow:
        docs = docs.select("doc_id", "lang", F.length("text").alias("_len"))
        ln = F.col("_len")
    else:
        docs = docs.select("doc_id", "lang", "text")
        ln = F.length("text")
    dropped = F.when(~F.col("kept"), 1).otherwise(0)
    dropped_chars = F.when(~F.col("kept"), ln).otherwise(0)
    return (
        docs.join(kl, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dropped).cast("long").alias("n_dropped"),
            F.sum(ln).cast("long").alias("chars_total"),
            F.sum(dropped_chars).cast("long").alias("chars_dropped"),
        )
        .select(
            "lang",
            "n_docs",
            "n_dropped",
            "chars_total",
            "chars_dropped",
            F.round(F.col("n_dropped") / F.col("n_docs"), 6).alias(
                "pct_docs_dropped"
            ),
            F.round(F.col("chars_dropped") / F.col("chars_total"), 6).alias(
                "pct_chars_dropped"
            ),
        )
    )


def main() -> None:
    spark = get_session("ab-r16-savings")
    spark.sparkContext.setLogLevel("ERROR")

    a = sorted(map(tuple, report(spark, False).collect()))
    b = sorted(map(tuple, report(spark, True).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(narrow):
        t0 = time.perf_counter()
        report(spark, narrow).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    wide, narrow = [], []
    for _ in range(4):
        wide.append(run(False))
        narrow.append(run(True))
    print("wide:  ", [round(x, 3) for x in wide], "min", round(min(wide), 3))
    print("narrow:", [round(x, 3) for x in narrow], "min", round(min(narrow), 3))


if __name__ == "__main__":
    main()
