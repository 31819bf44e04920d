"""Round-17 interleaved A/B: dedup_ngram_jaccard_auto_skew structural
variants (VERDICT r16 item 1 — the top untouched DataFrame path; the r16
pin of the array-typed `ordered` relation REGRESSED 7.25 -> 9.48 s, so
the variants here pin only FLAT relations or restructure passes).

Variants (all must be bit-identical to the baseline):
  base    — current ngram_jaccard_pairs(prefix_filter=True)
  pre_pin — pin the exploded prefix relation (doc, set_size, shingle):
            flat longs, consumed by BOTH candidate self-join sides
  hs_pin  — pre_pin + pin hsets (the hashed shingle arrays feeding the
            verify join twice and the df-aggregate once)
  freq2   — pre_pin + df-annotate via LEFT join against freq
            FILTERED to df >= 2 (a df=1 shingle's rank is unchanged by
            coalescing its df to 1, and the filtered relation is the
            shared-shingle vocabulary — far smaller shuffle)

Method: same session, order-rotated, min-of-4 per variant, sorted-row
equality asserted before any timing (the r16 evidence rules).

RESULT (32 cores, sf0.1): base 5.853 / pre_pin 7.494 / hs_pin 4.180 /
freq2 4.318 min-of-4 — and the follow-up isolation run (8 interleaved
reps) showed pinning hsets WITHOUT the pre pin is better still:
hs_only min 3.474/med 4.182 vs hs_pin min 4.481/med 5.684. KEPT: the
hsets-only pin, now inside ngram_jaccard_pairs' prefix path. The
ordered/prefix recompute from pinned hsets is cheap fused work whose
two lazy copies schedule concurrently (r16 pin heuristic); the eager
pre pin serializes them, and the r16-rejected `ordered` pin sat even
higher (kept all 6 corpus scans AND serialized).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.operators.dedup import _shingle_array
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

THRESHOLD = 0.5


def _boiler_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.trim(F.col("text")),
            F.lit(" legal disclaimer all rights reserved contact us"),
        ),
    )


def build_base(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _boiler_docs(spark, sf_dir), "doc_id", "text", n=3,
        threshold=THRESHOLD, prefix_filter=True,
    )


def _variant(spark, sf_dir, pin_pre: bool, pin_hsets: bool, freq2: bool):
    docs = _boiler_docs(spark, sf_dir)
    sets = _shingle_array(docs, "doc_id", "text", 3)
    hsets = sets.select(
        F.col("doc_id"),
        F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s))).alias("shingles"),
    )
    if pin_hsets:
        hsets = hsets.localCheckpoint(eager=True)
    sh = hsets.select(F.col("doc_id"), F.explode("shingles").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if freq2:
        freq = freq.filter(F.col("df") >= 2)
        annotated = sh.join(freq, "shingle", "left").withColumn(
            "df", F.coalesce("df", F.lit(1))
        )
    else:
        annotated = sh.join(freq, "shingle")
    ordered = (
        annotated.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("ord"))
        .select(
            F.col("doc_id"),
            F.size("ord").alias("set_size"),
            F.slice(
                F.transform("ord", lambda x: x["shingle"]),
                1,
                (F.size("ord") - F.ceil(F.lit(THRESHOLD) * F.size("ord")) + 1).cast("int"),
            ).alias("prefix"),
        )
    )
    pre = ordered.select(F.col("doc_id"), "set_size", F.explode("prefix").alias("shingle"))
    if pin_pre:
        pre = pre.localCheckpoint(eager=True)
    candidates = (
        pre.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"), "shingle")
        .join(
            pre.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.least("size_a", "size_b") >= F.lit(THRESHOLD) * F.greatest("size_a", "size_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = hsets.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = hsets.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


BUILDERS = {
    "base": build_base,
    "pre_pin": lambda s, d: _variant(s, d, True, False, False),
    "hs_pin": lambda s, d: _variant(s, d, True, True, False),
    "freq2": lambda s, d: _variant(s, d, True, True, True),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab_r17_jacc")
    spark.sparkContext.setLogLevel("ERROR")

    ref = sorted(map(tuple, build_base(spark, sf_dir).collect()))
    for name, b in BUILDERS.items():
        got = sorted(map(tuple, b(spark, sf_dir).collect()))
        assert got == ref, f"{name} output differs"
    print(f"bit-identity OK over {len(ref)} pairs")

    reps = 4
    times: dict[str, list[float]] = {n: [] for n in BUILDERS}
    order = list(BUILDERS)
    for r in range(reps):
        for name in order if r % 2 == 0 else order[::-1]:
            t0 = time.perf_counter()
            BUILDERS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:8s} min {min(ts):6.3f}  reps {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
