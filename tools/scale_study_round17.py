"""Round-17 scaling study (VERDICT r16 item 8): the sf0.1 bench cannot
resolve parallelism — most queries carry a 0.3-1 s fixed floor and no
query reaches the 4x core ratio — so this study times the round's top
operator families on a synthesized ~8x corpus (call it "sf0.8-ish") at
the ambient core count, to separate floor-bound from genuinely serial
paths and to check the r17 optimizations hold at a scale the driver
never measures.

Corpus synthesis (deterministic, derived from the read-only sf0.1
fixtures, written once per multiplier under /tmp):
- documents x M: ids offset by 10M per replica; every TOKEN of replica
  r>0 gets an `xr` suffix, so replicas share ZERO shingles/grams and
  near-dup structure is exactly M disjoint copies of the sf0.1 corpus
  (no cross-replica pair blow-up). The boilerplate footer the skew
  query appends lands AFTER perturbation, so its shingles stay hot
  across the WHOLE scaled corpus — the skew pathology scales with the
  data, as on a real web corpus.
- embeddings x M: ids offset by 10M; dim-0 shifted by +1000*r, so
  within-replica distances are unchanged (a constant shift on both
  ends of a pair cancels) and cross-replica pairs are impossible at
  the registry thresholds.
- trade graph x M: the orders ⋈ lineitem edge relation with node ids
  offset by 10M per replica — M disjoint copies of the sf0.1 graph.

Run once per core count (the session master is fixed at creation):
  SPARK_GRAFT_CPUS=32 python tools/scale_study_round17.py
  SPARK_GRAFT_CPUS=8  python tools/scale_study_round17.py
Prints one JSON line per (family, multiplier): min/median of 3 reps.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import clustering, dedup, graph
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"
MULTS = [1, 8]
REPS = 3


def _scaled_docs(spark, mult: int):
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"r17_scale_docs_x{mult}.parquet")
    if not os.path.exists(path):
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        parts = []
        for r in range(mult):
            t = F.col("text") if r == 0 else F.regexp_replace(
                F.col("text"), r"(\S+)", f"$1x{r}"
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                    t.alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _scaled_emb(spark, mult: int):
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"r17_scale_emb_x{mult}.parquet")
    if not os.path.exists(path):
        emb = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        parts = []
        for r in range(mult):
            e = F.col("embedding") if r == 0 else F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(1000.0 * r)),
                F.slice("embedding", 2, 1_000_000),
            )
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                    e.alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _scaled_edges(spark, mult: int, directed: bool):
    import tempfile

    tag = "dir" if directed else "undir"
    path = os.path.join(
        tempfile.gettempdir(), f"r17_scale_edges_{tag}_x{mult}.parquet"
    )
    if not os.path.exists(path):
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
        e = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        if not directed:
            e = e.unionAll(
                pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
            )
        parts = [
            e.select(
                (F.col("src") + F.lit(r * 10_000_000)).alias("src"),
                (F.col("dst") + F.lit(r * 10_000_000)).alias("dst"),
            )
            for r in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _boiler(docs):
    return docs.withColumn(
        "text",
        F.concat(
            F.trim(F.col("text")),
            F.lit(" legal disclaimer all rights reserved contact us"),
        ),
    )


def main():
    spark = get_session("scale-study-r17")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # prefit the two-level codebooks per multiplier OUTSIDE the timed
    # region (the bench's cached-fit shape: min-of-N measures the search)
    prefit: dict[int, tuple] = {}
    for m in MULTS:
        emb = _scaled_emb(spark, m)
        prefit[m] = clustering.fit_two_level_codebooks(
            emb, "vec_id", "embedding", k1=8, k2=8, iters=2, fit_fraction=0.4
        )

    FAMILIES = {
        "jacc_skew_prefix": lambda m: dedup.ngram_jaccard_pairs(
            _boiler(_scaled_docs(spark, m)), "doc_id", "text",
            n=3, threshold=0.5, prefix_filter=True,
        ),
        "exact_substring_spans": lambda m: dedup.exact_substring_spans(
            _scaled_docs(spark, m), "doc_id", "text", k=8, min_span_tokens=30
        ),
        "tfidf_cosine_pairs": lambda m: dedup.tfidf_topk_cosine_pairs(
            _scaled_docs(spark, m), "doc_id", "text", k=5, threshold=0.5, ngram=2
        ),
        "pagerank": lambda m: graph.pagerank(
            _scaled_edges(spark, m, directed=False), iters=5
        ),
        "hits": lambda m: graph.hits(
            _scaled_edges(spark, m, directed=True), iters=3
        ),
        "twolevel_pairs": lambda m: clustering.semantic_dedup_pairs_two_level(
            _scaled_emb(spark, m), "vec_id", "embedding",
            k1=8, k2=8, iters=2, threshold=1.2, probes=2, codebooks=prefit[m],
        ),
    }

    results = []
    for name, build in FAMILIES.items():
        for m in MULTS:
            build(m).write.format("noop").mode("overwrite").save()  # warm
            reps = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                build(m).write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 3))
            rec = {
                "family": name,
                "mult": m,
                "cores": cores,
                "min": min(reps),
                "med": sorted(reps)[len(reps) // 2],
                "reps": reps,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
