"""Decision → execution: the curation capstone driving an actual
corpus rewrite, end to end.

``corpus_curation_decision`` composes every dedup signal and
classifier gate into one (decision, reason) relation; this example
then EXECUTES it the way a training-data build would:

    corpus
      → corpus_curation_decision     (drop / excise / keep + reason)
      → keep rows pass through untouched
      → excise rows get their duplicated spans surgically removed
        (excise_spans — the 'keep the prose, cut the boilerplate' path)
      → drop rows are anti-joined away, with the reason histogram as
        the build's audit artifact

Run: ``python examples/curation_decision_pipeline.py [sf_dir]``

At 100 TB the decision relation is doc_id-keyed (a few dozen bytes per
doc); the only payload-touching stage is the excise rewrite, and it
touches ONLY the excise cohort — the drop/keep majority never
re-materializes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    curation,
    dedup,
    textops,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

# the same tiny compiled lexicons the registry queries use — the POINT
# is the inference plan shape (broadcast weight tables), not the model
QUALITY_LEXICON = [
    ("the", "0.5"), ("a", "0.4"), ("data", "0.3"), ("query", "0.3"),
    ("fast", "0.6"), ("table", "0.2"), ("spark", "0.4"),
    ("slow", "-0.8"), ("hash", "-0.3"), ("batch", "-0.2"),
]
DOMAIN_LEXICON = [
    ("analytics", "agg", "0.6"), ("analytics", "window", "0.5"),
    ("infra", "spark", "0.6"), ("infra", "batch", "0.5"),
    ("retail", "customer", "0.6"), ("retail", "order", "0.5"),
]


def main(sf_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_session("curation-decision-example", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "text")
    )
    # simulate real-world dirt so every decision branch executes: exact
    # re-deliveries (every 25th doc) and a site-wide boilerplate header
    # stamped onto every 10th doc (the excise cohort)
    hdr = " ".join(f"boiler{i:02d}" for i in range(20))
    corpus = base.unionByName(
        base.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    ).unionByName(
        base.filter(F.col("doc_id") % 10 == 7).select(
            (F.col("doc_id") + 400000).alias("doc_id"),
            F.concat_ws(
                " ", F.lit(hdr),
                F.concat_ws(" ", F.reverse(F.split(F.trim("text"), r"\s+"))),
            ).alias("text"),
        )
    )
    qlex = spark.createDataFrame(QUALITY_LEXICON, "term string, weight string").selectExpr(
        "term", "CAST(weight AS DECIMAL(12,6)) AS weight"
    )
    dlex = spark.createDataFrame(
        DOMAIN_LEXICON, "class string, term string, weight string"
    ).selectExpr("class", "term", "CAST(weight AS DECIMAL(12,6)) AS weight")

    decisions = curation.corpus_curation_decision(
        corpus,
        "doc_id",
        "text",
        textops.quality_classifier_weights(qlex, n_buckets=4096),
        textops.domain_classifier_weights(dlex, n_buckets=4096),
        n_buckets=4096,
        quality_threshold=0.01,
        blocked_domain="retail",
    ).localCheckpoint(eager=True)  # decisions feed three downstream branches

    audit = decisions.groupBy("decision", "reason").count().orderBy(
        F.col("count").desc()
    )
    print("decision audit:")
    for r in audit.collect():
        print(f"  {r.decision:7s} {r.reason:17s} {r['count']}")

    kept_ids = decisions.filter(F.col("decision") == "keep").select("doc_id")
    excise_ids = decisions.filter(F.col("decision") == "excise").select("doc_id")

    # execute the excisions: re-mine the spans among the docs that
    # survived to the span stage and rewrite ONLY the excise cohort.
    # The span relation must mirror the decision layer's restriction —
    # BOTH endpoints limited to stage-4 (span-stage) survivors, i.e.
    # docs not dropped by stages 1-3 — or the rewrite would cut spans
    # whose only duplicate counterpart was already dropped, excising
    # more than the decision's dup_frac accounted for (ADVICE r09).
    span_stage_survivors = decisions.filter(
        ~F.col("reason").isin("exact_dup", "near_dup", "contained")
    ).select("doc_id")
    spans = dedup.exact_substring_spans(
        corpus, "doc_id", "text", k=8, min_span_tokens=15, max_gram_freq=1024
    )
    excised = dedup.excise_spans(
        corpus.join(excise_ids, "doc_id", "left_semi"),
        spans.join(
            span_stage_survivors.withColumnRenamed("doc_id", "doc_a"),
            "doc_a",
            "left_semi",
        )
        .join(
            excise_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi"
        )
        .select("doc_b", "b_start", "span_tokens"),
        "doc_id",
        "text",
        span_id_col="doc_b",
        start_col="b_start",
    )

    final = (
        corpus.join(kept_ids, "doc_id", "left_semi")
        .select("doc_id", F.col("text").alias("clean_text"))
        .unionByName(excised.select("doc_id", "clean_text"))
    )
    n_in, n_out = corpus.count(), final.count()
    removed = (
        excised.agg(F.sum("n_tokens_removed").alias("t")).collect()[0].t or 0
    )
    print(f"corpus: {n_in} docs in -> {n_out} kept/excised out; "
          f"{removed} tokens excised")
    return {"n_in": n_in, "n_out": n_out, "tokens_removed": int(removed)}


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
