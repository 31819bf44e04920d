"""Exact-substring dedup of a growing corpus, end to end: daily ingest
slices persist their positional-gram state, each slice mines only
new-vs-all duplicated spans (history never re-pairs with itself), and
the accumulated span relation feeds the doc-level coverage gate that
decides what enters the training set — composed with the quality-
classifier gate.

Run: python examples/substring_dedup_pipeline.py [sf_dir]

The pattern at 100 TB:
1. each ingest slice appends (id, pos, hash) gram state — no text is
   ever re-tokenized after its ingest day;
2. the slice's spans come from new x all candidates; yesterday's
   corpus never re-pairs with itself (the union of all slices' spans
   equals the from-scratch relation — pinned by the streaming test);
3. the coverage gate turns spans into per-doc "fraction duplicated"
   and a drop decision; AND it with the classifier gate for the final
   keep-list.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import dedup, textops  # noqa: E402
from etl_fuel_priceguide_ec2_spark.registry.curation import (  # noqa: E402
    _QC_BUCKETS,
    _QC_LEXICON,
    _QC_THRESHOLD,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402

K = 8
MIN_SPAN = 30


def main(sf_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_session("substring-dedup-example", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # plant cross-doc quotes so the fixture corpus has spans to find
    # (each doc's twin = its text + the first 40 tokens of the next doc)
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
    corpus = docs.unionAll(twins)

    store = Path(tempfile.mkdtemp(prefix="substring_store_"))
    grams_path = str(store / "grams")
    spans_path = str(store / "spans")

    # 1.+2. three ingest days: persist gram state, mine new-vs-all
    n_slices = 3
    for day in range(n_slices):
        s = corpus.filter(F.col("doc_id") % n_slices == day)
        new_state = dedup.positional_gram_state(s, "doc_id", "text", K)
        try:
            hist = spark.read.parquet(grams_path)
        except Exception:
            hist = new_state.limit(0)
        spans = dedup.exact_substring_spans_incremental(
            hist, new_state, k=K, min_span_tokens=MIN_SPAN, max_gram_freq=None
        )
        n = spans.count()
        spans.write.mode("append").parquet(spans_path)
        new_state.write.mode("append").parquet(grams_path)
        print(f"day {day}: mined {n} new spans")

    all_spans = spark.read.parquet(spans_path)
    n_spans = all_spans.count()
    print(f"span store: {n_spans} spans over {corpus.count()} docs")

    # 3. doc-level gates: duplication coverage x classifier quality
    coverage = dedup.duplicated_span_coverage(
        corpus, "doc_id", "text", k=K, min_span_tokens=MIN_SPAN,
        max_gram_freq=None, drop_threshold=0.5,
    )
    lex = spark.createDataFrame(
        _QC_LEXICON, "term string, weight string"
    ).selectExpr("term", "CAST(weight AS DECIMAL(12,6)) AS weight")
    weights = textops.quality_classifier_weights(lex, n_buckets=_QC_BUCKETS)
    quality = textops.quality_classifier_scores(
        corpus, "doc_id", "text", weights,
        n_buckets=_QC_BUCKETS, threshold=_QC_THRESHOLD,
    )
    keep_list = (
        coverage.select("doc_id", "dup_frac", F.col("drop").alias("dup_drop"))
        .join(quality.select("doc_id", "score", "keep"), "doc_id")
        .withColumn("kept", ~F.col("dup_drop") & F.col("keep"))
    )
    n_kept = keep_list.filter("kept").count()
    n_total = keep_list.count()
    print(f"keep-list: {n_kept}/{n_total} docs survive both gates")
    return {
        "n_docs": n_total,
        "n_spans": n_spans,
        "n_kept": n_kept,
        "n_dup_dropped": keep_list.filter("dup_drop").count(),
    }


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
