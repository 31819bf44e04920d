"""Retrieval over a pretraining corpus, end to end: ingest-time state
(inverted postings + doc lengths persisted per slice), query-time BM25
against the store, dense cosine search, and hybrid reciprocal-rank
fusion — the search stack of a training-data pipeline (find docs for a
topic, audit what the dedup kept, retrieve eval-contamination
suspects).

Run: python examples/retrieval_pipeline.py [sf_dir]

The pattern at 100 TB:
1. each ingest slice writes its postings + doc lengths (disjoint doc
   ids -> union by concatenation, no re-aggregation);
2. a BM25 query scans ONLY query-term postings (the broadcast term
   set prunes before any aggregate) — no text re-tokenization;
3. dense search runs over the embedding store (exact here; the IVF
   paths in operators/similarity.py are the scale form);
4. RRF fuses the two rankings with no score calibration.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import (  # noqa: E402
    retrieval,
    similarity,
)
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_session("retrieval-example", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    store = Path(tempfile.mkdtemp(prefix="retrieval_store_"))

    # 1. ingest: postings + doclens per slice, appended to the store
    for i in range(3):
        s = docs.filter(F.col("doc_id") % 3 == i)
        retrieval.inverted_postings(s, "doc_id", "text").write.mode("append").parquet(
            str(store / "postings")
        )
        retrieval.doc_lengths(s, "doc_id", "text").write.mode("append").parquet(
            str(store / "doclens")
        )
    n_docs = docs.count()
    print(f"persisted postings for {n_docs} docs in 3 slices -> {store}")

    # 2. query time: BM25 against the store, no text re-tokenization
    queries = spark.createDataFrame(
        [(1, "spark"), (1, "query"), (2, "hash"), (2, "join"), (2, "merge")],
        "query_id int, token string",
    )
    lex = retrieval.bm25_topk_from_postings(
        spark.read.parquet(str(store / "postings")),
        spark.read.parquet(str(store / "doclens")),
        n_docs,
        queries,
        "doc_id",
        topk=20,
    )
    print("BM25 top-3 per query:")
    for r in lex.filter(F.col("rank") <= 3).orderBy("query_id", "rank").collect():
        print("  ", r.asDict())

    # 3. dense: cosine top-20 for the row-aligned query embeddings
    dense = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id").isin(1, 2)), "vec_id", "embedding", k=20
    )

    # 4. hybrid: reciprocal-rank fusion, no score calibration
    fused = retrieval.rrf_fuse(
        lex,
        dense.withColumnsRenamed({"neighbor_id": "doc_id"}),
        "query_id",
        "doc_id",
        topk=5,
    )
    rows = fused.orderBy("query_id", "rank").collect()
    print("hybrid RRF top-5 per query:")
    for r in rows:
        print("  ", r.asDict())
    return {
        "n_docs": n_docs,
        "lex_rows": lex.count(),
        "fused_rows": len(rows),
        "queries": queries.select("query_id").distinct().count(),
    }


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
