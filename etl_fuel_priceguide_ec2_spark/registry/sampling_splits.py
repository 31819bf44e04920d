"""Deterministic hash split / mixture sampling (membership-level oracles)."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    sampling,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Deterministic split / mixture sampling (operators/sampling.py) — the
# md5-hash bucketing is bit-identical in DuckDB, so membership itself is
# oracle-verified (unlike randomSplit/sample, whose membership is
# partition-dependent)
# ---------------------------------------------------------------------------

_HASH_BUCKET_SQL = (
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000"
)


@register(
    "hash_split_train_val_test",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_HASH_BUCKET_SQL} < 9000 THEN 'train'
                WHEN {_HASH_BUCKET_SQL} < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_hash_split_train_val_test(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.hash_split(
        docs, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
    )


@register(
    "mixture_sample_by_lang",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_HASH_BUCKET_SQL} <
          CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
                    WHEN 'fr' THEN 2500 ELSE 0 END
    """,
)
def q_mixture_sample_by_lang(spark, sf_dir):
    """Training-mix downsampling: keep 50% of en, all of de, 25% of fr,
    drop the rest — deterministic membership by id hash, so the mix is
    reproducible row-for-row on any cluster layout."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.mixture_sample(
        docs, "doc_id", "lang", {"en": 0.50, "de": 1.0, "fr": 0.25}
    )




@register(
    "weighted_sample_chars",
    """
    SELECT doc_id, lang, n_chars, sample_rank FROM (
      SELECT doc_id, lang, n_chars,
             CAST(row_number() OVER (
               ORDER BY ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                                 AS BIGINT) + 0.5) / 1152921504606846976.0)
                        / n_chars DESC,
                        doc_id) AS INTEGER) AS sample_rank
      FROM documents
      WHERE n_chars > 0
    ) WHERE sample_rank <= 100
    """,
)
def q_weighted_sample_chars(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis, key = ln(u)/w): 100 docs weighted by length.
    The md5-derived uniform makes the draw identical on any partition
    layout and in DuckDB — membership itself is the oracle check."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample_topk(docs, "doc_id", "n_chars", 100)
