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


@register(
    "temperature_mixture_allocation",
    """
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ), weighted AS (
      SELECT lang, n_docs,
             ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6) AS weight
      FROM counts
    ), tot AS (
      SELECT CAST(SUM(CAST(weight AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS t
      FROM weighted
    )
    SELECT w.lang, w.n_docs, w.weight,
           ROUND(w.weight / CAST(tot.t AS DOUBLE), 6) AS share,
           CAST(FLOOR(ROUND(w.weight / CAST(tot.t AS DOUBLE), 6)
                      * CAST(10000 AS DOUBLE)) AS BIGINT) AS planned_docs
    FROM weighted w CROSS JOIN tot
    """,
)
def q_temperature_mixture_allocation(spark, sf_dir):
    """Multilingual mixture rebalancing: per-lang sampling allocation
    under temperature tau = 0.5 (weights ~ sqrt(n) — flattens the
    corpus distribution without drowning low-resource langs) for a
    10k-document budget. tau is 0.5 deliberately: sqrt is correctly-
    rounded IEEE in both engines where pow() sits a libm ulp from the
    6-dp rounding boundary; the share denominator sums decimal weights
    (order-free), so the allocation replays exactly. Pairs with
    mixture_sample_by_lang, which materializes a per-lang quota via
    deterministic hash ranks."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_allocation(docs, "lang", budget=10_000)


# ---------------------------------------------------------------------------
# Round-11: training-export sharder (operators/export.py) — registered
# AFTER the round-11 freeze, leads the round-12 window
# ---------------------------------------------------------------------------

_SHARD_SEED = "r11"
_N_SHARDS = 8

_SHARDED_SQL = f"""
    SELECT doc_id, n_chars, CAST(h % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % {_N_SHARDS}
                                   ORDER BY h, doc_id) AS BIGINT) AS shard_pos
    FROM (
      SELECT doc_id, n_chars,
             CAST('0x' || substring(md5('{_SHARD_SEED}|' || CAST(doc_id AS VARCHAR)),
                                    1, 15) AS BIGINT) AS h
      FROM documents
      WHERE {_HASH_BUCKET_SQL} < 9000
    )
"""


def _train_keep_list(spark, sf_dir):
    """The shared keep-list both export queries shard: the
    deterministic 90% train split (stands in for a full curation
    keep-list — any id-keyed relation shards the same way)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.hash_split(
        docs, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
    ).filter(F.col("split") == "train").drop("split")


@register(
    "training_export_shards",
    f"""
    SELECT doc_id, shard, shard_pos FROM ({_SHARDED_SQL})
    """,
)
def q_training_export_shards(spark, sf_dir):
    """The write-side end of the curation pipeline: the train keep-list
    deterministically shuffled into 8 shards with dense 1-based
    in-shard positions — same shard, same position, same bytes on any
    cluster layout or rerun (seeded md5 order, id tiebreak). Positions
    come from ONE global two-pass rank (global_row_number), never a
    per-shard data window; the oracle replays assignment and order as
    pure expressions."""
    from etl_fuel_priceguide_ec2_spark.operators import export

    keep = _train_keep_list(spark, sf_dir)
    return export.shard_positions(
        keep, "doc_id", n_shards=_N_SHARDS, seed=_SHARD_SEED
    ).select("doc_id", "shard", "shard_pos")


@register(
    "training_export_manifest",
    f"""
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(shard_pos) AS BIGINT) AS max_pos,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ({_SHARDED_SQL})
    GROUP BY shard
    """,
)
def q_training_export_manifest(spark, sf_dir):
    """Per-shard export manifest (8 rows): doc count, max position,
    char total — the loader's no-rescan integrity check (max_pos ==
    n_docs iff positions are dense). Composes shard_positions with the
    n_shards-row manifest aggregate."""
    from etl_fuel_priceguide_ec2_spark.operators import export

    keep = _train_keep_list(spark, sf_dir)
    sharded = export.shard_positions(
        keep, "doc_id", n_shards=_N_SHARDS, seed=_SHARD_SEED
    )
    return export.shard_manifest(sharded, {"total_chars": "n_chars"})
