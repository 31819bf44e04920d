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


# --- round-14 addition (post-freeze -> leads round 15) --------------


@register(
    "kfold_assignments",
    """
    SELECT doc_id, lang,
           CAST(CAST('0x' || substring(md5('cv|' || CAST(doc_id AS VARCHAR)),
                     1, 15) AS BIGINT) % 5 AS INT) AS fold
    FROM documents
    """,
)
def q_kfold_assignments(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment — the k-fold
    sibling of hash_split: fold = seeded-md5-hash(id) % k, a pure
    function of (seed, id), so fold membership is reproducible
    row-for-row on any cluster layout and replayable cross-engine.
    Completes the sampling family (split / mixture / weighted /
    temperature / upsample / k-fold)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.kfold_assign(docs, "doc_id", k=5, seed="cv")


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


# Round-11: the export sharder x decontamination composition — the
# pre-flight report a training run reads BEFORE consuming the shards:
# which shards still carry benchmark-contaminated documents, and how
# bad the worst overlap is. Registered post-freeze (round-12 window).

_CONTAM_THRESHOLD = 0.5


@register(
    "training_export_contamination_manifest",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, list_distinct(list_filter(list_transform(
          range(1, greatest(len(toks) - 5, 0) + 2),
          i -> array_to_string(list_slice(toks, i, i + 4), ' ')),
          g -> g <> '')) AS gs
      FROM tok
    ), dg AS (SELECT doc_id, UNNEST(gs) AS g FROM grams),
    bg AS (SELECT doc_id AS bench_id, CAST(len(gs) AS BIGINT) AS bench_ngrams,
                  UNNEST(gs) AS g
           FROM grams WHERE doc_id < 10),
    contam AS (
      SELECT doc_id, MAX(contamination) AS contamination FROM (
        SELECT d.doc_id, bench_id,
               ROUND(COUNT(*) * 1.0 / bench_ngrams, 6) AS contamination
        FROM dg d JOIN bg USING (g) WHERE d.doc_id <> bench_id
        GROUP BY d.doc_id, bench_id, bench_ngrams
      ) GROUP BY doc_id
    ), sharded AS (
      {_SHARDED_SQL}
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE COALESCE(contamination, 0.0)
                                       >= {_CONTAM_THRESHOLD}) AS BIGINT)
             AS n_contaminated,
           ROUND(MAX(COALESCE(contamination, 0.0)), 6) AS max_contamination
    FROM sharded s LEFT JOIN contam USING (doc_id)
    GROUP BY shard
    """,
)
def q_training_export_contamination_manifest(spark, sf_dir):
    """Per-shard decontamination pre-flight (8 rows): for every export
    shard, how many of its documents overlap a benchmark document at
    >= 50% distinct-5-gram contamination (self-pairs excluded — bench
    docs legitimately appear in their own training split), and the
    shard's worst overlap. Ties the export sharder into the
    decontamination family: the flagged-doc relation is corpus-scan
    work already computed by contamination_check; the manifest itself
    is an n_shards-row aggregate off an id-keyed left join."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import export, textops

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    contam = (
        textops.contamination_check(
            docs, bench, "doc_id", "text", "bench_id", "bench_text", n=5
        )
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id")
        .agg(F.max("contamination").alias("contamination"))
    )
    keep = _train_keep_list(spark, sf_dir)
    sharded = export.shard_positions(
        keep, "doc_id", n_shards=_N_SHARDS, seed=_SHARD_SEED
    )
    return (
        sharded.join(contam, "doc_id", "left")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(
                F.when(
                    F.coalesce("contamination", F.lit(0.0))
                    >= _CONTAM_THRESHOLD,
                    1,
                )
            ).cast("long").alias("n_contaminated"),
            F.round(
                F.max(F.coalesce("contamination", F.lit(0.0))), 6
            ).alias("max_contamination"),
        )
    )


# --- round-12 addition (post-freeze -> leads the round-13 window) -----
# Mixture x sharder composition: the per-shard MIX manifest. A training
# loader consuming sharded data needs to know each shard carries the
# intended language composition (the deterministic hash shuffle makes
# every shard a uniform sample of the mix, so skew here means a broken
# seed or a broken mixture upstream). Pure-map keys + an
# (n_shards x |langs|)-row aggregate - no rank exchange: a composition
# report needs shard membership, not positions.


@register(
    "training_mix_shard_manifest",
    f"""
    SELECT CAST(h % {_N_SHARDS} AS BIGINT) AS shard, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             CAST('0x' || substring(md5('{_SHARD_SEED}|' || CAST(doc_id AS VARCHAR)),
                                    1, 15) AS BIGINT) AS h
      FROM documents
      WHERE {_HASH_BUCKET_SQL} <
            CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
                      WHEN 'fr' THEN 2500 ELSE 0 END
    )
    GROUP BY 1, 2
    """,
)
def q_training_mix_shard_manifest(spark, sf_dir):
    """Per-(shard, lang) composition of an exported training mix:
    mixture_sample (en 50% / de 100% / fr 25%, deterministic id-hash
    quotas) -> with_shard_keys (the sharder's pure-map half; seed and
    shard count shared with the export queries) -> docs + chars per
    cell. The pre-flight a loader reads to verify every shard carries
    the intended mixture before training starts."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import export

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    mixed = sampling.mixture_sample(
        docs, "doc_id", "lang", {"en": 0.50, "de": 1.0, "fr": 0.25}
    )
    return (
        export.with_shard_keys(mixed, "doc_id", _N_SHARDS, seed=_SHARD_SEED)
        .groupBy("shard", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- round-12 addition #2: fractional-epoch upsampling ----------------
# mixture_sample thins; a pretraining mix ALSO repeats sources
# ("2.5 epochs of de"). mixture_upsample materializes fractional
# epochs deterministically: floor(f) copies + one more iff the id's
# hash bucket falls under frac(f) - the same bucket predicate as the
# sampler, so factor < 1 degenerates to mixture_sample membership.


@register(
    "mixture_upsample_epochs",
    f"""
    SELECT doc_id, lang,
           UNNEST(generate_series(0, n_copies - 1)) AS copy_idx
    FROM (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 2 WHEN 'fr' THEN 1
                       ELSE 0 END
             + CASE WHEN {_HASH_BUCKET_SQL} <
                         CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 5000
                                   WHEN 'fr' THEN 2500 ELSE 0 END
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents
    )
    WHERE n_copies >= 1
    """,
)
def q_mixture_upsample_epochs(spark, sf_dir):
    """Fractional-epoch source mix: en x0.5 (thin - floor 0, the
    degenerate mixture_sample case), fr x1.25 (keep all + repeat a
    deterministic quarter), de x2.5 (two full epochs + a half). Every
    copy carries copy_idx so the export sharder can key on
    (doc_id, copy_idx) and spread replicas across shards. Map + bounded
    explode only - membership AND multiplicity replay row-for-row in
    the oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.mixture_upsample(
        docs, "doc_id", "lang", {"en": 0.50, "de": 2.5, "fr": 1.25}
    )


# --- round-12 addition #3: upsample x sharder composition -------------
# The copy_idx contract, driver-pinned end-to-end: replicas from the
# fractional-epoch upsampler become distinct shardable units via a
# composite replica id, so "2.5 epochs of de" spreads across shards
# instead of colliding on doc_id (shard_positions requires unique ids
# - this is the composition that makes upsampled corpora exportable).


@register(
    "training_export_upsampled_manifest",
    f"""
    WITH up AS (
      SELECT doc_id, lang,
             UNNEST(generate_series(0, n_copies - 1)) AS copy_idx
      FROM (
        SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 2 WHEN 'fr' THEN 1
                         ELSE 0 END
               + CASE WHEN {_HASH_BUCKET_SQL} <
                           CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 5000
                                     WHEN 'fr' THEN 2500 ELSE 0 END
                      THEN 1 ELSE 0 END AS n_copies
        FROM documents
      )
      WHERE n_copies >= 1
    ), keyed AS (
      SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(copy_idx AS VARCHAR)
               AS replica_id
      FROM up
    ), sharded AS (
      SELECT replica_id, CAST(h % {_N_SHARDS} AS BIGINT) AS shard,
             CAST(row_number() OVER (PARTITION BY h % {_N_SHARDS}
                                     ORDER BY h, replica_id) AS BIGINT)
               AS shard_pos
      FROM (
        SELECT replica_id,
               CAST('0x' || substring(md5('{_SHARD_SEED}|' || replica_id),
                                      1, 15) AS BIGINT) AS h
        FROM keyed
      )
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(shard_pos) AS BIGINT) AS max_pos
    FROM sharded GROUP BY shard
    """,
)
def q_training_export_upsampled_manifest(spark, sf_dir):
    """Shard manifest over an UPSAMPLED mix: fractional-epoch replicas
    get a composite replica id (doc_id # copy_idx - the unique-id
    contract shard_positions requires), flow through the identical
    seeded global shuffle, and the n_shards-row manifest proves the
    export is dense with every replica a first-class shardable unit.
    Same seed and shard count as the doc-level export queries."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import export

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    up = sampling.mixture_upsample(
        docs, "doc_id", "lang", {"en": 0.50, "de": 2.5, "fr": 1.25}
    )
    keyed = up.select(
        F.concat_ws("#", F.col("doc_id"), F.col("copy_idx")).alias("replica_id")
    )
    sharded = export.shard_positions(
        keyed, "replica_id", _N_SHARDS, seed=_SHARD_SEED,
        check_unique_ids=True,
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("shard_pos").alias("max_pos"),
    )


# --- round-13 addition (post-freeze -> leads the round-14 window) -----
# VERDICT r12 item 6: the per-shard CONTENT CHECKSUM — the manifest
# grows an order-sensitive digest over the (position, id) chain, so
# byte-identical export replay is verifiable from the n_shards-row
# manifest alone, cross-engine (a loader can re-derive the digest from
# the shards it read and compare; a writer round-trip test pins it).


@register(
    "training_export_checksum_manifest",
    f"""
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(shard_pos) AS BIGINT) AS max_pos,
           bit_xor(CAST('0x' || substring(md5(CAST(shard_pos AS VARCHAR)
                      || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT))
             AS content_checksum
    FROM ({_SHARDED_SQL})
    GROUP BY shard
    """,
)
def q_training_export_checksum_manifest(spark, sf_dir):
    """Per-shard export manifest with the content checksum (8 rows):
    doc count, max position, and the order-sensitive BIT_XOR digest of
    60-bit md5("<shard_pos>:<id>") terms. XOR commutes, so the digest
    is one map-side-combining aggregate (no sequential fold), yet any
    reorder/drop/duplicate/swap inside a shard flips it — the export
    determinism claim becomes checkable from the manifest alone.
    Composes the shared train keep-list sharding with
    shard_manifest(checksum_id_col=...)."""
    from etl_fuel_priceguide_ec2_spark.operators import export

    keep = _train_keep_list(spark, sf_dir)
    sharded = export.shard_positions(
        keep, "doc_id", n_shards=_N_SHARDS, seed=_SHARD_SEED
    )
    return export.shard_manifest(
        sharded, checksum_id_col="doc_id"
    ).select("shard", "n_docs", "max_pos", "content_checksum")


# ---------------------------------------------------------------------------
# Round-15: k-fold x export composition (VERDICT r14 item 4) — registered
# AFTER the round-15 freeze, leads the round-16 window
# ---------------------------------------------------------------------------


@register(
    "kfold_shard_manifest",
    """
    WITH sharded AS (
      SELECT doc_id, n_chars, fold,
             CAST(h % 8 AS BIGINT) AS shard,
             CAST(row_number() OVER (PARTITION BY h % 8
                                     ORDER BY h, doc_id) AS BIGINT) AS shard_pos
      FROM (
        SELECT doc_id, n_chars,
               CAST(CAST('0x' || substring(md5('cv|' || CAST(doc_id AS VARCHAR)),
                         1, 15) AS BIGINT) % 5 AS INT) AS fold,
               CAST('0x' || substring(md5('exp|' || CAST(doc_id AS VARCHAR)),
                         1, 15) AS BIGINT) AS h
        FROM documents
      )
    )
    SELECT fold, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substring(md5(CAST(shard_pos AS VARCHAR)
                      || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT))
             AS content_checksum
    FROM sharded
    GROUP BY fold, shard
    """,
)
def q_kfold_shard_manifest(spark, sf_dir):
    """The CV-training export pre-flight (VERDICT r14 item 4): k-fold
    assignment composed with the deterministic sharder into one
    per-(fold, shard) manifest — 40 rows (5 folds x 8 shards) of doc
    counts, char totals, and the order-sensitive content checksum. The
    sharding deliberately ignores the fold: shard byte order is the one
    global seeded shuffle, so a CV rotation drops fold f by SKIPPING
    its rows inside already-ordered shards (no re-shard, no re-write),
    and each (fold, shard) slice stays checksum-verifiable on its own.
    Fold disjointness is enforceable for external fold tables via
    export.assert_fold_disjoint (planted-leak negative test); here the
    folds are hash-assigned, disjoint by construction."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    from etl_fuel_priceguide_ec2_spark.operators import export

    return export.kfold_export_manifest(
        docs, "doc_id", n_shards=8, k=5, fold_seed="cv", shard_seed="exp",
        size_cols={"total_chars": "n_chars"},
    )
