"""Deterministic dataset splitting & mixture sampling for training-data
pipelines.

Both operators key every decision on a 60-bit md5-derived hash of the
row's id — no RNG state, no ordering dependence, no partitioning
dependence: the same row lands in the same split/sample on any cluster,
any partition count, any engine (the hash is bit-identical in DuckDB
via ``CAST('0x'||substring(md5(id),1,15) AS BIGINT)``, so both are
fully oracle-checkable — unlike ``sample()``/``randomSplit``, whose
membership is partition-dependent).

100 TB notes: both are pure per-row map work (the when-chain compiles
into codegen); zero shuffles, zero actions. Changing split fractions
re-buckets only the moved mass (consistent-hashing property of
thresholding one stable hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 10^4 buckets on the 60-bit hash: granularity 0.01% with exact integer
# thresholds (fraction * 10_000 must be integral — enforced).
_BUCKETS = 10_000


def _hash_bucket(id_col: str) -> Column:
    """Stable per-row bucket in [0, _BUCKETS): top-60-bits-of-md5 of the
    stringified id, mod buckets. Cross-engine reproducible."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return h % _BUCKETS


def hash_split(df: DataFrame, id_col: str, fractions: dict[str, float]) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    deterministic hash thresholding. ``fractions`` must sum to 1 and be
    multiples of 1/10000 (exact integer thresholds — no float boundary
    ambiguity). Contiguous bucket ranges in dict order."""
    total = round(sum(fractions.values()), 9)
    if total != 1.0:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bounds: list[tuple[str, int]] = []
    acc = 0
    for name, frac in fractions.items():
        ticks = frac * _BUCKETS
        if abs(ticks - round(ticks)) > 1e-9:
            raise ValueError(f"fraction {frac} for '{name}' is not a multiple of 1/{_BUCKETS}")
        acc += int(round(ticks))
        bounds.append((name, acc))
    bucket = _hash_bucket(id_col)
    expr: Column = F.lit(bounds[-1][0])  # fallback = last split
    col = None
    for name, upper in bounds:
        cond = bucket < upper
        col = F.when(cond, name) if col is None else col.when(cond, name)
    # when-chain evaluates in order, first match wins; final otherwise
    # is unreachable (acc == _BUCKETS) but keeps the column non-null
    return df.withColumn("split", col.otherwise(expr))


def kfold_assign(df: DataFrame, id_col: str, k: int, seed: str = "") -> DataFrame:
    """Add a ``fold`` column in [0, k) by deterministic id hashing —
    the cross-validation sibling of :func:`hash_split` (k-fold CV,
    ensembling shards, held-out rotation). Membership is a pure
    function of (seed, id): reproducible row-for-row on any cluster
    layout or rerun, and cross-engine replayable (the md5 bucket).
    Fold sizes are near-equal in expectation (hash-uniform), not
    exactly equal by construction — an exactly-balanced split needs a
    global rank (see ``shard_positions``), which costs a range
    exchange this operator deliberately avoids."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    key = F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")) if seed else F.col(
        id_col
    ).cast("string")
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return df.withColumn("fold", (h % k).cast("int"))


def mixture_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket falls under its stratum's rate (e.g. lang weights for a
    training mix). Strata absent from ``rates`` are dropped. Rates are
    multiples of 1/10000, checked like hash_split."""
    for name, rate in rates.items():
        ticks = rate * _BUCKETS
        if abs(ticks - round(ticks)) > 1e-9:
            raise ValueError(f"rate {rate} for '{name}' is not a multiple of 1/{_BUCKETS}")
        if not 0 <= rate <= 1:
            raise ValueError(f"rate {rate} for '{name}' outside [0, 1]")
    bucket = _hash_bucket(id_col)
    threshold: Column | None = None
    for name, rate in rates.items():
        ticks = F.lit(int(round(rate * _BUCKETS)))
        threshold = (
            F.when(F.col(strata_col) == name, ticks)
            if threshold is None
            else threshold.when(F.col(strata_col) == name, ticks)
        )
    threshold = threshold.otherwise(F.lit(0)) if threshold is not None else F.lit(0)
    return df.filter(bucket < threshold)


def mixture_upsample(
    df: DataFrame, id_col: str, strata_col: str, factors: dict[str, float]
) -> DataFrame:
    """Deterministic per-stratum REPLICATION with fractional epochs —
    the upsampling half of a pretraining source mix (``mixture_sample``
    only thins): every row of stratum s appears floor(f_s) times, plus
    once more iff its id-hash bucket falls under frac(f_s), so a
    factor of 2.3 means "2.3 epochs of this source" materialized
    exactly and reproducibly. factor < 1 degenerates to
    ``mixture_sample`` membership at the same rate (floor 0 + the
    identical bucket predicate); strata absent from ``factors`` (or at
    0) are dropped. Adds ``copy_idx`` (0-based BIGINT) so downstream
    stages — notably the export sharder, keyed on (id, copy_idx) — can
    keep replicas distinct.

    Fractions are multiples of 1/10000 like the other samplers (exact
    integer thresholds). Scale shape: pure map + a bounded explode
    (ceil(f) output rows per input row, no shuffle, no RNG state);
    membership and multiplicity are partition-layout- and
    engine-independent, so the upsampled corpus is oracle-checkable
    row-for-row."""
    copies: Column | None = None
    for name, f in factors.items():
        if f < 0:
            raise ValueError(f"factor {f} for '{name}' is negative")
        whole = int(f)
        frac_ticks = (f - whole) * _BUCKETS
        if abs(frac_ticks - round(frac_ticks)) > 1e-9:
            raise ValueError(
                f"factor {f} for '{name}' is not a multiple of 1/{_BUCKETS}"
            )
        n = F.lit(whole) + (
            _hash_bucket(id_col) < F.lit(int(round(frac_ticks)))
        ).cast("int")
        copies = (
            F.when(F.col(strata_col) == name, n)
            if copies is None
            else copies.when(F.col(strata_col) == name, n)
        )
    copies = copies.otherwise(F.lit(0)) if copies is not None else F.lit(0)
    return (
        df.withColumn("_n_copies", copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_n_copies").cast("long") - 1)
            ),
        )
        .drop("_n_copies")
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis): each row gets key = ln(u) / w where u is a
    stable md5-derived uniform in (0,1) and w its (positive) weight;
    the n largest keys form an exact weighted sample. Hash-derived u
    makes membership independent of partitioning, row order, and
    engine — the whole draw is reproducible and oracle-checkable,
    unlike rand()-based sampling.

    100 TB: one scan + one top-n (Spark runs the global row_number as
    a partial per-partition top-n before the single-partition final
    sort — see TakeOrderedAndProject — so no full sort materializes).
    Adds ``sample_rank`` (1..n, by key desc, id tiebreak).

    Rows with weight <= 0 (or NULL) are EXCLUDED before keying — the
    standard Efraimidis-Spirakis domain (w < 0 would flip ln(u)/w
    positive and always win; w == 0 yields -inf). Oracles must mirror
    the same ``weight > 0`` predicate."""
    # 60-bit hash -> u in (0, 1); +0.5 keeps u strictly inside (0,1)
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_es_key"), F.col(id_col))
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("_es_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .drop("_es_key")
    )


def temperature_allocation(
    df: DataFrame,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Temperature-based mixture allocation (tau = 0.5) — the standard
    multilingual/multi-source rebalancing step of a pretraining data
    mix: sampling weights proportional to n^tau flatten the corpus
    distribution (tau=1 keeps raw proportions and drowns low-resource
    groups; tau->0 is uniform and over-upsamples tails). Output per
    group: (group, n_docs, weight, share, planned_docs) with
    planned_docs = floor(share * budget).

    tau is fixed at 0.5 deliberately: sqrt is a correctly-rounded
    IEEE-754 primitive in both engines, where a general pow(n, tau)
    sits one libm ulp from the rounding boundary — the engine-
    portability discipline of the sketch tier applied to the mixing
    math. The share denominator sums 6-dp weights as DECIMAL
    (addition-order-free), so the allocation replays exactly in SQL.

    Plan: one map-side-combined count per group, a |groups|-row
    aggregate crossed back broadcast — nothing here scales with rows."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.round(F.sqrt(F.col("n_docs").cast("double")), 6)
    weighted = counts.withColumn("weight", w)
    tot = weighted.agg(
        F.sum(F.col("weight").cast("decimal(18,6)")).alias("_tot")
    )
    share = F.round(
        F.col("weight") / F.col("_tot").cast("double"), 6
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn("share", share)
        .withColumn(
            "planned_docs",
            F.floor(F.col("share") * F.lit(float(budget))).cast("long"),
        )
        .select(group_col, "n_docs", "weight", "share", "planned_docs")
    )
