"""Training-export sharding: the write-side end of the curation
pipeline (the load-stage role of the reference's DynamoDB writes,
``index.js:153-168``, re-expressed for training-data scale).

A training run wants the curated corpus as N shards with (a) a
DETERMINISTIC globally-shuffled order — same bytes per shard on any
cluster, any partition count, any rerun — and (b) a per-shard manifest
(doc counts, size totals) the loader can trust without re-scanning.
Random assignment can't give (a); this module keys everything on the
corpus's own ids through the repo's md5 idiom (``sampling._hash_bucket``
family — bit-identical in DuckDB, so assignment, order, and manifests
are all oracle-checkable):

    h(id)     = 60-bit md5 of (seed | id)   -- one hash per row
    shard     = h % n_shards                -- uniform bucket
    in-shard order = (h, id)                -- a seeded shuffle: within
                                               a shard, h/n is uniform,
                                               id breaks exact ties

Changing ``seed`` reshuffles everything; changing ``n_shards`` moves
only reassigned rows' positions. No RNG state anywhere.

100 TB notes: the hash and shard columns are pure per-row codegen. The
per-shard positions deliberately do NOT use
``row_number() OVER (PARTITION BY shard)`` — at 1000 executors a
100 TB / 1024-shard corpus puts ~100 GB through each window task.
Instead ``global_row_number`` (the two-pass distributed rank) ranks the
total order (shard, h, id) with ONE range exchange, and per-shard
positions follow by subtracting each shard's broadcast minimum rank —
an n_shards-row aggregate. The writer sorts within range partitions it
already has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators.util import global_row_number


def _shard_hash(id_col: str, seed: str) -> Column:
    """60-bit md5-derived hash of (seed | id) — the single source of
    both the shard assignment and the in-shard shuffle order.
    Cross-engine: DuckDB replays it as
    ``CAST('0x' || substring(md5('{seed}|' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT)``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def with_shard_keys(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """All input columns plus (shard, __h): the PURE-MAP half of the
    deterministic shuffle — per-row hash and bucket only, no rank.
    Streaming-safe by construction (a foreachBatch export writer can
    stage micro-batches with these columns and assign positions later:
    the total order (shard, __h, id) is append-stable, so the staged
    store finalizes to the same positions batch boundaries or not —
    ``streaming.feeds.training_export_stage_stream``)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn("__h", _shard_hash(id_col, seed)).withColumn(
        "shard", (F.col("__h") % n_shards).cast("long")
    )


def positions_from_staged(staged: DataFrame, id_col: str) -> DataFrame:
    """Dense 1-based in-shard positions over an already-keyed relation
    (carries the ``with_shard_keys`` columns): ONE global two-pass rank
    on (shard, __h, id) plus the broadcast n_shards-row min-rank join —
    never a per-shard window over the data."""
    ranked = global_row_number(staged, ["shard", "__h", id_col], out_col="__rn")
    # n_shards-row relation: each shard's minimum global rank; positions
    # are rank offsets, so no per-shard window over the data is needed
    mins = ranked.groupBy("shard").agg(F.min("__rn").alias("__rn0"))
    return (
        ranked.join(F.broadcast(mins), "shard")
        .withColumn(
            "shard_pos", (F.col("__rn") - F.col("__rn0") + 1).cast("long")
        )
        .drop("__h", "__rn", "__rn0")
    )


def assert_unique_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Fail loudly (ValueError with both counts) when ``id_col`` is not
    unique in ``df``; return ``df`` unchanged otherwise. ONE cheap
    aggregate (count vs approx-free countDistinct over the id column
    alone — no payload shuffles), so callers that can't prove
    uniqueness upstream can buy the shard-order contract for one extra
    job. Deliberately an action: the position contract is corrupted
    SILENTLY by duplicate ids (they share h and tie-break arbitrarily),
    which is strictly worse than an eager failure."""
    # count_distinct ignores NULLs, so a NULL id would trip the check
    # with a misleading "duplicated" message — count NULLs in the same
    # single aggregate and name them in the diagnostic (ADVICE r12).
    # NULL ids DO violate the contract (no total order through them).
    n, nd, n_null = df.select(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.count_if(F.col(id_col).isNull()).alias("n_null"),
    ).first()
    if n != nd + n_null or n_null:
        dup = n - nd - n_null
        raise ValueError(
            f"shard_positions requires unique ids and no NULLs: {n} rows, "
            f"{nd} distinct {id_col!r} values, {n_null} NULL ids, "
            f"{dup} duplicated"
        )
    return df


def shard_positions(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
    check_unique_ids: bool = False,
) -> DataFrame:
    """All input columns plus (shard, shard_pos): a deterministic
    global shuffle of ``df`` into ``n_shards`` shards with dense
    1-based positions inside each shard (position order = the seeded
    hash shuffle, id tiebreak). The contract a training loader needs:
    shard k's rows, sorted by shard_pos, are THE byte order of shard k
    — reproducible on any cluster layout.

    Requires unique ids (positions come from a strict total order on
    (shard, h, id); duplicate ids would share h and tie-break
    arbitrarily — enforce upstream, e.g. the curation keep-list).
    Pass ``check_unique_ids=True`` to pay one cheap aggregate
    (``assert_unique_ids``) and fail loudly instead of trusting the
    caller — the export examples do."""
    if check_unique_ids:
        df = assert_unique_ids(df, id_col)
    return positions_from_staged(
        with_shard_keys(df, id_col, n_shards, seed), id_col
    )


def shard_manifest(
    sharded: DataFrame,
    size_cols: dict[str, str] | None = None,
    checksum_id_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest over a ``shard_positions`` result: (shard,
    n_docs, max_pos, <total_x for each size col>[, content_checksum]).
    ``max_pos == n_docs`` iff positions are dense — the loader's cheap
    integrity check. ``size_cols`` maps output name -> input column to
    SUM (e.g. ``{"total_chars": "n_chars"}``). n_shards rows total —
    readable at a glance no matter the corpus size.

    With ``checksum_id_col`` set, adds ``content_checksum`` — an
    order-sensitive digest over the (shard_pos, id) chain: BIT_XOR of
    the 60-bit md5 of ``"<shard_pos>:<id>"``. XOR is commutative (the
    aggregate parallelizes with map-side combine, no sequential fold),
    yet the digest is order-SENSITIVE because each row's position is
    hashed into its term — any reorder, drop, duplicate, or swap flips
    some term and the digest (up to md5 collisions). The missing piece
    of the export determinism story: byte-identical shard replay is
    verifiable from this n_shards-row relation alone, cross-engine
    (DuckDB: ``bit_xor(CAST('0x' || substring(md5(shard_pos || ':' ||
    id), 1, 15) AS BIGINT))``)."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("shard_pos").cast("long").alias("max_pos"),
    ]
    for out, src in (size_cols or {}).items():
        aggs.append(F.sum(src).cast("long").alias(out))
    if checksum_id_col is not None:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("shard_pos").cast("string"),
                        F.lit(":"),
                        F.col(checksum_id_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        sharded = sharded.withColumn("_cs_h", h)
        aggs.append(F.expr("bit_xor(_cs_h)").alias("content_checksum"))
    return sharded.groupBy("shard").agg(*aggs)


def write_training_shards(
    sharded: DataFrame,
    path: str,
    n_shards: int,
) -> None:
    """Materialize a ``shard_positions`` result as
    ``path/shard=K/*.parquet`` with rows stored in shard_pos order.
    Range-partition on (shard, shard_pos) first so each output task
    holds a contiguous position range it can sort locally — the write
    adds no global sort, and huge shards split across tasks while
    still landing ordered within each file (readers merge files by
    their position ranges; at one-file-per-shard scale set
    ``n_shards`` partitions)."""
    (
        sharded.repartitionByRange(n_shards, "shard", "shard_pos")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def assert_fold_disjoint(
    df: DataFrame, id_col: str, fold_col: str = "fold"
) -> DataFrame:
    """Fail loudly (ValueError with both counts) when any id carries
    more than one fold value — the CV-export pre-flight: a fold leak
    (one document visible to a model both as training data and as its
    held-out eval) silently invalidates every score computed from the
    export, which is strictly worse than an eager failure. ONE cheap
    aggregate over (id, fold) pairs, no payload shuffle — same cost
    contract as :func:`assert_unique_ids`. Folds produced by
    ``sampling.kfold_assign`` are disjoint by construction (fold is a
    pure function of the id); this check exists for EXTERNAL fold
    relations — unions of assignment runs, hand-maintained eval sets —
    where nothing enforces it. NULLs in either column violate the
    contract (no fold membership through them) and are named in the
    diagnostic."""
    n_ids, n_pairs, n_null = df.select(
        F.count_distinct(F.col(id_col)).alias("n_ids"),
        F.count_distinct(F.col(id_col), F.col(fold_col)).alias("n_pairs"),
        F.count_if(
            F.col(id_col).isNull() | F.col(fold_col).isNull()
        ).alias("n_null"),
    ).first()
    if n_null or n_ids != n_pairs:
        raise ValueError(
            f"fold leak: {n_ids} distinct {id_col!r} values map to "
            f"{n_pairs} distinct ({id_col}, {fold_col}) pairs; "
            f"{n_null} rows with NULL id or fold"
        )
    return df


def kfold_export_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    k: int | None = None,
    fold_col: str | None = None,
    fold_seed: str = "",
    shard_seed: str = "",
    size_cols: dict[str, str] | None = None,
    check_unique_ids: bool = False,
) -> DataFrame:
    """Per-(fold, shard) training-export manifest — the composition of
    the k-fold assigner and the deterministic sharder into the CV
    pre-flight relation a training loader reads before touching bytes:
    (fold, shard, n_docs, <total_x...>, content_checksum), k*n_shards
    rows total.

    Folds come from exactly one of ``k`` (assign here via
    ``sampling.kfold_assign(seed=fold_seed)`` — disjoint by
    construction) or ``fold_col`` (a pre-existing column, e.g. a
    persisted assignment table — fold-DISJOINTNESS IS ASSERTED via
    :func:`assert_fold_disjoint`, one cheap aggregate, because nothing
    upstream enforces it). Sharding ignores the fold on purpose: the
    byte order of shard s is the one global seeded shuffle
    (``shard_positions``), so dropping fold f at train time means
    skipping its rows WITHIN the already-ordered shards — no re-shard,
    no re-shuffle, per-fold manifests still checksum-verifiable
    (``content_checksum`` is the order-sensitive XOR digest over
    (shard_pos, id), the ``shard_manifest`` construction, here scoped
    per (fold, shard)).

    100 TB shape: kfold_assign is pure map; shard_positions is ONE
    range exchange (the two-pass global rank); the manifest is a
    k*n_shards-row aggregate with map-side combine. Determinism: fold,
    shard, position, and digest are all pure functions of (seeds, id)
    — the manifest replays bit-for-bit on any cluster or engine.

    Note the fold check is not a uniqueness check: a DUPLICATED id
    with the same fold passes assert_fold_disjoint yet still violates
    the sharder's unique-id position contract — pass
    ``check_unique_ids=True`` (one extra aggregate) when uniqueness is
    not proven upstream, exactly as with ``shard_positions``."""
    from etl_fuel_priceguide_ec2_spark.operators import sampling

    if (k is None) == (fold_col is None):
        raise ValueError(
            "kfold_export_manifest: pass exactly one of k (assign folds "
            "here) or fold_col (pre-assigned folds, disjointness-checked)"
        )
    # Collide loudly up front (the pq_encode enforcement pattern,
    # ADVICE r15): the generated names below would otherwise silently
    # OVERWRITE the id column (id_col='fold' with k= clobbers the ids
    # via kfold_assign's withColumn) or a pre-existing input column,
    # corrupting positions and checksums with no error.
    generated = {"shard", "shard_pos", "__h", "__rn", "__rn0", "_cs_h"}
    if k is not None:
        generated.add("fold")  # kfold_assign writes it on this path
    if id_col in generated:
        raise ValueError(
            f"kfold_export_manifest: id_col {id_col!r} collides with a "
            f"generated column name ({'/'.join(sorted(generated))})"
        )
    clash = sorted(generated.intersection(df.columns))
    if clash:
        raise ValueError(
            f"kfold_export_manifest: input column(s) {clash} collide "
            "with generated column names — rename them first "
            f"({'/'.join(sorted(generated))} are reserved)"
        )
    # size_cols OUTPUT names must not shadow the manifest's own
    # columns either — size_cols={'n_docs': ...} would emit two n_docs
    # columns and every downstream select hits AMBIGUOUS_REFERENCE or
    # silently reads the wrong one (code-review r16)
    reserved_out = generated | {"n_docs", "content_checksum"}
    if fold_col is not None:
        reserved_out.add(fold_col)
    bad_out = sorted(o for o in (size_cols or {}) if o in reserved_out)
    if bad_out:
        raise ValueError(
            f"kfold_export_manifest: size_cols output name(s) {bad_out} "
            "collide with the manifest's own columns"
        )
    if k is not None:
        folded = sampling.kfold_assign(df, id_col, k, seed=fold_seed)
        fold_col = "fold"
    else:
        folded = assert_fold_disjoint(df, id_col, fold_col)
    sharded = shard_positions(
        folded, id_col, n_shards, seed=shard_seed,
        check_unique_ids=check_unique_ids,
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for out, src in (size_cols or {}).items():
        aggs.append(F.sum(src).cast("long").alias(out))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("shard_pos").cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    sharded = sharded.withColumn("_cs_h", h)
    aggs.append(F.expr("bit_xor(_cs_h)").alias("content_checksum"))
    return sharded.groupBy(F.col(fold_col).alias("fold"), "shard").agg(*aggs)
