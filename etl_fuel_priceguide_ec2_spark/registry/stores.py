"""Session-scoped per-corpus materialized-state caches.

The persisted-store stand-in pattern (rounds 11/12): relations that are
PERSISTED STATE in production (the Z-order layout, the hashed
doc-embedding store, fitted models) get built + localCheckpointed ONCE
per (session, corpus dir) and read back by every consumer, instead of
recomputing the build pipeline per query call. Deterministic builds
only — caching changes cost, never results; same corpus-immutability
caveat as the codebook cache (``registry/semantic.py``).

Lives in its own module so ``registry/base.py`` holds nothing but the
frozen window pins and the register/_ordered machinery — the freeze
claim ("base.py untouched since the freeze commit") stays byte-checkable
(VERDICT r12 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# key = (applicationId, sf_dir, name) -> localCheckpointed DataFrame
_STORE_CACHE: dict[tuple, DataFrame] = {}
# keys whose cached DataFrame is a PLAIN relation (a durable store's
# parquet read-back) — nothing checkpointed, so _unpersist_all must
# skip them: their analyzed plan has no LogicalRDD and the reflective
# unpersist would raise the private-API-change warning spuriously
_PLAIN_KEYS: set[tuple] = set()


def _evict_other_apps(app_id: str) -> None:
    # Evict entries from other (stopped or replaced) Spark applications:
    # a process that cycles sessions would otherwise accumulate dead
    # DataFrame handles forever (ADVICE r12). Their RDDs died with the
    # owning SparkContext, so dropping the references is sufficient.
    stale = [k for k in _STORE_CACHE if k[0] != app_id]
    for k in stale:
        del _STORE_CACHE[k]
        _PLAIN_KEYS.discard(k)


def corpus_store(spark: SparkSession, sf_dir: str, name: str, build):
    app_id = spark.sparkContext.applicationId
    _evict_other_apps(app_id)
    key = (app_id, sf_dir, name)
    if key not in _STORE_CACHE:
        _STORE_CACHE[key] = build().localCheckpoint(eager=True)
    return _STORE_CACHE[key]


def corpus_store_group(
    spark: SparkSession, sf_dir: str, names: list[str], build_all
) -> dict[str, DataFrame]:
    """Group form of :func:`corpus_store` for state relations that are
    cheapest mined in ONE shared pass (e.g. the curation capstone's
    seven signal relations, which share the corpus scan, the shingle
    relation, and the classifier featurization): ``build_all`` returns
    a dict of DataFrames keyed by ``names`` and runs only when at
    least one member is missing; every member is then checkpointed
    under its own key. Same determinism/immutability contract as the
    single-relation form."""
    app_id = spark.sparkContext.applicationId
    _evict_other_apps(app_id)
    keys = {n: (app_id, sf_dir, n) for n in names}
    if any(k not in _STORE_CACHE for k in keys.values()):
        built = build_all()
        missing = [n for n in names if n not in built]
        if missing:
            raise KeyError(
                f"corpus_store_group: build_all omitted {missing}"
            )
        for n in names:
            # fill only the gaps: overwriting an already-cached member
            # would re-checkpoint a duplicate and strand the old blocks
            # until GC (code-review: partial seeding via corpus_store
            # or an overlapping group must not rebuild the rest)
            if keys[n] not in _STORE_CACHE:
                _STORE_CACHE[keys[n]] = built[n].localCheckpoint(
                    eager=True
                )
    return {n: _STORE_CACHE[keys[n]] for n in names}


def clear_store_cache() -> None:
    """Drop every cached per-corpus store — for callers that rewrite
    data under a previously-built corpus dir within one process. Where
    the owning session is still alive, the localCheckpointed blocks
    are actually freed, not just dereferenced (ADVICE r12): a
    checkpointed DataFrame's plan is a LogicalRDD WRAPPING the
    persisted RDD, so the unpersist must go through
    ``queryExecution().analyzed().rdd()`` — ``df.rdd`` derives a NEW
    unpersisted RDD and unpersisting it is a silent no-op (verified:
    getPersistentRDDs 1 -> 0 via the plan handle, unchanged via
    df.rdd; code-review r13)."""
    try:
        _unpersist_all()
    finally:
        # the cache must ALWAYS end cleared — under warnings-as-errors
        # the RuntimeWarning below raises, and stale handles surviving
        # a clear would be worse than the leak it reports
        # (code-review r14)
        _STORE_CACHE.clear()
        _PLAIN_KEYS.clear()


def _unpersist_all() -> None:
    for key, df in _STORE_CACHE.items():
        if key in _PLAIN_KEYS:
            continue  # plain parquet handle — nothing persisted to free
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception as ex:
            # Expected only when the owning SparkContext has stopped
            # (nothing reachable to free). If the context is still
            # alive, the private analyzed-plan path itself broke — a
            # Spark upgrade moving the API must degrade LOUDLY to the
            # ContextCleaner fallback, not silently leak until GC
            # (VERDICT r13 item 8; the warning is test-pinned).
            alive = False
            try:
                sc = df.sparkSession.sparkContext
                alive = sc._jsc is not None and not sc._jsc.sc().isStopped()
            except Exception:
                pass
            if alive:
                import warnings

                warnings.warn(
                    "clear_store_cache: analyzed-plan unpersist failed on a "
                    f"live SparkContext ({ex!r}) — Spark private API change? "
                    "Blocks will only be reclaimed by the ContextCleaner "
                    "after the references drop.",
                    RuntimeWarning,
                    stacklevel=2,
                )


# --- durable (parquet-backed) group store (VERDICT r15 item 4) -------
#
# corpus_store_group kills the re-mine within a session but leaves the
# COLD-START cliff: a fresh process (the per-round driver bench, a new
# cluster job) pays the full signal mining on its first decision call
# (measured 16.6 s cold vs 2.6 s warm on the capstone at sf0.1). In
# production those signal relations are persisted state — an ingest
# pipeline writes them once and every decision refresh reads parquet.
# This helper is that persistence: members are written under
# $TMPDIR/<package>_stores/<group>_<tag>_<fingerprint>/ on first build
# and read back by every later SESSION, so cold rep-1 pays a parquet
# read instead of the mining. The cache key embeds a corpus
# FINGERPRINT (mtime+size of the corpus table files — the bench media
# cache's ADVICE-r12 pattern), so a regenerated fixture dir can never
# serve stale signals — the fp keys BOTH the parquet generation dir
# and the session-cache entries; superseded generations are pruned
# after a grace period. Determinism unchanged: builds are
# deterministic and parquet
# round-trips the exact values, so the store is correctness-invisible
# (the from-scratch oracle pins it every round).

_STORES_DIRNAME = "etl_fuel_priceguide_ec2_spark_stores"


def _corpus_tag(sf_dir: str) -> str:
    """Filesystem-safe generation tag for a corpus dir. The readable
    sanitized path alone is AMBIGUOUS — '/a/b_c' and '/a/b/c' both
    sanitize to 'a_b_c', so pruning or clearing one corpus could wipe
    the other's generations (code-review r16); a short digest of the
    normalized raw path disambiguates."""
    import hashlib
    import os
    import re

    norm = os.path.abspath(sf_dir)
    safe = re.sub(r"[^0-9a-zA-Z.]", "_", norm.strip("/"))
    return f"{safe}_{hashlib.md5(norm.encode()).hexdigest()[:6]}"


# grace period before a superseded generation dir may be pruned: long
# enough that a concurrent process's in-flight queries against the old
# generation finish, short enough that /tmp never accumulates more
# than one superseded generation per (group, tag) in practice
_STALE_GENERATION_GRACE_SECONDS = 3600.0


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """mtime_ns+size digest of the corpus table's parquet file(s) —
    changes on any rewrite of the fixture dir."""
    import hashlib
    import os

    p = os.path.join(sf_dir, f"{table}.parquet")
    paths = [p]
    if os.path.isdir(p):
        paths += [os.path.join(p, x) for x in sorted(os.listdir(p))]
    st = [(os.stat(x).st_mtime_ns, os.stat(x).st_size) for x in paths]
    return hashlib.md5(repr(st).encode()).hexdigest()[:10]


def durable_corpus_store_group(
    spark: SparkSession,
    sf_dir: str,
    group: str,
    names: list[str],
    build_all,
    table: str = "documents",
) -> dict[str, DataFrame]:
    """Parquet-backed :func:`corpus_store_group`: same build-once
    contract, but the materialization survives the process. Layering:
    session cache (localCheckpoint-free handles — the parquet read IS
    the materialization) -> parquet store -> ``build_all``. The group
    is atomic via a ``_GROUP_DONE`` marker written only after every
    member landed — a killed writer leaves no half-readable store."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    app_id = spark.sparkContext.applicationId
    _evict_other_apps(app_id)
    # the FINGERPRINT is part of the session-cache key (code-review
    # r16): without it, an in-process fixture regeneration would hit
    # the early-return below and serve handles pointing at the OLD
    # generation's parquet — exactly the staleness the fp exists to
    # prevent. Stale-fp handles for the same (sf_dir, group) are
    # evicted here so they can't outlive their (prunable) generation.
    fp = corpus_fingerprint(sf_dir, table)
    prefix = f"{group}@"
    stale_keys = [
        k
        for k in _STORE_CACHE
        if k[1] == sf_dir
        and k[2].startswith(prefix)
        and not k[2].startswith(f"{group}@{fp}:")
    ]
    for k in stale_keys:
        del _STORE_CACHE[k]
        _PLAIN_KEYS.discard(k)
    keys = {n: (app_id, sf_dir, f"{group}@{fp}:{n}") for n in names}
    if all(k in _STORE_CACHE for k in keys.values()):
        return {n: _STORE_CACHE[keys[n]] for n in names}

    tag = _corpus_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), _STORES_DIRNAME)
    base = os.path.join(root, f"{group}_{tag}_{fp}")
    # one LIVE generation per (group, tag): a regenerated fixture gets
    # a new fp. Old generations (and orphaned .building dirs from a
    # killed writer — the glob matches them too) are pruned only after
    # a grace period — an immediate rmtree could delete parquet another
    # LIVE process's plain read-back handles still reference mid-query
    # (code-review r16); clear_durable_stores() remains the
    # deterministic wipe.
    cutoff = time.time() - _STALE_GENERATION_GRACE_SECONDS
    for stale in glob.glob(os.path.join(root, f"{group}_{tag}_*")):
        try:
            old_enough = os.stat(stale).st_mtime < cutoff
        except OSError:
            continue
        if stale != base and old_enough:
            shutil.rmtree(stale, ignore_errors=True)
    marker = os.path.join(base, "_GROUP_DONE")

    def _generation_complete() -> bool:
        # the marker alone is not enough evidence: a later release may
        # request a member an old blessed generation never wrote (the
        # corpus fp does not change with CODE) — trust the generation
        # only when every requested member is present (code-review r16)
        return os.path.exists(marker) and all(
            os.path.exists(os.path.join(base, f"{n}.parquet")) for n in names
        )

    if not _generation_complete():
        if os.path.exists(marker):
            # blessed by an older code version but missing a member
            # this version needs: rebuild the whole group coherently
            shutil.rmtree(base, ignore_errors=True)
        built = build_all()
        missing = [n for n in names if n not in built]
        if missing:
            raise KeyError(
                f"durable_corpus_store_group: build_all omitted {missing}"
            )
        # build into a PRIVATE dir and publish with one atomic rename:
        # two processes racing the first-ever build would otherwise
        # interleave overwrite-writes under the same member paths and
        # bless a torn mix with the marker (code-review r16)
        work = f"{base}.building.{os.getpid()}"
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work)
        for n in names:
            built[n].write.mode("overwrite").parquet(
                os.path.join(work, f"{n}.parquet")
            )
        with open(os.path.join(work, "_GROUP_DONE"), "w") as f:
            f.write(fp)
        try:
            os.rename(work, base)
        except OSError:
            if _generation_complete():
                # a concurrent builder won the publish race with a
                # complete generation — use theirs, discard ours
                shutil.rmtree(work, ignore_errors=True)
            else:
                # an incomplete leftover (crashed pre-atomic-rename
                # writer) blocks the slot: clear it and publish ours
                shutil.rmtree(base, ignore_errors=True)
                os.rename(work, base)
    for n in names:
        if keys[n] not in _STORE_CACHE:
            _STORE_CACHE[keys[n]] = spark.read.parquet(
                os.path.join(base, f"{n}.parquet")
            )
            _PLAIN_KEYS.add(keys[n])
    return {n: _STORE_CACHE[keys[n]] for n in names}


def clear_durable_stores(sf_dir: str | None = None) -> None:
    """Remove parquet-backed store generations (plus the session
    handles pointing at them) — the durable analogue of
    :func:`clear_store_cache` for tests and fixture rewrites that must
    force a re-mine rather than a re-read.

    ``sf_dir`` scopes the wipe to ONE corpus dir's generations; the
    default clears everything. Tests exercising the re-mine path MUST
    pass their own sf_dir: an unscoped clear from a sf0.001 test would
    also evict the sf0.1 store that the bench's cold rep-1 depends on,
    silently turning the measured fresh-process read-back (~3.6 s)
    back into a full re-mine (~17 s) on the next bench run."""
    import glob
    import os
    import shutil
    import tempfile

    clear_store_cache()
    root = os.path.join(tempfile.gettempdir(), _STORES_DIRNAME)
    if sf_dir is None:
        shutil.rmtree(root, ignore_errors=True)
        return
    tag = _corpus_tag(sf_dir)
    for gen in glob.glob(os.path.join(root, f"*_{tag}_*")):
        shutil.rmtree(gen, ignore_errors=True)
