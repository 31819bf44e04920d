"""Training-export sharder (operators/export.py): determinism,
density, manifest integrity, the pack-then-shard composition, and the
partitioned writer round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import export, textops
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

N_SHARDS = 4
SEED = "t"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )


@pytest.fixture(scope="module")
def sharded_rows(spark, docs):
    out = export.shard_positions(
        docs.select("doc_id", "n_chars"), "doc_id", N_SHARDS, seed=SEED
    )
    return out.collect()


def test_shards_cover_all_rows_with_dense_positions(docs, sharded_rows):
    assert len(sharded_rows) == docs.count()
    assert len({r.doc_id for r in sharded_rows}) == len(sharded_rows)
    by_shard: dict[int, list[int]] = {}
    for r in sharded_rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert len(by_shard) == N_SHARDS  # all shards populated at this n
    for shard, ps in by_shard.items():
        # dense 1..n positions, no gaps, no duplicates
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard}"


def test_sharding_is_layout_and_rerun_deterministic(docs, sharded_rows):
    """Same (shard, shard_pos) per id on any partition layout — the
    whole point vs randomSplit/repartition-based shuffles."""
    want = {r.doc_id: (r.shard, r.shard_pos) for r in sharded_rows}
    again = export.shard_positions(
        docs.select("doc_id", "n_chars").repartition(7, "n_chars"),
        "doc_id",
        N_SHARDS,
        seed=SEED,
    ).collect()
    assert {r.doc_id: (r.shard, r.shard_pos) for r in again} == want


def test_seed_reshuffles(docs):
    a = export.shard_positions(
        docs.select("doc_id"), "doc_id", N_SHARDS, seed="a"
    ).collect()
    b = export.shard_positions(
        docs.select("doc_id"), "doc_id", N_SHARDS, seed="b"
    ).collect()
    am = {r.doc_id: (r.shard, r.shard_pos) for r in a}
    bm = {r.doc_id: (r.shard, r.shard_pos) for r in b}
    assert am != bm  # a different seed is a different shuffle
    assert set(am) == set(bm)  # ... of the same rows


def test_manifest_matches_shards(spark, docs, sharded_rows):
    sharded = spark.createDataFrame(sharded_rows)
    man = {
        r.shard: r
        for r in export.shard_manifest(
            sharded, {"total_chars": "n_chars"}
        ).collect()
    }
    for shard in range(N_SHARDS):
        rows = [r for r in sharded_rows if r.shard == shard]
        assert man[shard].n_docs == len(rows)
        assert man[shard].max_pos == len(rows)  # density check
        assert man[shard].total_chars == sum(r.n_chars for r in rows)


def test_pack_then_shard_pipeline(spark, docs):
    """The export pipeline end-to-end: chunk -> pack into budget bins
    -> shard the BINS (one bin = one training sequence). Every bin
    lands in exactly one shard at exactly one position, and nothing is
    lost or duplicated between the stages."""
    chunks = textops.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8
    )
    packed = textops.pack_chunks(
        chunks, "doc_id", ["doc_id", "chunk_id"], "chunk_tokens", budget=128
    )
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("bin_tokens"),
    )
    n_bins = bins.count()
    sharded = export.shard_positions(bins, "bin_id", N_SHARDS, seed=SEED)
    rows = sharded.collect()
    assert len(rows) == n_bins
    assert len({r.bin_id for r in rows}) == n_bins
    man = export.shard_manifest(
        sharded, {"total_tokens": "bin_tokens"}
    ).collect()
    assert sum(r.n_docs for r in man) == n_bins
    assert all(r.max_pos == r.n_docs for r in man)
    # token conservation through the whole pipeline
    total = packed.agg(F.sum("chunk_tokens")).collect()[0][0]
    assert sum(r.total_tokens for r in man) == total


def test_writer_roundtrip_preserves_order(spark, docs, tmp_path):
    sharded = export.shard_positions(
        docs.select("doc_id", "n_chars"), "doc_id", N_SHARDS, seed=SEED
    )
    path = str(tmp_path / "shards")
    export.write_training_shards(sharded, path, N_SHARDS)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    want = {
        (r.shard, r.shard_pos): r.doc_id for r in sharded.collect()
    }
    got = {
        (r.shard, r.shard_pos): r.doc_id for r in back.collect()
    }
    assert got == want
    # partitioned layout: one directory per shard
    import os

    shard_dirs = [d for d in os.listdir(path) if d.startswith("shard=")]
    assert len(shard_dirs) == N_SHARDS


def test_manifest_checksum_writer_roundtrip_and_sensitivity(
    spark, docs, tmp_path
):
    """VERDICT r12 item 6: the content checksum closes the export
    determinism loop — the digest recomputed from the WRITTEN shards
    equals the manifest's (byte-identical replay verifiable from the
    manifest alone), and any reorder or drop inside a shard flips it."""
    sharded = export.shard_positions(
        docs.select("doc_id", "n_chars"), "doc_id", N_SHARDS, seed=SEED
    )
    man = {
        r.shard: r.content_checksum
        for r in export.shard_manifest(
            sharded, checksum_id_col="doc_id"
        ).collect()
    }
    path = str(tmp_path / "shards")
    export.write_training_shards(sharded, path, N_SHARDS)
    back = spark.read.parquet(path)
    man_back = {
        r.shard: r.content_checksum
        for r in export.shard_manifest(
            back, checksum_id_col="doc_id"
        ).collect()
    }
    assert man_back == man and len(man) == N_SHARDS

    # sensitivity: swapping two rows' positions within a shard flips
    # that shard's digest and no other's
    rows = sharded.collect()
    s0 = [r for r in rows if r.shard == rows[0].shard][:2]
    swapped = spark.createDataFrame(back.collect()).withColumn(
        "shard_pos",
        F.when(F.col("doc_id") == s0[0].doc_id, F.lit(s0[1].shard_pos))
        .when(F.col("doc_id") == s0[1].doc_id, F.lit(s0[0].shard_pos))
        .otherwise(F.col("shard_pos")),
    )
    man_sw = {
        r.shard: r.content_checksum
        for r in export.shard_manifest(
            swapped, checksum_id_col="doc_id"
        ).collect()
    }
    assert man_sw[s0[0].shard] != man[s0[0].shard]
    assert all(man_sw[s] == man[s] for s in man if s != s0[0].shard)

    # a dropped row flips the digest too (count alone would also catch
    # this; the digest catches it even if a duplicate rebalances counts)
    dropped = back.filter(F.col("doc_id") != s0[0].doc_id)
    man_dr = {
        r.shard: r.content_checksum
        for r in export.shard_manifest(
            dropped, checksum_id_col="doc_id"
        ).collect()
    }
    assert man_dr[s0[0].shard] != man[s0[0].shard]


def test_shard_positions_validates_args(docs):
    with pytest.raises(ValueError):
        export.shard_positions(docs, "doc_id", 0)


def test_contamination_manifest_flags_planted_dup(spark):
    """The composition's interesting path, planted: a keep-list doc
    that copies a benchmark doc must surface in its shard's
    n_contaminated with max_contamination ~ 1."""
    from etl_fuel_priceguide_ec2_spark.operators import textops as t

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, bench_text)]  # the benchmark doc
    rows += [(i, f"clean document number {i} with its own words entirely") for i in range(1, 9)]
    rows.append((9, bench_text))  # the planted contaminated training doc
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    bench = docs.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    contam = (
        t.contamination_check(
            docs, bench, "doc_id", "text", "bench_id", "bench_text", n=5
        )
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id")
        .agg(F.max("contamination").alias("contamination"))
    )
    keep = docs.filter(F.col("doc_id") > 0).select("doc_id")
    sharded = export.shard_positions(keep, "doc_id", 2, seed=SEED)
    man = (
        sharded.join(contam, "doc_id", "left")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(
                F.when(F.coalesce("contamination", F.lit(0.0)) >= 0.5, 1)
            ).cast("long").alias("n_contaminated"),
            F.round(
                F.max(F.coalesce("contamination", F.lit(0.0))), 6
            ).alias("max_contamination"),
        )
        .collect()
    )
    planted_shard = {r.doc_id: r.shard for r in sharded.collect()}[9]
    by_shard = {r.shard: r for r in man}
    assert by_shard[planted_shard].n_contaminated == 1
    assert by_shard[planted_shard].max_contamination == 1.0
    assert sum(r.n_contaminated for r in man) == 1


def test_example_training_export_pipeline(tmp_path):
    """examples/training_export_pipeline.py — split → chunk → pack →
    shard → write → manifest → pre-flight, with conservation at every
    seam."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "export_example",
        Path(__file__).parent.parent / "examples" / "training_export_pipeline.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main("/root/testdata/sf0.001", out_dir=str(tmp_path / "sh"))
    assert out["bins"] > 0
    assert out["manifest_docs"] == out["bins"] == out["written_rows"]
    assert out["dense"] is True
    assert out["shards"] <= mod.N_SHARDS


def test_example_streaming_export_pipeline(tmp_path):
    """examples/streaming_export_pipeline.py — micro-batched staging →
    replay-deduped finalize → shards, with the inline append-stability
    proof (streamed == batch sharding) asserted true."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "stream_export_example",
        Path(__file__).parent.parent / "examples" / "streaming_export_pipeline.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main("/root/testdata/sf0.001", out_dir=str(tmp_path))
    assert out["micro_batches"] >= 2
    assert out["identical_to_batch_sharding"] is True
    assert out["finalized_rows"] == out["ingested_docs"] == out["manifest_docs"]
    assert out["dense"] is True


def test_shard_positions_check_unique_ids(spark, docs):
    """VERDICT r11: duplicate ids silently corrupt the position
    contract (shared h, arbitrary tie-break) — the opt-in
    check_unique_ids pays one aggregate and raises loudly, naming the
    duplicate count; on a unique corpus it's a no-op passthrough."""
    unique = docs.select("doc_id").limit(100)
    ok = export.shard_positions(
        unique, "doc_id", N_SHARDS, seed=SEED, check_unique_ids=True
    ).collect()
    want = export.shard_positions(
        unique, "doc_id", N_SHARDS, seed=SEED
    ).collect()
    assert sorted(map(tuple, ok)) == sorted(map(tuple, want))

    planted = unique.unionAll(unique.limit(3))  # 3 duplicated ids
    with pytest.raises(ValueError, match="unique ids"):
        export.shard_positions(
            planted, "doc_id", N_SHARDS, seed=SEED, check_unique_ids=True
        )

    # A NULL id has zero duplicates yet still breaks the total order;
    # the diagnostic must name NULLs, not report a bogus duplicate
    # count (ADVICE r12: count_distinct ignores NULLs).
    with_null = unique.unionAll(
        unique.limit(1).select(F.lit(None).cast("string").alias("doc_id"))
    )
    with pytest.raises(ValueError, match="1 NULL ids, 0 duplicated"):
        export.shard_positions(
            with_null, "doc_id", N_SHARDS, seed=SEED, check_unique_ids=True
        )


def test_example_pretraining_corpus_build(tmp_path):
    """examples/pretraining_corpus_build.py — the composed capstone:
    gates → dedup → holdout → decontamination → mixture → pack →
    checked sharded export, with token conservation, density, and the
    zero-contamination pre-flight asserted inside the script itself."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "pretrain_build_example",
        Path(__file__).parent.parent / "examples" / "pretraining_corpus_build.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main("/root/testdata/sf0.001", out_dir=str(tmp_path))
    assert out["token_conservation"] is True
    assert out["dense"] is True
    assert out["preflight_contaminated"] == 0
    assert out["written_bins"] == out["bins"] > 0
    # the mixture stage exercised BOTH directions: at least one lang
    # upsampled (factor > 1, fractional epochs materialized) while the
    # overall pool moved toward the budget
    assert out["mixed_replicas"] > 0
    assert out["upsampled_langs"] >= 1
    # holdout and train are disjoint by construction
    assert out["train_docs"] + out["holdout_docs"] <= out["after_dedup"]


def test_kfold_export_manifest_counts_and_fold_invariance(spark, docs):
    """The CV pre-flight manifest (VERDICT r14 item 4): k*n_shards rows
    whose counts partition the corpus exactly, whose per-(fold, shard)
    doc counts sum to the plain per-shard manifest's, and whose shard
    assignment/positions are IDENTICAL to a fold-free sharding — the
    rotation claim (dropping a fold never re-shards) made checkable."""
    man = export.kfold_export_manifest(
        docs, "doc_id", n_shards=N_SHARDS, k=3, fold_seed="cv",
        shard_seed=SEED, size_cols={"total_chars": "n_chars"},
    ).collect()
    total = docs.count()
    assert sum(r.n_docs for r in man) == total
    assert {(r.fold, r.shard) for r in man} <= {
        (f, s) for f in range(3) for s in range(N_SHARDS)
    }
    # folding is invisible to the sharder: per-shard totals match the
    # fold-free manifest exactly
    plain = {
        r.shard: r.n_docs
        for r in export.shard_manifest(
            export.shard_positions(docs, "doc_id", N_SHARDS, seed=SEED)
        ).collect()
    }
    per_shard = {}
    for r in man:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + r.n_docs
    assert per_shard == plain
    # per-(fold, shard) checksums xor to a value consistent with the
    # full-shard digest: XOR of the fold slices == the shard's digest
    # (same (shard_pos, id) terms, partitioned by fold)
    full = {
        r.shard: r.content_checksum
        for r in export.shard_manifest(
            export.shard_positions(docs, "doc_id", N_SHARDS, seed=SEED),
            checksum_id_col="doc_id",
        ).collect()
    }
    xored = {}
    for r in man:
        xored[r.shard] = xored.get(r.shard, 0) ^ r.content_checksum
    assert xored == full


def test_kfold_export_manifest_external_folds_and_planted_leak(spark, docs):
    """External fold tables go through assert_fold_disjoint: a clean
    pre-assigned fold column passes and yields the same manifest as
    the k= path with the same seed; a PLANTED LEAK (the union of two
    assignment runs with different seeds — the classic way a fold
    table gets corrupted) must raise before any export math runs."""
    from etl_fuel_priceguide_ec2_spark.operators import sampling

    folded = sampling.kfold_assign(docs, "doc_id", 3, seed="cv")
    via_k = export.kfold_export_manifest(
        docs, "doc_id", n_shards=N_SHARDS, k=3, fold_seed="cv",
        shard_seed=SEED,
    )
    via_col = export.kfold_export_manifest(
        folded, "doc_id", n_shards=N_SHARDS, fold_col="fold",
        shard_seed=SEED,
    )
    assert sorted(map(tuple, via_k.collect())) == sorted(
        map(tuple, via_col.collect())
    )

    leaked = folded.unionByName(
        sampling.kfold_assign(docs, "doc_id", 3, seed="other")
    )
    with pytest.raises(ValueError, match="fold leak"):
        export.kfold_export_manifest(
            leaked, "doc_id", n_shards=N_SHARDS, fold_col="fold",
            shard_seed=SEED,
        )
    # NULL folds violate the membership contract too
    some_id = folded.select(F.min("doc_id")).first()[0]
    nulled = folded.withColumn(
        "fold",
        F.when(F.col("doc_id") == some_id, None).otherwise(F.col("fold")),
    )
    with pytest.raises(ValueError, match="NULL"):
        export.assert_fold_disjoint(nulled, "doc_id")

    with pytest.raises(ValueError, match="exactly one"):
        export.kfold_export_manifest(
            folded, "doc_id", n_shards=N_SHARDS, k=3, fold_col="fold"
        )
    with pytest.raises(ValueError, match="exactly one"):
        export.kfold_export_manifest(folded, "doc_id", n_shards=N_SHARDS)


def test_kfold_export_manifest_collision_guard(spark, docs):
    """Generated-name collisions fail eagerly (ADVICE r15, the
    pq_encode enforcement pattern): id_col='fold' with k= would be
    silently OVERWRITTEN by kfold_assign's withColumn (corrupting every
    position and checksum downstream), and a pre-existing fold/shard
    column would be clobbered the same way — all four shapes raise
    before any export math runs."""
    renamed = docs.withColumnRenamed("doc_id", "fold")
    with pytest.raises(ValueError, match="id_col 'fold' collides"):
        export.kfold_export_manifest(
            renamed, "fold", n_shards=N_SHARDS, k=3
        )
    with pytest.raises(ValueError, match="id_col 'shard_pos' collides"):
        export.kfold_export_manifest(
            docs.withColumnRenamed("doc_id", "shard_pos"),
            "shard_pos", n_shards=N_SHARDS, k=3,
        )
    # pre-existing 'fold' input column on the k= path (a stale
    # assignment riding along) must not be silently clobbered
    with pytest.raises(ValueError, match=r"\['fold'\] collide"):
        export.kfold_export_manifest(
            docs.withColumn("fold", F.lit(0)), "doc_id",
            n_shards=N_SHARDS, k=3,
        )
    with pytest.raises(ValueError, match=r"\['shard'\] collide"):
        export.kfold_export_manifest(
            docs.withColumn("shard", F.lit(0)), "doc_id",
            n_shards=N_SHARDS, k=3,
        )
    # the fold_col path still accepts its own fold column, and id_col
    # 'fold' is fine there (nothing generates over it)
    from etl_fuel_priceguide_ec2_spark.operators import sampling

    folded = sampling.kfold_assign(docs, "doc_id", 3, seed="cv")
    assert export.kfold_export_manifest(
        folded, "doc_id", n_shards=N_SHARDS, fold_col="fold"
    ).count() > 0


def test_kfold_export_manifest_size_cols_output_collision_raises(spark, docs):
    """size_cols OUTPUT names must not shadow the manifest's own
    columns (code-review r16): {'n_docs': ...} would emit two n_docs
    columns and downstream selects hit AMBIGUOUS_REFERENCE or silently
    read the wrong one — the same silent-clobber class the generated-
    name guard already collides loudly on."""
    import pytest

    for bad in ("n_docs", "content_checksum", "fold", "shard"):
        with pytest.raises(ValueError, match="size_cols"):
            export.kfold_export_manifest(
                docs, "doc_id", n_shards=4, k=2,
                size_cols={bad: "n_chars"},
            )
    # a well-named output still works
    ok = export.kfold_export_manifest(
        docs, "doc_id", n_shards=4, k=2, size_cols={"total_chars": "n_chars"}
    )
    assert "total_chars" in ok.columns
