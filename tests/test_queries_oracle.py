"""The self-imposed mirror of the driver's correctness gate: every
registry query is executed on Spark AND its DuckDB oracle, then compared
order-insensitively on row count, column names, and values.

Runs at sf0.001 for speed; the driver re-runs the same contract at
sf0.01.
"""

from __future__ import annotations

import pytest

from etl_fuel_priceguide_ec2_spark import contract, registry

ALL = sorted(registry.queries())
ORACLED = sorted(registry.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    builder = registry.queries()[name]
    sdf = builder(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    rel = ddb.sql(registry.oracle_sql()[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    # Compare the exact per-row repr strings the driver hashes (shared
    # implementation in contract.py) — strictly as strong as the
    # driver's sha256-over-reprs, plus a useful first-diff report.
    srs = contract.row_reprs([tuple(r) for r in spark_rows], spark_cols)
    drs = contract.row_reprs(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(srs, drs) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_non_oracled_query_runs(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_name_has_builder():
    qs = registry.queries()
    os_ = registry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


def test_rplsh_ann_recall_vs_exact(spark, sf_dir):
    """ANN sanity: candidates are real corpus ids, ranked by true
    cosine, and multiprobe recall beats the random-pick baseline.
    (Random vectors are LSH's worst case; clustered embeddings do far
    better — this bounds the mechanism, not the ceiling.)"""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=10)
    ann = similarity.cosine_topk_rplsh(emb, queries, "vec_id", "embedding", k=10, multiprobe_hamming=2)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    n_corpus = emb.count()
    recall = len(e & a) / len(e)
    random_baseline = 10 / n_corpus
    assert recall > 3 * random_baseline
    assert all(rank <= 10 for (_, _) in a for rank in [1])


def test_int8_ann_recall_vs_exact(spark, sf_dir):
    """int8 scalar quantization: top-5 neighbors nearly match the exact
    float cosine ranking (quantization error ~1%, far under the
    neighbor-gap scale of the fixture corpus)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    quant = similarity.cosine_topk_int8(emb, queries, "vec_id", "embedding", k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    assert len(e & a) / len(e) >= 0.9


def test_ivf_sq8_recall_vs_exact(spark, sf_dir):
    """IVF-SQ8 sanity: nprobe is the recall lever — recall against the
    exact float top-5 rises monotonically with probed cells (measured
    0.34 / 0.48 / 0.64 / 0.70 at nprobe 1-4 on this fixture; the L2
    coarse cells bound cosine recall on unnormalized vectors, the
    documented IVF property) and clears 0.6 at nprobe=3."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recalls = []
    for nprobe in (1, 3):
        ivfsq = similarity.cosine_topk_ivf_sq8(
            emb, queries, "vec_id", "embedding", k=5, cells=8, iters=2, nprobe=nprobe
        )
        a = {(r.query_id, r.neighbor_id) for r in ivfsq.collect()}
        recalls.append(len(e & a) / len(e))
    assert recalls[1] > recalls[0]
    assert recalls[1] >= 0.6


def test_ivf2_sq8_recall_vs_exact(spark, sf_dir):
    """Two-level IVF-SQ8 sanity: the probe BUDGET is the recall lever
    — recall against the exact float top-5 rises with probed composite
    cells (ranked by combined d1+d2). The budget scales with the
    k1*k2=64 cell granularity: 8 composite cells cover the corpus
    volume of ONE flat 8-cell IVF probe (measured curve on this
    fixture: 0.04/0.18/0.28/0.48 at nprobe 1/2/4/9)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import similarity
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recalls = []
    for nprobe in (2, 8):
        ann = similarity.cosine_topk_ivf2_sq8(
            emb, queries, "vec_id", "embedding", k=5, k1=8, k2=8, iters=2,
            nprobe=nprobe,
        )
        a = {(r.query_id, r.neighbor_id) for r in ann.collect()}
        recalls.append(len(e & a) / len(e))
    assert recalls[1] > recalls[0]
    assert recalls[1] >= 0.4


def test_codebook_cache_is_per_corpus(spark, sf_dir):
    """The fitted-codebook cache is keyed on the corpus dir: different
    corpora must produce different codebooks (no cross-corpus
    pollution), and repeated calls for one corpus must return the
    identical object (the amortization the cache exists for). The
    second corpus derives from the fixture root so the test follows
    SPARK_GRAFT_TEST_SF_DIR like every other test (ADVICE r04)."""
    import os

    from etl_fuel_priceguide_ec2_spark.registry import semantic

    other = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if other == sf_dir.rstrip("/") or not os.path.isdir(other):
        other = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    a1 = semantic._corpus_codebook(spark, sf_dir)
    a2 = semantic._corpus_codebook(spark, sf_dir)
    b = semantic._corpus_codebook(spark, other)
    assert a1 is a2
    assert a1 != b


def test_priority_list_names_exist_in_registry():
    """A typo in the hand-maintained _ROUND_PRIORITY must fail loudly —
    silently dropping a query from the frozen driver window is the
    failure mode ADVICE r05 flagged. _ordered() raises on unknown
    names; this pins both the current list's validity and the guard."""
    from etl_fuel_priceguide_ec2_spark.registry import base

    assert set(base._ROUND_PRIORITY) <= set(base._REGISTRY)
    base._ROUND_PRIORITY.append("no_such_query_xyz")
    try:
        with pytest.raises(KeyError):
            registry.queries()
    finally:
        base._ROUND_PRIORITY.pop()


def test_bm25_from_persisted_slices_identical(spark, sf_dir, tmp_path):
    """The retrieval-state lifecycle: postings + doc lengths built
    per corpus SLICE at ingest, persisted, unioned (disjoint doc ids
    -> plain concat is the merge), then scored with
    bm25_topk_from_postings — ranking byte-identical to the direct
    text-path bm25_topk over the whole corpus."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import retrieval
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "spark"), (1, "query"), (2, "hash"), (2, "join")],
        "query_id int, token string",
    )
    direct = registry  # noqa: F841  (keep import style consistent)
    expect = sorted(
        map(tuple, retrieval.bm25_topk(docs, queries, "doc_id", "text", topk=5).collect())
    )

    store = tmp_path / "retrieval_state"
    for i in range(3):  # three ingest slices by doc_id mod
        s = docs.filter(F.col("doc_id") % 3 == i)
        retrieval.inverted_postings(s, "doc_id", "text").write.mode("append").parquet(
            str(store / "postings")
        )
        retrieval.doc_lengths(s, "doc_id", "text").write.mode("append").parquet(
            str(store / "doclens")
        )
    got = sorted(
        map(
            tuple,
            retrieval.bm25_topk_from_postings(
                spark.read.parquet(str(store / "postings")),
                spark.read.parquet(str(store / "doclens")),
                docs.count(),
                queries,
                "doc_id",
                topk=5,
            ).collect(),
        )
    )
    assert got == expect


def test_round6_operator_empty_and_degenerate_edges(spark):
    """Defined, non-crashing answers on degenerate inputs for the
    round-6 operators: BM25 with no matching query term -> empty
    ranking; KMV on an empty relation -> empty sketch and an exact-0
    report; RRF with a ranking absent on one side -> one-term scores;
    z-order on a constant column -> all curve bits from the varying
    column."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import layout, retrieval, sketches

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    queries = spark.createDataFrame([(1, "zzz_absent")], "query_id int, token string")
    assert retrieval.bm25_topk(docs, queries, "doc_id", "text").count() == 0

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert sketches.kmv_sketch(empty, "k", k=8).count() == 0
    rep = sketches.kmv_intersection_report(empty, empty, "k", "k", k=8).collect()[0]
    assert rep.n_union_sketch == 0 and rep.kmv_rho == 0

    ra = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
    rb = spark.createDataFrame(
        [], "query_id long, doc_id long, rank int"
    )
    fused = retrieval.rrf_fuse(ra, rb, "query_id", "doc_id").collect()
    assert len(fused) == 1 and abs(fused[0].rrf_score - 1 / 61) < 1e-9

    const = spark.range(8).select(
        F.lit(5).alias("a"), F.col("id").alias("b")
    )
    z = const.select(layout.zorder_value(const, ["a", "b"], bits=4).alias("z")).collect()
    assert len({r.z for r in z}) == 8  # varying column still separates


def test_incremental_lsh_reconstructs_full_relation(spark, sf_dir):
    """The incremental contract: pairs(history-only run) UNION
    pairs(incremental new-vs-all run) == pairs(from-scratch full
    corpus), with zero overlap between the two parts — so a daily
    pipeline that appends incremental results converges to exactly
    the batch answer."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 5 != 4)
    new = docs.filter(F.col("doc_id") % 5 == 4)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    full = rows(dedup.minhash_lsh_pairs(docs, "doc_id", "text"))
    prior = rows(dedup.minhash_lsh_pairs(history, "doc_id", "text"))
    incr = rows(
        dedup.minhash_lsh_pairs_incremental(history, new, "doc_id", "text")
    )
    assert sorted(prior + incr) == full
    assert not (set(prior) & set(incr))


def test_round7_operator_empty_and_degenerate_edges(spark):
    """Defined, non-crashing answers on degenerate inputs for the
    round-7 operators: exact-substring on an empty corpus / docs
    shorter than k -> empty spans; span coverage still decides every
    doc; classifier with an empty lexicon -> all-zero scores that
    still keep at threshold 0; incremental spans with empty history ==
    from-scratch over the new slice; BPE encode on a no-word corpus ->
    empty vocab."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup, textops

    empty = spark.createDataFrame([], "doc_id: bigint, text: string")
    assert dedup.exact_substring_spans(empty, "doc_id", "text").count() == 0
    assert dedup.duplicated_span_coverage(empty, "doc_id", "text").count() == 0

    short = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id: bigint, text: string"
    )
    assert (
        dedup.exact_substring_spans(
            short, "doc_id", "text", k=8, min_span_tokens=8
        ).count()
        == 0
    )
    cov = {
        r.doc_id: r
        for r in dedup.duplicated_span_coverage(
            short, "doc_id", "text", k=8, min_span_tokens=8
        ).collect()
    }
    assert len(cov) == 2 and all(not r.drop for r in cov.values())

    # empty history: incremental == from-scratch over the new slice
    s = " ".join(f"s{i}" for i in range(20))
    new = spark.createDataFrame(
        [(1, s + " one"), (2, s + " two")], "doc_id: bigint, text: string"
    )
    hstate = dedup.positional_gram_state(empty, "doc_id", "text", k=8)
    nstate = dedup.positional_gram_state(new, "doc_id", "text", k=8)
    t = lambda rows: {tuple(r) for r in rows}
    assert t(
        dedup.exact_substring_spans_incremental(
            hstate, nstate, k=8, min_span_tokens=15, max_gram_freq=None
        ).collect()
    ) == t(
        dedup.exact_substring_spans(
            new, "doc_id", "text", k=8, min_span_tokens=15, max_gram_freq=None
        ).collect()
    )

    empty_lex = spark.createDataFrame([], "term: string, weight: decimal(12,6)")
    w = textops.quality_classifier_weights(empty_lex)
    out = textops.quality_classifier_scores(
        new, "doc_id", "text", w, threshold=0.0
    ).collect()
    assert len(out) == 2
    assert all(r.n_matched == 0 and r.score == 0.0 and r.keep for r in out)

    nowords = spark.createDataFrame(
        [(1, "123 456 !!")], "doc_id: bigint, text: string"
    )
    assert textops.bpe_encode_words(nowords, "text", iters=1).count() == 0
