"""Cardinality-sketch tier: accuracy vs exact, branch coverage, and
the merge-plan property (the shuffle carries registers, not keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import sketches
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table


def test_hll_accuracy_vs_exact(spark, sf_dir):
    """b=8 (256 registers) -> 1.04/sqrt(256) ~ 6.5% standard error;
    assert within 3 sigma (20%) on both estimator branches: the
    high-cardinality event_id corpus (raw HLL) and the per-type user
    counts (linear counting)."""
    events = load_table(spark, sf_dir, "events")

    est = sketches.hll_cardinality(events, "event_id", b=8).collect()[0]
    exact = events.select("event_id").distinct().count()
    assert abs(est.n_distinct_est - exact) / exact < 0.20

    per_type = {
        r.event_type: r.n_distinct_est
        for r in sketches.hll_cardinality(events, "user_id", ["event_type"], b=8).collect()
    }
    exact_type = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("cnt"))
        .collect()
    }
    assert set(per_type) == set(exact_type)
    for t, ex in exact_type.items():
        assert abs(per_type[t] - ex) / ex < 0.20, (t, per_type[t], ex)


def test_hll_branches_and_duplicates(spark):
    """Estimate depends only on the DISTINCT key set (duplicates land
    in identical registers), and the two estimator branches engage
    where designed: tiny inputs -> linear counting (empty registers),
    inputs >> 2.5m -> the raw harmonic-mean estimator."""
    small = spark.range(0, 30).select(F.col("id").alias("k"))
    small_dup = small.union(small).union(small)
    e1 = sketches.hll_cardinality(small, "k", b=8).collect()[0]
    e2 = sketches.hll_cardinality(small_dup, "k", b=8).collect()[0]
    assert e1.n_distinct_est == e2.n_distinct_est
    assert e1.buckets_hit <= 30
    # linear counting is exact-ish at 30 distinct / 256 registers
    assert abs(e1.n_distinct_est - 30) < 5

    big = spark.range(0, 20000).select(F.col("id").alias("k"))
    eb = sketches.hll_cardinality(big, "k", b=8).collect()[0]
    # raw-branch estimate: every register occupied, no linear fallback
    assert eb.buckets_hit == 256
    assert abs(eb.n_distinct_est - 20000) / 20000 < 0.20


def test_hll_merge_equals_direct(spark, sf_dir):
    """Mergeability, the property the register/merge/estimate split
    exists for: per-day registers merged with a per-bucket MAX give a
    BIT-IDENTICAL estimate to sketching the whole corpus directly
    (max is associative + idempotent), so incremental rollups are
    exact re-aggregations, not approximations of approximations."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.to_date("ts").alias("day"), "user_id")
    direct = sketches.hll_cardinality(events, "user_id", b=8).collect()[0]
    merged = sketches.hll_estimate(
        sketches.hll_merge(sketches.hll_registers(days, "user_id", ["day"], b=8)),
        b=8,
    ).collect()[0]
    assert merged.n_distinct_est == direct.n_distinct_est
    assert merged.buckets_hit == direct.buckets_hit


def test_cms_one_sided_and_bounded(spark, sf_dir):
    """CMS guarantee: est >= true count for every probe key, and the
    overshoot is bounded by collision mass (expected total/w per row,
    min over d rows — assert 4x the expectation as a slack bound)."""
    events = load_table(spark, sf_dir, "events")
    probes = [0, 1, 2, 3, 17, 42, 99, 123]
    est = {
        r.user_id: r.est_count
        for r in sketches.cms_point_counts(events, "user_id", probes, d=4, w=256).collect()
    }
    true = {
        r.user_id: r.cnt
        for r in events.filter(F.col("user_id").isin(probes))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = events.count()
    for k in probes:
        t = true.get(k, 0)
        assert est[k] >= t, (k, est[k], t)
        assert est[k] - t <= 4 * n / 256, (k, est[k], t)


def test_dd_quantiles_relative_error(spark, sf_dir):
    """DDSketch-style bins: every estimated quantile is within the
    designed 6.25% relative error of the exact percentile (plus a bin
    of slack for the discrete cut)."""
    orders = load_table(spark, sf_dir, "orders")
    got = {r.q: r.est_value for r in sketches.dd_quantiles(orders, "o_totalprice").collect()}
    exact = orders.selectExpr(
        "percentile(o_totalprice, array(0.5D, 0.9D, 0.99D)) AS p"
    ).collect()[0].p
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(got[q] - ex) / ex < 0.08, (q, got[q], ex)


def test_heavy_hitters_sample_then_verify(spark, sf_dir):
    """The composed two-phase heavy-hitter query: every candidate's
    CMS verification bound dominates its TRUE full-corpus count
    (one-sided), candidates arrive as a relation (10 rows), and the
    estimate never exceeds the total row count."""
    from etl_fuel_priceguide_ec2_spark import registry

    got = registry.queries()["heavy_hitter_users"](spark, sf_dir).collect()
    assert len(got) == 10
    events = load_table(spark, sf_dir, "events")
    true = {
        r.user_id: r.cnt
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = events.count()
    for r in got:
        assert r.est_count >= true[r.user_id], (r.user_id, r.est_count, true[r.user_id])
        assert r.est_count <= n


def test_bloom_no_false_negatives_and_fp_band(spark, sf_dir):
    """Bloom guarantees: probing the filter with its own build set
    passes EVERY key (no false negatives, exhaustively); probing with
    a disjoint key set passes only by collision, at a rate in the band
    the m/n/k sizing predicts (~7% here; assert < 20%)."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 400000)
    self_probe = sketches.bloom_membership_report(
        hi, hi, "o_orderkey", "o_orderkey"
    ).collect()[0]
    assert self_probe.n_bloom_pass == self_probe.n_probe_keys
    assert self_probe.n_false_positives == 0

    lo = orders.filter(F.col("o_totalprice") <= 400000)
    disjoint = sketches.bloom_membership_report(
        hi, lo, "o_orderkey", "o_orderkey"
    ).collect()[0]
    assert disjoint.n_true_members == 0
    assert disjoint.n_false_positives / disjoint.n_probe_keys < 0.20


def test_sketch_empty_input_edges(spark):
    """Degenerate inputs have defined, non-crashing answers: an empty
    corpus estimates 0 distinct (linear counting at zeros == m), the
    quantile sketch of an empty/non-positive column is an empty
    relation, and a Bloom filter built from nothing rejects every
    probe (NULL word lookup fails the all-bits test)."""
    empty = spark.range(0).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    some = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") + 1).cast("double").alias("v")
    )
    e = sketches.hll_cardinality(empty, "k", b=8).collect()[0]
    assert e.buckets_hit == 0 and e.n_distinct_est == 0.0
    assert sketches.dd_quantiles(empty, "v").count() == 0
    neg = some.withColumn("v", -F.col("v"))
    assert sketches.dd_quantiles(neg, "v").count() == 0
    r = sketches.bloom_membership_report(empty, some, "k", "k").collect()[0]
    assert r.n_probe_keys == 5 and r.n_bloom_pass == 0 and r.n_false_positives == 0


def test_hll_shuffle_carries_registers_not_keys(spark, sf_dir):
    """Plan property: the aggregate is two-level (partial max(rho)
    map-side before the exchange), so the shuffled relation is the
    fixed-width register table — at 100 TB the exchange moves
    O(groups * 2^b) rows regardless of input size."""
    events = load_table(spark, sf_dir, "events")
    df = sketches.hll_cardinality(events, "user_id", ["event_type"], b=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # partial_max over (event_type, bucket) appears BELOW the exchange
    assert "partial_max" in plan or "HashAggregate" in plan
    first_exchange = plan.find("Exchange")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1 and first_exchange != -1


def test_pack_chunks_by_group_dense_and_bounded(spark, sf_dir):
    """Distributed packing invariants: bin ids are globally DENSE
    (0..max contiguous), a bin never spans two groups, and every bin's
    token total respects budget + one straddling chunk (the same bound
    the flat packer guarantees, now per parallel group)."""
    from etl_fuel_priceguide_ec2_spark import registry

    rows = registry.queries()["pack_chunks_by_lang"](spark, sf_dir).collect()
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, {"langs": set(), "toks": 0, "max_chunk": 0})
        b = bins[r.bin_id]
        b["langs"].add(r.lang)
        b["toks"] += r.chunk_tokens
        b["max_chunk"] = max(b["max_chunk"], r.chunk_tokens)
    assert sorted(bins) == list(range(len(bins)))  # dense
    for bid, b in bins.items():
        assert len(b["langs"]) == 1, (bid, b["langs"])  # never spans groups
        assert b["toks"] < 256 + b["max_chunk"], (bid, b["toks"])


def test_bloom_rejects_degenerate_params(spark, sf_dir):
    """k=0 would silently build F.sequence(0, -1) = [0, -1] (Spark
    infers a descending step) — a bogus -1 salt and a vacuous pass
    condition. Guarded like hll_registers' b / cms_registers' d/w
    (ADVICE r05)."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    for kwargs in ({"k": 0}, {"n_words": 0}):
        with pytest.raises(ValueError):
            sketches.bloom_membership_report(
                orders, orders, "o_orderkey", "o_orderkey", **kwargs
            )


def test_cms_oracle_sql_escapes_quoted_probes():
    """A string probe key containing a single quote must be emitted
    with SQL escaping (doubled quote), not Python repr() — DuckDB
    parses double-quoted strings as identifiers (ADVICE r05)."""
    import duckdb

    sql = sketches.cms_oracle_sql(
        "src", "k", ["o'brien", "plain"], d=2, w=16, key_sql_type="VARCHAR"
    )
    assert "('o''brien')" in sql
    con = duckdb.connect()
    con.execute("CREATE VIEW src AS SELECT * FROM (VALUES ('o''brien'), ('x')) t(k)")
    got = dict(con.execute(sql).fetchall())
    assert got["o'brien"] == 1 and got["plain"] == 0


def test_dd_merge_equals_direct(spark, sf_dir):
    """Quantile-sketch mergeability (the VERDICT r05 item-4 symmetry
    with the HLL rollup): per-day bin tables merged with a per-bin SUM
    give BIT-IDENTICAL quantile estimates to sketching the whole
    corpus directly — sum is associative, so incremental rollups are
    exact re-aggregations of ~500-row partials."""
    orders = load_table(spark, sf_dir, "orders")
    direct = {
        r.q: r.est_value
        for r in sketches.dd_quantiles(orders, "o_totalprice").collect()
    }
    days = orders.select(F.to_date("o_orderdate").alias("day"), "o_totalprice")
    daily = sketches.dd_registers(days, "o_totalprice", ["day"])
    merged_est = {
        r.q: r.est_value
        for r in sketches.dd_estimate(sketches.dd_merge(daily)).collect()
    }
    assert merged_est == direct


def test_kmv_error_band_large_and_small_overlap(spark):
    """The reason KMV exists next to HLL inclusion-exclusion (VERDICT
    r05 item 3): the direct estimator must stay accurate at BOTH
    overlap sizes, where I-E degrades on small intersections. Two
    synthetic pairs over 60k-element sets, k=512:
      large overlap: A=[0,40k), B=[20k,60k)   -> true ∩ = 20000
      small overlap: A=[0,40k), B=[39k,79k)   -> true ∩ = 1000
    KMV's relative error on the intersection should be bounded by a
    few sigma of jaccard sampling noise in both regimes."""
    k = 512

    def _sets(lo_b, hi_b):
        a = spark.range(0, 40_000).select(F.col("id").alias("k"))
        b = spark.range(lo_b, hi_b).select(F.col("id").alias("k"))
        return a, b

    for lo_b, hi_b, true_int in ((20_000, 60_000, 20_000), (39_000, 79_000, 1_000)):
        a, b = _sets(lo_b, hi_b)
        rep = sketches.kmv_intersection_report(a, b, "k", "k", k=k).collect()[0]
        union_true = 40_000 + (hi_b - lo_b) - true_int
        # union estimate: (k-1)/U_(k) has ~1/sqrt(k-2) RSE (~4.4%);
        # allow 4 sigma
        assert abs(rep.est_union - union_true) / union_true < 0.18
        # intersection: rho ~ Binomial(k, J); allow ~4 sigma of
        # sqrt(J(1-J)/k)/J relative noise plus the union error
        j = true_int / union_true
        sigma_rel = (j * (1 - j) / k) ** 0.5 / j
        tol = 4 * sigma_rel + 0.18
        assert abs(rep.est_intersection - true_int) / true_int < tol, (
            true_int,
            rep.est_intersection,
            tol,
        )


def test_kmv_exact_branch_small_sets(spark):
    """|A ∪ B| <= k -> the sketch IS the distinct set: every output
    is exact (count, jaccard, intersection), the graceful-degradation
    contract of the CASE branch."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(60, 160).select(F.col("id").alias("k"))
    rep = sketches.kmv_intersection_report(a, b, "k", "k", k=256).collect()[0]
    assert rep.n_a_sketch == 100 and rep.n_b_sketch == 100
    assert rep.n_union_sketch == 160
    assert rep.est_a == 100.0 and rep.est_b == 100.0 and rep.est_union == 160.0
    assert rep.kmv_rho == 40
    assert rep.est_intersection == 40.0
    # set algebra exact in the same branch: the union-sketch partition
    # (both / a-only / b-only) sums to the union
    assert rep.est_a_minus_b == 60.0 and rep.est_b_minus_a == 60.0


def test_cms_join_size_one_sided_and_tight(spark, sf_dir):
    """The inner-product estimator is one-sided (est >= true: collision
    mass only adds) and within the (nA*nB)/w expected collision bound;
    cross-table case exercised too (orders ⋈ lineitem on orderkey,
    whose true size is exactly len(lineitem) by FK)."""
    events = load_table(spark, sf_dir, "events")
    est = sketches.cms_join_size_estimate(
        events, events, "user_id", "user_id", d=4, w=256
    ).collect()[0].est_join_size
    true_f2 = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    n = events.filter(F.col("user_id").isNotNull()).count()
    assert est >= true_f2
    assert est <= true_f2 + 4 * (n * n) / 256  # 4x the expected bound

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    est2 = sketches.cms_join_size_estimate(
        orders, li, "o_orderkey", "l_orderkey", d=4, w=256
    ).collect()[0].est_join_size
    true2 = li.count()
    assert est2 >= true2
    assert est2 <= true2 + 4 * (orders.count() * true2) / 256


def test_kmv_cardinality_accuracy_and_branches(spark):
    """Grouped KMV distinct estimate: exact below k (the sketch IS the
    set), within estimator noise above it (RSE ~ 1/sqrt(k-2); assert
    4 sigma). One relation, both branches."""
    small = spark.range(0, 50).select(F.lit("s").alias("g"), F.col("id").alias("u"))
    big = spark.range(0, 20_000).select(F.lit("b").alias("g"), F.col("id").alias("u"))
    got = {
        r.g: r
        for r in sketches.kmv_cardinality(
            small.union(big), "u", ["g"], k=256
        ).collect()
    }
    assert got["s"].n_sketch == 50 and got["s"].n_distinct_est == 50.0
    assert got["b"].n_sketch == 256
    assert abs(got["b"].n_distinct_est - 20_000) / 20_000 < 4 / (254**0.5)


def test_cms_join_size_disjoint_buckets_is_zero(spark):
    """Two sketches sharing NO (i, bucket) register must estimate 0,
    not NULL, and a register row with zero matched buckets must still
    participate in the min (ADVICE r06): the per-row inner products are
    spined over all d rows and coalesced to 0."""
    a = spark.createDataFrame([(1,)], "k: bigint")
    # probe single keys until one lands in disjoint buckets for all 4 rows
    for cand in range(2, 64):
        b = spark.createDataFrame([(cand,)], "k: bigint")
        shared = (
            sketches.cms_registers(a, "k", 4, 256)
            .join(sketches.cms_registers(b, "k", 4, 256), ["i", "bucket"])
            .count()
        )
        if shared == 0:
            break
    else:  # pragma: no cover - 62 candidates, 4 buckets each, w=256
        raise AssertionError("no disjoint candidate found")
    est = sketches.cms_join_size_estimate(a, b, "k", "k", 4, 256).collect()[0]
    assert est.est_join_size == 0  # was NULL before the spine fix

    # empty side: estimate must be 0 as well, not an empty aggregate
    empty = spark.createDataFrame([], "k: bigint")
    est2 = sketches.cms_join_size_estimate(a, empty, "k", "k", 4, 256).collect()[0]
    assert est2.est_join_size == 0


def test_kmv_merge_grouped_and_rejects_stray_columns(spark):
    """kmv_merge with group_cols merges per group (bit-identical to
    sketching each group's union directly); without it, grouped state
    raises instead of silently collapsing into one global sketch
    (ADVICE r06)."""
    import pytest

    rows = [("g1", i) for i in range(200)] + [("g2", i) for i in range(100, 400)]
    df = spark.createDataFrame(rows, "g: string, k: bigint")
    k = 16
    grouped_state = sketches.kmv_sketch(df, "k", k=k, group_cols=["g"])

    # slice the input, sketch each slice per group, merge per group
    s1 = sketches.kmv_sketch(df.filter(F.col("k") % 2 == 0), "k", k=k, group_cols=["g"])
    s2 = sketches.kmv_sketch(df.filter(F.col("k") % 2 == 1), "k", k=k, group_cols=["g"])
    merged = sketches.kmv_merge(s1.unionAll(s2), k=k, group_cols=["g"])
    direct = {(r.g, r._h) for r in grouped_state.collect()}
    assert {(r.g, r._h) for r in merged.collect()} == direct

    with pytest.raises(ValueError, match="group_cols"):
        sketches.kmv_merge(grouped_state, k=k)  # stray 'g' column


def test_kmv_intersection_oracle_empty_union_guard(spark, sf_dir):
    """On empty inputs the oracle must return 0.0 for the ratio
    estimates, matching the Spark report's empty-union branch, not NULL
    (ADVICE r06)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = sketches.kmv_intersection_oracle_sql(
        "(SELECT * FROM events WHERE 1=0)",
        "(SELECT * FROM events WHERE 1=0)",
        "user_id",
        "user_id",
        k=64,
    )
    row = con.execute(sql).fetchone()
    cols = [d[0] for d in con.execute(sql).description]
    got = dict(zip(cols, row))
    for c in ("jaccard_est", "est_intersection", "est_a_minus_b", "est_b_minus_a"):
        assert got[c] == 0.0, (c, got[c])

    empty = load_table(spark, sf_dir, "events").filter(F.lit(False))
    rep = sketches.kmv_intersection_report(
        empty, empty, "user_id", "user_id", k=64
    ).collect()[0]
    for c in ("jaccard_est", "est_intersection", "est_a_minus_b", "est_b_minus_a"):
        assert rep[c] == got[c] == 0.0
