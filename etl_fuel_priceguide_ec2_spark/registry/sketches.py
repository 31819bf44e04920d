"""Cardinality-sketch tier (round 5): engine-portable HyperLogLog.

The distinct-count sketch is the canonical 100 TB aggregate (distinct
users / ids / n-grams without shuffling keys); Spark's own
approx_count_distinct is not externally replayable, so these queries
build HLL from md5 + integer primitives both engines evaluate
bit-identically (operators/sketches.py) — the ESTIMATE itself is
oracle-verified, not just tested for tolerance.

Registered after the round-5 freeze -> leads the round-6 window.
"""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.operators import sketches
from etl_fuel_priceguide_ec2_spark.registry.base import register
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

_B = 8  # 256 registers: 1.04/sqrt(256) ~ 6.5% standard error


@register(
    "hll_users_by_event_type",
    sketches.hll_oracle_sql("events", "user_id", ["event_type"], b=_B),
)
def q_hll_users_by_event_type(spark, sf_dir):
    """Per-event-type approximate distinct users. Small per-type
    cardinalities land in HLL's linear-counting branch (empty-register
    estimator) — the merge plan is the point: the shuffle carries
    (type, register, rho) triples, never user ids."""
    events = load_table(spark, sf_dir, "events")
    return sketches.hll_cardinality(events, "user_id", ["event_type"], b=_B)


@register(
    "hll_distinct_event_ids",
    sketches.hll_oracle_sql("events", "event_id", None, b=_B),
)
def q_hll_distinct_event_ids(spark, sf_dir):
    """Global approximate distinct event ids. Cardinality >> 2.5m
    exercises the raw HLL estimator (exact-integer indicator sum, one
    double division); state is 256 registers regardless of input
    size."""
    events = load_table(spark, sf_dir, "events")
    return sketches.hll_cardinality(events, "event_id", None, b=_B)


@register(
    "hll_weekly_rollup_users",
    sketches.hll_oracle_sql(
        "events",
        "user_id",
        ["week", "day"],
        b=_B,
        group_exprs={
            "week": "date_trunc('week', CAST(ts AS DATE))",
            "day": "CAST(ts AS DATE)",
        },
        out_groups=["week"],
    ),
)
def q_hll_weekly_rollup_users(spark, sf_dir):
    """The incremental-rollup shape: per-DAY register tables (the
    state a daily ingest would persist) merged into per-week distinct
    users by a per-bucket MAX — associative and idempotent, so the
    merged estimate is bit-identical to sketching the week directly
    (pinned by test). At 100 TB this replaces re-reading raw history
    with re-aggregating 2^b-row daily partials."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    days = events.select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily_regs = sketches.hll_registers(days, "user_id", ["week", "day"], b=_B)
    weekly = sketches.hll_merge(daily_regs, ["week"])
    return sketches.hll_estimate(weekly, ["week"], b=_B)


# --- heavy hitters: sample-then-verify, the production composition ---
# exact top-k over 100 TB shuffles every key; the two-phase form
# (1) finds CANDIDATES on a deterministic md5-hash row sample (exact
# counts, but over ~10% of rows), then (2) verifies each candidate
# against the full corpus via the CMS registers — candidates flow as a
# RELATION into the probe join, never through the driver. est_count is
# the CMS one-sided bound over ALL rows; sample_count documents phase 1.
_HH_SAMPLE = (
    "(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)"
    " % 10000) < 1000"
)
_HH_K = 10
_HH_CMS_BUCKET = (
    "CAST('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' ||"
    " CAST({src}.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256"
)

_HEAVY_HITTERS_ORACLE = f"""
    WITH sampled AS (
      SELECT user_id FROM events WHERE {_HH_SAMPLE} AND user_id IS NOT NULL
    ), cand AS (
      SELECT user_id, sample_count FROM (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS sample_count,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id ASC) AS rn
        FROM sampled GROUP BY user_id
      ) WHERE rn <= {_HH_K}
    ), rows_i AS (SELECT unnest(range(0, 4)) AS i),
    regs AS (
      SELECT t.i, {_HH_CMS_BUCKET.format(src="s")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events s CROSS JOIN rows_i t
      WHERE s.user_id IS NOT NULL
      GROUP BY 1, 2
    ), probed AS (
      SELECT p.user_id, t.i, {_HH_CMS_BUCKET.format(src="p")} AS bucket
      FROM cand p CROSS JOIN rows_i t
    ), est AS (
      SELECT probed.user_id,
             CAST(MIN(COALESCE(regs.c, 0)) AS BIGINT) AS est_count
      FROM probed
      LEFT JOIN regs ON regs.i = probed.i AND regs.bucket = probed.bucket
      GROUP BY probed.user_id
    )
    SELECT c.user_id, c.sample_count, e.est_count
    FROM cand c JOIN est e USING (user_id)
"""


@register("heavy_hitter_users", _HEAVY_HITTERS_ORACLE)
def q_heavy_hitter_users(spark, sf_dir):
    """Sample-then-verify heavy hitters: candidates from exact counts
    over a deterministic 10% md5-hash row sample, each verified
    against the FULL corpus by probing the CMS registers — the
    candidate relation drives the probe join directly (no driver
    round-trip, no full-corpus key shuffle). Output: the top-10 sample
    candidates with their sample counts and full-corpus CMS bounds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    sampled = events.filter((h % 10_000 < 1_000) & F.col("user_id").isNotNull())
    wspec = Window.orderBy(F.col("sample_count").desc(), F.col("user_id").asc())
    cand = (
        sampled.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sample_count"))
        .withColumn("rn", F.row_number().over(wspec))
        .filter(F.col("rn") <= _HH_K)
        .drop("rn")
    )
    regs = sketches.cms_registers(events, "user_id", d=4, w=256)
    est = sketches.cms_estimate(regs, cand.select("user_id"), "user_id", d=4, w=256)
    return cand.join(est, "user_id")


def _hll_est_subq(where: str) -> str:
    """Scalar subquery: the HLL estimate of distinct user_id over
    ``events WHERE {where}`` (CTE-in-subquery is valid DuckDB)."""
    inner = sketches.hll_oracle_sql(
        f"(SELECT user_id FROM events WHERE {where})", "user_id", None, b=_B
    )
    return f"(SELECT n_distinct_est FROM ({inner}) _e)"


_SIDE_A = "event_type = 'click' AND user_id < 100"
_SIDE_B = "event_type = 'view' AND user_id >= 50"

_HLL_INTERSECT_ORACLE = f"""
    SELECT a.est_a, b.est_b, u.est_union,
           ROUND(a.est_a + b.est_b - u.est_union, 2) AS est_intersection
    FROM (SELECT {_hll_est_subq(_SIDE_A)} AS est_a) a,
         (SELECT {_hll_est_subq(_SIDE_B)} AS est_b) b,
         (SELECT {_hll_est_subq(f"({_SIDE_A}) OR ({_SIDE_B})")} AS est_union) u
"""


@register("hll_intersection_user_sets", _HLL_INTERSECT_ORACLE)
def q_hll_intersection_user_sets(spark, sf_dir):
    """Sketch composition by inclusion-exclusion: |A ∩ B| estimated as
    est(A) + est(B) - est(A ∪ B), where the union estimate comes from
    MERGING the two sides' register tables (never re-reading rows) —
    the audience-overlap question answered from per-segment sketch
    state alone. Union-side registers are identical whether built from
    unioned rows or merged partials (associativity), so the oracle
    replays the row-union form."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    a = events.filter((F.col("event_type") == "click") & (F.col("user_id") < 100))
    b = events.filter((F.col("event_type") == "view") & (F.col("user_id") >= 50))
    ra = sketches.hll_registers(a, "user_id", b=_B)
    rb = sketches.hll_registers(b, "user_id", b=_B)
    est_a = sketches.hll_estimate(ra, b=_B).select(
        F.col("n_distinct_est").alias("est_a")
    )
    est_b = sketches.hll_estimate(rb, b=_B).select(
        F.col("n_distinct_est").alias("est_b")
    )
    est_u = sketches.hll_estimate(sketches.hll_merge(ra.unionAll(rb)), b=_B).select(
        F.col("n_distinct_est").alias("est_union")
    )
    return (
        est_a.crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .withColumn(
            "est_intersection",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 2),
        )
    )


@register(
    "bloom_membership_orders",
    sketches.bloom_oracle_sql(
        "(SELECT o_orderkey AS _key FROM orders WHERE o_totalprice > 400000)",
        "(SELECT l_orderkey AS _key FROM lineitem)",
        n_words=260,
        k=4,
    ),
)
def q_bloom_membership_orders(spark, sf_dir):
    """Membership sketch: high-value order keys compiled into a
    260-long Bloom filter (m=16380 bits, k=4), probed by every
    lineitem order key WITHOUT joining lineitem to orders. The one-row
    report counts probe keys, bloom passes, true members, and realized
    false positives — the explicit, persistable form of runtime bloom
    join pruning, with the ~7% FP rate the m/n/k choice predicts
    visible in the result."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return sketches.bloom_membership_report(
        orders.filter(F.col("o_totalprice") > 400000),
        lineitem,
        "o_orderkey",
        "l_orderkey",
        n_words=260,
        k=4,
    )


_CMS_PROBES = [0, 1, 2, 3, 17, 42, 99, 123]


@register(
    "cms_user_event_counts",
    sketches.cms_oracle_sql("events", "user_id", _CMS_PROBES, d=4, w=256),
)
def q_cms_user_event_counts(spark, sf_dir):
    """Count-min-sketch event counts for a fixed probe set of users:
    the register table is d x w longs (built map-side, merged
    associatively), est = min over d salted-hash rows — always >= the
    true count, over by at most other keys' collisions. The frequency
    primitive that answers per-key counts at 100 TB without shuffling
    keys."""
    events = load_table(spark, sf_dir, "events")
    return sketches.cms_point_counts(events, "user_id", _CMS_PROBES, d=4, w=256)


_TOKEN_PROBES = ["join", "hash", "scan", "filter", "nonexistent_token", "merge"]
_TOKENS_SUBQUERY = (
    r"(SELECT token FROM (SELECT UNNEST(string_split_regex(trim(text),"
    r" '\s+')) AS token FROM documents) WHERE token <> '')"
)


@register(
    "cms_token_frequencies",
    sketches.cms_oracle_sql(
        _TOKENS_SUBQUERY, "token", _TOKEN_PROBES, d=4, w=512,
        key_sql_type="VARCHAR",
    ),
)
def q_cms_token_frequencies(spark, sf_dir):
    """Count-min over the DOCUMENT TOKEN stream — the LLM-pipeline use
    of the frequency sketch: corpus-level vocabulary counts for a
    probe list (stopword ratios, contamination-marker terms, domain
    vocab drift) without a full vocabulary shuffle. The token stream
    is billions of rows at 100 TB; the register table stays d x w.
    Includes a token absent from the corpus: CMS reports its collision
    mass, the documented one-sided error."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return sketches.cms_point_counts(tokens, "token", _TOKEN_PROBES, d=4, w=512)


@register(
    "dd_quantile_order_totals",
    sketches.dd_quantiles_oracle_sql("orders", "o_totalprice"),
)
def q_dd_quantile_order_totals(spark, sf_dir):
    """DDSketch-style p50/p90/p99 of order totals with <= 6.25%
    relative error: radix-2 log bins + 8 linear sub-bins, all bin
    math in exact integers (bitlen by compares, power-of-two lookup
    divisions), so the fixed-size bin table — and the estimate — is
    engine-portable and mergeable, where a true percentile needs a
    full sort and percentile_approx's GK summary replays nowhere."""
    orders = load_table(spark, sf_dir, "orders")
    return sketches.dd_quantiles(orders, "o_totalprice")


# --- round-6 additions (registered AFTER the round-6 freeze — these
# lead the round-7 window per the rotation discipline) ---------------

_KMV_K = 64  # union of the two fixture sides (~150 users) exceeds k,
# so the registry query exercises the ESTIMATOR branch, not the exact
# small-set fallback; tests cover both.


@register(
    "kmv_intersection_user_sets",
    sketches.kmv_intersection_oracle_sql(
        f"(SELECT user_id FROM events WHERE {_SIDE_A})",
        f"(SELECT user_id FROM events WHERE {_SIDE_B})",
        "user_id",
        "user_id",
        k=_KMV_K,
    ),
)
def q_kmv_intersection_user_sets(spark, sf_dir):
    """DIRECT audience-overlap estimate via KMV/theta sketches
    (VERDICT r05 item 3): where hll_intersection_user_sets subtracts
    two ~1%-RSE estimates (inclusion-exclusion — the error swamps
    small intersections), KMV keeps the k smallest distinct hashes
    per side and estimates |A ∩ B| = (rho/k) * est(|A ∪ B|) with rho
    counted on sketch state alone, so the error scales with the
    overlap itself. Same fixture sides as the HLL query — NOTES.md
    records the side-by-side comparison."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    a = events.filter((F.col("event_type") == "click") & (F.col("user_id") < 100))
    b = events.filter((F.col("event_type") == "view") & (F.col("user_id") >= 50))
    return sketches.kmv_intersection_report(a, b, "user_id", "user_id", k=_KMV_K)


@register(
    "dd_quantile_weekly_rollup",
    sketches.dd_quantiles_oracle_sql(
        "orders",
        "o_totalprice",
        qs=(0.5, 0.9),
        group_exprs={
            "week": "date_trunc('week', CAST(o_orderdate AS DATE))",
            "day": "CAST(o_orderdate AS DATE)",
        },
        out_groups=["week"],
    ),
)
def q_dd_quantile_weekly_rollup(spark, sf_dir):
    """The quantile-sketch rollup symmetry (VERDICT r05 item 4):
    per-DAY DDSketch bin tables (the state a daily ingest persists)
    merged to per-week by a per-bin SUM — associative, so the weekly
    median/p90 over merged registers is bit-identical to sketching
    the week directly (pinned by test, the hll_weekly_rollup_users
    pattern). At 100 TB this re-aggregates ~500-row daily partials
    instead of re-reading raw history."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    days = orders.select(
        F.date_trunc("week", F.to_date("o_orderdate")).cast("date").alias("week"),
        F.to_date("o_orderdate").alias("day"),
        "o_totalprice",
    )
    daily_regs = sketches.dd_registers(days, "o_totalprice", ["week", "day"])
    weekly = sketches.dd_merge(daily_regs, ["week"])
    return sketches.dd_estimate(weekly, (0.5, 0.9), ["week"])


_CMS_F2_BUCKET = (
    "CAST('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' ||"
    " CAST(s.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256"
)

_CMS_JOIN_SIZE_ORACLE = f"""
    WITH rows_i AS (SELECT unnest(range(0, 4)) AS i),
    regs AS (
      SELECT t.i, {_CMS_F2_BUCKET} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM events s CROSS JOIN rows_i t
      WHERE s.user_id IS NOT NULL
      GROUP BY 1, 2
    ), per AS (
      SELECT i, CAST(SUM(c * c) AS BIGINT) AS s FROM regs GROUP BY i
    ), est AS (
      SELECT MIN(s) AS est_join_size FROM per
    ), truef AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS true_join_size FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events
        WHERE user_id IS NOT NULL GROUP BY user_id
      )
    )
    SELECT est.est_join_size, truef.true_join_size FROM est, truef
"""


@register("cms_selfjoin_size_events", _CMS_JOIN_SIZE_ORACLE)
def q_cms_selfjoin_size_events(spark, sf_dir):
    """Sketch-driven join planning: the F2 second frequency moment of
    events.user_id — the self-join size Σ f(u)^2, i.e. "how many rows
    would events ⋈ events on user_id produce?" — estimated from CMS
    register state alone (min over d rows of Σ_bucket c^2; AMS/CMS
    inner product), WITHOUT executing the join. One-sided: est >= true
    (collision mass adds). The true value is computed alongside for
    the report; at 100 TB only the register table exists and the
    question costs O(d*w). The skew-profile companion: a huge F2/n^2
    ratio is exactly the hot-key warning the salting operators
    exist for."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    est = sketches.cms_join_size_estimate(
        events, events, "user_id", "user_id", d=4, w=256
    )
    true_f2 = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.sum(F.col("_c") * F.col("_c")).alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(true_f2))


_KMV_CARD_K = 64
_KMV_CARD_C = repr(float((_KMV_CARD_K - 1) << 60))

_KMV_CARD_ORACLE = f"""
    WITH dh AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS _h
      FROM events WHERE user_id IS NOT NULL
    ), sk AS (
      SELECT event_type, _h FROM (
        SELECT event_type, _h,
               row_number() OVER (PARTITION BY event_type ORDER BY _h) AS rn
        FROM dh
      ) WHERE rn <= {_KMV_CARD_K}
    ), agg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sketch, MAX(_h) AS kth
      FROM sk GROUP BY event_type
    )
    SELECT event_type, n_sketch,
           ROUND(CASE WHEN n_sketch < {_KMV_CARD_K} THEN CAST(n_sketch AS DOUBLE)
                      ELSE {_KMV_CARD_C} / CAST(kth AS DOUBLE) END, 2) AS n_distinct_est
    FROM agg
"""


@register("kmv_distinct_by_event_type", _KMV_CARD_ORACLE)
def q_kmv_distinct_by_event_type(spark, sf_dir):
    """Per-event-type approximate distinct users from the KMV sketch —
    the same question hll_users_by_event_type answers, from the state
    that ALSO serves set-algebra queries (one per-segment sketch store,
    both uses: cardinality here, overlap in kmv_intersection_user_sets).
    k=64 sits below the fixture's per-type distinct counts so the
    (k-1)/U_(k) estimator branch is exercised; groups under k fall
    back to exact automatically."""
    events = load_table(spark, sf_dir, "events")
    return sketches.kmv_cardinality(
        events, "user_id", ["event_type"], k=_KMV_CARD_K
    )
