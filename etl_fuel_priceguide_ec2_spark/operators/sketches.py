"""Engine-portable cardinality sketches (HyperLogLog over md5).

Not in the reference (a row-store ETL, ``index.js``); part of the
large-scale-pipeline extension tier: counting distinct users / ids /
n-grams over 100 TB is the canonical "exact is too expensive" query —
an exact COUNT(DISTINCT) shuffles every distinct key, while an HLL
register table is a fixed 2^b longs per group, merged associatively by
map-side partial aggregation (the same two-level aggregate Spark uses
for any max/sum).

Spark ships approx_count_distinct (HyperLogLog++), but its estimate is
implementation-specific — no external engine can replay it, so it
cannot be value-hash-verified against an oracle. This operator builds
HLL from primitives BOTH engines evaluate bit-identically:

- hash = first 15 hex chars of md5(key) -> a 60-bit non-negative long
  (the same engine-portable draw as clustering/sampling);
- register index = hash % 2^b; the remaining 60-b bits are the
  geometric-tail window w;
- rho = (60-b) - bitlen(w) + 1, with bitlen = length(bin(w)) — an
  exact integer/string op both engines evaluate identically AND keep
  inside whole-stage codegen (no log2: floor(log2(w)) sits one ulp
  from an integer for w near 2^k, where libm/JVM last-ulp differences
  could flip the floor; and no HOF fold: an aggregate(transform(...))
  compare-chain was measured ~10x slower per row — higher-order
  functions are interpreted, not codegen'd);
- the indicator sum is kept EXACT: sum_int = sum of 2^(maxrho_max - rho)
  per register (empty register -> 2^maxrho_max), an integer <=
  2^(maxrho_max + b) that fits a BIGINT — no float summation order
  anywhere;
- estimate = alpha_m * m^2 * 2^maxrho_max / sum_int (one IEEE double
  division), with the standard small-range fallback
  m * ln(m / empty_registers) when E <= 2.5m and empties exist.

Every step is deterministic and identical in Spark and DuckDB, so the
estimate — not just the registers — is oracle-comparable. Accuracy is
the textbook 1.04/sqrt(m) relative standard error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    # the standard bias correction constant (Flajolet et al. 2007)
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key_col) per group via the portable
    HLL above. Output: group cols + (buckets_hit, n_distinct_est).

    Plan: one scan -> partial max(rho) per (group, register) map-side
    -> 2^b-row shuffle per group -> one tiny final aggregate. The
    shuffle carries register ids and 1-byte rhos, never keys — the
    100 TB distinct-count shape.

    Composition of ``hll_registers`` + ``hll_estimate`` — call those
    directly to persist registers at ingest and merge them later (the
    incremental-rollup pattern; registers merge by per-bucket MAX)."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, b=b), group_cols, b=b
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """The HLL register table: group cols + (_bucket, _maxrho). This
    is the sketch STATE — persist it per day/partition and merge
    slices with a per-(group, _bucket) MAX; the estimate over merged
    registers is bit-identical to the estimate over the raw union
    (max is associative), which is what makes the sketch
    incremental."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    wbits = 60 - b  # md5 prefix gives 60 hash bits
    maxrho = wbits + 1
    groups = list(group_cols or [])

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = (h % m).alias("_bucket")
    # w via shiftright, NOT floor(h/m): h spans 60 bits, past double's
    # 53-bit exact range, so a float division would corrupt low bits
    w = F.shiftright(h, b)
    # bitlen = length(bin(w)): exact, codegen-native, engine-portable
    # (see module docstring for why not log2 and not a HOF fold)
    rho = F.when(w == 0, F.lit(maxrho)).otherwise(
        F.lit(wbits) + 1 - F.length(F.bin(w))
    )
    return (
        # NULL keys are excluded, matching COUNT(DISTINCT) semantics
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, bucket, rho.alias("_rho"))
        .groupBy(*groups, "_bucket")
        .agg(F.max("_rho").alias("_maxrho"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register slices (e.g. per-day tables unioned, or a finer
    grouping collapsed): per-(group, bucket) MAX. Associative and
    idempotent — merge order and re-merges can never change the
    estimate."""
    groups = list(group_cols or [])
    return regs.groupBy(*groups, "_bucket").agg(F.max("_maxrho").alias("_maxrho"))


def hll_estimate(
    regs: DataFrame,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """Finish a register table into (buckets_hit, n_distinct_est) per
    group — the tiny final aggregate over at most 2^b rows per group.

    ``b`` MUST equal the ``b`` the register table was built with
    (hll_registers embeds it in every bucket/rho value) — a mismatch
    silently mis-scales the estimate; it cannot be detected here
    without scanning the registers (code-review r16)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    maxrho = (60 - b) + 1
    groups = list(group_cols or [])
    # exact integer indicator sum, scaled by 2^maxrho: term for a
    # register holding rho is 2^(maxrho - rho) (shiftleft by an
    # expression needs expr() — the pyspark wrapper only takes ints)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({maxrho} - _maxrho AS INT))")
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("buckets_hit"),
        F.sum(term).alias("_s_occ"),
    )
    # coalesce: SUM over zero register rows (empty corpus) is NULL, but
    # the right indicator sum is "all registers empty"
    sum_int = F.coalesce(F.col("_s_occ"), F.lit(0)) + (
        F.lit(m) - F.col("buckets_hit")
    ) * F.lit(1 << maxrho)
    zeros = F.lit(m) - F.col("buckets_hit")
    # alpha * m^2 * 2^maxrho as ONE double literal (same text lands in
    # the SQL oracle, so both engines divide the identical constant)
    c = _alpha(m) * m * m * float(1 << maxrho)
    e_raw = F.lit(c) / sum_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *groups,
        "buckets_hit",
        F.round(est, 2).alias("n_distinct_est"),
    )


def _validate_probe_keys(probe_keys: list) -> None:
    # Shared by the operator and its oracle generator (code-review
    # r16): an empty list renders "FROM (VALUES )" and a None key
    # renders "(None)" — both DuckDB parse errors — so the contract is
    # validated identically on BOTH sides instead of one side crashing
    # mid-sim.
    if not probe_keys:
        raise ValueError("probe_keys must be a non-empty list")
    if any(k is None for k in probe_keys):
        raise ValueError("probe_keys must not contain None")


def cms_point_counts(
    df: DataFrame,
    key_col: str,
    probe_keys: list,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-min sketch point-frequency estimates — the heavy-hitter /
    frequency primitive at 100 TB: exact per-key counts shuffle every
    key; the CMS register table is d x w longs, built by the same
    two-level aggregate as the HLL (partial sums per (row, bucket)
    map-side, so the exchange carries at most d*w rows per map
    partition), merged associatively across partitions/days.

    est(key) = min over the d rows of the register at
    md5(i || ':' || key) % w — the classic one-sided estimator:
    est >= true count always, and exceeds it only by other keys'
    collisions (expected <= total/w per row, min over d rows).

    Deterministic and engine-portable like the HLL: md5 60-bit draws,
    integer sums, no floats anywhere. Output: (key, est_count) for
    each probe key (probe keys are a small driver-side list — the
    "which exact ids do I care about" side of a frequency question).
    For DATA-DEPENDENT probes (candidates from another relation, never
    collected to the driver) compose ``cms_registers`` +
    ``cms_estimate`` directly."""
    _validate_probe_keys(probe_keys)
    spark = df.sparkSession
    probes = spark.createDataFrame(
        [(k,) for k in probe_keys], f"{key_col} {df.schema[key_col].dataType.simpleString()}"
    )
    return cms_estimate(cms_registers(df, key_col, d=d, w=w), probes, key_col, d=d, w=w)


def _cms_buckets(key_expr, d: int, w: int):
    """Array of k salted (i, bucket) register positions for a key."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.struct(
            i.alias("i"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                i.cast("string"),
                                F.lit(":"),
                                key_expr.cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % w
            ).alias("bucket"),
        ),
    )


def cms_registers(df: DataFrame, key_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """The CMS state: (i, bucket, c) — at most d*w rows. Persist per
    slice and merge by summing ``c`` (associative); like the HLL
    registers, merged-slice estimates equal whole-history estimates."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2; got d={d}, w={w}")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(_cms_buckets(F.col(key_col), d, w)).alias("ib"))
        .select("ib.i", "ib.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    regs: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """(key, est_count) for every row of ``probes`` — a RELATION, so
    candidates produced by another query (a sample, a filter) probe
    the sketch without ever touching the driver. The register table is
    broadcast; the probe side only fans out d rows per key."""
    probed = probes.select(
        key_col, F.explode(_cms_buckets(F.col(key_col), d, w)).alias("ib")
    ).select(key_col, "ib.i", "ib.bucket")
    return (
        probed.join(F.broadcast(regs), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )


def cms_join_size_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    key_a: str,
    key_b: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Equi-join cardinality estimate from CMS state alone — the
    sketch-driven planning primitive: |A ⋈ B on key| = Σ_k f_A(k)·f_B(k)
    is the inner product of the two frequency vectors, estimated as
    min over the d register rows of Σ_bucket cA[i,b]·cB[i,b]
    (AMS/count-min inner product; Cormode & Muthukrishnan 2005). With
    A = B this is the second frequency moment F2 = Σ f(k)^2 — the
    self-join-size / key-skew question ("will this join explode?")
    answered WITHOUT executing the join: two d×w register tables joined
    broadcast-side, output one BIGINT.

    One-sided like the point estimator: est >= true always (collision
    mass only adds), within true + (nA·nB)/w per row in expectation.
    Exact-integer end-to-end, so the estimate replays bit-identically
    in SQL. Range bound: Σ cA·cB <= nA·nB must fit a BIGINT — at row
    counts past ~3e9 per side, sketch SLICES (per-day registers) keep
    each product in range and the estimates merge by summing slice
    inner products."""
    ra = cms_registers(df_a, key_a, d, w)
    rb = (
        cms_registers(df_b, key_b, d, w)
        .withColumnRenamed("c", "_cb")
    )
    per_row = (
        ra.join(F.broadcast(rb), ["i", "bucket"])
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("_cb")).alias("_s"))
    )
    # Min over ALL d register rows, not just rows whose buckets matched
    # in the join: a row with zero shared buckets has inner product 0,
    # and two sketches sharing NO buckets must estimate 0 — the bare
    # inner-join aggregate would return NULL (empty) there, and would
    # exclude any zero-product row from the min (ADVICE r06).
    spine = df_a.sparkSession.range(d).select(F.col("id").cast("int").alias("i"))
    full = spine.join(per_row, ["i"], "left").select(
        F.coalesce(F.col("_s"), F.lit(0).cast("long")).alias("_s")
    )
    return full.agg(F.min("_s").alias("est_join_size"))


def cms_oracle_sql(
    table: str,
    key_col: str,
    probe_keys: list,
    d: int = 4,
    w: int = 256,
    key_sql_type: str = "BIGINT",
) -> str:
    """DuckDB replay of ``cms_point_counts`` (same parameters;
    ``key_sql_type`` pins the probe column's dtype to the table's —
    a bare VALUES list would come out INTEGER and fail the driver's
    dtype-sensitive schema compare)."""
    _validate_probe_keys(probe_keys)
    # SQL-escape string probes by doubling single quotes — repr() would
    # emit Python-style double quotes for keys containing ', which DuckDB
    # parses as an identifier (ADVICE r05).
    vals = ", ".join(
        "('" + k.replace("'", "''") + "')" if isinstance(k, str) else f"({k})"
        for k in probe_keys
    )
    bucket = (
        "CAST('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' ||"
        f" CAST({{src}}.{key_col} AS VARCHAR)), 1, 15) AS BIGINT) % {w}"
    )
    return f"""
    WITH rows_i AS (SELECT unnest(range(0, {d})) AS i),
    regs AS (
      SELECT t.i, {bucket.format(src="s")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} s CROSS JOIN rows_i t
      WHERE s.{key_col} IS NOT NULL
      GROUP BY 1, 2
    ), probes AS (
      SELECT CAST({key_col} AS {key_sql_type}) AS {key_col}
      FROM (VALUES {vals}) AS p({key_col})
    ), probed AS (
      SELECT p.{key_col}, t.i, {bucket.format(src="p")} AS bucket
      FROM probes p CROSS JOIN rows_i t
    )
    SELECT probed.{key_col},
           CAST(MIN(COALESCE(regs.c, 0)) AS BIGINT) AS est_count
    FROM probed
    LEFT JOIN regs ON regs.i = probed.i AND regs.bucket = probed.bucket
    GROUP BY probed.{key_col}
"""


def bloom_membership_report(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    n_words: int = 260,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter membership — the sketch family's fourth shape
    (cardinality / frequency / quantiles / MEMBERSHIP): a build-side
    key set compiled to an m-bit filter, probed without a join of the
    probe side against the build side. At 100 TB this is the explicit,
    persistable form of the runtime bloom pruning Spark injects into
    joins: build once at ingest (n_words longs — broadcastable at any
    corpus size), then prune scans/streams against it.

    Words hold 63 bits (not 64): DuckDB raises on `1::BIGINT << 63`,
    so the sign bit is never used and both engines shift identically.
    Bit positions are the md5 60-bit draws salted by hash index, OR-ed
    into words with bit_or — exact integer state end-to-end, so the
    filter AND the report replay bit-identically in SQL.

    Output: ONE row —
      (n_probe_keys, n_bloom_pass, n_true_members, n_false_positives)
    with n_false_positives = pass - true (no false negatives by
    construction; the report both demonstrates the filter and measures
    its realized FP rate)."""
    # Mirror hll_registers' b-range / cms_registers' d/w validation:
    # k=0 would silently yield F.sequence(0, -1) = [0, -1] (descending
    # step inferred) — a bogus -1 salt and a vacuous pass (ADVICE r05).
    if k < 1:
        raise ValueError(f"bloom k must be >= 1, got {k}")
    if n_words < 1:
        raise ValueError(f"bloom n_words must be >= 1, got {n_words}")
    m = n_words * 63

    def _bits(df: DataFrame, key: str) -> DataFrame:
        # k salted positions per key: (word index, 63-bit mask)
        bit = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("_i").cast("string"),
                            F.lit(":"),
                            F.col(key).cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m
        )
        return (
            df.select(key, F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"))
            .withColumn("_bit", bit)
            .select(
                key,
                F.floor(F.col("_bit") / 63).cast("long").alias("_w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 63 AS INT))").alias(
                    "_mask"
                ),
            )
        )

    build_keys = build.select(F.col(build_key).alias("_key")).filter(
        F.col("_key").isNotNull()
    ).distinct()
    words = (
        _bits(build_keys, "_key")
        .groupBy("_w")
        .agg(F.bit_or("_mask").alias("_word"))
    )
    probe_keys = probe.select(F.col(probe_key).alias("_key")).filter(
        F.col("_key").isNotNull()
    ).distinct()
    passes = (
        _bits(probe_keys, "_key")
        .join(F.broadcast(words), "_w", "left")
        .withColumn(
            "_hit",
            F.when(
                F.col("_word").isNotNull()
                & (F.col("_word").bitwiseAND(F.col("_mask")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("_key")
        .agg((F.sum("_hit") == k).cast("int").alias("_pass"))
    )
    flagged = passes.join(
        build_keys.withColumn("_true", F.lit(1)), "_key", "left"
    ).select("_pass", F.coalesce("_true", F.lit(0)).alias("_true"))
    # coalesce: SUM over an empty probe relation is NULL; the module
    # contract (ADVICE r08, oversized_baskets) is zeros on empty input
    # so downstream arithmetic never hits NULL only on the edge case
    # (code-review r16)
    z = F.lit(0).cast("long")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.coalesce(F.sum("_pass"), z).alias("n_bloom_pass"),
        F.coalesce(F.sum("_true"), z).alias("n_true_members"),
        (F.coalesce(F.sum("_pass"), z) - F.coalesce(F.sum("_true"), z)).alias(
            "n_false_positives"
        ),
    )


def bloom_oracle_sql(
    build_sql: str,
    probe_sql: str,
    n_words: int = 260,
    k: int = 4,
) -> str:
    """DuckDB replay of ``bloom_membership_report``. ``build_sql`` /
    ``probe_sql`` are subqueries yielding one column named ``_key``."""
    m = n_words * 63
    bit = (
        "CAST('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' ||"
        f" CAST({{src}}._key AS VARCHAR)), 1, 15) AS BIGINT) % {m}"
    )
    return f"""
    WITH hashes AS (SELECT unnest(range(0, {k})) AS i),
    build_keys AS (
      SELECT DISTINCT _key FROM {build_sql} WHERE _key IS NOT NULL
    ), words AS (
      SELECT bit // 63 AS _w,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % 63 AS INT)) AS _word
      FROM (SELECT {bit.format(src="b")} AS bit
            FROM build_keys b CROSS JOIN hashes t)
      GROUP BY 1
    ), probe_keys AS (
      SELECT DISTINCT _key FROM {probe_sql} WHERE _key IS NOT NULL
    ), pbits AS (
      SELECT p._key, {bit.format(src="p")} AS bit
      FROM probe_keys p CROSS JOIN hashes t
    ), passes AS (
      SELECT pb._key,
             CAST(SUM(CASE WHEN w._word IS NOT NULL
                            AND (w._word & (CAST(1 AS BIGINT) << CAST(pb.bit % 63 AS INT))) <> 0
                           THEN 1 ELSE 0 END) = {k} AS INT) AS _pass
      FROM pbits pb
      LEFT JOIN words w ON w._w = pb.bit // 63
      GROUP BY pb._key
    ), flagged AS (
      SELECT ps._pass,
             CASE WHEN b._key IS NOT NULL THEN 1 ELSE 0 END AS _true
      FROM passes ps LEFT JOIN build_keys b USING (_key)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(COALESCE(SUM(_pass), 0) AS BIGINT) AS n_bloom_pass,
           CAST(COALESCE(SUM(_true), 0) AS BIGINT) AS n_true_members,
           CAST(COALESCE(SUM(_pass), 0) - COALESCE(SUM(_true), 0)
                AS BIGINT) AS n_false_positives
    FROM flagged
"""


# DDSketch-style quantiles: power-of-two bins with 2^SUB_BITS linear
# sub-bins each -> relative error <= 2^-(SUB_BITS+1) = 6.25%, all bin
# math in exact integers (bitlen by compares, divisions by power-of-two
# lookup) so the sketch is engine-portable like the HLL/CMS above.
_SUB_BITS = 3


def dd_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles of a positive numeric column with bounded
    RELATIVE error — the percentile shape at 100 TB: an exact
    percentile needs a full sort (or Spark's percentile_approx, whose
    GK summary no external engine replays); this sketch is a
    fixed-size bin-count table built by one two-level aggregate.

    Values quantize to integer cents; cents < 16 get exact unit bins;
    larger values bin by (bitlen, top SUB_BITS+1 bits) — the DDSketch
    log-bin idea with radix-2 bins and 8 linear sub-bins, giving
    est/true in [1 - 1/16, 1 + 1/16). The estimate for quantile q is
    the midpoint of the first bin whose cumulative count reaches
    ceil(q * n). Output: (q, est_value) per requested quantile.

    Mergeable: bin counts sum associatively across partitions/days.
    Bin ids and counts are exact integers end-to-end; the only doubles
    are the final midpoint/100 and the q*n threshold, computed from
    identical literals in both engines. Bin math is codegen-native
    (length(bin()) bitlen + shiftright, like the HLL — no HOF folds,
    no libm log).

    Composition of ``dd_registers`` + ``dd_estimate`` (the
    hll_registers / hll_merge / hll_estimate split, VERDICT r05
    item 4): persist per-day bin tables at ingest, merge slices with
    ``dd_merge`` (per-bin SUM), estimate over merged registers is
    bit-identical to the direct estimate (sum is associative)."""
    return dd_estimate(dd_registers(df, value_col), qs)


def dd_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The DDSketch bin-count table: group cols + (bin, c) — the
    sketch STATE. At most ~500 bins per group regardless of input
    size (radix-2 log bins x 8 linear sub-bins over cent values), so
    a year of per-day state for a metric is ~180k tiny rows."""
    sub = 1 << _SUB_BITS  # 8 sub-bins; values < 2*sub are exact
    groups = list(group_cols or [])
    cents = F.round(F.col(value_col) * 100).cast("long")
    # bitlen = length(bin(c)); top = c >> (bitlen - 1 - SUB_BITS),
    # in [8, 16) — shift-by-expression needs expr()
    bitlen = F.length(F.bin(F.col("_c")))
    top = F.expr(
        f"shiftright(_c, CAST(length(bin(_c)) - {1 + _SUB_BITS} AS INT))"
    )
    bin_id = F.when(F.col("_c") < 2 * sub, F.col("_c")).otherwise(
        F.lit(2 * sub) + (bitlen - (_SUB_BITS + 2)) * sub + (top - sub)
    )
    return (
        df.filter(F.col(value_col) > 0)
        .select(*groups, cents.alias("_c"))
        .select(*groups, bin_id.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dd_merge(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register slices (per-day tables unioned, or a finer
    grouping collapsed): per-(group, bin) SUM. Associative — merge
    order can never change the estimate, which is what makes the
    quantile sketch incremental (the HLL rollup symmetry)."""
    groups = list(group_cols or [])
    return regs.groupBy(*groups, "bin").agg(F.sum("c").alias("c"))


def dd_estimate(
    regs: DataFrame,
    qs: tuple = (0.5, 0.9, 0.99),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Finish a bin-count table into (group cols + q, est_value) —
    windows and joins over the tiny register relation only."""
    from pyspark.sql import Window

    sub = 1 << _SUB_BITS
    groups = list(group_cols or [])
    wspec = (
        Window.partitionBy(*groups).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy(F.lit(1))
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = regs.select(
        *groups,
        "bin",
        F.sum("c").over(wspec).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    spark = regs.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    picked = (
        qdf.join(
            cum.withColumnRenamed("bin", "_bin"),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy(*groups, "q")
        .agg(F.min("_bin").alias("_b"))
    )
    # bin midpoint in dollars computed directly from the picked bin id
    # (a pure function of the id — exact-integer bounds, one divide)
    idx = F.col("_b") - 2 * sub
    btop = (idx % sub) + sub
    scale = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST((_b - {2 * sub}) DIV {sub} + 1 AS INT))"
    )
    lo = btop * scale
    hi = (btop + 1) * scale
    mid = F.when(F.col("_b") < 2 * sub, F.col("_b").cast("double")).otherwise(
        (lo + hi - 1).cast("double") / F.lit(2.0)
    )
    return picked.select(
        *groups, "q", F.round(mid / 100.0, 4).alias("est_value")
    )


def dd_quantiles_oracle_sql(
    table: str,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    group_exprs: dict[str, str] | None = None,
    out_groups: list[str] | None = None,
) -> str:
    """DuckDB replay of ``dd_quantiles`` (same parameters).

    ``group_exprs`` maps group name -> SQL expression; ``out_groups``
    (subset of the group names) replays the registers-then-merge
    pipeline: bins count at the FULL grouping, collapse to
    ``out_groups`` with a per-bin SUM before the estimate — the
    ``dd_registers`` + ``dd_merge`` + ``dd_estimate`` rollup shape
    (the hll_oracle_sql symmetry, VERDICT r05 item 4)."""
    sub = 1 << _SUB_BITS
    qvals = ", ".join(f"({float(q)!r})" for q in qs)
    exprs = group_exprs or {}
    groups = list(exprs)
    out_g = groups if out_groups is None else list(out_groups)
    gsel_src = "".join(f"{exprs[g]} AS {g}, " for g in groups)
    gsel = "".join(f"{g}, " for g in groups)
    osel = "".join(f"{g}, " for g in out_g)
    opfx = "".join(f"p.{g}, " for g in out_g)
    part = ("PARTITION BY " + ", ".join(out_g)) if out_g else ""
    gby_cnt = "GROUP BY " + ", ".join([*groups, "bin"]) if groups else "GROUP BY bin"
    gby_merge = "GROUP BY " + ", ".join([*out_g, "bin"]) if out_g else "GROUP BY bin"
    gby_pick = "GROUP BY " + ", ".join([*[f"c.{g}" for g in out_g], "q"])
    jcond = " AND ".join(
        ["c.cum >= CAST(CEIL(q.q * c.n) AS BIGINT)"]
    )
    return f"""
    WITH cents_t AS (
      SELECT {gsel_src}CAST(ROUND({value_col} * 100) AS BIGINT) AS cents
      FROM {table} WHERE {value_col} > 0
    ), binned0 AS (
      SELECT {gsel}cents, length(bin(cents)) AS bl
      FROM cents_t
    ), bins AS (
      SELECT {gsel}CASE WHEN cents < {2 * sub} THEN cents
                  ELSE {2 * sub} + (bl - {_SUB_BITS + 2}) * {sub}
                       + (cents // (CAST(1 AS BIGINT) << (bl - {1 + _SUB_BITS}))) - {sub}
             END AS bin
      FROM binned0
    ), counts AS (
      SELECT {gsel}bin, CAST(COUNT(*) AS BIGINT) AS c FROM bins {gby_cnt}
    ), merged AS (
      SELECT {osel}bin, CAST(SUM(c) AS BIGINT) AS c FROM counts {gby_merge}
    ), cum AS (
      SELECT {osel}bin, SUM(c) OVER ({part} ORDER BY bin) AS cum0,
             SUM(c) OVER ({part}) AS n0
      FROM merged
    ), cum2 AS (
      SELECT {osel}bin, CAST(cum0 AS BIGINT) AS cum, CAST(n0 AS BIGINT) AS n FROM cum
    ), qs_t AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {qvals}) AS t(q)),
    picked AS (
      SELECT {"".join(f"c.{g}, " for g in out_g)}q.q AS q, MIN(c.bin) AS bin
      FROM qs_t q JOIN cum2 c ON {jcond}
      {gby_pick}
    )
    SELECT {opfx}p.q,
           ROUND(CASE WHEN p.bin < {2 * sub} THEN CAST(p.bin AS DOUBLE)
                  ELSE CAST(((((p.bin - {2 * sub}) % {sub} + {sub})
                             * (CAST(1 AS BIGINT) << (((p.bin - {2 * sub}) // {sub}) + 1))
                          + (((p.bin - {2 * sub}) % {sub} + {sub} + 1)
                             * (CAST(1 AS BIGINT) << (((p.bin - {2 * sub}) // {sub}) + 1)))
                          - 1)) AS DOUBLE) / 2.0
             END / 100.0, 4) AS est_value
    FROM picked p
"""


def hll_oracle_sql(
    table: str,
    key_col: str,
    group_cols: list[str] | None = None,
    b: int = 8,
    group_exprs: dict[str, str] | None = None,
    out_groups: list[str] | None = None,
) -> str:
    """The DuckDB replay of ``hll_cardinality`` — generated from the
    same parameters so the scale constants can never drift.

    ``group_exprs`` maps a group name to the SQL expression that
    computes it (plain column reference when absent). ``out_groups``
    (a subset of ``group_cols``) replays the registers-then-merge
    pipeline: registers build at the FULL grouping, then collapse to
    ``out_groups`` with a per-bucket MAX before the estimate — the
    incremental-rollup shape ``hll_registers`` + ``hll_merge`` +
    ``hll_estimate`` expose on the Spark side."""
    m = 1 << b
    wbits = 60 - b
    maxrho = wbits + 1
    c = repr(_alpha(m) * m * m * float(1 << maxrho))
    groups = list(group_cols or [])
    exprs = group_exprs or {}
    out_g = groups if out_groups is None else list(out_groups)
    gsel_src = "".join(f"{exprs.get(g, g)} AS {g}, " for g in groups)
    gsel = "".join(f"{g}, " for g in groups)
    osel = "".join(f"{g}, " for g in out_g)
    gby_out = ("GROUP BY " + ", ".join(out_g)) if out_g else ""
    gby_reg = "GROUP BY " + ", ".join([*groups, "_bucket"])
    gby_merge = "GROUP BY " + ", ".join([*out_g, "_bucket"])
    return f"""
    WITH hashed AS (
      SELECT {gsel_src}
             CAST('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM {table}
      WHERE {key_col} IS NOT NULL
    ), rho AS (
      SELECT {gsel} h % {m} AS _bucket,
             CASE WHEN (h >> {b}) = 0 THEN {maxrho}
                  ELSE {wbits} + 1 - length(bin(h >> {b}))
             END AS _rho
      FROM hashed
    ), regs0 AS (
      SELECT {gsel} _bucket, MAX(_rho) AS _maxrho FROM rho {gby_reg}
    ), regs AS (
      SELECT {osel} _bucket, MAX(_maxrho) AS _maxrho FROM regs0 {gby_merge}
    ), agg AS (
      SELECT {osel} CAST(COUNT(*) AS BIGINT) AS buckets_hit,
             CAST(COALESCE(SUM(CAST(1 AS BIGINT) << ({maxrho} - _maxrho)), 0) AS BIGINT)
               + ({m} - CAST(COUNT(*) AS BIGINT)) * (CAST(1 AS BIGINT) << {maxrho}) AS sum_int,
             {m} - CAST(COUNT(*) AS BIGINT) AS zeros
      FROM regs {gby_out}
    )
    SELECT {osel} buckets_hit,
           ROUND(CASE WHEN ({c} / CAST(sum_int AS DOUBLE)) <= {2.5 * m}
                       AND zeros > 0
                      THEN {float(m)} * ln({float(m)} / CAST(zeros AS DOUBLE))
                      ELSE {c} / CAST(sum_int AS DOUBLE) END, 2) AS n_distinct_est
    FROM agg
"""


# --- KMV (k-minimum-values / theta-style) sketch -----------------------
#
# VERDICT r05 item 3: HLL intersection by inclusion-exclusion degrades
# exactly where audience-overlap questions live — a small |A ∩ B| is the
# difference of two ~1%-RSE estimates, so the subtraction swamps the
# signal. KMV (Beyer et al., SIGMOD 2007; the DataSketches theta-sketch
# family) estimates the intersection DIRECTLY: keep the k smallest
# distinct hash values per set; the union sketch is the k smallest of
# the merged values; rho = |union sketch ∩ A-sketch ∩ B-sketch| gives
# jaccard_est = rho/k and |A ∩ B| ~ (rho/k) * est(|A ∪ B|), whose error
# scales with the intersection itself, not with |A| + |B|.
#
# Engine-portable discipline as the rest of the tier: hashes are the
# 60-bit md5 draws (exact integers), min-k is an integer rank, rho is
# an exact integer, and the only doubles are the final divisions from
# identical literals — the estimates hash-match DuckDB.


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    nsplits: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``key_col`` (per
    group, when ``group_cols`` is given) — the KMV sketch STATE
    (group cols + ``_h``, <= k rows per group, ascending-unique).

    Build plan for 100 TB: (1) map-side partial distinct collapses
    duplicate keys before the shuffle, so the exchange carries ~one
    8-byte hash per distinct key; (2) min-k runs TWO-LEVEL — a
    row_number window per (group, _h % nsplits) split keeps each sort
    partition at distinct/nsplits rows across nsplits parallel
    reducers, then a final per-group window ranks the <= nsplits*k
    survivors. min-k of per-split min-k equals global min-k, so the
    single-reducer step only ever sees nsplits*k rows per group. The
    persisted state is k longs per group: set algebra (union /
    intersection / jaccard) runs on state alone, never re-reading
    rows."""
    if k < 2:
        raise ValueError(f"kmv k must be >= 2, got {k}")
    if nsplits < 1:
        # _h % 0 would raise DIVIDE_BY_ZERO deep inside the min-k job
        # under ANSI mode with no hint at the bad argument
        # (code-review r16)
        raise ValueError(f"kmv nsplits must be >= 1, got {nsplits}")
    groups = list(group_cols or [])
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    dh = (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, h.alias("_h"))
        .distinct()
    )
    return _min_k(dh, k, nsplits, groups)


def _min_k(
    dh: DataFrame, k: int, nsplits: int, groups: list[str] | None = None
) -> DataFrame:
    """Two-level distributed min-k over a distinct ``_h`` relation
    (min-k of per-split min-k equals global min-k), per group."""
    from pyspark.sql import Window

    groups = list(groups or [])
    w1 = Window.partitionBy(*groups, F.col("_h") % nsplits).orderBy("_h")
    lvl1 = (
        dh.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = (
        Window.partitionBy(*groups).orderBy("_h") if groups else Window.orderBy("_h")
    )
    return (
        lvl1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key_col) per group from the KMV
    sketch: exact when the group has < k distinct keys (the sketch IS
    the set), else the classic (k-1)/U_(k) estimator — group cols +
    (n_sketch, n_distinct_est). The HLL alternative when sketch state
    must also answer set-algebra questions (one state, both uses);
    RSE ~ 1/sqrt(k-2) vs HLL's 1.04/sqrt(2^b)."""
    groups = list(group_cols or [])
    sk = kmv_sketch(df, key_col, k=k, group_cols=groups)
    agg = sk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("_h").alias("_kth")
    )
    return agg.select(
        *groups,
        "n_sketch",
        F.round(_kmv_est_expr(F.col("n_sketch"), F.col("_kth"), k), 2).alias(
            "n_distinct_est"
        ),
    )


def kmv_merge(
    sketches_union: DataFrame,
    k: int,
    nsplits: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge KMV sketch slices (per-day/per-batch ``_h`` tables
    unioned): distinct, then min-k — per group when ``group_cols`` is
    given (matching ``kmv_sketch(group_cols=...)`` state). Associative
    AND idempotent — every k-smallest value survives its own slice's
    min-k, and duplicate values from replayed slices collapse in the
    distinct — so merged state is bit-identical to sketching the union
    of the raw key sets (the hll_merge symmetry; pinned by the
    streaming test).

    Raises on unexpected input columns: silently projecting down to
    ``_h`` would collapse grouped sketch state into one global sketch
    (ADVICE r06)."""
    groups = list(group_cols or [])
    expected = set(groups) | {"_h"}
    extra = [c for c in sketches_union.columns if c not in expected]
    if extra or "_h" not in sketches_union.columns:
        raise ValueError(
            f"kmv_merge expects columns {sorted(expected)}, got "
            f"{sketches_union.columns}; pass group_cols to merge grouped "
            "sketch slices per group"
        )
    return _min_k(
        sketches_union.select(*groups, "_h").distinct(), k, nsplits, groups
    )


def _kmv_est_expr(n_col, kth_col, k: int):
    # n < k -> the sketch IS the distinct set (exact count). Otherwise
    # the classic unbiased estimator (k-1)/U_(k) with U_(k) = kth
    # smallest hash / 2^60; (k-1)*2^60 is one exact double literal
    # (k-1 < 2^53, times a power of two).
    c = float((k - 1) << 60)
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(c) / kth_col.cast("double")
    )


def kmv_intersection_report(
    df_a: DataFrame,
    df_b: DataFrame,
    key_a: str,
    key_b: str,
    k: int = 256,
) -> DataFrame:
    """ONE row: (n_a_sketch, n_b_sketch, n_union_sketch, kmv_rho,
    est_a, est_b, est_union, jaccard_est, est_intersection).

    The union sketch is the k smallest of the two sketches' merged
    values (a <= 2k-row relation — state-only merge, associative like
    hll_merge); rho counts union-sketch values present in BOTH side
    sketches. jaccard_est = rho / n_union (exact when the union fits k
    because then every value is kept); est_intersection = jaccard_est
    * est_union, which degrades gracefully to the EXACT intersection
    count when |A ∪ B| <= k. The same union-sketch partition gives the
    full theta-style set algebra for free: every union-sketch value is
    in A, B, or both, so est_a_minus_b / est_b_minus_a use the
    a-only / b-only counts over the identical est_union scale (the
    three estimates sum to est_union exactly). All joins are against
    <= k-row relations (broadcast); nothing here rescans the input
    tables."""
    from pyspark.sql import Window

    sa = kmv_sketch(df_a, key_a, k=k)
    sb = kmv_sketch(df_b, key_b, k=k)
    union_vals = sa.unionAll(sb).distinct()
    wu = Window.orderBy("_h")
    su = (
        union_vals.withColumn("_rn", F.row_number().over(wu))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )

    def _stats(s: DataFrame, n_name: str, kth_name: str) -> DataFrame:
        return s.agg(
            F.count(F.lit(1)).alias(n_name), F.max("_h").alias(kth_name)
        )

    rho = (
        su.join(sa, "_h", "semi")
        .join(sb, "_h", "semi")
        .agg(F.count(F.lit(1)).alias("kmv_rho"))
    )
    rho_a_only = (
        su.join(sa, "_h", "semi")
        .join(sb, "_h", "anti")
        .agg(F.count(F.lit(1)).alias("_rho_a_only"))
    )
    est_a = _kmv_est_expr(F.col("n_a_sketch"), F.col("_kth_a"), k)
    est_b = _kmv_est_expr(F.col("n_b_sketch"), F.col("_kth_b"), k)
    est_u = F.round(
        _kmv_est_expr(F.col("n_union_sketch"), F.col("_kth_u"), k), 2
    )
    # guard the empty-union case (both inputs empty): ANSI mode makes
    # 0/0 an error, and the defined answer is jaccard 0
    jac = F.when(F.col("n_union_sketch") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.col("kmv_rho").cast("double") / F.col("n_union_sketch").cast("double"),
            6,
        )
    )
    frac_a_only = F.when(F.col("n_union_sketch") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.col("_rho_a_only").cast("double")
            / F.col("n_union_sketch").cast("double"),
            6,
        )
    )
    # b-only count = n_union - rho - a_only (the partition is exact)
    frac_b_only = F.when(F.col("n_union_sketch") == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.col("n_union_sketch") - F.col("kmv_rho") - F.col("_rho_a_only")).cast(
                "double"
            )
            / F.col("n_union_sketch").cast("double"),
            6,
        )
    )
    return (
        _stats(sa, "n_a_sketch", "_kth_a")
        .crossJoin(F.broadcast(_stats(sb, "n_b_sketch", "_kth_b")))
        .crossJoin(F.broadcast(_stats(su, "n_union_sketch", "_kth_u")))
        .crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(rho_a_only))
        .select(
            "n_a_sketch",
            "n_b_sketch",
            "n_union_sketch",
            "kmv_rho",
            F.round(est_a, 2).alias("est_a"),
            F.round(est_b, 2).alias("est_b"),
            est_u.alias("est_union"),
            jac.alias("jaccard_est"),
            F.round(jac * est_u, 2).alias("est_intersection"),
            F.round(frac_a_only * est_u, 2).alias("est_a_minus_b"),
            F.round(frac_b_only * est_u, 2).alias("est_b_minus_a"),
        )
    )


def kmv_intersection_oracle_sql(
    side_a: str,
    side_b: str,
    key_a: str,
    key_b: str,
    k: int = 256,
) -> str:
    """DuckDB replay of ``kmv_intersection_report`` (``side_a`` /
    ``side_b`` are table expressions, e.g. a filtered subquery).
    Generated from the same k so the estimator constant can never
    drift. The two-level Spark min-k equals the single ROW_NUMBER
    min-k replayed here by construction."""
    c = repr(float((k - 1) << 60))

    def _sk(src: str, key: str, name: str) -> str:
        return f"""{name}_keys AS (
      SELECT DISTINCT CAST('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 15) AS BIGINT) AS _h
      FROM {src} WHERE {key} IS NOT NULL
    ), {name}_sk AS (
      SELECT _h FROM (
        SELECT _h, row_number() OVER (ORDER BY _h) AS rn FROM {name}_keys
      ) WHERE rn <= {k}
    ), {name}_st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(_h) AS kth FROM {name}_sk
    )"""

    est = (
        lambda n, kth: f"CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE)"
        f" ELSE {c} / CAST({kth} AS DOUBLE) END"
    )
    # Empty-union guard mirroring kmv_intersection_report's WHEN
    # n_union_sketch == 0 THEN 0.0 — without it DuckDB returns NULL on
    # empty inputs while Spark returns 0.0 (ADVICE r06).
    frac = (
        lambda num: f"CASE WHEN u_st.n = 0 THEN 0.0"
        f" ELSE ROUND(CAST({num} AS DOUBLE) / CAST(u_st.n AS DOUBLE), 6) END"
    )
    return f"""
    WITH {_sk(side_a, key_a, "a")}, {_sk(side_b, key_b, "b")},
    u_all AS (SELECT _h FROM a_sk UNION SELECT _h FROM b_sk),
    u_sk AS (
      SELECT _h FROM (
        SELECT _h, row_number() OVER (ORDER BY _h) AS rn FROM u_all
      ) WHERE rn <= {k}
    ), u_st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(_h) AS kth FROM u_sk
    ), rho_t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rho FROM u_sk
      WHERE _h IN (SELECT _h FROM a_sk) AND _h IN (SELECT _h FROM b_sk)
    ), rho_a_t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rho_a FROM u_sk
      WHERE _h IN (SELECT _h FROM a_sk) AND _h NOT IN (SELECT _h FROM b_sk)
    )
    SELECT a_st.n AS n_a_sketch, b_st.n AS n_b_sketch,
           u_st.n AS n_union_sketch, rho_t.rho AS kmv_rho,
           ROUND({est("a_st.n", "a_st.kth")}, 2) AS est_a,
           ROUND({est("b_st.n", "b_st.kth")}, 2) AS est_b,
           ROUND({est("u_st.n", "u_st.kth")}, 2) AS est_union,
           {frac("rho_t.rho")} AS jaccard_est,
           ROUND({frac("rho_t.rho")}
                 * ROUND({est("u_st.n", "u_st.kth")}, 2), 2) AS est_intersection,
           ROUND({frac("rho_a_t.rho_a")}
                 * ROUND({est("u_st.n", "u_st.kth")}, 2), 2) AS est_a_minus_b,
           ROUND({frac("u_st.n - rho_t.rho - rho_a_t.rho_a")}
                 * ROUND({est("u_st.n", "u_st.kth")}, 2), 2) AS est_b_minus_a
    FROM a_st, b_st, u_st, rho_t, rho_a_t
"""
