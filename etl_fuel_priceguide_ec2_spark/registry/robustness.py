"""Skew-resistant join, W4 array access, EXCEPT ALL, error-tolerant JSON, interval/range join, histogram, data-quality metrics."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    SNAP_A_END,
    SNAP_B_END,
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    joins,
    similarity,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Skew-resistant join, W4 array access, EXCEPT ALL, error-tolerant JSON,
# embedding stats
# ---------------------------------------------------------------------------


@register(
    "salted_join_skewed_flag",
    """
    SELECT f.flag_name, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN (VALUES ('A', 'returned'), ('N', 'none'), ('R', 'refused'))
         AS f(l_returnflag, flag_name)
      ON l.l_returnflag = f.l_returnflag
    GROUP BY f.flag_name
    """,
)
def q_salted_join_skewed_flag(spark, sf_dir):
    """l_returnflag has 3 values over the whole fact table — the
    textbook hot-key join. The salted join spreads each flag over 16
    sub-keys; the oracle is the PLAIN join, proving salting changes the
    plan, never the result."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    flags = spark.createDataFrame(
        [("A", "returned"), ("N", "none"), ("R", "refused")],
        "l_returnflag string, flag_name string",
    )
    joined = joins.salted_join(li, flags, key="l_returnflag", salt_src_col="l_orderkey", salts=16)
    return joined.groupBy("flag_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
    )


@register(
    "array_element_access",
    """
    SELECT o_custkey,
           list_sort(list(o_orderpriority))[1] AS first_priority,
           list_sort(list(o_orderpriority))[-1] AS last_priority,
           len(list(o_orderpriority)) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def q_array_element_access(spark, sf_dir):
    """W4 — nested array element access (Items[0].Combustiveis pattern,
    index.js:70): element_at on a per-group built array."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    arr = F.sort_array(F.collect_list("o_orderpriority"))
    return orders.groupBy("o_custkey").agg(
        F.element_at(arr, 1).alias("first_priority"),
        F.element_at(arr, -1).alias("last_priority"),
        F.size(F.collect_list("o_orderpriority")).alias("n_orders"),
    )


@register(
    "except_all_multiset",
    f"""
    SELECT event_type FROM events WHERE ts <= TIMESTAMP '{SNAP_B_END}'
    EXCEPT ALL
    SELECT event_type FROM events WHERE ts <= TIMESTAMP '{SNAP_A_END}'
    """,
)
def q_except_all_multiset(spark, sf_dir):
    """EP3's multiset form: exceptAll keeps duplicate cardinality
    (bag difference), unlike the distinct EXCEPT of snapshot_diff."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("ts") <= F.lit(SNAP_B_END).cast("timestamp")).select("event_type")
    a = ev.filter(F.col("ts") <= F.lit(SNAP_A_END).cast("timestamp")).select("event_type")
    return b.exceptAll(a)


@register(
    "json_error_tolerance",
    """
    SELECT event_id,
           CASE WHEN json_valid(broken) THEN CAST(json_extract_string(broken, '$.k') AS BIGINT)
                ELSE NULL END AS k_val,
           json_valid(broken) AS parse_ok
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0
                  THEN substring(props, 1, length(props) - 1)
                  ELSE props END AS broken
      FROM events
    )
    """,
)
def q_json_error_tolerance(spark, sf_dir):
    """P6 — error-tolerant row processing: malformed JSON (1 in 7 rows
    corrupted) parses to NULL instead of failing the job (PERMISSIVE
    semantics of from_json)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    broken = F.when(
        F.col("event_id") % 7 == 0, F.expr("substring(props, 1, length(props) - 1)")
    ).otherwise(F.col("props"))
    parsed = F.from_json(broken, "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        parsed.getField("k").isNotNull().alias("parse_ok"),
    )


@register(
    "embedding_norm_stats",
    """
    SELECT label, COUNT(*) AS n,
           ROUND(MIN(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6) AS min_norm,
           ROUND(MAX(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_norm_stats(spark, sf_dir):
    """Vector-column statistics (min/max are order-independent, so no
    float-summation nondeterminism vs the oracle)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(F.col("embedding").cast("array<double>"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


@register(
    "similarity_pandas_udf",
    """
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS qn
      FROM embeddings WHERE vec_id = 0
    )
    -- numpy's matmul sums in a different order than a sequential fold,
    -- but both engines agree after ROUND(.., 4) (divergence ~1e-15 —
    -- a boundary hit would need a cosine within 1e-13 of a 5e-5 step)
    SELECT vec_id, ROUND(cos_raw, 4) + 0.0 AS cosine FROM (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[]))) * q.qn) AS cos_raw
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id > 0
      ORDER BY cos_raw DESC, e.vec_id ASC
      LIMIT 10
    )
    """,
)
def q_similarity_pandas_udf(spark, sf_dir):
    """X3 pandas_udf variant: Arrow-batched numpy cosine against one
    query vector — the plumbing for very wide vectors where matmul
    beats the per-element HOF loop."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    scored = similarity.cosine_scores_pandas(emb.filter(F.col("vec_id") > 0), list(qvec), "embedding", "vec_id")
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10).select(
        "vec_id", (F.round("cosine", 4) + F.lit(0.0)).alias("cosine")
    )


# ---------------------------------------------------------------------------
# Interval/range join, histogram, data-quality metrics
# ---------------------------------------------------------------------------


@register(
    "interval_join_recent_events",
    """
    WITH anchors AS (
      SELECT event_id AS anchor_id, user_id, ts AS anchor_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.anchor_id, COUNT(e.event_id) AS n_recent_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM anchors a
    JOIN events e
      ON e.user_id = a.user_id
     AND e.ts <= a.anchor_ts
     AND e.ts >= a.anchor_ts - INTERVAL 7 DAY
    GROUP BY a.anchor_id
    """,
)
def q_interval_join_recent_events(spark, sf_dir):
    """Range join via day-bucket replication (see
    joins.interval_join_recent): each purchase event aggregates the same
    user's events from the trailing 7 days (attribution-window shape).
    The oracle is the naive BETWEEN join — same rows, scalable plan.
    (Round-3 re-anchor: the former orders-vs-events form compared 0 rows
    at sf0.01 because the fixtures' date ranges never overlap — vacuous.)
    """
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    anchors = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("anchor_ts"),
    )
    joined = joins.interval_join_recent(
        anchors, events, key="user_id", left_ts="anchor_ts", right_ts="ts", lookback_days=7
    )
    return joined.groupBy("anchor_id").agg(
        F.count("event_id").alias("n_recent_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "price_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) + 1 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*), 4)
             AS avg_price
    FROM orders GROUP BY 1
    """,
)
def q_price_histogram(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("bucket", F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
        )
    )


@register(
    "data_quality_metrics",
    """
    SELECT 'c_acctbal' AS column_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_out_of_range,
           COUNT(DISTINCT c_custkey) AS n_distinct_keys,
           COUNT(*) - COUNT(DISTINCT c_custkey) AS n_duplicate_keys
    FROM customer
    """,
)
def q_data_quality_metrics(spark, sf_dir):
    """Constraint-validation pass (null rate, range violations, key
    uniqueness) — the pre-load quality gate of a production pipeline,
    one aggregate over the table."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    return cust.agg(
        F.lit("c_acctbal").alias("column_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(
            F.when((F.col("c_acctbal") < -1000) | (F.col("c_acctbal") > 10000), 1).otherwise(0)
        ).alias("n_out_of_range"),
        F.countDistinct("c_custkey").alias("n_distinct_keys"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n_duplicate_keys"),
    )


def _rplsh_oracle_sql(planes: int = 6, dim: int = 64, seed: int = 42, k: int = 10) -> str:
    """Full cross-engine mirror of similarity.cosine_topk_rplsh: the
    seeded numpy hyperplanes are inlined as DOUBLE literals (repr is an
    exact float64 round-trip), signatures/probes/cosines recomputed in
    DuckDB with the same left-fold order as Spark's F.aggregate, so the
    ANN result — recall < 1 and all — is value-compared, not rows-only."""
    import numpy as np

    hp = np.random.default_rng(seed).standard_normal((planes, dim))
    hp_rows = ",\n        ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in hp[j])}]::DOUBLE[])"
        for j in range(planes)
    )
    masks = [0] + [1 << j for j in range(planes)] + [
        (1 << a) | (1 << b) for a in range(planes) for b in range(a + 1, planes)
    ]
    return f"""
    WITH hp(j, h) AS (
      VALUES
        {hp_rows}
    ), base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM embeddings
    ), sigged AS (
      SELECT b.vec_id,
             CAST(SUM(CASE WHEN list_reduce(
                                  list_transform(range(1, {dim + 1}), i -> b.v[i] * hp.h[i]),
                                  (a, c) -> a + c) >= 0
                           THEN (CAST(1 AS BIGINT) << hp.j) ELSE 0 END) AS BIGINT) AS sig
      FROM base b CROSS JOIN hp
      GROUP BY b.vec_id
    ), csig AS (
      SELECT s.vec_id, s.sig, b.v, b.nrm FROM sigged s JOIN base b USING (vec_id)
    ), probes AS (
      SELECT c.vec_id, c.v, c.nrm, xor(c.sig, m.m) AS psig
      FROM csig c CROSS JOIN (SELECT UNNEST({masks}::BIGINT[]) AS m) m
      WHERE c.vec_id < 5
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, {dim + 1}), i -> c.v[i] * q.v[i]),
                         (a, b) -> a + b) / (c.nrm * q.nrm) AS cos_raw
      FROM probes q JOIN csig c ON c.sig = q.psig
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) + 0.0 AS cosine FROM (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """


@register("similarity_topk_rplsh", _rplsh_oracle_sql())
def q_similarity_topk_rplsh(spark, sf_dir):
    """Random-hyperplane LSH ANN with hamming-2 multiprobe (see
    similarity.cosine_topk_rplsh) — the bucketed scale path where even
    the IVF cell assignment is derived from the vectors themselves.
    Oracle = full DuckDB mirror with the seeded hyperplanes inlined."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_rplsh(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10, dim=64
    )




@register(
    "column_profile_lineitem",
    """
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_null,
             COUNT(DISTINCT l_quantity) AS q_nd,
             MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max,
             CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_null,
             COUNT(DISTINCT l_extendedprice) AS p_nd,
             MIN(l_extendedprice) AS p_min, MAX(l_extendedprice) AS p_max,
             CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_null,
             COUNT(DISTINCT l_discount) AS d_nd,
             MIN(l_discount) AS d_min, MAX(l_discount) AS d_max,
             CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_null,
             COUNT(DISTINCT l_returnflag) AS r_nd,
             MIN(l_returnflag) AS r_min, MAX(l_returnflag) AS r_max,
             CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_null,
             COUNT(DISTINCT l_linestatus) AS s_nd,
             MIN(l_linestatus) AS s_min, MAX(l_linestatus) AS s_max
      FROM lineitem
    )
    SELECT 'l_quantity' AS column_name, n_rows, q_null AS n_null, q_nd AS n_distinct,
           CAST(q_min AS DOUBLE) AS min_num, CAST(q_max AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
    UNION ALL
    SELECT 'l_extendedprice', n_rows, p_null, p_nd,
           CAST(p_min AS DOUBLE), CAST(p_max AS DOUBLE), NULL, NULL FROM a
    UNION ALL
    SELECT 'l_discount', n_rows, d_null, d_nd,
           CAST(d_min AS DOUBLE), CAST(d_max AS DOUBLE), NULL, NULL FROM a
    UNION ALL
    SELECT 'l_returnflag', n_rows, r_null, r_nd,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), r_min, r_max FROM a
    UNION ALL
    SELECT 'l_linestatus', n_rows, s_null, s_nd,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), s_min, s_max FROM a
    """,
)
def q_column_profile_lineitem(spark, sf_dir):
    """Column-profiling pass (schema-discovery / quality-dashboard
    shape): per-column null count, distinct count, and min/max in ONE
    scan — all 20 accumulators ride a single aggregate over the fact
    table and the per-column rows are exploded from the 1-row result,
    so profiling N columns never costs N scans. Numeric and string
    columns keep typed min/max lanes (cross-engine string formatting of
    doubles is not stable; typed lanes are)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    num_cols = ["l_quantity", "l_extendedprice", "l_discount"]
    str_cols = ["l_returnflag", "l_linestatus"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    a = li.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").cast("double").alias("min_num"),
                F.col(f"{c}__max").cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
        )
    return a.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


from etl_fuel_priceguide_ec2_spark.operators import layout as _layout

_ZORDER_ORACLE = f"""
    WITH z_t AS (
      {_layout.zorder_sql("lineitem", ["l_partkey", "l_suppkey"], bits=8)}
    )
    SELECT CAST(z >> 12 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
           MIN(l_suppkey) AS min_suppkey, MAX(l_suppkey) AS max_suppkey
    FROM z_t GROUP BY 1
"""


@register("zorder_layout_lineitem", _ZORDER_ORACLE)
def q_zorder_layout_lineitem(spark, sf_dir):
    """Z-order layout statistics: lineitem clustered on the Morton
    interleave of (l_partkey, l_suppkey) at 8 bits each, summarized
    per 4-bit curve prefix (16 buckets). The point of the relation:
    every bucket's min/max span is narrow on BOTH columns
    simultaneously — the row-group stats a z-ordered parquet write
    produces, which is what lets selective predicates on EITHER
    column prune most row groups at 100 TB (single-column sort prunes
    only itself; the locality test quantifies the span shrink). Curve
    values are exact integer arithmetic, so the layout report
    hash-matches DuckDB."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import layout

    li = load_table(spark, sf_dir, "lineitem")
    z = layout.zorder_value(li, ["l_partkey", "l_suppkey"], bits=8)
    return (
        li.withColumn("z", z)
        .groupBy(F.shiftright("z", 12).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
        )
    )


from etl_fuel_priceguide_ec2_spark.operators import graph as _graph

_PR_EDGES = """
    SELECT c AS src, s AS dst FROM (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    UNION ALL
    SELECT s, c FROM (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
"""


@register(
    "pagerank_supplier_customer",
    _graph.pagerank_oracle_sql(_PR_EDGES, iters=5, damping=0.85, topk=20),
)
def q_pagerank_supplier_customer(spark, sf_dir):
    """PageRank over the undirected customer-supplier trade graph
    (edges = distinct (custkey, suppkey) pairs from orders ⋈ lineitem;
    node ids disambiguated as 2*custkey / 2*suppkey+1), 5 iterations,
    damping 0.85, top-20 by rank with node-id tiebreak. The graph
    centrality question CC cannot answer ("which suppliers anchor the
    trade network"), built on the same iterative join+aggregate+
    checkpoint discipline. Per-edge contributions round to 12 dp and
    sum as DECIMAL, so every iteration is bit-identical to the
    oracle's unrolled CTE replay."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = _graph.pagerank(edges, iters=5, damping=0.85)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )


_TRI_PAIRS = """
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderpriority = '1-URGENT'
"""


@register(
    "triangle_counts_part_graph",
    _graph.triangle_oracle_sql(_TRI_PAIRS, topk=20),
)
def q_triangle_counts_part_graph(spark, sf_dir):
    """Triangle counting + local clustering coefficient over the part
    co-order graph (parts are adjacent when an urgent-priority order
    contains both), top-20 parts by triangle count with id tiebreak.
    The community-structure question PageRank and CC cannot answer
    ("how tightly is this part's neighborhood interlinked"). Degree-
    ordered orientation bounds the wedge join at O(m^1.5) — at sf0.1
    the graph is 241k edges / 325k triangles; the orientation is what
    keeps the same plan alive when a hub part appears at 100 TB. All
    integer arithmetic except one final division (exact operands,
    9 dp), so the relation hash-matches the DuckDB replay."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("ok")
    )
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("a") < F.col("b"))
        .join(urgent, "ok")
        .select("a", "b")
        .distinct()
    )
    tri = _graph.triangle_counts(pairs)
    w = Window.orderBy(F.col("n_triangles").desc(), F.col("node").asc())
    return (
        tri.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("node", "degree", "n_triangles", "lcc", "rank")
    )


_HITS_EDGES = """
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


@register(
    "hits_trade_authorities",
    _graph.hits_oracle_sql(_HITS_EDGES, iters=3, topk=20),
)
def q_hits_trade_authorities(spark, sf_dir):
    """HITS over the DIRECTED buyer→supplier trade graph (edges =
    distinct (custkey, suppkey) from orders ⋈ lineitem; same 2k/2k+1
    node encoding as pagerank_supplier_customer): 3 iterations of the
    L1-normalized hub/authority mutual recursion, top-20 authorities
    with node-id tiebreak. Where PageRank ranks overall centrality on
    the undirected graph, HITS separates the two roles the bipartite
    direction encodes — buyers whose baskets span strong suppliers
    (hubs) vs suppliers anchored by strong buyers (authorities)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    scores = _graph.hits(edges, iters=3)
    # TakeOrdered top-20 first (distributed), THEN rank the 20 survivors
    # — the unpartitioned row_number window never sees more than k rows,
    # so the single-partition exchange is O(k) regardless of graph size
    w = Window.orderBy(F.col("auth").desc(), F.col("node").asc())
    return (
        scores.orderBy(F.col("auth").desc(), F.col("node").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select("node", "hub", "auth", "rank")
    )
