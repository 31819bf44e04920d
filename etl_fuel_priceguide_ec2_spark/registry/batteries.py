"""Function batteries: posexplode, map, higher-order, conditional agg, union-by-name, variant JSON, try_*, bitwise, CSV round-trip."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

@register(
    "posexplode_tokens",
    """
    SELECT x.doc_id, u.i - 1 AS pos, x.toks[u.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 50) x,
         UNNEST(generate_series(1, len(x.toks))) AS u(i)
    """,
)
def q_posexplode_tokens(spark, sf_dir):
    """Positional explode (LATERAL VIEW posexplode): token + ordinal per
    document — the tokenizer front-end for positional n-gram features.
    Generator runs inside the scan stage, no shuffle."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
    )


@register(
    "map_functions_battery",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           COUNT(DISTINCT event_type) AS n_types,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
    FROM events
    GROUP BY user_id
    """,
)
def q_map_functions_battery(spark, sf_dir):
    """MapType surface: build event_type->count map per user with
    map_from_entries(collect_list(struct)), then read it back with
    element_at / map_keys / size. Output is scalar columns so the
    DuckDB oracle (which has no Spark-style MAP hashing) compares
    exactly."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("purchases"),
        F.size("m").alias("n_types"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("types_csv"),
    )


@register(
    "window_count_distinct",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_distinct_types
    FROM events
    """,
)
def q_window_count_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — Spark lacks DISTINCT in
    window aggregates, so the idiomatic rewrite is
    size(collect_set(...)) over the running frame. State per key is
    bounded by the distinct-value cardinality (5 event types), so this
    scales; for high-cardinality columns switch to approx sketches."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
    )


@register(
    "shipping_priority_top10",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(revenue_dec AS DOUBLE) AS revenue
    FROM (
      SELECT o_orderkey, o_orderdate, o_orderpriority,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS revenue_dec
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
    )
    ORDER BY revenue_dec DESC, o_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority_top10(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority top-10). Revenue is summed as
    DECIMAL so the top-10 cut is deterministic across engines; cast to
    DOUBLE only in the output. Catalyst pushes both date predicates
    into the scans and broadcast-joins the filtered customer dim; the
    global top-10 is a TakeOrdered, not a full sort."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    dec_price = F.col("l_extendedprice").cast("decimal(12,2)")
    dec_disc = F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec_price * dec_disc).alias("revenue_dec"))
        .orderBy(F.col("revenue_dec").desc(), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


@register(
    "fuzzy_brand_pairs",
    """
    WITH b AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
           levenshtein(a.p_brand, c.p_brand) AS dist
    FROM b a JOIN b c ON a.p_brand < c.p_brand
    WHERE levenshtein(a.p_brand, c.p_brand) <= 1
    """,
)
def q_fuzzy_brand_pairs(spark, sf_dir):
    """Fuzzy string matching via edit distance over a deduplicated
    domain: distinct-first shrinks the cross join to |domain|^2 (25x25
    here), then broadcast nested-loop + levenshtein filter. The
    distinct-then-compare pattern is how entity-resolution blocking
    keeps edit-distance joins tractable at scale."""
    from pyspark.sql import functions as F

    brands = (
        load_table(spark, sf_dir, "part").select("p_brand").distinct()
    )
    a = brands.select(F.col("p_brand").alias("brand_a"))
    c = brands.select(F.col("p_brand").alias("brand_b"))
    return (
        a.join(F.broadcast(c), F.col("brand_a") < F.col("brand_b"))
        .withColumn("dist", F.levenshtein("brand_a", "brand_b"))
        .filter(F.col("dist") <= 1)
    )


@register(
    "higher_order_array_battery",
    """
    WITH g AS (
      SELECT o_custkey,
             list_sort(list(o_orderpriority)) AS priorities,
             list_sort(list(ROUND(o_totalprice, 2))) AS totals
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           array_to_string(list_transform(priorities, x -> substr(x, 1, 1)), '|')
             AS priority_codes,
           len(list_filter(priorities, x -> x = '1-URGENT')) AS n_urgent,
           len(list_filter(priorities, x -> x = '5-LOW')) > 0 AS has_low,
           len(list_filter(totals, x -> x > 300000)) AS n_big,
           array_to_string(list_transform(totals[1:3],
                             x -> CAST(CAST(x AS DECIMAL(14,2)) AS VARCHAR)), '|')
             AS smallest3,
           ROUND(list_max(totals), 2) AS max_total
    FROM g
    """,
)
def q_higher_order_array_battery(spark, sf_dir):
    """Higher-order array functions (SparkSQL lambdas): transform /
    filter / exists / slice / array_max over per-group collected
    arrays. Lambdas run inside codegen on the JVM — no Python UDF —
    so this is shuffle-once (the groupBy) then embarrassingly
    parallel."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderpriority")).alias("priorities"),
        F.sort_array(F.collect_list(F.round("o_totalprice", 2))).alias("totals"),
    )
    return g.select(
        "o_custkey",
        F.array_join(
            F.transform("priorities", lambda x: F.substring(x, 1, 1)), "|"
        ).alias("priority_codes"),
        F.size(F.filter("priorities", lambda x: x == "1-URGENT")).alias("n_urgent"),
        F.exists("priorities", lambda x: x == "5-LOW").alias("has_low"),
        F.size(F.filter("totals", lambda x: x > 300000)).alias("n_big"),
        F.array_join(
            F.transform(
                F.slice("totals", 1, 3),
                lambda x: x.cast("decimal(14,2)").cast("string"),
            ),
            "|",
        ).alias("smallest3"),
        F.round(F.array_max("totals"), 2).alias("max_total"),
    )


@register(
    "having_large_qty_customers",
    """
    SELECT o_custkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
           COUNT(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 1300
    """,
)
def q_having_large_qty_customers(spark, sf_dir):
    """GROUP BY + HAVING (TPC-H Q18 shape): post-aggregation predicate
    on an exact DECIMAL sum so the cut is engine-stable. Catalyst plans
    HAVING as a Filter above the final HashAggregate; the partial agg
    still combines map-side."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty_dec = F.sum(F.col("l_quantity").cast("decimal(12,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            qty_dec.alias("qty_dec"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("qty_dec") > 1300)
        .select(
            "o_custkey",
            F.col("qty_dec").cast("double").alias("total_qty"),
            "n_items",
        )
    )


@register(
    "conditional_agg_battery",
    """
    SELECT user_id,
           CAST(count_if(value > 3) AS BIGINT) AS n_big,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           bool_or(event_type = 'purchase') AS any_purchase,
           bool_and(value IS NOT NULL) AS all_valued,
           any_value(user_id) AS uid_echo
    FROM events
    GROUP BY user_id
    """,
)
def q_conditional_agg_battery(spark, sf_dir):
    """Conditional aggregation surface: count_if, the SQL FILTER
    clause, bool_and/bool_or, any_value. All partial-aggregable —
    single shuffle on the group key. any_value is nondeterministic in
    general; here the group key echoes itself so it compares exactly."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("count_if(value > 3)").alias("n_big"),
        F.expr("count(*) FILTER (WHERE event_type = 'click')").alias("n_click"),
        F.expr("bool_or(event_type = 'purchase')").alias("any_purchase"),
        F.expr("bool_and(value IS NOT NULL)").alias("all_valued"),
        F.expr("any_value(user_id)").alias("uid_echo"),
    )


@register(
    "union_by_name_feeds",
    """
    SELECT user_id, d, clicks, purchases FROM (
      SELECT user_id, CAST(ts AS DATE) AS d,
             COUNT(*) AS clicks, NULL::BIGINT AS purchases
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS DATE)
      UNION ALL BY NAME
      SELECT user_id, COUNT(*) AS purchases, CAST(ts AS DATE) AS d,
             NULL::BIGINT AS clicks
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, CAST(ts AS DATE)
    )
    """,
)
def q_union_by_name_feeds(spark, sf_dir):
    """Schema-aligned union (unionByName, allowMissingColumns): merge
    two differently-shaped daily feeds by column NAME, missing columns
    null-filled — the schema-drift-tolerant concat for multi-source
    ingestion. Positional UNION would silently misalign here."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("purchases"))
    )
    return clicks.unionByName(purchases, allowMissingColumns=True).select(
        "user_id", "d", "clicks", "purchases"
    )


@register(
    "variant_json_battery",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
           'OBJECT<k: BIGINT>' AS v_schema
    FROM events
    """,
)
def q_variant_json_battery(spark, sf_dir):
    """Spark 4 VARIANT type: parse_json once into a binary-encoded
    variant, then typed variant_get extraction — the scale path for
    semi-structured columns (single parse, O(1) typed field reads,
    no per-access JSON re-parse). schema_of_variant output is pinned
    as a literal in the oracle (DuckDB has no variant; the value checks
    Spark's inference is stable)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.parse_json("props").alias("v")
    ).select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_val"),
        F.variant_get("v", "$.missing", "string").isNull().alias("missing_is_null"),
        F.schema_of_variant("v").alias("v_schema"),
    )


@register(
    "try_functions_battery",
    """
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_custkey % 5, 0) IS NULL AS div_by_zero_null,
           ROUND(o_totalprice / NULLIF(o_custkey % 5, 0), 6) AS safe_ratio,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast_null,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit
    FROM orders
    """,
)
def q_try_functions_battery(spark, sf_dir):
    """ANSI-mode error tolerance: try_divide / try_cast return NULL
    instead of failing the job — the P6 error-row philosophy
    (index.js:137-140, skip-and-continue) lifted to expression level.
    Under ANSI SQL (Spark 4 default) plain '/' and CAST throw; try_*
    is the idiom for dirty data at scale where one bad row must not
    kill a 100 TB job."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    safe = F.try_divide("o_totalprice", F.col("o_custkey") % 5)
    return orders.select(
        "o_orderkey",
        safe.isNull().alias("div_by_zero_null"),
        F.round(safe, 6).alias("safe_ratio"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast_null"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias("prio_digit"),
    )


@register(
    "bitwise_battery",
    """
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 1365) AS xored,
           event_id << 3 AS shifted_left,
           event_id >> 2 AS shifted_right,
           bit_count(event_id) AS popcount
    FROM events
    """,
)
def q_bitwise_battery(spark, sf_dir):
    """Bitwise expression surface (& | ^ shifts popcount) — flag words,
    bloom/bitmap membership math, hash mixing. Pure codegen
    expressions."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ 1365").alias("xored"),
        F.shiftleft("event_id", 3).alias("shifted_left"),
        F.shiftright("event_id", 2).alias("shifted_right"),
        F.bit_count("event_id").alias("popcount"),
    )


@register(
    "csv_roundtrip_battery",
    """
    SELECT o_orderkey,
           o_orderkey || ',' || o_orderpriority || ',' || o_orderstatus AS csv_line,
           o_orderpriority AS prio_back,
           o_orderkey AS key_back
    FROM orders
    """,
)
def q_csv_roundtrip_battery(spark, sf_dir):
    """to_csv / from_csv round-trip: struct → CSV line → parsed struct,
    outputs compared against the source columns (the oracle builds the
    same line with plain concatenation). The embedded-codec pattern for
    line-oriented interchange without a file hop."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    line = F.to_csv(F.struct("o_orderkey", "o_orderpriority", "o_orderstatus"))
    parsed = F.from_csv(line, "k LONG, p STRING, s STRING")
    return orders.select(
        "o_orderkey",
        line.alias("csv_line"),
        parsed.getField("p").alias("prio_back"),
        parsed.getField("k").alias("key_back"),
    )


