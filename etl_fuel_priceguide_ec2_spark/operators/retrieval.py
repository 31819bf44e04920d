"""Lexical ranked retrieval: BM25 top-k over an inverted-postings
relation (VERDICT r05 item 5 — the lexical complement to the dense X3
similarity stack; tfidf_top_terms computes document keywords, this
answers query-time ranked retrieval).

Not in the reference (a row-store ETL, ``index.js``); extension-tier.

100 TB shape: the postings relation (token, doc, tf) is corpus-sized
and is NEVER broadcast — the tiny query-term set is, and it prunes the
exploded token stream BEFORE the tf aggregate, so the shuffle carries
only postings for query terms. Document lengths aggregate map-side
(one long per doc). Scoring is per-(query, doc, term) arithmetic on
exact integers (tf, df, dl) with the floats confined to the edges:
idf and the per-term contribution each round to 6 dp, and the per-doc
score sums the contributions as DECIMAL(18,6) — addition-order-free,
so ranking and the DuckDB oracle replay are exact, with the one
documented caveat that ln() sits one libm ulp from the 6-dp rounding
boundary in principle (same accepted risk as the HLL linear branch).

BM25 (Robertson-Sparck Jones; the standard k1/b form):
  idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)        [Lucene form]
  tfnorm(t) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  score(q, d) = sum over query terms of idf*tfnorm
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def inverted_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, id, tf) — the classic inverted index as a relation.
    One explode + one hash aggregate (map-side combined).

    Mergeable state: postings built per corpus SLICE (a day, a shard)
    union to the corpus postings by simple concatenation — doc ids are
    disjoint across slices, so no re-aggregation is needed; doc
    lengths likewise. Persist both at ingest and score queries with
    ``bm25_topk_from_postings`` without touching raw text again
    (pinned by test_bm25_from_persisted_slices_identical)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), _WS)).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl) token counts per doc — the other half of the
    persisted retrieval state (slice-unionable like the postings)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), _WS)).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))


def bm25_topk_from_postings(
    postings: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    queries: DataFrame,
    id_col: str,
    topk: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scoring against PERSISTED retrieval state — the query-time
    path once ``inverted_postings`` + ``doc_lengths`` were written at
    ingest: no text is re-tokenized; the only corpus-sized input is
    the postings scan, pruned by the broadcast query-term set before
    anything aggregates. Identical scoring/ranking math to
    ``bm25_topk`` (which delegates here)."""
    from pyspark.sql import Window

    qterms = queries.select("token").distinct()
    tf_rel = postings.join(F.broadcast(qterms), "token").select(
        "token", id_col, F.col("tf").alias("_tf")
    )
    return _bm25_score(tf_rel, doclens, n_docs, queries, id_col, topk, k1, b)


def _bm25_score(
    tf_rel: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    queries: DataFrame,
    id_col: str,
    topk: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared scoring/ranking tail of both BM25 paths: tf_rel is
    (token, id, _tf) for QUERY TERMS ONLY (however it was built)."""
    from pyspark.sql import Window

    avgdl_rel = doclens.agg(
        (F.sum("_dl").cast("double") / F.lit(float(n_docs))).alias("_avgdl")
    )
    df_rel = tf_rel.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))

    idf = F.round(
        F.log(
            (F.lit(float(n_docs)) - F.col("_df") + F.lit(0.5))
            / (F.col("_df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    tfnorm = (F.col("_tf") * F.lit(k1 + 1.0)) / (
        F.col("_tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
    )
    contrib = F.round(F.col("_idf") * tfnorm, 6).cast("decimal(18,6)")

    scored = (
        tf_rel.join(F.broadcast(df_rel.withColumn("_idf", idf)), "token")
        .join(doclens, id_col)
        .crossJoin(F.broadcast(avgdl_rel))
        .join(F.broadcast(queries), "token")
        .select("query_id", id_col, contrib.alias("_c"))
        .groupBy("query_id", id_col)
        .agg(F.sum("_c").alias("_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            id_col,
            F.col("_score").cast("double").alias("score"),
            "rank",
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    topk: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query BM25 top-k: ``queries`` is a (query_id, token)
    relation (a handful of rows — broadcast everywhere it appears).
    Output: (query_id, doc id, score DOUBLE, rank).

    Plan: explode -> broadcast-semi prune by query terms -> tf
    aggregate over MATCHING postings only -> df per term (a second
    tiny aggregate over the same pruned relation) -> join doc lengths
    -> decimal score sum -> per-query row_number window (score desc,
    id asc tiebreak — deterministic at the cut)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), _WS)).alias("token"),
    ).filter(F.col("token") != "")

    # corpus stats: N docs (driver literal, like tfidf_top_terms) and
    # doc lengths (one long per doc, map-side combined; avgdl is
    # derived inside _bm25_score)
    n_docs = df.count()
    doclens = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))

    qterms = queries.select("token").distinct()
    # prune the token stream BEFORE aggregating: postings are built
    # only for query terms, so the shuffle is query-sized, not
    # corpus-vocabulary-sized
    matched = toks.join(F.broadcast(qterms), "token")
    tf_rel = matched.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("_tf"))
    return _bm25_score(tf_rel, doclens, n_docs, queries, id_col, topk, k1, b)


def bm25_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_values: list[tuple[int, str]],
    topk: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replay of ``bm25_topk`` — generated from the same
    constants so k1/b/topk can never drift. ``query_values`` is the
    (query_id, token) list the Spark side builds its queries
    DataFrame from."""
    qvals = ", ".join(
        f"({int(qid)}, '" + tok.replace("'", "''") + "')" for qid, tok in query_values
    )
    return f"""
    WITH queries(query_id, token) AS (VALUES {qvals}),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}
    ), toks AS (
      SELECT {id_col}, UNNEST(string_split_regex(trim({text_col}), '\\s+')) AS token
      FROM {table}
    ), toks2 AS (
      SELECT {id_col}, token FROM toks WHERE token <> ''
    ), doclens AS (
      SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS dl FROM toks2 GROUP BY {id_col}
    ), avgdl_t AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST((SELECT n_docs FROM stats) AS DOUBLE) AS avgdl
      FROM doclens
    ), matched AS (
      SELECT t.token, t.{id_col}
      FROM toks2 t WHERE t.token IN (SELECT DISTINCT token FROM queries)
    ), tf_rel AS (
      SELECT token, {id_col}, CAST(COUNT(*) AS BIGINT) AS tf
      FROM matched GROUP BY token, {id_col}
    ), df_rel AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS dfreq,
             ROUND(ln((CAST((SELECT n_docs FROM stats) AS DOUBLE) - CAST(COUNT(*) AS BIGINT)
                       + CAST(0.5 AS DOUBLE))
                      / (CAST(COUNT(*) AS BIGINT) + CAST(0.5 AS DOUBLE))
                      + CAST(1.0 AS DOUBLE)), 6) AS idf
      FROM tf_rel GROUP BY token
    ), scored AS (
      SELECT q.query_id, t.{id_col},
             CAST(SUM(CAST(ROUND(d.idf * ((t.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                    / (t.tf + CAST({float(k1)!r} AS DOUBLE)
                       * (CAST({1.0 - b!r} AS DOUBLE)
                          + CAST({float(b)!r} AS DOUBLE) * l.dl / a.avgdl))), 6)
                  AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS score_dec
      FROM tf_rel t
      JOIN df_rel d USING (token)
      JOIN doclens l USING ({id_col})
      CROSS JOIN avgdl_t a
      JOIN queries q USING (token)
      GROUP BY q.query_id, t.{id_col}
    )
    SELECT query_id, {id_col},
           CAST(score_dec AS DOUBLE) AS score, CAST(rank AS INT) AS rank
    FROM (
      SELECT query_id, {id_col}, score_dec,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_dec DESC, {id_col} ASC) AS rank
      FROM scored
    ) WHERE rank <= {topk}
"""


def rrf_fuse(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str = "rank",
    topk: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings (Cormack et
    al. 2009 — the standard hybrid-retrieval combiner):
    score(q, d) = Σ_r 1/(rrf_k + rank_r(q, d)) over the rankers that
    returned d, candidates = the union. Rank-based, so the two
    rankers' score scales never need calibration — exactly why it is
    the default way to merge a lexical (BM25) and a dense (cosine)
    ranking.

    Engine-portable by construction: ranks are exact integers, the
    two reciprocal terms are one fixed-order sum of two doubles from
    identical literals, rounded at the edge; ties cut by doc id. The
    fuse input relations are per-query top-N (tiny); this operator
    never touches the corpus."""
    from pyspark.sql import Window

    fa = ranking_a.select(
        F.col(query_col).cast("long").alias("query_id"),
        F.col(doc_col).cast("long").alias("doc_id"),
        F.col(rank_col).alias("_ra"),
    )
    fb = ranking_b.select(
        F.col(query_col).cast("long").alias("query_id"),
        F.col(doc_col).cast("long").alias("doc_id"),
        F.col(rank_col).alias("_rb"),
    )
    j = fa.join(fb, ["query_id", "doc_id"], "full")
    score = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("_ra")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("_rb")), F.lit(0.0)),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )
