"""TF-IDF, vocabulary, n-gram LM counts, deterministic sampling."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import register
from etl_fuel_priceguide_ec2_spark.registry.stores import corpus_store
from etl_fuel_priceguide_ec2_spark.operators import (
    dedup,
    retrieval,
    textops,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# TF-IDF / vocabulary / n-gram LM counts / deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df, tfidf, rank FROM (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1), 6) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1) DESC,
                        tf.token ASC) AS rank
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ) WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textops.tfidf_top_terms(docs, "doc_id", "text", k=3)


@register(
    "vocabulary_top20",
    r"""
    SELECT token, n, rank FROM (
      SELECT token, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rank
      FROM (
        SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS token FROM documents
      ) WHERE token <> ''
      GROUP BY token
    ) WHERE rank <= 20
    """,
)
def q_vocabulary_top20(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textops.vocabulary(docs, "text", k=20)


@register(
    "bigram_top_per_lang",
    r"""
    WITH d AS (
      SELECT lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), grams AS (
      SELECT lang, UNNEST(list_transform(
        range(1, greatest(len(toks) - 1, 1) + 1),
        i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS bigram
      FROM d
    )
    SELECT lang, bigram, n, rank FROM (
      SELECT lang, bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, bigram ASC) AS rank
      FROM grams WHERE contains(bigram, ' ')
      GROUP BY lang, bigram
    ) WHERE rank <= 5
    """,
)
def q_bigram_top_per_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return textops.bigram_top_per_lang(docs, "lang", "text", k=5)


_CONTAM_GRAMS = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, list_distinct(list_filter(list_transform(
          range(1, greatest(len(toks) - 5, 0) + 2),
          i -> array_to_string(list_slice(toks, i, i + 4), ' ')),
          g -> g <> '')) AS gs
      FROM tok
    )
"""


@register(
    "contamination_check",
    _CONTAM_GRAMS
    + r"""
    , dg AS (SELECT doc_id, UNNEST(gs) AS g FROM grams),
    bg AS (SELECT doc_id AS bench_id, CAST(len(gs) AS BIGINT) AS bench_ngrams,
                  UNNEST(gs) AS g
           FROM grams WHERE doc_id < 10)
    SELECT d.doc_id AS doc_id, bench_id, COUNT(*) AS n_overlap, bench_ngrams,
           ROUND(COUNT(*) * 1.0 / bench_ngrams, 6) AS contamination
    FROM dg d JOIN bg USING (g)
    GROUP BY d.doc_id, bench_id, bench_ngrams
    """,
)
def q_contamination_check(spark, sf_dir):
    """Benchmark contamination: docs with doc_id < 10 play the eval
    set; every (doc, bench) pair sharing a distinct word 5-gram is
    reported with its contaminated fraction. Self-pairs included (a doc
    is 100% contaminated against itself) — the oracle sees the same."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("bench_text")
    )
    out = textops.contamination_check(
        docs, bench, "doc_id", "text", "bench_id", "bench_text", n=5
    )
    return out.withColumn("bench_ngrams", F.col("bench_ngrams").cast("long"))


@register(
    "repetition_signals",
    r"""
    WITH base AS (
      SELECT doc_id, lower(trim(text)) AS lt FROM documents
    ), tok AS (
      SELECT doc_id, string_split_regex(lt, '\s+') AS rawtoks,
             list_filter(string_split_regex(lt, '\s+'), t -> t <> '') AS toks
      FROM base
    ), grams AS (
      SELECT doc_id,
             list_filter(list_transform(
                 range(1, greatest(len(rawtoks) - 2, 0) + 2),
                 i -> array_to_string(list_slice(rawtoks, i, i + 1), ' ')),
                 g -> g <> '') AS g2,
             list_filter(list_transform(
                 range(1, greatest(len(rawtoks) - 3, 0) + 2),
                 i -> array_to_string(list_slice(rawtoks, i, i + 2), ' ')),
                 g -> g <> '') AS g3
      FROM tok
    ), top AS (
      SELECT doc_id, MAX(c) AS topc, SUM(c) AS tot FROM (
        SELECT doc_id, t, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(toks) AS t FROM tok)
        GROUP BY doc_id, t
      ) GROUP BY doc_id
    )
    SELECT g.doc_id AS doc_id,
           CASE WHEN len(g2) > 0
                THEN ROUND(1 - len(list_distinct(g2)) * 1.0 / len(g2), 6) END
             AS dup_bigram_frac,
           CASE WHEN len(g3) > 0
                THEN ROUND(1 - len(list_distinct(g3)) * 1.0 / len(g3), 6) END
             AS dup_trigram_frac,
           ROUND(topc * 1.0 / tot, 6) AS top_token_frac
    FROM grams g LEFT JOIN top USING (doc_id)
    """,
)
def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (dup n-gram fractions,
    top-token share) — the cheap repetition gate every pretraining
    corpus runs; entirely per-row expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.repetition_signals(docs, "doc_id", "text")


@register(
    "unigram_quality",
    r"""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), tot AS (
      SELECT SUM(cnt) AS n_total, COUNT(*) AS n_vocab FROM vocab
    )
    SELECT doc_id, ROUND(AVG(ln((cnt + 1.0) / (n_total + n_vocab))), 6) AS avg_logprob,
           COUNT(*) AS n_tokens
    FROM tok JOIN vocab USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_unigram_quality(spark, sf_dir):
    """Corpus-unigram-LM mean log-prob per doc (perplexity filtering's
    cheap cousin): flags gibberish/OOV-heavy text using only the corpus
    itself as the model."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.unigram_logprob_score(docs, "doc_id", "text")


@register(
    "deterministic_sample",
    """
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 20 = 3
    """,
)
def q_deterministic_sample(spark, sf_dir):
    """Deterministic mod-sampling (reproducible corpus subsetting —
    at scale, use pmod(xxhash64(id), k) for unbiased hash sampling;
    the mod form keeps the oracle engine-portable)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 20 == 3).select("doc_id", "lang", "n_chars")




@register(
    "mad_outlier_docs",
    """
    WITH med AS (
      SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY lang
    ), mad AS (
      SELECT d.lang, quantile_cont(ABS(d.n_chars - m.med), 0.5) AS mad
      FROM documents d JOIN med m USING (lang) GROUP BY d.lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           ROUND((d.n_chars - m.med) / NULLIF(a.mad, 0), 4) AS robust_z
    FROM documents d JOIN med m USING (lang) JOIN mad a USING (lang)
    WHERE ABS(d.n_chars - m.med) > 2 * a.mad AND a.mad > 0
    """,
)
def q_mad_outlier_docs(spark, sf_dir):
    """Robust per-group outlier gate (median/MAD, the length-outlier
    filter a curation pipeline runs before training): docs whose length
    deviates from their language's median by > 2 MAD (calibrated
    non-vacuous on every fixture SF: 21-182 rows). Median and MAD
    are EXACT percentiles (mean/stddev would let the outliers drag
    their own threshold); two grouped aggregates + two broadcast joins
    back — the per-lang stats relation is tiny at any corpus size."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    med = docs.groupBy("lang").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    mad = (
        docs.join(F.broadcast(med), "lang")
        .groupBy("lang")
        .agg(F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad"))
    )
    return (
        docs.join(F.broadcast(med), "lang")
        .join(F.broadcast(mad), "lang")
        .filter((F.abs(F.col("n_chars") - F.col("med")) > 2 * F.col("mad")) & (F.col("mad") > 0))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                (F.col("n_chars") - F.col("med")) / F.nullif(F.col("mad"), F.lit(0)), 4
            ).alias("robust_z"),
        )
    )


@register(
    "udtf_ngrams_explode",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS ngram,
           CAST(i - 1 AS INT) AS pos
    FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS s(i)
    """,
)
def q_udtf_ngrams_explode(spark, sf_dir):
    """Python UDTF, driver-visible (the third §2.8 extension point gets
    an oracle row alongside the pandas UDF and the grouped UDAF):
    word bigrams with positions via a LATERAL table-function join.
    Python UDTFs run row-at-a-time — fine for genuinely-custom
    generators; the JVM-side transform/slice pattern (operators/dedup)
    is the hot-path equivalent, which is exactly what the oracle
    replays."""
    from etl_fuel_priceguide_ec2_spark.functions import registry_udf

    registry_udf.register_all(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter("doc_id < 100").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, g.ngram, g.pos
        FROM __docs_udtf d, LATERAL explode_ngrams(d.text, 2) g
        """
    )


# --- round-6 addition (post-freeze -> leads the round-7 window) ------

_BM25_QUERIES = [
    (1, "spark"),
    (1, "query"),
    (2, "hash"),
    (2, "join"),
    (2, "merge"),
    (3, "vector"),
    (3, "stream"),
]


@register(
    "bm25_topk_docs",
    retrieval.bm25_oracle_sql("documents", "doc_id", "text", _BM25_QUERIES, topk=5),
)
def q_bm25_topk_docs(spark, sf_dir):
    """Query-time lexical ranked retrieval (VERDICT r05 item 5): BM25
    top-5 docs for three multi-term queries over the inverted-postings
    relation. The postings side is NEVER broadcast — the 7-row query
    term set is, and it prunes the exploded token stream before the tf
    aggregate; per-doc scores sum 6-dp-rounded term contributions as
    DECIMAL so ranking is addition-order-free and the DuckDB replay is
    exact (plan audit: test_bm25_plan_no_cartesian_postings_stream)."""
    from etl_fuel_priceguide_ec2_spark.operators import retrieval as _r

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, "query_id int, token string")
    return _r.bm25_topk(docs, queries, "doc_id", "text", topk=5)


@register(
    "bpe_merge_candidates",
    r"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS token FROM documents
    ), toks2 AS (
      SELECT token FROM toks WHERE length(token) >= 2
    ), idx AS (
      SELECT token, UNNEST(range(1, length(token))) AS i FROM toks2
    ), pairs AS (
      SELECT substr(token, CAST(i AS INT), 2) AS pair FROM idx
    ), counts AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences, CAST(rank AS INT) AS rank
    FROM (
      SELECT pair, n_occurrences,
             ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rank
      FROM counts
    ) WHERE rank <= 20
    """,
)
def q_bpe_merge_candidates(spark, sf_dir):
    """Tokenizer-training support: the BPE merge-candidate counting
    pass — adjacent character-pair frequencies over the corpus token
    stream (with multiplicity), top-20 merge candidates. The pair key
    space is bounded by |alphabet|^2, so the count shuffle is a few
    thousand map-side-combined rows regardless of corpus size; UTF-8
    character semantics match across engines (zh pairs count
    identically)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_merge_candidates(docs, "text", k=20)


def _rrf_oracle() -> str:
    lex = retrieval.bm25_oracle_sql(
        "documents", "doc_id", "text", _BM25_QUERIES, topk=20
    )
    return f"""
    WITH lex AS ({lex}),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), qv AS (SELECT * FROM e WHERE vec_id IN (1, 2, 3)),
    dense AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT qv.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                                  ORDER BY list_dot_product(e.v, qv.v) / (e.nrm * qv.nrm) DESC,
                                           e.vec_id ASC) AS rank
        FROM e CROSS JOIN qv
        WHERE qv.vec_id <> e.vec_id
      ) WHERE rank <= 20
    ), fused AS (
      SELECT COALESCE(CAST(l.query_id AS BIGINT), d.query_id) AS query_id,
             COALESCE(CAST(l.doc_id AS BIGINT), d.neighbor_id) AS doc_id,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.rank), CAST(0 AS DOUBLE))
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + d.rank), CAST(0 AS DOUBLE)), 9)
               AS rrf_score
      FROM lex l FULL JOIN dense d
        ON CAST(l.query_id AS BIGINT) = d.query_id
       AND CAST(l.doc_id AS BIGINT) = d.neighbor_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rank AS INT) AS rank FROM (
      SELECT query_id, doc_id, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= 10
"""


@register("hybrid_rrf_topk_docs", _rrf_oracle())
def q_hybrid_rrf_topk_docs(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion of the lexical BM25
    top-20 and the dense cosine top-20 for the same three queries
    (query_id q's dense representation is embedding vec_id q —
    documents and embeddings are row-aligned fixtures). Rank-based
    fusion needs no score calibration between the two stacks; the
    union of candidates is kept (a doc ranked by only one side scores
    with one reciprocal term, the standard RRF convention). All fuse
    inputs are per-query top-20 relations — corpus-scale work happens
    inside the two rankers, each already plan-audited."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    from etl_fuel_priceguide_ec2_spark.operators import similarity

    queries = spark.createDataFrame(_BM25_QUERIES, "query_id int, token string")
    lex = retrieval.bm25_topk(docs, queries, "doc_id", "text", topk=20)
    dense = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id").isin(1, 2, 3)), "vec_id", "embedding", k=20
    )
    return retrieval.rrf_fuse(
        lex, dense.withColumnsRenamed({"neighbor_id": "doc_id"}),
        "query_id", "doc_id", topk=10,
    )


@register(
    "bpe_learned_merges",
    textops.bpe_learn_oracle_sql("documents", "text", iters=3),
)
def q_bpe_learned_merges(spark, sf_dir):
    """FULL BPE tokenizer training, 3 merges: the sequential
    count -> argmax -> re-tokenize loop bpe_merge_candidates is one
    pass of, with real greedy-overlap merge semantics (aa+aa in aaaa
    merges positions 1,3). State is the word-frequency table — the
    Heaps'-law collapse that makes tokenizer training a |vocab|-sized
    problem at 100 TB, not a corpus-sized one. Every learned merge is
    bit-identical to the DuckDB unrolled-CTE replay (integer counts,
    (count DESC, pair ASC) tiebreak); corpus_symbols_after pins the
    re-tokenization itself, not just the argmax."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_learn_merges(docs, "text", iters=3)


@register(
    "bpe_encoded_vocab",
    textops.bpe_encode_oracle_sql("documents", "text", iters=3),
)
def q_bpe_encoded_vocab(spark, sf_dir):
    """APPLY the learned BPE tokenizer (the other half of the
    tokenizer story): after 3 merges, every distinct corpus word with
    its final segmentation and token count — the vocab-sized encode
    relation a broadcast join stamps onto the corpus for exact
    tokens-per-doc accounting. Same state loop as bpe_learned_merges
    (one implementation, two projections); the encoding string is
    bit-identical to the DuckDB unrolled replay's final state."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_encode_words(docs, "text", iters=3)


_BPE_TOKENS_PER_DOC_ORACLE = f"""{textops._bpe_oracle_with("documents", "text", 3)}
    , wtok AS (
      SELECT word, CAST(MAX(pos) AS BIGINT) AS n FROM s3 GROUP BY word
    ), dw AS (
      SELECT doc_id, lower(w) AS word FROM (
        SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
      ) WHERE regexp_matches(w, '^[A-Za-z]{{2,}}$')
    ), per AS (
      SELECT dw.doc_id, CAST(SUM(wtok.n) AS BIGINT) AS bpe_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM dw JOIN wtok USING (word) GROUP BY dw.doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.bpe_tokens, CAST(0 AS BIGINT)) AS bpe_tokens,
           COALESCE(per.n_words, CAST(0 AS BIGINT)) AS n_words
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per USING (doc_id)
"""


@register("bpe_tokens_per_doc", _BPE_TOKENS_PER_DOC_ORACLE)
def q_bpe_tokens_per_doc(spark, sf_dir):
    """The pretraining budget accounting query: exact BPE tokens per
    document under the 3-merge learned tokenizer — the vocab-sized
    encode relation (bpe_encoded_vocab) broadcast-stamped onto the
    corpus word stream. The corpus is scanned once and never shuffled
    except the per-doc sum; the tokenizer state rides the broadcast.
    Docs with no qualifying words still get a decided 0 row."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    enc = textops.bpe_encode_words(docs, "text", iters=3).select(
        "word", "n_tokens"
    )
    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w").rlike("^[A-Za-z]{2,}$"))
        .select("doc_id", F.lower(F.col("w")).alias("word"))
    )
    per = (
        words.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("bpe_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    return (
        docs.select("doc_id")
        .distinct()
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("bpe_tokens"), F.lit(0).cast("long")).alias(
                "bpe_tokens"
            ),
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
        )
    )


@register(
    "bigram_lm_quality",
    textops.bigram_lm_oracle_sql("documents", "doc_id", "text"),
)
def q_bigram_lm_quality(spark, sf_dir):
    """Bigram-LM (conditional-probability) quality scoring — the
    perplexity-filtering stand-in one rung above unigram_quality:
    P(v|u) add-one-smoothed over the corpus's own bigram counts,
    per-doc mean ln P + bigram count. Gibberish with plausible
    unigrams but improbable transitions drops to the bottom of this
    ranking while staying invisible to the unigram score."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bigram_logprob_score(docs, "doc_id", "text")


@register(
    "tfidf_cosine_pairs",
    r"""
    WITH dd AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ), toks AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS token
      FROM dd
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
      SELECT doc_id, token,
             tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1) AS w,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1) DESC,
                        token ASC) AS rank
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ), topk AS (
      SELECT doc_id, token, w FROM w WHERE rank <= 5
    ), nrm AS (
      SELECT doc_id,
             sqrt(CAST(sum(CAST(ROUND(w * w, 12) AS DECIMAL(30,12)))
                       AS DOUBLE)) AS nn
      FROM topk GROUP BY doc_id
    ), u AS (
      SELECT t.doc_id, token, w / nn AS nw FROM topk t JOIN nrm USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(sum(CAST(ROUND(a.nw * b.nw * 1e12, 0) AS BIGINT)) / 1e12,
                 6) AS cosine
    FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING sum(CAST(ROUND(a.nw * b.nw * 1e12, 0) AS BIGINT)) / 1e12 >= 0.5
    """,
)
def q_tfidf_cosine_pairs(spark, sf_dir):
    """Weighted lexical near-dup: cosine over each doc's top-5 TF-IDF
    word-BIGRAM terms — the sparsified middle ground between
    unweighted Jaccard (dedup_ngram_jaccard) and dense embedding
    cosine (dedup_embedding_cosine). The top-k sparsification is the
    blocking: idf evicts stopwords from every doc's kept terms, so
    pairs only form through genuinely discriminative shared terms.
    Bigram terms because the fixture's WORD vocabulary is 31 strings —
    unigram idf can't evict anything there (22.2M candidates at sf0.1
    vs 2.0M with bigrams; operator docstring + SCALE.md §3)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.tfidf_topk_cosine_pairs(
        docs, "doc_id", "text", k=5, threshold=0.5, ngram=2
    )


# --- round-10 additions (post-freeze; lead round 11): model-free doc
# embeddings via the hashing trick, and cosine retrieval over them ----

_HASHED_EMB_COMPONENTS_SQL = r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ), tk AS (
      SELECT doc_id, UNNEST(toks) AS t FROM d
    ), tf AS (
      SELECT doc_id, t, COUNT(*) AS tf FROM tk GROUP BY doc_id, t
    ), dfreq AS (
      SELECT t, COUNT(*) AS df FROM tf GROUP BY t
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    comp AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 64 AS bucket,
             CAST(SUM(CAST(ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 9)
                           AS DECIMAL(30,12))) AS DOUBLE) AS c
      FROM tf JOIN dfreq USING (t) CROSS JOIN n
      GROUP BY 1, 2
    ), nrm AS (
      SELECT doc_id,
             sqrt(CAST(SUM(CAST(ROUND(c * c, 9) AS DECIMAL(30,12)))
                       AS DOUBLE)) AS nn
      FROM comp GROUP BY doc_id
    ), u AS (
      SELECT comp.doc_id, CAST(bucket AS BIGINT) AS bucket, c / nn AS nw
      FROM comp JOIN nrm USING (doc_id)
    )
"""


@register(
    "doc_hashed_embeddings",
    _HASHED_EMB_COMPONENTS_SQL
    + """
    SELECT doc_id, bucket, ROUND(nw, 6) AS nw FROM u
""",
)
def q_doc_hashed_embeddings(spark, sf_dir):
    """Model-free document embeddings via the hashing trick: every
    token's tf-idf weight lands in md5(token) % 64, collisions SUM,
    vectors L2-normalize — emitted SPARSE (doc_id, bucket, nw), the
    storage shape at 100 TB and the inverted-index side for cosine
    retrieval. Bridges raw text into the X3 similarity ladder with no
    external model; all cross-row sums 9dp-quantized DECIMAL."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return textops.hashed_tfidf_components(docs, "doc_id", "text", dim=64).select(
        "doc_id", "bucket", F.round("nw", 6).alias("nw")
    )


@register(
    "doc_embedding_topk",
    _HASHED_EMB_COMPONENTS_SQL
    + """
    , q AS (
      SELECT doc_id AS query_id, bucket, nw AS qw FROM u WHERE doc_id < 5
    ), scored AS (
      SELECT q.query_id, u.doc_id AS neighbor_id,
             CAST(SUM(CAST(ROUND(u.nw * q.qw, 12) AS DECIMAL(30,12)))
                  AS DOUBLE) AS cos
      FROM u JOIN q USING (bucket)
      WHERE u.doc_id <> q.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank,
             ROUND(cos, 6) AS cosine
      FROM scored
    ) WHERE rank <= 10
""",
)
def q_doc_embedding_topk(spark, sf_dir):
    """Cosine top-10 retrieval over the hashed doc embeddings for five
    query documents — text-to-text semantic-ish retrieval with zero
    external models. The join is sparse: L2-normalized dot products
    need only SHARED buckets, so candidates form through an
    inverted-index equi-join (never query x corpus dense math), and
    the dot product accumulates 12dp-quantized DECIMAL terms so the
    ranking is addition-order-free cross-engine — hashed text vectors
    produce near-tied cosines, where the similarity ladder's raw
    double fold would flip ranks between engines."""
    from pyspark.sql import Window, functions as F

    docs = load_table(spark, sf_dir, "documents")
    # Materialize the embedding store once PER CORPUS: both the corpus
    # index side and the filtered query side read it, and the full
    # TF-IDF pipeline (tokenize -> df counts -> norms) would otherwise
    # run twice per call — in production this relation is the persisted
    # doc-embedding store (doc_hashed_embeddings), not a live
    # recomputation per join branch or per query.
    u = corpus_store(
        spark,
        sf_dir,
        "hashed_tfidf64",
        lambda: textops.hashed_tfidf_components(docs, "doc_id", "text", dim=64),
    )
    q = (
        u.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            "bucket",
            F.col("nw").alias("qw"),
        )
    )
    scored = (
        u.join(F.broadcast(q), "bucket")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(
            F.sum(F.round(F.col("nw") * F.col("qw"), 12).cast("decimal(30,12)"))
            .cast("double")
            .alias("cos")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )
