"""X1/X2 — exact and near-dup dedup on documents (SSJoin, MinHash-LSH, SimHash, embedding-cosine)."""

from __future__ import annotations

from etl_fuel_priceguide_ec2_spark.registry.base import (
    register,
)
from etl_fuel_priceguide_ec2_spark.operators import (
    dedup,
)
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# X1/X2 — dedup family on documents
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_hash, COUNT(*) AS dup_count
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY sha256(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs.unionAll(docs), content_col="text", id_col="doc_id")


_NGRAM_ORACLE = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (x.set_size + y.set_size - n_common), 6) AS jaccard
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE n_common * 1.0 / (x.set_size + y.set_size - n_common) >= 0.5
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Naive inverted-index SSJoin, pinned (prefix_filter=False): the
    test corpus is known skew-free (max shingle df ~ 1% of docs), where
    the naive join is measured 2x faster than the PPJoin pass and 3x
    faster than paying the auto probe per run. Unknown corpora should
    use the operator default ('auto' — see dedup_ngram_jaccard_auto_skew
    for the skewed case)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
    )


@register("dedup_ngram_jaccard_prefix", _NGRAM_ORACLE)
def q_dedup_ngram_jaccard_prefix(spark, sf_dir):
    """PPJoin prefix-filtered exact SSJoin — same oracle as the naive
    inverted index, proving the skew-resistant scale path loses no
    pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True)


# Skewed-corpus variant: every doc gets the same boilerplate footer, so
# its shingles have df = n_docs (the web-corpus template pathology). The
# oracle is the same exact all-pairs Jaccard on the modified text —
# asserting the auto-selected PPJoin path loses no pairs under skew.
_NGRAM_SKEW_ORACLE = (
    _NGRAM_ORACLE.replace("FROM documents", "FROM boil")
    .replace(
        "WITH d AS",
        "WITH boil AS (SELECT doc_id, trim(text) || "
        "' legal disclaimer all rights reserved contact us' AS text "
        "FROM documents), d AS",
    )
)


# corpus skew statistic cache, keyed on corpus dir — stands in for the
# catalog: corpus_skew_stats is computed once per corpus (at "ingest")
# and every subsequent auto-path SSJoin reuses it, so the 5% probe scan
# is amortized across calls instead of paid per query (at 100 TB the
# per-call probe is a multi-TB sample scan — VERDICT r02 item 6).
_SKEW_STATS_CACHE: dict[str, dict] = {}


def _boilerplate_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.trim(F.col("text")),
            F.lit(" legal disclaimer all rights reserved contact us"),
        ),
    )


@register("dedup_ngram_jaccard_auto_skew", _NGRAM_SKEW_ORACLE)
def q_dedup_ngram_jaccard_auto_skew(spark, sf_dir):
    """prefix_filter='auto' on a hot-shingle corpus: the sampled df
    statistic detects the boilerplate skew and selects the PPJoin prefix
    path (the naive inverted index would blow up as sum(df^2) here).
    The statistic is computed once per corpus and cached (the catalog
    pattern) — the decision is free on every call after the first."""
    docs = _boilerplate_docs(spark, sf_dir)
    key = f"{sf_dir}:boilerplate"
    if key not in _SKEW_STATS_CACHE:
        _SKEW_STATS_CACHE[key] = dedup.corpus_skew_stats(docs, "doc_id", "text", n=3)
    return dedup.ngram_jaccard_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        prefix_filter="auto",
        skew_stats=_SKEW_STATS_CACHE[key],
    )


@register("dedup_minhash_lsh", _NGRAM_ORACLE)
def q_dedup_minhash_lsh(spark, sf_dir):
    """LSH candidate generation + exact verification. Oracle is the exact
    all-pairs Jaccard result: equality asserts 100% recall of the LSH
    parameters (128 hashes / 32 bands at t=0.5) on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.5)


@register(
    "dedup_simhash",
    r"""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ), th AS (
      SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
      FROM toks
    ), bitsums AS (
      SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT UNNEST(generate_series(0, 59)) AS j)
      GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
      FROM bitsums GROUP BY doc_id
    ), blocked AS (
      SELECT doc_id, simhash, simhash >> 44 AS block FROM sig
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM blocked a JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-pairs on a 60-bit md5-derived hash — the hash choice
    (top 15 hex chars of md5) is computable bit-identically in DuckDB
    (``CAST('0x'||substring(md5(t),1,15) AS BIGINT)``), so the whole
    operator — tokenize, signed bit-fold, signature, prefix block,
    Hamming filter — is oracle-verified end to end. The engine default
    (xxhash64, 64-bit) is exercised by tests/test_determinism."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=12, bits=60, hash_fn="md5_60"
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "dedup_embedding_cosine",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_pairs(emb, "vec_id", "embedding", block_col="label", threshold=0.35)



# --- composed TEXT dedup pipeline: MinHash-LSH pairs -> CC -> keep-list ---
# the text-side sibling of semantic_dedup_keeplist: every document with
# its dup-component id and the keep decision, as ONE oracled relation.
# The oracle mines the exact all-pairs Jaccard (the LSH parameters have
# proven 100% recall on this corpus — dedup_minhash_lsh), then replays
# connected components as a recursive-CTE fixpoint.
_MINHASH_KEEPLIST_ORACLE = r"""
    WITH RECURSIVE d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), spairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sz x ON id_a = x.doc_id
      JOIN sz y ON id_b = y.doc_id
      WHERE n_common * 1.0 / (x.set_size + y.set_size - n_common) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION SELECT id_b, id_a FROM spairs
    ), walk AS (
      SELECT src AS node, src AS reach FROM edges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node, MIN(reach) AS component_id
      FROM (SELECT node, reach FROM walk UNION SELECT src, dst FROM edges)
      GROUP BY node
    )
    SELECT doc.doc_id,
           COALESCE(c.component_id, doc.doc_id) AS component_id,
           COALESCE(c.component_id, doc.doc_id) = doc.doc_id AS kept
    FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
"""


@register("minhash_dedup_keeplist", _MINHASH_KEEPLIST_ORACLE)
def q_minhash_dedup_keeplist(spark, sf_dir):
    """The COMPOSED text-dedup pipeline as one relation: MinHash-LSH
    candidate pairs (verified at Jaccard >= 0.5) -> HashMin connected
    components -> canonical keep-list (kept iff the doc is its
    component's min-id representative; singletons always kept). At
    100 TB every stage is bucketed/blocked: zero-shuffle signatures,
    band-bucket candidate join, 32-byte-key CC iterations — the keep
    relation is what a curation job actually anti-joins against."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.5
    )
    comp = dedup.connected_components(pairs, "id_a", "id_b")
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("doc_id")))
        .withColumn("kept", F.col("component_id") == F.col("doc_id"))
    )


# --- round-14 addition (post-freeze -> leads round 15) --------------


_SAVINGS_ORACLE = (
    "SELECT d.lang,\n"
    "       CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
    "       CAST(SUM(CASE WHEN NOT kl.kept THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_dropped,\n"
    "       CAST(SUM(length(d.text)) AS BIGINT) AS chars_total,\n"
    "       CAST(SUM(CASE WHEN NOT kl.kept THEN length(d.text) ELSE 0 END)"
    " AS BIGINT) AS chars_dropped,\n"
    "       ROUND(SUM(CASE WHEN NOT kl.kept THEN 1 ELSE 0 END) * 1.0"
    " / COUNT(*), 6) AS pct_docs_dropped,\n"
    "       ROUND(SUM(CASE WHEN NOT kl.kept THEN length(d.text) ELSE 0 END)"
    " * 1.0 / SUM(length(d.text)), 6) AS pct_chars_dropped\n"
    f"FROM documents d JOIN ({_MINHASH_KEEPLIST_ORACLE}) kl"
    " ON kl.doc_id = d.doc_id\n"
    "GROUP BY d.lang"
)


@register("dedup_savings_report", _SAVINGS_ORACLE)
def q_dedup_savings_report(spark, sf_dir):
    """The pre-delete report: per language, how much the MinHash-CC
    keep-list would actually remove — doc counts, character volume,
    and the dropped fractions. At 100 TB this is the relation a
    curation owner reads BEFORE signing off on deleting a third of a
    corpus (and the one that catches a runaway threshold: a language
    suddenly losing 80% of its bytes is a bug, not dedup). One
    id-keyed join of the keep-list onto the doc metadata, then a
    |langs|-row aggregate — the keep-list mining dominates; the
    report is free on top of it."""
    from pyspark.sql import functions as F

    kl = q_minhash_dedup_keeplist(spark, sf_dir).select("doc_id", "kept")
    # Project length(text) BEFORE the keep-list join (r16, guide §2.2
    # shuffle-fewer-bytes): the aggregate only ever reads the length,
    # so the join no longer carries corpus text payloads — at scale
    # that join is a corpus-sized shuffle. Locally neutral (A/B
    # tools/ab_round16_savings.py: mins 4.571 vs 4.499 and 3.096 vs
    # 3.408 across two runs, identical 5-row output).
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("_len")
    )
    dropped = F.when(~F.col("kept"), 1).otherwise(0)
    dropped_chars = F.when(~F.col("kept"), F.col("_len")).otherwise(0)
    return (
        docs.join(kl, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dropped).cast("long").alias("n_dropped"),
            F.sum("_len").cast("long").alias("chars_total"),
            F.sum(dropped_chars).cast("long").alias("chars_dropped"),
        )
        .select(
            "lang",
            "n_docs",
            "n_dropped",
            "chars_total",
            "chars_dropped",
            F.round(F.col("n_dropped") / F.col("n_docs"), 6).alias(
                "pct_docs_dropped"
            ),
            F.round(F.col("chars_dropped") / F.col("chars_total"), 6).alias(
                "pct_chars_dropped"
            ),
        )
    )


# --- round-6 addition (post-freeze -> leads the round-7 window) ------

_INCR_ORACLE = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (x.set_size + y.set_size - n_common), 6) AS jaccard
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE n_common * 1.0 / (x.set_size + y.set_size - n_common) >= 0.5
      AND (id_a % 5 = 4 OR id_b % 5 = 4)
"""


@register("minhash_incremental_pairs", _INCR_ORACLE)
def q_minhash_incremental_pairs(spark, sf_dir):
    """The daily-ingest dedup shape: docs with doc_id % 5 == 4 play
    the NEW slice; pairs are mined between the new slice and
    history + new WITHOUT re-mining history x history (the new side's
    band buckets drive the candidate join). Oracle = exact all-pairs
    Jaccard restricted to pairs touching the new slice — equality
    asserts both the incremental restriction and 100% LSH recall.
    Union with prior runs' pairs reconstructs the full-corpus relation
    (pinned by test)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 5 != 4)
    new = docs.filter(F.col("doc_id") % 5 == 4)
    return dedup.minhash_lsh_pairs_incremental(
        history, new, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.5
    )


# Exact-substring dedup (round 7 — the missing X2 family, VERDICT r06
# item 4). The fixture corpus is random-bag text with no natural long
# shared spans, so the query PLANTS them deterministically: alongside
# every document d (having a successor), a contaminated twin
# (doc_id + 100000) = d's full text + the first 40 tokens of document
# d+1 — the "doc quoting another doc" shape. Expected spans: twin
# contains all of d (a full-document span), the 40 borrowed tokens of
# d+1 (a long quote), and the borrow chains across twins. Both engines
# build the identical corpus relationally.
_ESS_CORPUS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT d.doc_id + 100000 AS doc_id,
             d.text || ' ' || array_to_string(
               list_slice(string_split_regex(trim(n.text), '\\s+'), 1, 40), ' ')
               AS text
      FROM documents d JOIN documents n ON n.doc_id = d.doc_id + 1
"""


@register(
    "exact_substring_spans",
    dedup.exact_substring_oracle_sql(
        _ESS_CORPUS_SQL, "doc_id", "text",
        k=8, min_span_tokens=30, max_gram_freq=64,
    ),
)
def q_exact_substring_spans(spark, sf_dir):
    """Cross-document exact duplicated spans >= 30 tokens (k=8 grams,
    gram-frequency cap 64) over the planted-quote corpus — the
    boilerplate / verbatim-leak detector that document-level near-dup
    (MinHash/SimHash/Jaccard) cannot see when documents differ overall
    but share one long quote. See
    ``operators/dedup.py::exact_substring_spans`` for the
    diagonal-islands formulation and the 100 TB plan."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    corpus = docs.unionAll(twins)
    return dedup.exact_substring_spans(
        corpus, "doc_id", "text", k=8, min_span_tokens=30, max_gram_freq=64
    )


@register(
    "duplicated_span_coverage",
    dedup.span_coverage_oracle_sql(
        _ESS_CORPUS_SQL, "doc_id", "text",
        k=8, min_span_tokens=30, max_gram_freq=64, drop_threshold=0.5,
    ),
)
def q_duplicated_span_coverage(spark, sf_dir):
    """The keep-list form of exact-substring dedup over the planted
    corpus: per-document fraction of tokens covered by cross-document
    shared spans (interval union via running-max window) and the
    drop-at-50% decision — the "mostly duplicated text" gate."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    corpus = docs.unionAll(twins)
    return dedup.duplicated_span_coverage(
        corpus, "doc_id", "text",
        k=8, min_span_tokens=30, max_gram_freq=64, drop_threshold=0.5,
    )


_ESS_INCR_ORACLE = f"""
    WITH fs AS ({dedup.exact_substring_oracle_sql(
        _ESS_CORPUS_SQL, "doc_id", "text",
        k=8, min_span_tokens=30, max_gram_freq=64,
    )})
    SELECT doc_a, doc_b, a_start, b_start, span_tokens
    FROM fs WHERE doc_a >= 100000 OR doc_b >= 100000
"""


@register("exact_substring_incremental_spans", _ESS_INCR_ORACLE)
def q_exact_substring_incremental_spans(spark, sf_dir):
    """The daily-ingest exact-substring shape: originals are the
    persisted history state, the contaminated twins arrive as the new
    slice; spans involving >= 1 twin are mined from positional-gram
    state relations WITHOUT re-joining history x history. The oracle
    is the from-scratch spec (full corpus spans, filtered to pairs
    touching the new slice) — the state-probe plan must reproduce it
    exactly."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    hist_state = dedup.positional_gram_state(docs, "doc_id", "text", k=8)
    new_state = dedup.positional_gram_state(twins, "doc_id", "text", k=8)
    return dedup.exact_substring_spans_incremental(
        hist_state, new_state, k=8, min_span_tokens=30, max_gram_freq=64
    )


_PHRASES_SQL = r"""
      SELECT doc_id AS phrase_id,
             array_to_string(list_slice(
               string_split_regex(trim(text), '\s+'), 1, 12), ' ') AS phrase
      FROM documents WHERE doc_id < 5
"""


@register(
    "phrase_occurrences",
    dedup.phrase_occurrences_oracle_sql(
        "SELECT doc_id, text FROM documents", _PHRASES_SQL,
        "doc_id", "text", k=8,
    ),
)
def q_phrase_occurrences(spark, sf_dir):
    """Exact contamination localization: the first 12 tokens of docs
    0-4 play the eval phrases; every verbatim occurrence across the
    corpus is reported with its exact token position (each phrase hits
    its own doc at position 1; any other hit is a real leak). Probes
    the SAME positional-gram state the span miner and streaming store
    use — broadcast phrase grams, one hash join, aligned-offset full
    count."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("phrase_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12)
        ).alias("phrase"),
    )
    state = dedup.positional_gram_state(docs, "doc_id", "text", k=8)
    return dedup.phrase_occurrences(state, phrases, k=8)


_EXCISE_ORACLE = f"""
    WITH spans AS ({dedup.exact_substring_oracle_sql(
        _ESS_CORPUS_SQL, "doc_id", "text",
        k=8, min_span_tokens=30, max_gram_freq=64,
    )}),
    corpus AS ({_ESS_CORPUS_SQL}),
    tl AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM corpus
    ), toks AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             toks[CAST(r.i AS INT)] AS tok
      FROM tl, LATERAL (
        SELECT UNNEST(range(1, len(toks) + 1)) AS i
      ) r
    ), covered AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_b AS doc_id,
               UNNEST(range(b_start, b_start + span_tokens)) AS pos
        FROM spans
      )
    ), kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t LEFT JOIN covered c
        ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.pos IS NULL
    ), rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS nkept
      FROM kept GROUP BY doc_id
    )
    SELECT tl.doc_id,
           COALESCE(rebuilt.clean_text, '') AS clean_text,
           CAST(len(tl.toks) - COALESCE(rebuilt.nkept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM tl LEFT JOIN rebuilt ON rebuilt.doc_id = tl.doc_id
"""


@register("scrub_duplicated_spans", _EXCISE_ORACLE)
def q_scrub_duplicated_spans(spark, sf_dir):
    """Surgical dedup over the planted corpus: every mined shared span
    is excised from its doc_b side (later id loses, canonical doc_a
    kept intact) — the keep-the-prose alternative to dropping partly
    duplicated documents. One output row per corpus doc with the
    rebuilt text and removed-token count."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    corpus = docs.unionAll(twins)
    spans = dedup.exact_substring_spans(
        corpus, "doc_id", "text", k=8, min_span_tokens=30, max_gram_freq=64
    )
    return dedup.excise_spans(
        corpus,
        spans.select("doc_b", "b_start", "span_tokens"),
        "doc_id",
        "text",
        span_id_col="doc_b",
        start_col="b_start",
    )


@register(
    "winnow_candidate_pairs",
    dedup.winnow_candidates_oracle_sql(
        _ESS_CORPUS_SQL, "doc_id", "text",
        k=8, w=4, min_shared=2, max_fp_freq=64,
    ),
)
def q_winnow_candidate_pairs(spark, sf_dir):
    """MOSS-style winnowing over the planted corpus: the md5-hash
    positional-gram state winnowed at w=4 (index ~2/(w+1) the gram
    relation's size — the storage knob the full index lacks;
    substrings >= w+k-1 = 11 tokens are guaranteed a shared
    fingerprint), then candidate pairs with >= 2 shared fingerprints
    (hot fingerprints capped at 64 docs). The cheap first pass whose
    candidates exact_substring_spans verifies exactly."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    corpus = docs.unionAll(twins)
    state = dedup.positional_gram_state(corpus, "doc_id", "text", k=8, hash="md5")
    # Pin the fingerprint index ONCE (r16 optimization): the candidate
    # step consumes it three times (freq-cap aggregate + both self-join
    # sides), and each lazy copy re-ran the md5-gram explode + per-doc
    # window + distinct (before-plan: 24 parquet scans / 34 exchanges).
    # Unlike the ngram-jaccard prefix pin (rejected — recompute was
    # cheap fused map work), this chain carries a real window + two
    # shuffles per copy: A/B 2.665 -> 2.045 s min-of-4 at sf0.1 with
    # identical output (tools/ab_round16_winnow.py). The index is the
    # persistable MOSS state (~2/(w+1) of the gram relation) — at
    # scale it would be written to storage at ingest, which is this
    # same materialization. Routed through util.iteration_pin (VERDICT
    # r16 item 4) so a production caller holding a checkpoint dir can
    # swap the eager localCheckpoint for a reliable checkpoint at one
    # edit point; the pinned index is ~2/(w+1) of the positional-gram
    # relation — O(corpus positions / 2.5) of pin storage (SCALE.md).
    from etl_fuel_priceguide_ec2_spark.operators.util import iteration_pin

    fps = iteration_pin(None)(dedup.winnow_fingerprints(state, w=4))
    return dedup.fingerprint_candidates(fps, min_shared=2, max_fp_freq=64)


# ---------------------------------------------------------------------------
# X2d — asymmetric containment (quote-inclusion / anthology detection)
# ---------------------------------------------------------------------------

# Corpus augmented with derived "anthology" docs (two consecutive source
# docs concatenated — every 40th id) so true short-in-long containment is
# exercised: each component is fully contained (C = 1.0) in its anthology
# while the anthology's own containment in either component is ~0.5,
# which a symmetric Jaccard threshold can never separate. The derivation
# is pure SQL over the fixture tables, replayed verbatim by the oracle.
_CONTAINMENT_ORACLE = r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT 10000000 + a.doc_id AS doc_id, a.text || ' ' || b.text AS text
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 40 = 0 AND length(a.text) > 0 AND length(b.text) > 0
    ), d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(x.set_size AS BIGINT) AS size_a,
           CAST(y.set_size AS BIGINT) AS size_b,
           ROUND(n_common * 1.0 / x.set_size, 6) AS containment
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE n_common >= CAST(CEIL(0.9 * x.set_size) AS BIGINT)
"""


@register("containment_pairs", _CONTAINMENT_ORACLE)
def q_containment_pairs(spark, sf_dir):
    """X2d: directed containment C(A,B) = |A∩B|/|A| >= 0.9 over word
    3-gram shingles — the asymmetric dedup relation that catches a doc
    quoted whole inside a longer one (Jaccard ~|A|/|B| misses it at any
    symmetric threshold). Fixture corpus is skew-free so the naive
    inverted-index path is pinned; prefix_filter=True is the
    boilerplate-corpus form (equality of both paths pinned by test)."""
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_next"))
    anth = (
        docs.filter((F.col("doc_id") % 40) == 0)
        .join(nxt, "doc_id")
        .select(
            (F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", "text", "_next").alias("text"),
        )
    )
    corpus = docs.unionByName(anth)
    return dedup.containment_pairs(corpus, "doc_id", "text", n=3, threshold=0.9)


# ---------------------------------------------------------------------------
# Fuzzy record linkage (SymSpell symmetric-delete join)
# ---------------------------------------------------------------------------

# Dirty-dim fixture derived in SQL from customer names: every 5th
# customer's clean name, plus a one-character-deleted corruption of
# every 15th (deletion position keyed on custkey) — the re-linking
# story. Natural one-digit-substitution neighbors among the clean names
# are found too (Customer#...001 vs ...002 is distance 1).
_SYMSPELL_CORPUS_SQL = """
  SELECT c_name AS name FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT substring(c_name, 1, (c_custkey % length(c_name))) ||
         substring(c_name, (c_custkey % length(c_name)) + 2) AS name
  FROM customer WHERE c_custkey % 15 = 0
"""


from etl_fuel_priceguide_ec2_spark.operators import linkage as _linkage


@register(
    "symspell_edit1_pairs",
    _linkage.symspell_oracle_sql(_SYMSPELL_CORPUS_SQL, "name", min_len=4),
)
def q_symspell_edit1_pairs(spark, sf_dir):
    """Fuzzy linkage: edit-distance-1 pairs over a dirty name relation
    via SymSpell symmetric-delete blocking (hashed 1-deletion
    neighborhoods, equi-join, exact levenshtein verify — never
    all-pairs). Reference parity: the conditional-upsert dim flow
    (index.js:242-294) assumes exact keys; this is the primitive that
    re-links near-key dirt before the upsert."""
    from pyspark.sql import functions as F
    from etl_fuel_priceguide_ec2_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.filter((F.col("c_custkey") % 5) == 0).select(
        F.col("c_name").alias("name")
    )
    pos = (F.col("c_custkey") % F.length("c_name")).cast("int")
    dirty = cust.filter((F.col("c_custkey") % 15) == 0).select(
        F.concat(
            F.substring(F.col("c_name"), 1, pos),
            F.col("c_name").substr(pos + F.lit(2), F.length("c_name")),
        ).alias("name")
    )
    corpus = clean.unionByName(dirty)
    return linkage.symspell_pairs(corpus, "name", min_len=4)


# --- round-9 addition (post-freeze -> leads the round-10 window) ------
# X2d closure (VERDICT r08 item 4): containment_pairs emits directed
# pairs but nothing consumed them. This keep-list composes them with
# the CC machinery: MUTUAL containment (both directions >= t — the
# "same doc modulo a suffix" regime) forms undirected components whose
# min-id representative survives; ONE-WAY containment (the
# quote/anthology regime) drops the contained copy outright. The
# corpus adds near-identical "+1 trailing token" twins (every 60th
# doc) so both tie rules are exercised: long docs pair MUTUALLY with
# their twin (component canonical keeps the smaller id), short docs'
# containment is one-way (s/(s+2) < t), exercising the directed drop.
_CONTAINMENT_KEEPLIST_ORACLE = r"""
    WITH RECURSIVE ccorpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT 10000000 + a.doc_id AS doc_id, a.text || ' ' || b.text AS text
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 40 = 0 AND length(a.text) > 0 AND length(b.text) > 0
      UNION ALL
      SELECT 5000000 + doc_id AS doc_id, text || ' zzduptail' AS text
      FROM documents WHERE doc_id % 60 = 0 AND length(text) > 0
    ), d AS MATERIALIZED (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM ccorpus
    ), sh AS MATERIALIZED (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), cpairs AS MATERIALIZED (
      SELECT id_a, id_b FROM inter JOIN sz x ON id_a = x.doc_id
      WHERE n_common >= CAST(CEIL(0.9 * x.set_size) AS BIGINT)
    ), mutual AS MATERIALIZED (
      SELECT c.id_a, c.id_b
      FROM cpairs c JOIN cpairs r ON r.id_a = c.id_b AND r.id_b = c.id_a
    ), oneway AS MATERIALIZED (
      SELECT DISTINCT c.id_a
      FROM cpairs c LEFT JOIN cpairs r ON r.id_a = c.id_b AND r.id_b = c.id_a
      WHERE r.id_a IS NULL
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM mutual
      UNION SELECT id_b, id_a FROM mutual
    ), walk AS (
      SELECT src AS node, src AS reach FROM edges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node, MIN(reach) AS component_id
      FROM (SELECT node, reach FROM walk UNION SELECT src, dst FROM edges)
      GROUP BY node
    )
    SELECT c.doc_id,
           COALESCE(comp.component_id, c.doc_id) AS component_id,
           (COALESCE(comp.component_id, c.doc_id) = c.doc_id
            AND ow.id_a IS NULL) AS kept
    FROM ccorpus c
    LEFT JOIN comp ON comp.node = c.doc_id
    LEFT JOIN oneway ow ON ow.id_a = c.doc_id
"""


@register("containment_keeplist", _CONTAINMENT_KEEPLIST_ORACLE)
def q_containment_keeplist(spark, sf_dir):
    """The keep-list closure of the containment join (VERDICT r08 item
    4): mutual-containment pairs (both directions >= 0.9 — trailing-
    boilerplate twins) cluster via HashMin connected components with
    the min-id canonical surviving, while one-way containment (quote /
    anthology inclusion) drops the contained copy outright. One row
    per corpus doc: (doc_id, component_id, kept) — the same consumable
    shape as minhash_dedup_keeplist, so curation jobs anti-join it
    identically. The oracle replays CC as the recursive-CTE fixpoint
    over exact all-pairs containment."""
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_next")
    )
    anth = (
        docs.filter((F.col("doc_id") % 40) == 0)
        .join(nxt, "doc_id")
        .select(
            (F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", "text", "_next").alias("text"),
        )
    )
    twins = docs.filter((F.col("doc_id") % 60) == 0).select(
        (F.lit(5_000_000) + F.col("doc_id")).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("zzduptail")).alias("text"),
    )
    corpus = docs.unionByName(anth).unionByName(twins)
    cp = dedup.containment_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.9, prefix_filter=True
    ).select("id_a", "id_b")
    rev = cp.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    mutual = cp.join(rev, ["id_a", "id_b"], "left_semi")
    oneway = (
        cp.join(rev, ["id_a", "id_b"], "left_anti").select("id_a").distinct()
    )
    comp = dedup.connected_components(mutual, "id_a", "id_b")
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .join(oneway.withColumnRenamed("id_a", "doc_id").withColumn("_ow", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", F.col("doc_id")).alias("component_id"),
            (
                (F.coalesce("component_id", F.col("doc_id")) == F.col("doc_id"))
                & F.col("_ow").isNull()
            ).alias("kept"),
        )
    )


@register(
    "symspell_edit2_pairs",
    _linkage.symspell_oracle_sql(_SYMSPELL_CORPUS_SQL, "name", min_len=4, max_dist=2),
)
def q_symspell_edit2_pairs(spark, sf_dir):
    """The distance-2 SymSpell tier (VERDICT r08 item 6) over the same
    dirty-dim corpus as the edit-1 query: depth-2 deletion
    neighborhoods (~L²/2 variants per string vs L+1 — SCALE.md has the
    count table), hashed-variant equi-join, exact levenshtein <= 2
    verify. On the zero-padded fixture names this also links
    two-digit-substitution siblings invisible at d=1; production use
    is OCR noise and double typos, still never all-pairs."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.filter((F.col("c_custkey") % 5) == 0).select(
        F.col("c_name").alias("name")
    )
    pos = (F.col("c_custkey") % F.length("c_name")).cast("int")
    dirty = cust.filter((F.col("c_custkey") % 15) == 0).select(
        F.concat(
            F.substring(F.col("c_name"), 1, pos),
            F.col("c_name").substr(pos + F.lit(2), F.length("c_name")),
        ).alias("name")
    )
    corpus = clean.unionByName(dirty)
    return linkage.symspell_pairs(corpus, "name", min_len=4, max_dist=2)


_SSJOIN_INCR_ORACLE = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (x.set_size + y.set_size - n_common), 6) AS jaccard
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE n_common * 1.0 / (x.set_size + y.set_size - n_common) >= 0.5
      AND (id_a % 5 = 4 OR id_b % 5 = 4)
"""


@register("ssjoin_incremental_pairs", _SSJOIN_INCR_ORACLE)
def q_ssjoin_incremental_pairs(spark, sf_dir):
    """The EXACT-SSJoin sibling of minhash_incremental_pairs (round 9):
    docs with doc_id % 5 == 4 play the new slice; pairs touching new
    are mined from persisted shingle-set STATE via
    ``ngram_jaccard_pairs_incremental`` — prefix orderings over union
    frequencies, history x history structurally excluded, recall
    exactly 1.0. Oracle = exact all-pairs Jaccard restricted to pairs
    touching the new slice."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 5 != 4)
    new = docs.filter(F.col("doc_id") % 5 == 4)
    sets_hist = dedup._shingle_array(hist, "doc_id", "text", 3)
    sets_new = dedup._shingle_array(new, "doc_id", "text", 3)
    return dedup.ngram_jaccard_pairs_incremental(
        sets_hist, sets_new, "doc_id", threshold=0.5
    )


_CONTAINMENT_INCR_ORACLE = r"""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT 10000000 + a.doc_id AS doc_id, a.text || ' ' || b.text AS text
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 40 = 0 AND length(a.text) > 0 AND length(b.text) > 0
    ), d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - 3 + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(x.set_size AS BIGINT) AS size_a,
           CAST(y.set_size AS BIGINT) AS size_b,
           ROUND(n_common * 1.0 / x.set_size, 6) AS containment
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE n_common >= CAST(CEIL(0.9 * x.set_size) AS BIGINT)
      AND (id_a >= 10000000 OR id_b >= 10000000)
"""


@register("containment_incremental_pairs", _CONTAINMENT_INCR_ORACLE)
def q_containment_incremental_pairs(spark, sf_dir):
    """Directed containment from persisted state with the anthologies
    arriving as the NEW slice (round 9): both directions touching new
    are mined — new anthologies as containers of history docs (history
    prefixes probe only the new index) and as contained copies (new
    prefixes probe the full store) — history x history never re-forms.
    Oracle = exact all-pairs containment restricted to pairs touching
    the new slice."""
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_next")
    )
    anth = (
        docs.filter((F.col("doc_id") % 40) == 0)
        .join(nxt, "doc_id")
        .select(
            (F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", "text", "_next").alias("text"),
        )
    )
    sets_hist = dedup._shingle_array(docs, "doc_id", "text", 3)
    sets_new = dedup._shingle_array(anth, "doc_id", "text", 3)
    return dedup.containment_pairs_incremental(
        sets_hist, sets_new, "doc_id", threshold=0.9
    )


# --- round-9 addition: sorted-neighborhood blocking -------------------
# The sort-based third member of the fuzzy-linkage family (SymSpell =
# neighborhood expansion, containment/SSJoin = set blocking, SNM =
# sort blocking). Fixture: every customer record plus a dirty slice
# with the last character doubled (suffix dirt — the regime SNM is
# built for: the typo'd key sorts IMMEDIATELY adjacent to its clean
# twin, so window 4 always covers the pair); sequential Customer#
# names also make natural id-drift neighbors, so the relation mixes
# planted and organic near-keys.
_SNM_CORPUS_SQL = """
  SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name FROM customer
  UNION ALL
  SELECT CAST(10000000 + c_custkey AS BIGINT) AS rec_id,
         c_name || substring(c_name, length(c_name), 1) AS name
  FROM customer WHERE c_custkey % 9 = 0
"""


@register(
    "sorted_neighborhood_pairs",
    _linkage.sorted_neighborhood_oracle_sql(
        _SNM_CORPUS_SQL, "rec_id", "name", window=4, max_dist=2
    ),
)
def q_sorted_neighborhood_pairs(spark, sf_dir):
    """Sorted-neighborhood merge/purge blocking: one sort pass, each
    record compared to its 4 sort-successors, exact levenshtein <= 2
    verify. Reference parity: the same near-key re-linking need as
    symspell_edit1_pairs (index.js:242-294's exact-key upsert), via
    the sort-based blocking that costs O(n*w) comparisons and no
    variant expansion. The Spark side ranks with the two-pass
    range-partition trick (operators/util.py global_row_number) —
    never a single-partition global window."""
    from pyspark.sql import functions as F
    from etl_fuel_priceguide_ec2_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        F.col("c_custkey").cast("long").alias("rec_id"), F.col("c_name").alias("name")
    )
    dirty = cust.filter((F.col("c_custkey") % 9) == 0).select(
        (F.lit(10_000_000) + F.col("c_custkey")).cast("long").alias("rec_id"),
        F.concat(
            F.col("c_name"),
            F.col("c_name").substr(F.length("c_name"), F.lit(1)),
        ).alias("name"),
    )
    corpus = clean.unionByName(dirty)
    return linkage.sorted_neighborhood_pairs(
        corpus, "rec_id", "name", window=4, max_dist=2
    )


# --- round-9 addition: the SNM consumer --------------------------------
# sorted_neighborhood_pairs emits candidate pairs; this is the relation
# a dim-upsert job actually consumes. Production semantics: the CLEAN
# slice is the existing dim (sequential ids — adjacent sort neighbors
# are legitimate DISTINCT entities), the DIRTY slice is today's ingest;
# so the consumer keeps only cross-slice links before clustering —
# clean x clean sort-adjacency is blocking noise, not duplication. CC
# then forms (clean row + its dirty variants) components and the
# min-id canonical (always the clean row: clean ids < 10M) survives.
_SNM_KEEPLIST_ORACLE = r"""
    WITH RECURSIVE corpus AS MATERIALIZED (
""" + _SNM_CORPUS_SQL + r"""
    ), recs AS (
      SELECT rec_id AS id, lower(trim(name)) AS k FROM corpus
    ), ranked AS (
      SELECT id, k, ROW_NUMBER() OVER (ORDER BY k, id) AS rn FROM recs
    ), spairs AS (
      SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
      FROM ranked a
      JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 4
      WHERE levenshtein(a.k, b.k) <= 2
        AND ((a.id < 10000000) <> (b.id < 10000000))
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION SELECT id_b, id_a FROM spairs
    ), walk AS (
      SELECT src AS node, src AS reach FROM edges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node, MIN(reach) AS component_id
      FROM (SELECT node, reach FROM walk UNION SELECT src, dst FROM edges)
      GROUP BY node
    )
    SELECT c.rec_id,
           COALESCE(cm.component_id, c.rec_id) AS component_id,
           COALESCE(cm.component_id, c.rec_id) = c.rec_id AS kept
    FROM corpus c LEFT JOIN comp cm ON cm.node = c.rec_id
"""


@register("snm_dedup_keeplist", _SNM_KEEPLIST_ORACLE)
def q_snm_dedup_keeplist(spark, sf_dir):
    """The keep-list consumer of sorted_neighborhood_pairs: SNM
    candidates filtered to CROSS-SLICE links (clean dim x dirty
    ingest — clean-x-clean sort adjacency between sequential ids is
    blocking noise, not duplication), clustered with HashMin CC,
    min-id canonical kept (always the clean dim row). Same
    (id, component_id, kept) contract as minhash_dedup_keeplist /
    containment_keeplist, so curation anti-joins it identically."""
    from pyspark.sql import functions as F
    from etl_fuel_priceguide_ec2_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        F.col("c_custkey").cast("long").alias("rec_id"), F.col("c_name").alias("name")
    )
    dirty = cust.filter((F.col("c_custkey") % 9) == 0).select(
        (F.lit(10_000_000) + F.col("c_custkey")).cast("long").alias("rec_id"),
        F.concat(
            F.col("c_name"),
            F.col("c_name").substr(F.length("c_name"), F.lit(1)),
        ).alias("name"),
    )
    corpus = clean.unionByName(dirty)
    pairs = linkage.sorted_neighborhood_pairs(
        corpus, "rec_id", "name", window=4, max_dist=2
    ).filter((F.col("id_a") < 10_000_000) != (F.col("id_b") < 10_000_000))
    comp = dedup.connected_components(
        pairs.select("id_a", "id_b"), "id_a", "id_b"
    )
    return (
        corpus.select("rec_id")
        .join(comp, F.col("rec_id") == F.col("doc_id"), "left")
        .select(
            "rec_id",
            F.coalesce("component_id", F.col("rec_id")).alias("component_id"),
            (F.coalesce("component_id", F.col("rec_id")) == F.col("rec_id")).alias(
                "kept"
            ),
        )
    )


# --- round-10 addition: the multi-pass SNM form ------------------------
# Fixture adds PREFIX dirt (first character doubled) alongside the
# suffix-dirt slice: prefix typos sort far from their clean twins in
# forward key order — the exact miss class the single pass documents —
# but land adjacent in REVERSED key order, so the two-pass union
# recovers them. Clean rows keep c_custkey ids; suffix dirt +10M
# (as in _SNM_CORPUS_SQL), prefix dirt +20M.
_SNM_MP_CORPUS_SQL = _SNM_CORPUS_SQL + """
  UNION ALL
  SELECT CAST(20000000 + c_custkey AS BIGINT) AS rec_id,
         substring(c_name, 1, 1) || c_name AS name
  FROM customer WHERE c_custkey % 11 = 0
"""


@register(
    "snm_multipass_pairs",
    _linkage.sorted_neighborhood_multipass_oracle_sql(
        _SNM_MP_CORPUS_SQL, "rec_id", "name", window=4, max_dist=2
    ),
)
def q_snm_multipass_pairs(spark, sf_dir):
    """Two-pass sorted-neighborhood (production merge/purge): forward
    key order catches the suffix-dirt slice, REVERSED key order
    catches the prefix-dirt slice that forward sorting scatters; the
    union is deduplicated (levenshtein is reversal-invariant, so a
    pair found by both passes is byte-identical). Two full-data range
    exchanges total, still O(n*w) comparisons per pass."""
    from pyspark.sql import functions as F
    from etl_fuel_priceguide_ec2_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        F.col("c_custkey").cast("long").alias("rec_id"), F.col("c_name").alias("name")
    )
    suffix_dirty = cust.filter((F.col("c_custkey") % 9) == 0).select(
        (F.lit(10_000_000) + F.col("c_custkey")).cast("long").alias("rec_id"),
        F.concat(
            F.col("c_name"),
            F.col("c_name").substr(F.length("c_name"), F.lit(1)),
        ).alias("name"),
    )
    prefix_dirty = cust.filter((F.col("c_custkey") % 11) == 0).select(
        (F.lit(20_000_000) + F.col("c_custkey")).cast("long").alias("rec_id"),
        F.concat(
            F.col("c_name").substr(F.lit(1), F.lit(1)), F.col("c_name")
        ).alias("name"),
    )
    corpus = clean.unionByName(suffix_dirty).unionByName(prefix_dirty)
    return linkage.sorted_neighborhood_multipass(
        corpus, "rec_id", "name", window=4, max_dist=2
    )
