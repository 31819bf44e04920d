"""The corpus-curation CAPSTONE: one relation that composes every dedup
signal and classifier gate this engine mines into a per-document
keep / drop / excise decision with explicit precedence.

The reference's whole job is one such decision loop for fuel prices —
fetch, compare against what's stored, keep only the new/changed rows
(index.js:63-79 dedup-compare, index.js:242-294 conditional upsert).
This operator is that decision loop for a training corpus: the signals
are mined by the engine's existing operators, and THIS relation is the
single artifact a 100 TB data build actually consumes.

Precedence (first match wins; each stage sees only the SURVIVORS of
the previous ones, exactly like a production pipeline):

  1. exact_dup       sha-256 content group, min-id canonical survives
  2. near_dup        word n-gram Jaccard >= t over stage-1 survivors,
                     connected components, min-id canonical survives
  3. contained       directed containment C(A,B) >= t among stage-2
                     survivors drops A (the contained copy); mutual
                     containment (both directions >= t) keeps the
                     smaller id
  4. span_coverage   fraction of tokens covered by cross-document
                     exact spans among stage-3 survivors >= t -> drop
  5. low_quality     linear quality-classifier score < threshold
  6. blocked_domain  confident domain-router assignment to a blocked
                     class (margin > 0)
  7. excise          surviving doc with ANY covered span -> rewrite
                     (scrub_duplicated_spans is the executor)
  8. keep            clean

Signal-mining semantics: pair relations (Jaccard, containment, spans)
are mined ONCE over the FULL corpus — the ingest-time-state contract
shared with the incremental gram/LSH stores — and each stage then
RESTRICTS the mined pairs to its survivor set. For the exact-recall
miners used here (prefix-filtered SSJoin / containment, capped gram
join) restriction equals re-mining for the pair predicates; only the
gram-frequency cap is corpus-wide by design (boilerplate frequency is
a property of the corpus at ingest, not of a survivor subset).

100 TB shape: every signal keeps its audited plan (hashed-shingle
prefix joins, frequency-capped gram join, HashMin CC on 8-byte ids,
broadcast classifier weights); the composition itself adds only
id-keyed left joins and set subtractions — document payloads are never
rejoined after tokenization. Nothing here is new physics; the operator
exists so the DECISION is one oracled relation instead of seven
ad-hoc notebook joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup, textops


def corpus_curation_decision(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    quality_weights: DataFrame,
    domain_weights: DataFrame,
    *,
    n: int = 3,
    jaccard_threshold: float = 0.6,
    containment_threshold: float = 0.9,
    k: int = 8,
    min_span_tokens: int = 15,
    max_gram_freq: int | None = 1024,
    span_drop_threshold: float = 0.5,
    quality_threshold: float = 0.01,
    blocked_domain: str | None = "retail",
    n_buckets: int = 4096,
) -> DataFrame:
    """One row per corpus document:
    (id, decision, reason, dup_frac, quality_score, domain).

    ``decision`` in ('drop', 'excise', 'keep'); ``reason`` names the
    first precedence rule that fired ('exact_dup', 'near_dup',
    'contained', 'span_coverage', 'low_quality', 'blocked_domain',
    'partial_span_dup', 'clean'). ``dup_frac`` is NULL for documents
    dropped before the span stage ran for them (stages 1-3) — the
    signal was never defined for non-survivors, and 0.0 would be a
    lie. ``quality_score`` / ``domain`` are scored for EVERY document
    (classifier inference is one broadcast join — cheap enough to keep
    the full audit trail)."""
    sigs = corpus_curation_signals(
        corpus, id_col, text_col, quality_weights, domain_weights,
        n=n, jaccard_threshold=jaccard_threshold,
        containment_threshold=containment_threshold, k=k,
        min_span_tokens=min_span_tokens, max_gram_freq=max_gram_freq,
        quality_threshold=quality_threshold, n_buckets=n_buckets,
    )
    return curation_decision_from_signals(
        sigs["content_hashes"], sigs["jaccard_pairs"],
        sigs["containment_pairs"], sigs["spans"], sigs["n_tokens"],
        sigs["quality"], sigs["domain"], id_col,
        span_drop_threshold=span_drop_threshold,
        quality_threshold=quality_threshold,
        blocked_domain=blocked_domain,
    )


def corpus_curation_signals(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    quality_weights: DataFrame,
    domain_weights: DataFrame,
    *,
    n: int = 3,
    jaccard_threshold: float = 0.6,
    containment_threshold: float = 0.9,
    k: int = 8,
    min_span_tokens: int = 15,
    max_gram_freq: int | None = 1024,
    quality_threshold: float = 0.01,
    n_buckets: int = 4096,
    materialize: bool | str = True,
) -> dict[str, DataFrame]:
    """The capstone's SIGNAL-MINING stage, factored off the decision:
    one shared pass over the corpus producing the seven id-keyed state
    relations ``curation_decision_from_signals`` consumes
    (content_hashes, jaccard_pairs, containment_pairs, spans,
    n_tokens, quality, domain). These are exactly the relations an
    ingest pipeline persists once and re-reads per decision refresh —
    the factoring exists so a caller holding persisted signal state
    (a store, a parquet directory, a session cache) pays only the
    id-scale decision layer per refresh, mirroring production. The
    batch capstone mines-then-decides through this function; both it
    and the incremental form delegate the decision to
    ``curation_decision_from_signals``, so precedence semantics cannot
    drift between mining modes.

    ``materialize=False`` skips every localCheckpoint — for plan audits
    that need to SEE the mining pipeline (a checkpointed relation plans
    as an opaque scan). ``materialize="intermediates"`` checkpoints
    only the SHARED intermediates (corpus projection, shingle
    relation, featurization) and leaves the seven output relations
    lazy — for callers that checkpoint the outputs themselves (the
    registry's state store), avoiding a double materialization of
    every pair/span relation (code-review). Production callers that
    consume the outputs directly keep the default."""
    if materialize not in (True, False, "intermediates"):
        # loud: a typo'd mode would silently skip every checkpoint and
        # re-shingle the corpus once per consumer (the 100 TB rescan
        # pathology the checkpoints exist to prevent)
        raise ValueError(
            f"materialize must be True, False, or 'intermediates', "
            f"got {materialize!r}"
        )
    mat_inter = materialize in (True, "intermediates")
    mat_out = materialize is True
    _mi = (
        (lambda df: df.localCheckpoint(eager=True))
        if mat_inter
        else (lambda df: df)
    )
    _mo = (
        (lambda df: df.localCheckpoint(eager=True))
        if mat_out
        else (lambda df: df)
    )
    docs = _mi(
        corpus.select(F.col(id_col), F.col(text_col))
    )  # five signal pipelines re-read the corpus; derive it once
    # ONE tokenize+shingle scan feeds both set-similarity miners (at
    # 100 TB each avoided re-shingling is a full corpus scan); this is
    # the same persistable state relation the LSH/gram stores use
    sets = _mi(dedup._shingle_array(docs, id_col, text_col, n))

    # -- signal mining (each relation is the persistable state form)
    hashes = docs.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha")
    )
    # Materialize the three mined pair/span relations ONCE: the decision
    # layer's tree references each several times (cp2 feeds mutual AND
    # one-way AND their reversal; spans union both endpoints; the
    # survivor chain s1->s2->s3 recurs under every later stage), and
    # unlike the shared shingle scan these are multi-shuffle join
    # pipelines, not fused map work, and their OUTPUTS are id-scale
    # (pairs/spans) — exactly the relations an ingest pipeline persists
    # as state anyway. Exchange reuse already deduplicates the shuffles
    # the plan branches share, so the win is the residual recomputation:
    # measured 13.1 -> 11.6 s for the full capstone at sf0.1 (11.3 with
    # the decision layer's survivor-chain materialization below).
    jp = _mo(dedup.ngram_jaccard_pairs(
        docs, id_col, text_col, n=n,
        threshold=jaccard_threshold, prefix_filter=True, shingle_sets=sets,
    ))
    cp = _mo(dedup.containment_pairs(
        docs, id_col, text_col, n=n,
        threshold=containment_threshold, prefix_filter=True,
        shingle_sets=sets,
    ).select("id_a", "id_b"))
    spans = _mo(dedup.exact_substring_spans(
        docs, id_col, text_col,
        k=k, min_span_tokens=min_span_tokens, max_gram_freq=max_gram_freq,
    ))
    ntok = docs.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).cast("long").alias("n_tokens"),
    )
    feats = _mi(textops.classifier_features(
        docs, id_col, text_col, n_buckets
    ))  # ONE featurization pass, both models
    q = textops.quality_classifier_scores(
        docs, id_col, text_col, quality_weights,
        n_buckets=n_buckets, threshold=quality_threshold, features=feats,
    ).select(F.col(id_col), F.col("score").alias("quality_score"))
    dom = textops.domain_classifier_labels(
        docs, id_col, text_col, domain_weights, n_buckets=n_buckets,
        features=feats,
    ).select(
        F.col(id_col),
        F.col("best_class").alias("domain"),
        F.col("margin").alias("margin"),
    )
    return {
        "content_hashes": hashes,
        "jaccard_pairs": jp,
        "containment_pairs": cp,
        "spans": spans,
        "n_tokens": ntok,
        "quality": q,
        "domain": dom,
    }


def curation_decision_from_signals(
    content_hashes: DataFrame,
    jaccard_pairs: DataFrame,
    containment_pairs: DataFrame,
    spans: DataFrame,
    n_tokens: DataFrame,
    quality: DataFrame,
    domain: DataFrame,
    id_col: str = "doc_id",
    *,
    span_drop_threshold: float = 0.5,
    quality_threshold: float = 0.01,
    blocked_domain: str | None = "retail",
) -> DataFrame:
    """The DECISION layer of the capstone, factored off the mining:
    every input is a doc_id-keyed SIGNAL relation (content hashes,
    verified Jaccard pairs, directed containment pairs, duplicated
    spans, token counts, classifier outputs) — exactly the relations
    an ingest pipeline persists as state. Batch mining
    (``corpus_curation_decision``) and incremental state-probing
    mining (``corpus_curation_decision_incremental`` in the registry)
    both delegate here, so the precedence semantics cannot drift
    between the two forms.

    At 100 TB this layer is corpus-INDEPENDENT: every join is keyed on
    doc ids, the CC fixpoint runs over the (tiny) pair relation, and
    nothing here re-reads text — re-deciding the whole corpus after a
    new slice lands costs id-scale work, which is why late-arriving
    bridge documents (a new doc merging two old near-dup components)
    are handled exactly rather than approximately."""
    docs_ids = content_hashes.select(id_col)

    # The survivor chain s1 -> s2 -> s3 and the two loser sets recur
    # under every later stage AND the final assembly join tree; they
    # are tiny id-scale relations (ids only, bounded by the corpus key
    # count), so each stage materializes once (localCheckpoint) instead
    # of re-deriving the whole upstream cascade per reference — the
    # same id-scale-state argument the docstring makes for 100 TB.
    # Measured at sf0.1: decision layer 4.5 -> 3.0 s on
    # pre-materialized signals; exchange reuse alone did not cover the
    # window/anti-join tails.

    # -- stage 1: exact content dedup (one window over 32-byte hashes)
    wh = Window.partitionBy("sha")
    ex = content_hashes.select(
        F.col(id_col), F.min(id_col).over(wh).alias("_exact_canon")
    ).localCheckpoint(eager=True)
    s1 = ex.filter(F.col("_exact_canon") == F.col(id_col)).select(id_col)

    # -- stage 2: near-dup components among exact survivors
    jp2 = jaccard_pairs.select("id_a", "id_b").join(
        s1.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi"
    ).join(s1.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi")
    comp = dedup.connected_components(jp2, "id_a", "id_b")
    near_losers = comp.filter(F.col("component_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    ).localCheckpoint(eager=True)
    s2 = s1.join(near_losers, id_col, "left_anti")

    # -- stage 3: directed containment among near-dup survivors;
    # contained copy drops, mutual containment keeps the smaller id
    cp2 = containment_pairs.select("id_a", "id_b").join(
        s2.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi"
    ).join(s2.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi")
    rev = cp2.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
    )
    mutual = cp2.join(rev, ["id_a", "id_b"], "left_semi")
    one_way = cp2.join(rev, ["id_a", "id_b"], "left_anti")
    cont_losers = (
        one_way.select("id_a")
        .unionAll(mutual.filter(F.col("id_b") < F.col("id_a")).select("id_a"))
        .distinct()
        .withColumnRenamed("id_a", id_col)
        .localCheckpoint(eager=True)
    )
    s3 = s2.join(cont_losers, id_col, "left_anti").localCheckpoint(
        eager=True
    )

    # -- stage 4: exact-substring coverage among containment survivors
    # (interval union per doc — same window as duplicated_span_coverage)
    sp = spans.join(
        s3.withColumnRenamed(id_col, "doc_a"), "doc_a", "left_semi"
    ).join(s3.withColumnRenamed(id_col, "doc_b"), "doc_b", "left_semi")
    iv = sp.select(
        F.col("doc_a").alias("_id"),
        F.col("a_start").alias("_s"),
        (F.col("a_start") + F.col("span_tokens") - 1).alias("_e"),
    ).unionAll(
        sp.select(
            F.col("doc_b").alias("_id"),
            F.col("b_start").alias("_s"),
            (F.col("b_start") + F.col("span_tokens") - 1).alias("_e"),
        )
    )
    wiv = (
        Window.partitionBy("_id")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.col("_e")
        - F.greatest(F.coalesce(F.max("_e").over(wiv), F.lit(0)), F.col("_s") - 1),
        F.lit(0),
    )
    cov = (
        iv.withColumn("_c", contrib)
        .groupBy("_id")
        .agg(F.sum("_c").alias("_covered"))
    )
    dup = (
        s3.join(n_tokens, id_col)
        .join(cov, s3[id_col] == cov["_id"], "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(
                    F.round(
                        F.col("_covered").cast("double")
                        / F.col("n_tokens").cast("double"),
                        9,
                    ),
                    F.lit(0.0),
                ),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
    )

    # -- assemble: precedence CASE over id-keyed signal joins
    q = quality.select(F.col(id_col), "quality_score")
    dom = domain.select(
        F.col(id_col), "domain", F.col("margin").alias("_margin")
    )
    base = (
        docs_ids
        .join(ex, id_col)
        .join(near_losers.withColumn("_near_drop", F.lit(True)), id_col, "left")
        .join(cont_losers.withColumn("_cont_drop", F.lit(True)), id_col, "left")
        .join(dup, id_col, "left")
        .join(q, id_col)
        .join(dom, id_col)
    )
    is_exact = F.col("_exact_canon") != F.col(id_col)
    is_near = F.col("_near_drop").isNotNull()
    is_cont = F.col("_cont_drop").isNotNull()
    is_cov = F.col("dup_frac") >= F.lit(span_drop_threshold)
    is_lowq = F.col("quality_score") < F.lit(quality_threshold)
    is_dom = (
        (F.col("domain") == F.lit(blocked_domain)) & (F.col("_margin") > 0.0)
        if blocked_domain is not None
        else F.lit(False)
    )
    is_part = F.col("dup_frac") > F.lit(0.0)
    decision = (
        F.when(is_exact | is_near | is_cont | is_cov | is_lowq | is_dom, "drop")
        .when(is_part, "excise")
        .otherwise("keep")
    )
    reason = (
        F.when(is_exact, "exact_dup")
        .when(is_near, "near_dup")
        .when(is_cont, "contained")
        .when(is_cov, "span_coverage")
        .when(is_lowq, "low_quality")
        .when(is_dom, "blocked_domain")
        .when(is_part, "partial_span_dup")
        .otherwise("clean")
    )
    return base.select(
        F.col(id_col),
        decision.alias("decision"),
        reason.alias("reason"),
        "dup_frac",
        "quality_score",
        "domain",
    )


def curation_decision_oracle_sql(
    corpus_sql: str,
    id_col: str,
    text_col: str,
    quality_lexicon: list[tuple[str, float]],
    domain_lexicon: list[tuple[str, str, float]],
    *,
    n: int = 3,
    jaccard_threshold: float = 0.6,
    containment_threshold: float = 0.9,
    k: int = 8,
    min_span_tokens: int = 15,
    max_gram_freq: int | None = 1024,
    span_drop_threshold: float = 0.5,
    quality_threshold: float = 0.01,
    blocked_domain: str | None = "retail",
    n_buckets: int = 4096,
) -> str:
    """DuckDB replay of ``corpus_curation_decision``: the exact
    all-pairs forms of each signal (string shingles, full span SQL, CC
    as a recursive-CTE fixpoint) staged through the same survivor
    restriction and the same precedence CASE. Heavy CTEs are
    MATERIALIZED (the HITS-oracle lesson: a diamond over inlined CTEs
    re-evaluates the chain)."""
    assert n == 3, "oracle shingle SQL is written for n=3"
    spans_sql = dedup.exact_substring_oracle_sql(
        corpus_sql, id_col, text_col,
        k=k, min_span_tokens=min_span_tokens, max_gram_freq=max_gram_freq,
    )
    q_sql = textops.quality_classifier_oracle_sql(
        "ccorpus", id_col, text_col, quality_lexicon,
        n_buckets=n_buckets, threshold=quality_threshold,
    )
    dom_sql = textops.domain_classifier_oracle_sql(
        "ccorpus", id_col, text_col, domain_lexicon, n_buckets=n_buckets
    )
    dom_gate = (
        f"dom.best_class = '{blocked_domain}' AND dom.margin > 0.0"
        if blocked_domain is not None
        else "FALSE"
    )
    return f"""
    WITH RECURSIVE ccorpus AS MATERIALIZED ({corpus_sql}),
    ex AS MATERIALIZED (
      SELECT {id_col},
             MIN({id_col}) OVER (PARTITION BY sha256({text_col})) AS exact_canon
      FROM ccorpus
    ),
    s1 AS MATERIALIZED (
      SELECT {id_col} FROM ex WHERE exact_canon = {id_col}
    ),
    cd AS MATERIALIZED (
      SELECT {id_col} AS did,
             string_split_regex(trim({text_col}), '\\s+') AS toks
      FROM ccorpus
    ),
    csh AS MATERIALIZED (
      SELECT did, UNNEST(list_distinct(list_transform(
          range(1, greatest(len(toks) - {n} + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' ')))) AS shingle
      FROM cd
    ),
    csz AS MATERIALIZED (
      SELECT did, COUNT(*) AS set_size FROM csh GROUP BY did
    ),
    cinter AS MATERIALIZED (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.did < b.did
      GROUP BY 1, 2
    ),
    jp AS MATERIALIZED (
      SELECT id_a, id_b FROM cinter
      JOIN csz x ON id_a = x.did JOIN csz y ON id_b = y.did
      WHERE n_common * 1.0 / (x.set_size + y.set_size - n_common)
              >= {jaccard_threshold!r}
        AND id_a IN (SELECT {id_col} FROM s1)
        AND id_b IN (SELECT {id_col} FROM s1)
    ),
    cedges AS (
      SELECT id_a AS src, id_b AS dst FROM jp
      UNION SELECT id_b, id_a FROM jp
    ),
    walk AS (
      SELECT src AS node, src AS reach FROM cedges
      UNION
      SELECT w.node, e.dst FROM walk w JOIN cedges e ON w.reach = e.src
    ),
    comp AS MATERIALIZED (
      SELECT node, MIN(reach) AS component_id
      FROM (SELECT node, reach FROM walk UNION SELECT src, dst FROM cedges)
      GROUP BY node
    ),
    near_losers AS MATERIALIZED (
      SELECT node AS {id_col} FROM comp WHERE component_id <> node
    ),
    s2 AS MATERIALIZED (
      SELECT {id_col} FROM s1
      WHERE {id_col} NOT IN (SELECT {id_col} FROM near_losers)
    ),
    cdir AS MATERIALIZED (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.did <> b.did
      GROUP BY 1, 2
    ),
    cp AS MATERIALIZED (
      SELECT id_a, id_b FROM cdir
      JOIN csz x ON id_a = x.did
      WHERE n_common >= CAST(CEIL({containment_threshold!r} * x.set_size) AS BIGINT)
        AND id_a IN (SELECT {id_col} FROM s2)
        AND id_b IN (SELECT {id_col} FROM s2)
    ),
    cont_losers AS MATERIALIZED (
      SELECT DISTINCT c.id_a AS {id_col}
      FROM cp c LEFT JOIN cp r ON r.id_a = c.id_b AND r.id_b = c.id_a
      WHERE r.id_a IS NULL OR c.id_b < c.id_a
    ),
    s3 AS MATERIALIZED (
      SELECT {id_col} FROM s2
      WHERE {id_col} NOT IN (SELECT {id_col} FROM cont_losers)
    ),
    allspans AS MATERIALIZED (SELECT * FROM ({spans_sql}) t),
    sp AS MATERIALIZED (
      SELECT * FROM allspans
      WHERE doc_a IN (SELECT {id_col} FROM s3)
        AND doc_b IN (SELECT {id_col} FROM s3)
    ),
    iv AS (
      SELECT doc_a AS vid, a_start AS s, a_start + span_tokens - 1 AS e FROM sp
      UNION ALL
      SELECT doc_b, b_start, b_start + span_tokens - 1 FROM sp
    ),
    contrib AS (
      SELECT vid,
             greatest(e - greatest(COALESCE(MAX(e) OVER (
               PARTITION BY vid ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), s - 1), 0)
               AS c
      FROM iv
    ),
    cov AS MATERIALIZED (
      SELECT vid, CAST(SUM(c) AS BIGINT) AS covered FROM contrib GROUP BY vid
    ),
    cntok AS MATERIALIZED (
      SELECT {id_col} AS did,
             CAST(len(list_filter(
               string_split_regex(lower(trim({text_col})), '\\s+'),
               t -> t <> '')) AS BIGINT) AS n_tokens
      FROM ccorpus
    ),
    dup AS MATERIALIZED (
      SELECT s3.{id_col},
             CASE WHEN nt.n_tokens > 0 THEN
               COALESCE(ROUND(CAST(cov.covered AS DOUBLE)
                              / CAST(nt.n_tokens AS DOUBLE), 9), 0.0)
             ELSE 0.0 END AS dup_frac
      FROM s3
      JOIN cntok nt ON nt.did = s3.{id_col}
      LEFT JOIN cov ON cov.vid = s3.{id_col}
    ),
    q AS MATERIALIZED (SELECT * FROM ({q_sql}) t),
    dom AS MATERIALIZED (SELECT * FROM ({dom_sql}) t)
    SELECT c.{id_col},
           CASE WHEN ex.exact_canon <> c.{id_col} THEN 'drop'
                WHEN nl.{id_col} IS NOT NULL THEN 'drop'
                WHEN cl.{id_col} IS NOT NULL THEN 'drop'
                WHEN dup.dup_frac >= {span_drop_threshold!r} THEN 'drop'
                WHEN q.score < {quality_threshold!r} THEN 'drop'
                WHEN {dom_gate} THEN 'drop'
                WHEN dup.dup_frac > 0.0 THEN 'excise'
                ELSE 'keep' END AS decision,
           CASE WHEN ex.exact_canon <> c.{id_col} THEN 'exact_dup'
                WHEN nl.{id_col} IS NOT NULL THEN 'near_dup'
                WHEN cl.{id_col} IS NOT NULL THEN 'contained'
                WHEN dup.dup_frac >= {span_drop_threshold!r} THEN 'span_coverage'
                WHEN q.score < {quality_threshold!r} THEN 'low_quality'
                WHEN {dom_gate} THEN 'blocked_domain'
                WHEN dup.dup_frac > 0.0 THEN 'partial_span_dup'
                ELSE 'clean' END AS reason,
           dup.dup_frac,
           q.score AS quality_score,
           dom.best_class AS domain
    FROM ccorpus c
    JOIN ex ON ex.{id_col} = c.{id_col}
    LEFT JOIN near_losers nl ON nl.{id_col} = c.{id_col}
    LEFT JOIN cont_losers cl ON cl.{id_col} = c.{id_col}
    LEFT JOIN dup ON dup.{id_col} = c.{id_col}
    JOIN q ON q.{id_col} = c.{id_col}
    JOIN dom ON dom.{id_col} = c.{id_col}
"""


def corpus_curation_decision_incremental(
    hist: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    quality_weights: DataFrame,
    domain_weights: DataFrame,
    *,
    n: int = 3,
    jaccard_threshold: float = 0.6,
    containment_threshold: float = 0.9,
    k: int = 8,
    min_span_tokens: int = 15,
    max_gram_freq: int | None = 1024,
    span_drop_threshold: float = 0.5,
    quality_threshold: float = 0.01,
    blocked_domain: str | None = "retail",
    n_buckets: int = 4096,
    restrict_to_new: bool = True,
) -> DataFrame:
    """The daily-ingest capstone: given yesterday's corpus (``hist``,
    whose signal state a production run would read off parquet) and a
    NEW slice, produce the decision rows for the new slice while

    - never re-mining history x history pairs (the incremental miners:
      ``ngram_jaccard_pairs_incremental``,
      ``containment_pairs_incremental``,
      ``exact_substring_spans_incremental``),
    - never re-tokenizing history text (all probes run over persisted
      shingle/gram/hash state relations),
    - re-running only the id-scale DECISION layer over persisted + new
      signals (``curation_decision_from_signals``), which re-elects
      canonicals exactly when a late-arriving doc bridges two old
      components.

    Output == the from-scratch decision over hist ∪ new restricted to
    new ids (the registry oracle asserts exactly this; the full
    relation equals the batch capstone, pinned by test). One
    documented divergence class: the exact-substring frequency cap is
    evaluated per mining run (history-only spans were capped against
    history frequencies), so a gram crossing the cap only after new
    arrivals keeps its already-mined history spans — the same
    at-ingest cap semantics the incremental gram store documents."""
    # state relations — per-slice, exactly what ingest persists
    sets_hist = dedup._shingle_array(hist, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    sets_new = dedup._shingle_array(new, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    grams_hist = dedup.positional_gram_state(hist, id_col, text_col, k)
    grams_new = dedup.positional_gram_state(new, id_col, text_col, k)

    def _slice_signals(docs: DataFrame, sets: DataFrame):
        hashes = docs.select(
            F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha")
        )
        ntok = docs.select(
            F.col(id_col),
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            ).cast("long").alias("n_tokens"),
        )
        feats = textops.classifier_features(docs, id_col, text_col, n_buckets)
        q = textops.quality_classifier_scores(
            docs, id_col, text_col, quality_weights,
            n_buckets=n_buckets, threshold=quality_threshold, features=feats,
        ).select(F.col(id_col), F.col("score").alias("quality_score"))
        dom = textops.domain_classifier_labels(
            docs, id_col, text_col, domain_weights, n_buckets=n_buckets,
            features=feats,
        ).select(
            F.col(id_col),
            F.col("best_class").alias("domain"),
            F.col("margin").alias("margin"),
        )
        return hashes, ntok, q, dom

    h_hashes, h_ntok, h_q, h_dom = _slice_signals(hist, sets_hist)
    n_hashes, n_ntok, n_q, n_dom = _slice_signals(new, sets_new)

    # history-only pair/span relations == the persisted prior-run state
    jp_hist = dedup.ngram_jaccard_pairs(
        hist, id_col, text_col, n=n,
        threshold=jaccard_threshold, prefix_filter=True,
        shingle_sets=sets_hist,
    ).select("id_a", "id_b")
    cp_hist = dedup.containment_pairs(
        hist, id_col, text_col, n=n,
        threshold=containment_threshold, prefix_filter=True,
        shingle_sets=sets_hist,
    ).select("id_a", "id_b")
    spans_hist = dedup.exact_substring_spans(
        hist, id_col, text_col,
        k=k, min_span_tokens=min_span_tokens, max_gram_freq=max_gram_freq,
    )

    # incremental mining: new-vs-all ONLY
    jp_inc = dedup.ngram_jaccard_pairs_incremental(
        sets_hist, sets_new, id_col, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    cp_inc = dedup.containment_pairs_incremental(
        sets_hist, sets_new, id_col, threshold=containment_threshold
    ).select("id_a", "id_b")
    spans_inc = dedup.exact_substring_spans_incremental(
        grams_hist, grams_new, k, min_span_tokens, max_gram_freq
    )

    decisions = curation_decision_from_signals(
        h_hashes.unionByName(n_hashes),
        jp_hist.unionByName(jp_inc),
        cp_hist.unionByName(cp_inc),
        spans_hist.unionByName(spans_inc.select(*spans_hist.columns)),
        h_ntok.unionByName(n_ntok),
        h_q.unionByName(n_q),
        h_dom.unionByName(n_dom),
        id_col,
        span_drop_threshold=span_drop_threshold,
        quality_threshold=quality_threshold,
        blocked_domain=blocked_domain,
    )
    if not restrict_to_new:
        # the full re-decided relation (history rows included) — the
        # equality-with-batch test surface; production appends only the
        # new rows and upserts any history rows whose decision changed
        return decisions
    return decisions.join(new.select(id_col), id_col, "left_semi")
