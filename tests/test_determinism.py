"""Repeated-execution determinism: the oracle gate hashes values, so ANY
nondeterminism (partition-order-dependent floats, unstable window ties,
RNG leaking into results) breaks the driver even when a single run
looks right. Execute twice, require byte-identical row sets.

Queries chosen for nondeterminism risk: window ties, float aggregation,
hash-based candidates, iterative convergence, Python UDF paths.
"""

from __future__ import annotations

import pytest

from etl_fuel_priceguide_ec2_spark import registry

RISKY = [
    "asof_latest_per_key",       # window ties
    "dedup_last_wins",           # last-wins ordering
    "dedup_minhash_lsh",         # hash candidates + distinct
    "dedup_clusters",            # iterative convergence
    "similarity_topk",           # float ranking
    "pricing_summary",           # decimal/double aggregation
    "window_running_sum",        # running float sums
    "multimodal_decode_features",  # mapInPandas
    "pack_chunks",               # global window order
    "semantic_kmeans_clusters",  # float argmin + iterative centroid update
    "weighted_sample_chars",     # float key ranking at the top-n boundary
    "salted_event_value_agg",    # two-phase merge across salt buckets
    # round 5: the sketch tier's risk surfaces — the HLL final divide
    # + ln branch, the quantile cut at a float threshold, the rand(42)
    # no-op barrier in the IVF/simhash plans (must never leak into
    # results), and the two-phase heavy-hitter sample boundary
    "hll_distinct_event_ids",    # exact-integer sum -> one double divide
    "dd_quantile_order_totals",  # ceil(q*n) cut + bin midpoint floats
    "similarity_topk_ivf2_sq8",  # expression barrier + int8 tie ranking
    "dedup_simhash",             # expression barrier + signature folds
    "heavy_hitter_users",        # hash sample boundary + CMS min
    "pack_chunks_by_lang",       # per-group windows + offset composition
    # round 6: the new risk surfaces — min-k windows + broadcast set
    # algebra, decimal score ranking at the top-k cut, merged-register
    # quantile cut, and the pair-count window tiebreak
    "kmv_intersection_user_sets",  # two-level min-k + semi/anti joins
    "bm25_topk_docs",              # decimal sum ranking at the cut
    "dd_quantile_weekly_rollup",   # per-group register merge + cut
    "bpe_merge_candidates",        # count-desc window tiebreak
    "hybrid_rrf_topk_docs",        # double rrf-score ties at the cut
    "zorder_layout_lineitem",      # interleave arithmetic + bucket agg
    "pagerank_supplier_customer",  # iterative decimal sums + rank cut
    "minhash_incremental_pairs",   # bucket-probe candidates + jaccard
    "triangle_counts_part_graph",  # wedge/closing joins + lcc division
    "part_affinity_lift",          # double lift ties at the top-k cut
    "bpe_learned_merges",          # iterative argmax + greedy rebuild
    # round 10: the embedding second-moment tier — fan_out repartition
    # under order-free decimal sums (partitioning must never show),
    # driver-side power iteration + deflation collected into literals,
    # and the z-prefix bucket probe's rank cut
    "embedding_covariance",        # repartitioned decimal outer-product sums
    "pca_top2_subspace_scores",    # two collects + deflation + projection
    "similarity_topk_zorder",      # bucket probe + cosine ties at the cut
    # round 13: the new risk surfaces — the PQ rung's 17 driver-side
    # fits + decimal ADC cut + raw-double rerank ties, the audio
    # fingerprint's mapInPandas decode + banded candidates, and the
    # commutative XOR digest (partitioning must never show in it)
    "similarity_topk_ivf_pq",      # cached fits + ADC cut + rerank ties
    "audio_fingerprint_near_pairs",  # Arrow decode + banded candidates
    "training_export_checksum_manifest",  # map-combined XOR digest
    # round 14: the residual rung's staged string fast path (the
    # barrier-projected residual must never leak partitioning into the
    # per-cell ADC tables), the recall report's left-join counts at
    # the exact cut, and the drift report's per-snapshot decimal sums
    "similarity_topk_ivf_pq_residual",  # staged _rv + per-cell ADC + rerank
    "ann_recall_ivf_pq",                # exact cut ties + hit counts
    "embedding_snapshot_drift",         # two-scan decimal sums + rounded diff
    # round 16: the codec tier — the full JPEG entropy pipeline
    # (Huffman/stuffing/DC prediction must be bit-stable across Arrow
    # batch boundaries), the PNG DEFLATE+unfilter path, and the AVI
    # container walk + sampled-frame fan-out (frame order must never
    # depend on partitioning)
    "image_ahash_keeplist_jpeg",   # entropy round trip + banded pairs + CC
    "image_ahash_keeplist_png",    # DEFLATE round trip + banded pairs + CC
    "video_frame_ahash_sample",    # container walk + per-frame band math
]


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", RISKY)
def test_repeated_execution_identical(spark, sf_dir, name):
    b = registry.queries()[name]
    first = _rowset(b(spark, sf_dir))
    second = _rowset(b(spark, sf_dir))
    assert first == second, f"{name} is nondeterministic across executions"
