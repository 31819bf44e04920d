"""Multimodal near-dup curation, end to end: one polymorphic band
relation, three perceptual hash families, one keep-list composition.

The X5 dedup symmetry as an executable build:

    documents
      → image payloads  (real PPM codec)  → aHash bands ┐
                                          → pHash bands ┼→ banded pair
      → audio payloads  (real WAV codec)  → fingerprint ┘   join → CC →
      → video payloads  (real AVI codec)  → per-sampled-     keep-list
        frame bands → composite-id banded pairs → ALL-frames
        conjunction → clip pairs → the same CC + keep rule
      → a media item survives iff it is the canonical representative
        under EVERY family (different modalities flag different dup
        groups; the drop sets union)
      → audit: per-family component counts + the residual-pair proof
        that each family's keep-list is idempotent (re-mining pairs
        among its survivors finds ZERO — two survivors within the
        Hamming bound would have shared a component)

Run: ``python examples/multimodal_dedup_pipeline.py [sf_dir]``

At 100 TB the payloads decode ONCE per family into 4-longs-per-item
band relations (the persistable ingest state — the band-state miner
consumes slices of it incrementally); everything downstream of the
decode is id-scale: pair relations, CC components, keep flags. The
pair join and CC machinery are the SAME functions for all three
families — that is the polymorphism the four-band contract buys.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import multimodal  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_session(
        "multimodal-dedup-example", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()

    image_media = multimodal.to_image_media(docs, "doc_id", size=16, classes=100)
    audio_media = multimodal.to_audio_media_classed(docs, "doc_id", classes=100)

    # decode ONCE per family into the persistable band state
    families = {
        "image_ahash": multimodal.image_ahash(image_media),
        "image_phash": multimodal.image_phash(image_media),
        "audio_fingerprint": multimodal.audio_fingerprint(audio_media),
    }

    out: dict = {"n_docs": n_docs}
    kept_sets = []
    for name, hashes in families.items():
        hashes = hashes.localCheckpoint(eager=True)  # decode once
        # the ONE shared keep-list composition (operators/multimodal)
        kl = multimodal.band_keeplist(docs, hashes).localCheckpoint(eager=True)
        n_comp = kl.select("component_id").distinct().count()
        kept_ids = kl.filter(F.col("kept")).select("doc_id")
        n_kept = kept_ids.count()
        # conservation: every doc got exactly one decision
        assert kl.count() == n_docs
        # idempotence: re-mining pairs among the survivors finds ZERO
        # (two survivors within Hamming 3 would have shared a component)
        residual = multimodal.image_ahash_pairs(
            hashes.join(kept_ids, "doc_id"), max_hamming=3
        ).count()
        assert residual == 0, f"{name}: keep-list not idempotent ({residual})"
        # each component elected exactly one canonical representative
        assert n_kept == n_comp
        out[name] = {"components": n_comp, "kept": n_kept}
        kept_sets.append(kept_ids)
        print(f"{name:18s} components={n_comp:5d} kept={n_kept:5d} residual_pairs=0")

    # --- the VIDEO family (r16): clip-level dedup over sampled frame
    # hashes — the fourth modality through the SAME machinery. A clip
    # pairs with another iff EVERY sampled frame pair (same offset) is
    # within the Hamming bound: frame hashes ride the identical banded
    # pair join via a composite (clip, frame) id, then the conjunction
    # is one count-distinct aggregate, then the same CC + keep rule.
    video_media = multimodal.to_video_media(docs, "doc_id", n_frames=4)
    vh = multimodal.video_frame_ahash(video_media, every_nth=2)
    vh = vh.localCheckpoint(eager=True)  # decode each clip once
    n_sampled = 2  # frames 0 and 2 of 4
    composite = vh.select(
        (F.col("doc_id") * 16 + F.col("frame_idx")).alias("doc_id"),
        "b0", "b1", "b2", "b3",
    )
    def clip_conjunction_pairs(frame_hashes):
        """Clip-level pair rule — ONE definition shared by the mining
        pass and the idempotence residual check below (they previously
        duplicated it; a drift between the two would make the example
        assert a different predicate than it mined, code-review r16):
        decode the composite (clip*16+frame) id, keep aligned-offset
        frame near-pairs across distinct clips, and demand ALL
        n_sampled offsets near (count-distinct conjunction)."""
        fpairs = multimodal.image_ahash_pairs(frame_hashes, max_hamming=3)
        return (
            fpairs.select(
                (F.col("id_a") / 16).cast("long").alias("ca"),
                (F.col("id_b") / 16).cast("long").alias("cb"),
                (F.col("id_a") % 16).alias("oa"),
                (F.col("id_b") % 16).alias("ob"),
            )
            .filter((F.col("oa") == F.col("ob")) & (F.col("ca") != F.col("cb")))
            .groupBy("ca", "cb")
            .agg(F.count_distinct("oa").alias("n_off"))
            .filter(F.col("n_off") == n_sampled)  # ALL sampled frames near
            .select("ca", "cb")
        )

    clip_pairs = (
        clip_conjunction_pairs(composite)
        .select(
            F.least("ca", "cb").alias("id_a"),
            F.greatest("ca", "cb").alias("id_b"),
        )
        .distinct()
    )
    from etl_fuel_priceguide_ec2_spark.operators import dedup

    vcomp = dedup.connected_components(clip_pairs, "id_a", "id_b")
    vkl = (
        docs.join(vcomp, "doc_id", "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("doc_id")))
        .withColumn("kept", F.col("component_id") == F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    v_kept_ids = vkl.filter(F.col("kept")).select("doc_id")
    out["video_clips"] = {
        "components": vkl.select("component_id").distinct().count(),
        "kept": v_kept_ids.count(),
    }
    assert vkl.count() == n_docs
    assert out["video_clips"]["kept"] == out["video_clips"]["components"]
    # idempotence at CLIP level: re-mining clip pairs among survivors
    # finds zero (two surviving clips whose every sampled frame pairs
    # would have shared a component)
    surv_frames = composite.join(
        v_kept_ids.select((F.col("doc_id")).alias("clip")),
        (F.col("doc_id") / 16).cast("long") == F.col("clip"),
    ).select("doc_id", "b0", "b1", "b2", "b3")
    resid_clip = clip_conjunction_pairs(surv_frames).count()
    assert resid_clip == 0, f"video clip keep-list not idempotent ({resid_clip})"
    kept_sets.append(v_kept_ids)
    print(
        f"{'video_clips':18s} components={out['video_clips']['components']:5d} "
        f"kept={out['video_clips']['kept']:5d} residual_clip_pairs=0"
    )

    # a media item survives iff canonical under EVERY family
    final = kept_sets[0]
    for s in kept_sets[1:]:
        final = final.join(s, "doc_id")
    out["final_kept"] = final.count()
    # the intersection can only shrink each family's kept set
    assert out["final_kept"] <= min(v["kept"] for k, v in out.items() if isinstance(v, dict))
    print(f"final multimodal-canonical media items: {out['final_kept']} / {n_docs}")

    # deliberately no spark.stop(): get_session returns the process's
    # shared session (getOrCreate), which the pytest suite owns — the
    # other 11 examples follow the same rule
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
