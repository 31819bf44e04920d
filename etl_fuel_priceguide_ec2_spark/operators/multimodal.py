"""X5 — multimodal columns: image/audio/video as opaque binary columns
with typed metadata.

At 100 TB the binary column stores POINTERS (paths/offsets) or small
payloads; large blobs live in object storage and are fetched inside the
decode UDF per partition. The Spark-side plumbing here — schema, Arrow
batch shape, mapInPandas signature, partition sizing — is real and
tested. The decode interior has two tiers:

  * ``real_codec=True`` — genuine bytes -> pixels -> resize -> re-encode
    for PPM(P6) and 24-bit BMP via the dependency-free
    ``operators.imagecodec`` (numpy only). Other formats raise
    NotImplementedError until PIL/av are provisioned; they slot into the
    same (width, height, rgb-array) contract.
  * ``real_codec=False`` (default for text-backed fixtures) — a
    deterministic fake deriving dims from byte length, so oracle checks
    stay byte-exact on corpora with no real media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def to_media(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a payload as an opaque binary column + typed metadata.
    (Fixtures have no real media, so the payload is the utf-8 encoding
    of the text column — byte-exact and oracle-checkable.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic FAKE decoder (stand-in for PIL/ffmpeg, which are
    not installed here): derives (width, height, n_frames) from payload
    bytes so tests are reproducible."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


def decode_features(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode/feature-extract over the binary column with mapInPandas —
    Arrow-batched, one Python worker per partition, payloads never pass
    through the driver.

    ``real_codec=True`` decodes PPM/BMP payloads for real (header parse
    -> pixel array; one still frame). Unsupported formats raise
    NotImplementedError — provision PIL/av and extend
    ``imagecodec.decode`` for more.
    """

    def _real_decode(payload: bytes) -> tuple[int, int, int]:
        from etl_fuel_priceguide_ec2_spark.operators import imagecodec

        img = imagecodec.decode(payload)
        return (img.shape[1], img.shape[0], 1)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if real_codec else _fake_decode
        for pdf in it:
            feats = pdf["payload"].apply(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": feats.apply(lambda t: t[0]),
                    "height": feats.apply(lambda t: t[1]),
                    "n_frames": feats.apply(lambda t: t[2]),
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode a (stubbed) per-frame index list
    from the decoded frame count — shows the fan-out shape a real video
    pipeline uses (one row per sampled frame)."""
    feats = decode_features(media)
    return feats.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))).alias("frame_idx"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("resized_payload", BinaryType(), True),
        StructField("resized_bytes", LongType(), True),
    ]
)


def resize(media: DataFrame, target_w: int = 224, target_h: int = 224, real_codec: bool = False) -> DataFrame:
    """Resize over mapInPandas.

    ``real_codec=True``: decode PPM/BMP -> nearest-neighbor resample to
    (target_w, target_h) via vectorized numpy index maps -> re-encode as
    PPM. Genuine pixels in, genuine pixels out, no codec libraries
    needed. ``real_codec=False``: deterministic fake (byte slice scaled
    by the area ratio) for text-backed fixture corpora. Schema,
    batching, and partition behavior are identical on both paths."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_fuel_priceguide_ec2_spark.operators import imagecodec

        for pdf in it:
            out_rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                if real_codec:
                    img = imagecodec.decode(payload)
                    resized = imagecodec.encode_ppm(
                        imagecodec.resize_nearest(img, target_w, target_h)
                    )
                else:
                    w, h, _ = _fake_decode(payload)
                    # fake resize: keep a byte count scaled by the area ratio
                    ratio = min(1.0, (target_w * target_h) / max(w * h, 1))
                    resized = payload[: max(1, int(len(payload) * ratio))]
                out_rows.append((r["doc_id"], target_w, target_h, resized, len(resized)))
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "width", "height", "resized_payload", "resized_bytes"]
            )

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("peak_abs", LongType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def to_audio_media(
    df: DataFrame, id_col: str, n_samples: int = 4000, sample_rate: int = 8000
) -> DataFrame:
    """Synthesize a REAL 16-bit mono PCM WAV payload per row (stdlib
    ``wave`` encoder over the deterministic integer sawtooth keyed on
    the id — fixtures ship no real audio). Arrow-batched pandas UDF:
    payload bytes are produced executor-side and never visit the
    driver."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from etl_fuel_priceguide_ec2_spark.operators import audiocodec

    @pandas_udf(BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: audiocodec.encode_wav(
                audiocodec.synth_sawtooth(int(i), n_samples), sample_rate
            )
        )

    payload = _synth(F.col(id_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("audio/wav").alias("mime"),
    )


def audio_waveform_stats(media: DataFrame) -> DataFrame:
    """Decode the WAV binary column and emit waveform statistics
    (sample rate, length, integer peak, RMS) via mapInPandas — the
    audio analogue of ``decode_features``: payloads stream through
    executors in Arrow batches; only the tiny stats rows shuffle.
    RMS is computed from the EXACT int64 energy sum, so the value is
    bit-stable under any partitioning (and SQL-mirrorable)."""
    import numpy as np
    import pandas as pd

    from etl_fuel_priceguide_ec2_spark.operators import audiocodec

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = audiocodec.decode_wav(bytes(payload))
                energy = int(np.sum(samples.astype(np.int64) ** 2))
                n = len(samples)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": rate,
                        "n_samples": n,
                        "peak_abs": int(np.max(np.abs(samples.astype(np.int64)))),
                        "rms": round(float(np.sqrt(energy / n)), 6) if n else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA])

    return media.select("doc_id", "payload").mapInPandas(_stats, AUDIO_STATS_SCHEMA)


AUDIO_ZC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("zcr", DoubleType(), True),
    ]
)


def audio_zero_crossings(media: DataFrame) -> DataFrame:
    """Zero-crossing count/rate per decoded WAV payload — the classic
    cheap voicing/noisiness feature, and deliberately integer-exact: a
    crossing is a flip of the (sample < 0) flag between consecutive
    samples, so the count is bit-stable under any partitioning and a
    SQL oracle can replay it with one LAG window over the regenerated
    samples. Same Arrow/mapInPandas shape as audio_waveform_stats:
    payloads stream through executors, only 4-column stats rows move."""
    import numpy as np
    import pandas as pd

    from etl_fuel_priceguide_ec2_spark.operators import audiocodec

    def _zc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = audiocodec.decode_wav(bytes(payload))
                n = len(samples)
                neg = samples.astype(np.int64) < 0
                crossings = int(np.sum(neg[1:] != neg[:-1])) if n > 1 else 0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": n,
                        "zero_crossings": crossings,
                        "zcr": round(crossings / (n - 1), 6) if n > 1 else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_ZC_SCHEMA])

    return media.select("doc_id", "payload").mapInPandas(_zc, AUDIO_ZC_SCHEMA)
