"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the decode kernels are STUBS:
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (shape + checksum derived from the bytes)
stands in.  Everything AROUND the kernel is real and tested — the schema
contract, the Arrow batch path, the batch-size control, the partitioning —
so swapping in a real codec (PIL/ffmpeg) on a production cluster is a
one-function change.

Schema convention for a multimodal table:

    (sample_id long, modality string, media binary,
     meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "sample_id long, modality string, n_bytes long, checksum string, "
    "width int, height int, feat array<double>"
)


def synth_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    (seed, sample_id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        modality = ["image", "audio", "video"][i % 3]
        meta = (64 + i % 8, 48 + i % 4, 16000, 30) if modality != "image" else (
            64 + i % 8,
            48 + i % 4,
            None,
            None,
        )
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(media: bytes, width: int | None, height: int | None):
    """Deterministic stand-in for a codec: 8-dim feature from the digest."""
    d = hashlib.sha256(media).digest()
    feat = [b / 255.0 for b in d[:8]]
    return d.hex()[:16], feat


def decode_and_featurize(
    df: DataFrame, fake: bool = True, batch_size: int = 256
) -> DataFrame:
    """Decode media bytes and emit per-sample features, Arrow-batched.

    Real deployment: replace ``_fake_decode`` with PIL/torchaudio/ffmpeg —
    the Spark-side contract (schema, batching, partitioning) is unchanged.
    ``fake=False`` raises NotImplementedError from the workers (codecs not
    available in this container).
    """
    conf_df = df.select("sample_id", "modality", "media", "meta.width", "meta.height")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # stable per-batch vectorized work; slice to bound memory
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                out = {
                    "sample_id": chunk["sample_id"],
                    "modality": chunk["modality"],
                    "n_bytes": chunk["media"].map(lambda b: len(b) if b is not None else 0),
                    "checksum": [],
                    "width": chunk["width"],
                    "height": chunk["height"],
                    "feat": [],
                }
                for media, w, h in zip(chunk["media"], chunk["width"], chunk["height"]):
                    if not fake:
                        raise NotImplementedError(
                            "real media codecs are not available in this container; "
                            "use fake=True or install PIL/ffmpeg on the cluster"
                        )
                    cks, feat = _fake_decode(bytes(media or b""), w, h)
                    out["checksum"].append(cks)
                    out["feat"].append(feat)
                yield pd.DataFrame(out)

    return df.sparkSession.createDataFrame([], FEATURES_SCHEMA) if df.isEmpty() else (
        conf_df.mapInPandas(_batches, FEATURES_SCHEMA)
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (sample_id, frame_idx) to
    decode — the shuffle-free explode that precedes a real frame decoder.
    Uses meta.n_frames only (no decode)."""
    return (
        df.where(F.col("modality") == "video")
        .select(
            "sample_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
