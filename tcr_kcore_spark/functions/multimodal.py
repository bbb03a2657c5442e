"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

Decode support is split by container class:

- **Uncompressed containers decode for real.**  Binary PPM (``P6``) needs
  no system codec — a header parse plus a NumPy reshape — so
  ``decode_ppm`` is a real decoder (magic + comment/whitespace grammar +
  payload-length validation) and ``decode_and_featurize`` computes real
  pixel statistics (channel means, std, gradient energy) from the decoded
  array.  The emitted width/height come from the PARSED HEADER, not the
  metadata column, so a correctness check on them proves decode happened.
- **Compressed codecs stay stubbed.**  JPEG/PNG/audio/video need system
  libraries absent from this container; those rows raise
  NotImplementedError unless ``fake=True`` routes them through the
  deterministic fake decoder.  Swapping in PIL/ffmpeg on a production
  cluster is a one-function change — the Spark-side contract (schema,
  Arrow batching, partitioning) is identical for real and fake kernels,
  as the P6 path demonstrates.

Schema convention for a multimodal table:

    (sample_id long, modality string, media binary,
     meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


# -- real uncompressed-container codec: binary PPM (P6) ----------------------


def synth_ppm_pixels(sample_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic RGB pixel array — pure arithmetic so oracles can
    re-derive it without importing any Spark-side code:
    ``pix[y, x, c] = (13*sample_id + 3*x + 7*y + 11*c) % 256``."""
    y, x, c = np.ogrid[0:height, 0:width, 0:3]
    return ((13 * sample_id + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as a binary PPM (P6) container."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """REAL decoder for the binary PPM (P6) container: parses the netpbm
    header grammar (magic, ``#`` comments, arbitrary whitespace, maxval)
    and returns the (H, W, 3) uint8 pixel array.  Raises ValueError on a
    malformed header, unsupported maxval, or truncated payload."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(data):
            raise ValueError("truncated ppm header")
        b = data[pos : pos + 1]
        if b == b"#":  # comment runs to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif b.isspace():
            pos += 1
        elif b.isdigit():
            start = pos
            while pos < len(data) and data[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(data[start:pos]))
        else:
            raise ValueError(f"bad ppm header byte {b!r} at {pos}")
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte separates header from payload
    payload = data[pos : pos + w * h * 3]
    if len(payload) != w * h * 3:
        raise ValueError(f"truncated ppm payload: {len(payload)} != {w * h * 3}")
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)


def image_features(pixels: np.ndarray) -> list[float]:
    """8-dim real feature vector from a decoded (H, W, 3) uint8 image:
    per-channel means, global std, mean |∂x| and |∂y| (gradient energy),
    min, max — all normalized to [0, 1].  float64 throughout so an
    independent NumPy re-derivation is bit-identical."""
    f = pixels.astype(np.float64) / 255.0
    gx = np.abs(np.diff(f, axis=1)).mean() if f.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(f, axis=0)).mean() if f.shape[0] > 1 else 0.0
    return [
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(f.std()),
        float(gx),
        float(gy),
        float(f.min()),
        float(f.max()),
    ]


def _real_decode(media: bytes):
    """Dispatch on container magic.  P6 → real decode (checksum is the
    sha256 of the DECODED pixel buffer — provably post-decode, a byte
    pass-through cannot produce it).  Anything else is a compressed codec
    this container cannot decode."""
    if media[:2] == b"P6":
        pixels = decode_ppm(media)
        cks = hashlib.sha256(pixels.tobytes()).hexdigest()[:16]
        return cks, image_features(pixels), pixels.shape[1], pixels.shape[0]
    raise NotImplementedError(
        f"no codec for container magic {media[:4]!r} in this container; "
        "P6 ppm decodes natively — install PIL/ffmpeg on the cluster for "
        "compressed formats, or use fake=True"
    )


def synth_ppm_media_table(spark, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic REAL-image media table: each row is a valid binary
    PPM (P6) payload of varying size (``w = 8 + i % 5``, ``h = 6 + i % 4``,
    pixels from ``synth_ppm_pixels``), every third one carrying a header
    comment — exercising the netpbm grammar, not just the happy path.
    ``seed`` shifts sample ids so two tables share no payloads."""
    rows = []
    for i in range(n):
        sid = seed * 1000 + i
        w, h = 8 + i % 5, 6 + i % 4
        data = encode_ppm(synth_ppm_pixels(sid, w, h))
        if i % 3 == 0:  # splice a comment line into the header
            head, rest = data.split(b"\n", 1)
            data = head + b"\n# synth fixture\n" + rest
        rows.append((sid, "image", bytearray(data), (w, h, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_and_featurize(
    df: DataFrame, fake: bool = True, batch_size: int = 256
) -> DataFrame:
    """Decode media bytes and emit per-sample features, Arrow-batched.

    ``fake=False`` decodes FOR REAL where the container allows it (binary
    PPM / P6 — see ``_real_decode``); rows holding compressed codecs
    (JPEG/PNG/audio/video) raise NotImplementedError from the workers.
    ``fake=True`` routes every row through the deterministic fake decoder
    (width/height pass through from metadata).  Real and fake kernels share
    the identical Spark-side contract — schema, Arrow batching,
    partitioning — so swapping in PIL/ffmpeg is a one-function change.
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
                    "width": [],
                    "height": [],
                    "feat": [],
                }
                for media, w, h in zip(chunk["media"], chunk["width"], chunk["height"]):
                    if fake:
                        cks, feat = _fake_decode(bytes(media or b""), w, h)
                    else:
                        cks, feat, w, h = _real_decode(bytes(media or b""))
                    out["checksum"].append(cks)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["feat"].append(feat)
                yield pd.DataFrame(
                    out,
                    # width/height may be all-None in a fake batch; pin the
                    # dtype so Arrow doesn't infer object
                ).astype({"width": "Int32", "height": "Int32"})

    return df.sparkSession.createDataFrame([], FEATURES_SCHEMA) if df.isEmpty() else (
        conf_df.mapInPandas(_batches, FEATURES_SCHEMA)
    )


RESIZED_SCHEMA = (
    "sample_id long, media binary, width int, height int, checksum string"
)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index maps: output row ``i``
    takes source row ``floor(i * H / out_h)`` (same for columns) — exact
    integer semantics, so an independent oracle re-derivation is
    bit-identical.  Works for up- and down-scaling."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[ys][:, xs]


def resize_box(pixels: np.ndarray, factor: int) -> np.ndarray:
    """Exact box-mean downsample by an integer factor: each output pixel is
    the TRUNCATING mean (``sum // factor²``) of its ``factor × factor``
    source block — integer-exact, no float rounding ambiguity.  Requires
    both dims divisible by ``factor`` (raises ValueError otherwise)."""
    h, w, c = pixels.shape
    if factor < 1 or h % factor or w % factor:
        raise ValueError(f"dims ({h}, {w}) not divisible by factor {factor}")
    s = (
        pixels.astype(np.int64)
        .reshape(h // factor, factor, w // factor, factor, c)
        .sum(axis=(1, 3))
    )
    return (s // (factor * factor)).astype(np.uint8)


def resize_media(
    df: DataFrame,
    out_w: int | None = None,
    out_h: int | None = None,
    factor: int | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """REAL image resize over the media column, Arrow-batched: decode the
    P6 container (``decode_ppm`` — parsed header, not metadata), resize the
    pixel array in NumPy (nearest-neighbor to ``(out_w, out_h)``, or exact
    box-mean downsample by ``factor``), re-encode as P6 and emit
    ``(sample_id, media, width, height, checksum)`` where checksum is the
    sha256 of the RESIZED pixel buffer — only computable post-decode +
    post-resize, so a hash match proves both ran.  Compressed codecs raise
    NotImplementedError from the workers (same boundary as
    ``decode_and_featurize(fake=False)``).  The Spark-side contract
    (schema, mapInPandas batch slicing, partition preservation) is the
    production shape; swapping the kernel for PIL/ffmpeg keeps it."""
    if (factor is None) == (out_w is None or out_h is None):
        raise ValueError("pass either (out_w, out_h) or factor, not both")

    conf_df = df.select("sample_id", "media")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                out = {
                    "sample_id": chunk["sample_id"],
                    "media": [],
                    "width": [],
                    "height": [],
                    "checksum": [],
                }
                for media in chunk["media"]:
                    pixels = decode_ppm(bytes(media))
                    if factor is not None:
                        resized = resize_box(pixels, factor)
                    else:
                        resized = resize_nearest(pixels, out_w, out_h)
                    out["media"].append(encode_ppm(resized))
                    out["width"].append(resized.shape[1])
                    out["height"].append(resized.shape[0])
                    out["checksum"].append(
                        hashlib.sha256(resized.tobytes()).hexdigest()[:16]
                    )
                yield pd.DataFrame(out).astype({"width": "Int32", "height": "Int32"})

    return conf_df.mapInPandas(_batches, RESIZED_SCHEMA)


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
