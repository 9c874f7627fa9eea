"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract / resize / frame-sample kernels run as Arrow-batched
``mapInPandas`` over that binary column. The image/audio codec libraries are
NOT available in this environment (SURVEY.md §7.6), so the codec call itself
is stubbed: ``decoder="fake"`` produces a deterministic bytes-derived
pseudo-decode (so the distributed plumbing — schema, batching, partitioning —
is fully real and tested), while ``decoder="pil"``/``"ffmpeg"`` raise
``NotImplementedError`` until the library is present.

The span→media join: interleaved documents reference media by
``spans.media_ref``; ``resolve_media`` explodes the refs and joins the media
table (broadcast when small, shuffle-join on media_ref otherwise), preserving
per-document span order via the carried ``offset``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType())),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media fixture."""
    rng = np.random.default_rng(seed)
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        payload = rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        mt = types[i % 3]
        rows.append(
            (
                "m://%012x" % i,
                mt,
                bytearray(payload),
                int(rng.integers(16, 256)) if mt != "audio" else None,
                int(rng.integers(16, 256)) if mt != "audio" else None,
                int(rng.integers(100, 60000)) if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic pseudo-decode: SHA-256 expand of the payload bytes into
    out_dim floats in [0,1). Stands in for a real codec so the Spark-side
    batch shape is exercised end-to-end."""
    h = hashlib.sha256(payload).digest()
    reps = (out_dim * 4) // len(h) + 1
    buf = (h * reps)[: out_dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return (arr / 2**32).astype(np.float32)


def image_features(
    media: DataFrame,
    out_dim: int = 32,
    resize_to: tuple[int, int] = (64, 64),
    decoder: str = "fake",
) -> DataFrame:
    """Decode + resize + feature-extract images via mapInPandas (Arrow
    batches of binary payloads in, fixed-width float vectors out)."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires an image codec library not present "
            "in this environment; only the deterministic 'fake' decoder runs here"
        )
    w, h = resize_to

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(bytes(p), out_dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "feat": feats,
                    "out_width": w,
                    "out_height": h,
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select("media_ref", "payload")
    return imgs.mapInPandas(_batch, IMAGE_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_feat", T.ArrayType(T.FloatType())),
    ]
)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, out_dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Frame-sample videos: one row per sampled frame (fan-out inside
    mapInPandas; frame count derives from duration_ms)."""
    if decoder != "fake":
        raise NotImplementedError("real video decode not available here")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, feats = [], [], []
            for ref, payload, dur in zip(
                pdf["media_ref"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(1, int(dur or 0) // every_ms)
                for fi in range(n_frames):
                    refs.append(ref)
                    idxs.append(fi)
                    feats.append(_fake_decode(bytes(payload) + fi.to_bytes(4, "little"), out_dim))
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "frame_feat": feats})

    vids = media.filter(F.col("media_type") == "video").select(
        "media_ref", "payload", "duration_ms"
    )
    return vids.mapInPandas(_batch, FRAME_SCHEMA)


def resolve_media(docs: DataFrame, media: DataFrame, broadcast: bool = True) -> DataFrame:
    """Join interleaved documents' media spans to the media table.

    Output: (doc_id, offset, span_kind, media_ref, media_type, width, height,
    duration_ms) — one row per media span, span order recoverable via offset.
    """
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("_pos", "_s")
    ).select(
        "doc_id",
        F.col("_s.kind").alias("span_kind"),
        F.col("_s.media_ref").alias("media_ref"),
        F.col("_s.offset").alias("offset"),
    ).filter(F.col("media_ref") != "")
    m = media.drop("payload")
    m = F.broadcast(m) if broadcast else m
    return spans.join(m, "media_ref", "left")
