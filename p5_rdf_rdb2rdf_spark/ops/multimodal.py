"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The image/audio decode libraries are NOT in this container, so the decode
kernels are STUBBED: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` when asked for real decoding and otherwise produce a
**deterministic fake** derived from the payload bytes. The Spark-side
plumbing — schema, partitioning, ``mapInPandas`` batch shape, Arrow transfer
of binary columns — is real and tested; swapping in PIL/librosa changes only
the marked kernel functions.
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
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def fetch_media(spans: DataFrame) -> DataFrame:
    """media_ref -> (media_ref, kind, payload, n_bytes).

    STUB fetch: payload = deterministic pseudo-bytes from sha256(media_ref)
    (a real deployment reads object storage here via a connector). The
    payload column is genuine ``binary`` so everything downstream exercises
    Arrow binary transfer.
    """
    refs = spans.where(F.col("media_ref").isNotNull()).select("media_ref", "kind").distinct()

    @F.pandas_udf(T.BinaryType())
    def synth_payload(refs_s: pd.Series) -> pd.Series:
        def gen(r: str) -> bytes:
            seed = hashlib.sha256(r.encode()).digest()
            # 256..4095 deterministic bytes
            n = 256 + seed[0] * 15
            reps = -(-n // len(seed))
            return (seed * reps)[:n]

        return refs_s.map(gen)

    out = refs.withColumn("payload", synth_payload(F.col("media_ref")))
    return out.withColumn("n_bytes", F.length("payload").cast("int"))


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _decode_image_kernel(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode kernel — deterministic fake metadata from the payload.

    Real implementation (requires PIL, not in this container):

        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands()), img.format
    """
    try:
        import PIL  # noqa: F401

        raise NotImplementedError("real image decode not wired yet")
    except ImportError:
        pass
    h = hashlib.sha256(payload).digest()
    return 64 + h[1] * 8, 64 + h[2] * 8, 1 + h[3] % 4, ["png", "jpeg", "webp"][h[4] % 3]


def decode_images(media: DataFrame) -> DataFrame:
    """binary payloads -> typed image metadata via mapInPandas (Arrow
    batches; one Python process per partition, vectorized within batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [_decode_image_kernel(p) for p in pdf["payload"]]
            arr = pd.DataFrame(metas, columns=["width", "height", "channels", "format"])
            arr.insert(0, "media_ref", pdf["media_ref"].to_numpy())
            yield arr

    return media.where(F.col("kind") == "image").select("media_ref", "payload").mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic per-payload feature vector: normalized byte histogram
    folded to ``dim`` buckets (the stand-in for a real encoder; numpy-
    vectorized per Arrow batch). Output feeds the similarity/dedup ops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for p in pdf["payload"]:
                b = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float64)
                n = np.linalg.norm(hist)
                feats.append((hist / (n or 1.0)).astype(np.float32).tolist())
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "feature": feats})

    return media.select("media_ref", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 512, max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling stand-in: slice the payload at fixed strides
    (real impl: pyav keyframe extraction). Shows the explode-to-frames shape:
    (media_ref, frame_idx, frame_bytes)."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor(F.length("payload") / every_n_bytes).cast("int"), F.lit(max_frames - 1)
        ),
    )
    return (
        media.where(F.col("kind").isin("video", "image"))
        .select(
            "media_ref",
            F.posexplode(
                F.transform(
                    idx,
                    lambda i: F.substring(
                        F.col("payload").cast("string"), i * every_n_bytes + 1, 16
                    ),
                )
            ).alias("frame_idx", "frame_probe"),
        )
    )
