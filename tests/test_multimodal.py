"""Multimodal plumbing: binary columns, mapInPandas batch shapes, stubbed
decode kernels (deterministic fakes — real codecs not in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from p5_rdf_rdb2rdf_spark.ops.multimodal import (
    decode_images,
    fetch_media,
    media_features,
    sample_frames,
)
from p5_rdf_rdb2rdf_spark.pipeline.corpus import synth_corpus
from p5_rdf_rdb2rdf_spark.pipeline.spans import explode_spans


def _media(spark):
    spans = explode_spans(synth_corpus(spark, 60, partitions=3))
    return fetch_media(spans)


def test_fetch_media_binary_and_deterministic(spark):
    m1 = _media(spark)
    assert dict(m1.dtypes)["payload"] == "binary"
    rows = {r.media_ref: (bytes(r.payload), r.n_bytes) for r in m1.collect()}
    assert rows  # media spans exist
    for ref, (payload, n) in rows.items():
        assert len(payload) == n and n >= 256
    # deterministic: regenerate -> identical payloads
    rows2 = {r.media_ref: bytes(r.payload) for r in _media(spark).collect()}
    assert {k: v[0] for k, v in rows.items()} == rows2


def test_decode_images_schema_and_determinism(spark):
    media = _media(spark)
    meta = decode_images(media)
    assert [f.name for f in meta.schema.fields] == [
        "media_ref",
        "width",
        "height",
        "channels",
        "format",
    ]
    rows = meta.collect()
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images > 0
    for r in rows:
        assert 64 <= r.width and 64 <= r.height and 1 <= r.channels <= 4
        assert r.format in ("png", "jpeg", "webp")
    rows2 = decode_images(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_media_features_normalized(spark):
    media = _media(spark)
    feats = media_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == media.count()
    import numpy as np

    for r in rows[:10]:
        v = np.array(r.feature)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_sample_frames_shape(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n_bytes=128, max_frames=4)
    rows = frames.collect()
    assert rows
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
    for ref, idxs in by_ref.items():
        assert idxs == sorted(idxs) and len(idxs) <= 4
