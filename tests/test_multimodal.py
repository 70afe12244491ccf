"""Multimodal plumbing: binary columns, mapInPandas batch shapes, stubbed
decode kernels (deterministic fakes — real codecs not in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from p5_rdf_rdb2rdf_spark.ops.multimodal import (
    decode_audio,
    decode_images,
    fetch_media,
    media_features,
    probe_video,
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
        assert r.format in ("jpeg", "webp", "gif")  # synthetic payloads: fake path
    rows2 = decode_images(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def _png_bytes(width: int, height: int, color_type: int) -> bytes:
    """Minimal real PNG prefix: signature + IHDR chunk (13-byte body)."""
    import struct
    import zlib

    body = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    chunk = b"IHDR" + body
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _wav_bytes(rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Minimal real RIFF/WAVE header + silence frames."""
    import struct

    data = b"\x00" * (n_samples * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_images_real_png_header(spark):
    """VERDICT r1 #9 golden: the kernel interface round-trips a REAL PNG
    header — width/height/channels come out of IHDR, not the fake path."""
    rows = [
        ("m1", "image", bytearray(_png_bytes(640, 480, 2)), 0),   # RGB
        ("m2", "image", bytearray(_png_bytes(31, 7, 6)), 0),      # RGBA
        ("m3", "image", bytearray(b"\xff\xd8\xff\xe0 not a png"), 0),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in decode_images(media).collect()}
    assert (got["m1"].width, got["m1"].height, got["m1"].channels, got["m1"].format) == (640, 480, 3, "png")
    assert (got["m2"].width, got["m2"].height, got["m2"].channels, got["m2"].format) == (31, 7, 4, "png")
    assert got["m3"].format != "png"  # non-PNG falls back to the fake path


def test_decode_audio_real_wav_header(spark):
    rows = [
        ("a1", "audio", bytearray(_wav_bytes(16000, 1, 16, 1000)), 0),
        ("a2", "audio", bytearray(_wav_bytes(44100, 2, 16, 441)), 0),
        ("a3", "audio", bytearray(b"ID3 not a wav at all, just bytes"), 0),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in decode_audio(media).collect()}
    assert (got["a1"].sample_rate, got["a1"].channels, got["a1"].bits_per_sample,
            got["a1"].n_samples, got["a1"].format) == (16000, 1, 16, 1000, "wav")
    assert (got["a2"].sample_rate, got["a2"].channels, got["a2"].n_samples) == (44100, 2, 441)
    assert got["a3"].format in ("mp3", "ogg", "flac")  # deterministic fake


def test_probe_video_container(spark):
    rows = [
        ("v1", "video", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 2048), 0),
        ("v2", "video", bytearray(b"not-an-mp4" + b"y" * 100), 0),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in probe_video(media, bytes_per_frame_est=512).collect()}
    assert got["v1"].container == "mp4" and got["v1"].n_frames_est == 4
    assert got["v2"].container == "unknown" and got["v2"].n_frames_est == 1


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
