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
        # regression (ADVICE r2 #5): box-size bytes >= 0x80. A string cast
        # UTF-8-decodes \x00\x01\x86\xa0 into fewer characters than 4 bytes,
        # shifting 'ftyp' off offset 5 and misclassifying the payload.
        ("v3", "video", bytearray(b"\x00\x01\x86\xa0ftypisom" + b"\xff" * 64), 0),
        # and >=0x80 bytes *inside* a 4-byte size that UTF-8 would reject
        ("v4", "video", bytearray(b"\x80\x81\x82\x83ftypmp41" + b"z" * 512), 0),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in probe_video(media, bytes_per_frame_est=512).collect()}
    assert got["v1"].container == "mp4" and got["v1"].n_frames_est == 4
    assert got["v2"].container == "unknown" and got["v2"].n_frames_est == 1
    assert got["v3"].container == "mp4"
    assert got["v4"].container == "mp4"


def _mp4_bytes(timescale: int, duration: int, version: int = 0) -> bytes:
    """Minimal real MP4: ftyp box + moov{mvhd} box, valid ISO-BMFF sizes."""
    import struct

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    if version == 0:
        body = b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration)
    else:
        body = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, timescale, duration)
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_probe_video_duration_mvhd(spark):
    """VERDICT r2 next-round #10: mvhd timescale/duration from a REAL box
    walk, both version layouts; non-MP4 reports NULLs (no fake durations)."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import probe_video_duration

    rows = [
        ("d0", "video", bytearray(_mp4_bytes(600, 3600, version=0)), 0),
        ("d1", "video", bytearray(_mp4_bytes(90000, 90000 * 7 + 45000, version=1)), 0),
        ("d2", "video", bytearray(b"RIFFxxxxAVI " + b"q" * 64), 0),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in probe_video_duration(media).collect()}
    assert (got["d0"].container, got["d0"].timescale, got["d0"].duration_units) == ("mp4", 600, 3600)
    assert abs(got["d0"].duration_s - 6.0) < 1e-9
    assert (got["d1"].timescale, got["d1"].duration_units) == (90000, 675000)
    assert abs(got["d1"].duration_s - 7.5) < 1e-9
    assert got["d2"].container == "unknown" and got["d2"].duration_s is None


def test_decode_audio_noncanonical_wav_layouts(spark):
    """Regression (ADVICE r2 #4): WAVE with an 18-byte fmt (cbSize=0), a LIST
    chunk before data, and a fact chunk must parse via the RIFF sub-chunk
    walk; n_samples comes from the data chunk's declared size, never from
    len(payload)-44."""
    import struct

    def wav_ext(rate, channels, bits, n_samples):
        data = b"\x00" * (n_samples * channels * (bits // 8))
        fmt16 = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                            channels * bits // 8, bits)
        fmt18 = fmt16 + struct.pack("<H", 0)  # cbSize = 0
        list_chunk = b"LIST" + struct.pack("<I", 9) + b"INFOIART1"  # odd size -> pad byte
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", n_samples)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", 18) + fmt18
            + list_chunk + b"\x00"
            + fact
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rows = [("x1", "audio", bytearray(wav_ext(22050, 2, 16, 333)), 0)]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = decode_audio(media).collect()[0]
    assert (got.sample_rate, got.channels, got.bits_per_sample, got.n_samples, got.format) == (
        22050, 2, 16, 333, "wav",
    )


def test_decode_images_real_jpeg_sof(spark):
    """VERDICT r2 next-round #10: JPEG dimensions out of SOF0/SOF2 via a real
    marker walk (APP0 + quant table before the SOF; no PIL)."""
    import struct

    def jpeg(width, height, channels, sof_marker):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x01\x00H\x00H\x00\x00"
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x10" * 64
        sof = (
            bytes([0xFF, sof_marker])
            + struct.pack(">H", 8 + 3 * channels)
            + b"\x08"
            + struct.pack(">HH", height, width)
            + bytes([channels])
            + b"\x01\x11\x00" * channels
        )
        return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"

    rows = [
        ("j0", "image", bytearray(jpeg(800, 600, 3, 0xC0)), 0),  # baseline SOF0
        ("j2", "image", bytearray(jpeg(123, 45, 1, 0xC2)), 0),   # progressive SOF2
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary, n_bytes int"
    )
    got = {r.media_ref: r for r in decode_images(media).collect()}
    assert (got["j0"].width, got["j0"].height, got["j0"].channels, got["j0"].format) == (800, 600, 3, "jpeg")
    assert (got["j2"].width, got["j2"].height, got["j2"].channels, got["j2"].format) == (123, 45, 1, "jpeg")


def test_jpeg_sof_truncated_at_component_byte():
    """ADVICE r3 #4: a stream ending EXACTLY at the SOF component-count byte
    must be rejected (None), not reported as a fabricated 0-channel image;
    one byte more and the walk succeeds with the real channel count."""
    import struct

    from p5_rdf_rdb2rdf_spark.ops.multimodal import _jpeg_sof_dims

    head = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 20, 10)
    assert len(head) == 11  # component byte would sit at index 11 — absent
    assert _jpeg_sof_dims(head) is None
    assert _jpeg_sof_dims(head + b"\x03") == (10, 20, 3)


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


def test_media_kernels_total_on_arbitrary_bytes():
    """The struct-read kernels run inside executors over untrusted payloads:
    they must be TOTAL functions — any byte string yields a result or a
    clean fallback, never an exception (a throwing kernel fails the whole
    Spark task and, with retries, the job). Hypothesis drives arbitrary
    bytes plus adversarial prefixes of the real magic numbers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from p5_rdf_rdb2rdf_spark.ops.multimodal import (
        _decode_audio_kernel,
        _decode_image_kernel,
        _jpeg_sof_dims,
        _mp4_mvhd,
        _wav_meta,
    )

    prefixes = st.sampled_from(
        [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"\xff\xd8\xff", b"RIFF",
         b"RIFF\x00\x00\x00\x00WAVE", b"\x00\x00\x00\x08ftyp", b"\x00\x00\x00\x01",
         b"RIFF\xff\xff\xff\xffWAVEfmt ", b"\xff\xd8\xff\xc0\x00\x03"]
    )

    @settings(max_examples=300, deadline=None)
    @given(prefix=prefixes, tail=st.binary(max_size=200))
    def run(prefix: bytes, tail: bytes):
        payload = prefix + tail
        w, h, c, fmt = _decode_image_kernel(payload)
        assert isinstance(fmt, str)
        sr, ch, bits, n, afmt = _decode_audio_kernel(payload)
        assert isinstance(afmt, str)
        r = _jpeg_sof_dims(payload)
        assert r is None or len(r) == 3
        r = _wav_meta(payload)
        assert r is None or len(r) == 4
        r = _mp4_mvhd(payload)
        assert r is None or len(r) == 2

    run()


def test_mp4_walk_terminates_on_zero_size_boxes():
    """A box declaring size 0 means 'extends to end of file' — a walker that
    treats it as a zero-length box loops forever. Also: size < header is
    malformed and must end the walk, not recurse."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import _mp4_mvhd

    # ftyp, then a box with size=0 that is NOT moov -> walk must stop
    p = b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00" + b"\x00\x00\x00\x00free" + b"x" * 64
    assert _mp4_mvhd(p) is None
    # malformed: size 4 (< 8-byte header)
    p2 = b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00" + b"\x00\x00\x00\x04moov"
    assert _mp4_mvhd(p2) is None


def test_sample_frames_shape(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n_bytes=128, max_frames=4)
    assert dict(frames.dtypes)["frame_probe"] == "binary"
    rows = frames.collect()
    assert rows
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
    for ref, idxs in by_ref.items():
        assert idxs == sorted(idxs) and len(idxs) <= 4


def test_sample_frames_byte_exact_offsets(spark):
    """Regression (ADVICE r2 #5): slices must be at BYTE strides even when
    the payload contains >= 0x80 bytes (a string cast made offsets
    character-based and mangled the probe bytes)."""
    payload = bytes(range(256)) * 3  # plenty of high bytes
    media = spark.createDataFrame(
        [("s1", "video", bytearray(payload), len(payload))],
        "media_ref string, kind string, payload binary, n_bytes int",
    )
    rows = {r.frame_idx: bytes(r.frame_probe) for r in
            sample_frames(media, every_n_bytes=256, max_frames=3).collect()}
    assert rows == {i: payload[i * 256 : i * 256 + 16] for i in range(3)}


def _bmp24(w, h, row_value, top_down=False, pad_byte=0xEE):
    """24-bit uncompressed BMP whose every sample in row r is row_value(r);
    pad bytes are poison (0xEE) so stats that fail to strip padding break."""
    import struct

    stride = (3 * w + 3) & ~3
    order = range(h) if top_down else reversed(range(h))
    px = b"".join(
        (bytes([row_value(r)]) * (3 * w)).ljust(stride, bytes([pad_byte]))
        for r in order
    )
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(px), 0, 0, 0, 0
    )
    return hdr + dib + px


def test_bmp_pixel_decode_strips_padding_and_row_order():
    """Real BMP pixel extraction: 4-byte row padding is NOT pixel data (the
    pad bytes here are 0xEE poison — any stat touching them breaks), and
    bottom-up vs top-down storage yields identical statistics."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import _pixel_stats_kernel

    w, h = 3, 4  # stride 12 = 9 data + 3 pad bytes per row
    up = _pixel_stats_kernel(_bmp24(w, h, lambda r: 10 + r))
    down = _pixel_stats_kernel(_bmp24(w, h, lambda r: 10 + r, top_down=True))
    assert up is not None and down is not None
    fmt, gw, gh, ch, n_px, s, mn, mx, mean = up
    assert (fmt, gw, gh, ch, n_px) == ("bmp", 3, 4, 3, 12)
    assert s == 3 * w * sum(10 + r for r in range(h))  # poison excluded
    assert (mn, mx) == (10, 13)
    assert mean == s / (n_px * ch)
    assert up == down  # stats are row-order invariant


def test_bmp_pixel_decode_truncated_returns_none():
    """A BMP whose declared pixel array is cut short must yield None (no
    fabricated stats), while the header-only metadata kernel still reports
    real dimensions."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import (
        _decode_image_kernel,
        _pixel_stats_kernel,
    )

    full = _bmp24(5, 3, lambda r: r)
    cut = full[:-4]
    assert _pixel_stats_kernel(cut) is None
    assert _decode_image_kernel(cut)[:4] == (5, 3, 3, "bmp")  # header intact


def test_pnm_pixel_decode_8_and_16_bit():
    """Binary PGM/PPM rasters: comment-bearing headers, exact data offset
    (single whitespace after maxval), 1 vs 3 channels, and big-endian
    16-bit samples when maxval > 255."""
    import numpy as np

    from p5_rdf_rdb2rdf_spark.ops.multimodal import _pixel_stats_kernel

    pgm = b"P5\n# comment line\n4 2\n255\n" + bytes(range(8))
    fmt, w, h, ch, n_px, s, mn, mx, mean = _pixel_stats_kernel(pgm)
    assert (fmt, w, h, ch, n_px, s, mn, mx) == ("pgm", 4, 2, 1, 8, 28, 0, 7)
    assert mean == 3.5

    ppm = b"P6 2 2 255 " + bytes(range(12))
    fmt, w, h, ch, n_px, s, mn, mx, mean = _pixel_stats_kernel(ppm)
    assert (fmt, w, h, ch, n_px, s) == ("ppm", 2, 2, 3, 4, 66)

    vals = np.array([300, 700, 65535, 0], dtype=">u2")
    pgm16 = b"P5\n2 2\n65535\n" + vals.tobytes()
    fmt, w, h, ch, n_px, s, mn, mx, mean = _pixel_stats_kernel(pgm16)
    assert (fmt, s, mn, mx) == ("pgm", 300 + 700 + 65535, 0, 65535)

    # truncated raster -> None
    assert _pixel_stats_kernel(b"P5\n4 2\n255\n" + bytes(5)) is None


def test_decode_pixel_stats_dataframe_and_unknown(spark):
    """The mapInPandas operator: real stats for BMP/PGM payloads, NULL stats
    + format='unknown' for undecodable ones — never fabricated."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import decode_pixel_stats

    rows = [
        ("a", "image", _bmp24(3, 2, lambda r: 5 + r)),
        ("b", "image", b"P5\n3 1\n255\n" + bytes([1, 2, 3])),
        ("c", "image", b"\x00not an image at all"),
        ("d", "video", b"irrelevant kind, filtered out"),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary"
    )
    got = {r.media_ref: r for r in decode_pixel_stats(media).collect()}
    assert set(got) == {"a", "b", "c"}
    assert (got["a"].format, got["a"].px_min, got["a"].px_max) == ("bmp", 5, 6)
    assert got["a"].px_sum == 3 * 3 * (5 + 6)
    assert (got["b"].format, got["b"].px_sum, got["b"].px_mean) == ("pgm", 6, 2.0)
    assert got["c"].format == "unknown" and got["c"].px_sum is None


def test_pixel_kernels_total_on_arbitrary_bytes():
    """Same totality bar as the other struct-read kernels: arbitrary bytes
    (with adversarial BMP/PNM magic prefixes) never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from p5_rdf_rdb2rdf_spark.ops.multimodal import (
        _decode_image_kernel,
        _pixel_stats_kernel,
    )

    prefixes = st.sampled_from(
        [b"", b"BM", b"BM" + b"\x00" * 12, b"P5", b"P6\n", b"P5\n#",
         b"P5\n99999999 99999999\n255\n", b"BM" + b"\xff" * 52]
    )

    @settings(max_examples=300, deadline=None)
    @given(prefix=prefixes, tail=st.binary(max_size=200))
    def run(prefix: bytes, tail: bytes):
        payload = prefix + tail
        r = _pixel_stats_kernel(payload)
        assert r is None or len(r) == 9
        w, h, c, fmt = _decode_image_kernel(payload)
        assert isinstance(fmt, str)

    run()


def test_resize_kernel_nn_matches_python_oracle():
    """Nearest-neighbor resize vs an independent Python double loop: exact
    sample selection with the floor index map, on a PGM with fully distinct
    pixel values (catches any row/col index swap)."""
    import numpy as np

    from p5_rdf_rdb2rdf_spark.ops.multimodal import _resize_kernel

    w, h, ow, oh = 5, 4, 3, 2
    src = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    pgm = b"P5\n%d %d\n255\n" % (w, h) + src.tobytes()
    fmt, gw, gh, ch, px, s = _resize_kernel(pgm, ow, oh)
    assert (fmt, gw, gh, ch) == ("pgm", ow, oh, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(oh, ow)
    want = np.array(
        [[src[(r * h) // oh][(c * w) // ow] for c in range(ow)] for r in range(oh)],
        dtype=np.uint8,
    )
    assert (got == want).all() and s == int(want.sum())


def test_resize_kernel_bmp_orientation_normalized():
    """Bottom-up and top-down BMPs with the same LOGICAL content must resize
    to identical grids (orientation normalized before the index map); the
    resized first row must come from the logical TOP of the image."""
    import numpy as np

    from p5_rdf_rdb2rdf_spark.ops.multimodal import _resize_kernel

    w, h = 3, 4
    up = _resize_kernel(_bmp24(w, h, lambda r: 10 + r), 2, 2)
    down = _resize_kernel(_bmp24(w, h, lambda r: 10 + r, top_down=True), 2, 2)
    assert up is not None and up == down
    fmt, ow, oh, ch, px, s = up
    grid = np.frombuffer(px, dtype=np.uint8).reshape(oh, ow, ch)
    assert (grid[0] == 10).all()  # logical row 0 (top), value 10 + 0
    assert (grid[1] == 12).all()  # source row (1*4)//2 = 2 -> value 12
    assert s == 2 * 3 * (10 + 12)
    # truncated raster -> None, never a fabricated grid
    assert _resize_kernel(_bmp24(w, h, lambda r: r)[:-4], 2, 2) is None
    assert _resize_kernel(b"\x89PNG not a codec-free format", 2, 2) is None


def test_resize_images_dataframe_and_16bit(spark):
    """resize_images end-to-end: schema, unknown fallback, and 16-bit PNM
    samples keep their dtype (big-endian) through the resize."""
    import numpy as np

    from p5_rdf_rdb2rdf_spark.ops.multimodal import resize_images

    vals = np.array([[300, 700], [65535, 0]], dtype=">u2")
    rows = [
        ("a", "image", b"P5\n2 2\n65535\n" + vals.tobytes()),
        ("b", "image", b"not an image"),
        ("c", "audio", b"RIFF"),  # filtered by kind
    ]
    df = spark.createDataFrame(rows, "media_ref string, kind string, payload binary")
    got = {r.media_ref: r for r in resize_images(df, 1, 1).collect()}
    assert set(got) == {"a", "b"}
    a = got["a"]
    assert (a.format, a.width, a.height, a.channels) == ("pgm", 1, 1, 1)
    assert np.frombuffer(a.pixels, dtype=">u2")[0] == 300  # src[0][0]
    assert a.px_sum == 300
    assert got["b"].format == "unknown" and got["b"].pixels is None


def test_pixel_histogram_kernel_channels_and_16bit():
    """Per-channel histograms (VERDICT r5 #8): bin = v*n_bins//domain with
    domain 256 / 65536 by sample width; channels bin independently; only
    non-zero bins are emitted; undecodable payloads -> None."""
    import numpy as np

    from p5_rdf_rdb2rdf_spark.ops.multimodal import _pixel_hist_kernel

    # BMP rows at 10+60r (w=3, h=4): every channel identical, bins 0/4/8/11
    rows = _pixel_hist_kernel(_bmp24(3, 4, lambda r: 10 + 60 * r), 16)
    want_bins = {(10 + 60 * r) * 16 // 256 for r in range(4)}
    assert want_bins == {0, 4, 8, 11}
    for c in range(3):
        got = {(b, n) for fmt, ch, b, n in rows if ch == c}
        assert got == {(b, 3) for b in want_bins}  # w samples per row/bin
    assert all(fmt == "bmp" for fmt, *_ in rows)

    # PPM with DISTINCT per-channel values: channels must not mix
    ppm = b"P6 1 2 255 " + bytes([0, 100, 200, 10, 110, 210])
    rows = _pixel_hist_kernel(ppm, 16)
    by_ch = {}
    for fmt, c, b, n in rows:
        by_ch.setdefault(c, {})[b] = n
    assert by_ch == {0: {0: 2}, 1: {6: 2}, 2: {12: 1, 13: 1}}

    # 16-bit PGM: domain 65536
    vals = np.array([300, 700, 65535, 0], dtype=">u2")
    rows = _pixel_hist_kernel(b"P5\n2 2\n65535\n" + vals.tobytes(), 16)
    assert {(b, n) for _f, _c, b, n in rows} == {(0, 3), (15, 1)}

    assert _pixel_hist_kernel(b"not an image", 16) is None


def test_decode_pixel_histograms_dataframe(spark):
    """The mapInPandas operator: long-format rows for decodable payloads,
    one format='unknown' NULL row for garbage, counts summing to
    width*height per channel."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import decode_pixel_histograms

    media = spark.createDataFrame(
        [
            ("a", "image", bytearray(_bmp24(3, 4, lambda r: 10 + 60 * r))),
            ("b", "image", bytearray(b"P5\n2 2\n255\n" + bytes([0, 16, 32, 255]))),
            ("c", "image", bytearray(b"garbage")),
            ("d", "audio", bytearray(b"not even scanned")),
        ],
        "media_ref string, kind string, payload binary",
    )
    out = decode_pixel_histograms(media, n_bins=16).collect()
    assert {r.media_ref for r in out} == {"a", "b", "c"}  # kind filter
    a_rows = [r for r in out if r.media_ref == "a"]
    assert sum(r.n for r in a_rows) == 3 * 4 * 3  # w*h per channel
    b_bins = {(r.bin, r.n) for r in out if r.media_ref == "b"}
    assert b_bins == {(0, 1), (1, 1), (2, 1), (15, 1)}
    c_rows = [r for r in out if r.media_ref == "c"]
    assert len(c_rows) == 1 and c_rows[0].format == "unknown" and c_rows[0].n is None
