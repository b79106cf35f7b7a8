"""Multimodal plumbing: mapInPandas decode/feature stages — schema,
determinism, batch behavior, and the real-codec stub path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparklyclean_spark.catalog import load_table
from sparklyclean_spark.operators import multimodal as MM
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return MM.make_media_table(load_table(spark, SF_DIR, "documents")).cache()


def test_decode_metadata_deterministic(media):
    a = {tuple(r) for r in MM.decode_metadata(media).collect()}
    b = {tuple(r) for r in MM.decode_metadata(media).collect()}
    assert a == b
    row = next(iter(a))
    assert len(a) == media.count()


def test_decode_fake_dims_follow_length(media):
    joined = (
        MM.decode_metadata(media)
        .join(media.select("media_id", F.octet_length("payload").alias("n")), "media_id")
        .where(
            (F.col("n_bytes") != F.col("n"))
            | (F.col("width") != F.col("n") % 64 + 16)
            | (F.col("height") != F.col("n") % 48 + 16)
        )
    )
    assert joined.count() == 0


def test_real_codec_marks_undecodable_rows(media):
    """Text bytes are not a parseable image: the real-codec path must
    record ok=False per row, never throw (one bad blob must not kill a
    100 TB decode stage)."""
    out = MM.decode_metadata(media.limit(5), use_real_codec=True).collect()
    assert all(not r["ok"] and r["width"] is None for r in out)
    assert all(r["n_bytes"] > 0 for r in out)


def _png_bytes(w: int, h: int) -> bytes:
    """A fully valid in-memory PNG (correct CRCs, decodable by any
    viewer) built with the stdlib only."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_codec_decodes_real_images(spark):
    """The real-codec path extracts TRUE dimensions from real encoded
    bytes (PNG/GIF/BMP via the stdlib header parsers — no Pillow
    needed), and flags corrupt payloads instead of raising."""
    import struct

    png = _png_bytes(7, 5)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 8
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 96, 0, 0, 54)
        + struct.pack("<Iii", 40, 9, -3)  # negative height = top-down
        + b"\x00" * 40
    )
    corrupt = b"\x89PNG\r\n\x1a\n" + b"XXXXXXXXXXXX"
    df = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png), 0),
            (2, "image/gif", bytearray(gif), 0),
            (3, "image/bmp", bytearray(bmp), 0),
            (4, "image/png", bytearray(corrupt), 0),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.decode_metadata(df, use_real_codec=True).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["ok"]) == (7, 5, True)
    assert (out[2]["width"], out[2]["height"], out[2]["ok"]) == (12, 34, True)
    assert (out[3]["width"], out[3]["height"], out[3]["ok"]) == (9, 3, True)
    assert out[4]["ok"] is False and out[4]["width"] is None


@pytest.mark.needs_pillow
def test_real_codec_pillow_fallback(spark):
    """When Pillow is importable, formats without a stdlib parser
    (TIFF here — JPEG gained a stdlib SOF parser in r11) decode
    through it in the same hook."""
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (11, 6)).save(buf, format="TIFF")
    df = spark.createDataFrame(
        [(1, "image/tiff", bytearray(buf.getvalue()), 0)], MM.MEDIA_SCHEMA
    )
    row = MM.decode_metadata(df, use_real_codec=True).collect()[0]
    assert (row["width"], row["height"], row["ok"]) == (11, 6, True)


def _jpeg_bytes(w: int, h: int, sof: int = 0xC0, truncate_at: int | None = None) -> bytes:
    """A structurally valid JPEG header stream built with the stdlib
    only: SOI, APP0/JFIF, a fill byte, DQT, COM, then the SOFn frame
    header carrying the true (height, width) — the segment walk a
    decoder performs per ITU-T T.81 §B.2.2. ``truncate_at`` cuts the
    stream mid-segment to model a truncated crawl payload."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)  # leading fill byte
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"crawl"
    sof_seg = (
        bytes([0xFF, sof])
        + struct.pack(">H", 11)  # 2 len + 9: prec, h, w, ncomp, 3/comp
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01"  # 1 component
        + b"\x01\x11\x00"  # id, sampling, quant table
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x11\x00\x3f\x00"
    stream = b"\xff\xd8" + app0 + dqt + com + sof_seg + sos + b"\x12\x34" + b"\xff\xd9"
    return stream if truncate_at is None else stream[:truncate_at]


def test_real_codec_decodes_jpeg_stdlib(spark):
    """r11: JPEG dimensions come from the stdlib SOF marker walk — no
    Pillow — for baseline (SOF0), progressive (SOF2), and arithmetic
    (SOF9) frames; truncated streams and SOF-less streams yield
    ok=False rows, never a failed task."""
    baseline = _jpeg_bytes(640, 480, sof=0xC0)
    progressive = _jpeg_bytes(123, 4567, sof=0xC2)
    arithmetic = _jpeg_bytes(9, 7, sof=0xC9)
    truncated = _jpeg_bytes(640, 480, truncate_at=30)  # cut inside DQT
    no_sof = _jpeg_bytes(640, 480)[:20]  # SOI + APP0 only, then EOF
    df = spark.createDataFrame(
        [
            (1, "image/jpeg", bytearray(baseline), 0),
            (2, "image/jpeg", bytearray(progressive), 0),
            (3, "image/jpeg", bytearray(arithmetic), 0),
            (4, "image/jpeg", bytearray(truncated), 0),
            (5, "image/jpeg", bytearray(no_sof), 0),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.decode_metadata(df, use_real_codec=True).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["ok"]) == (640, 480, True)
    assert (out[2]["width"], out[2]["height"], out[2]["ok"]) == (123, 4567, True)
    assert (out[3]["width"], out[3]["height"], out[3]["ok"]) == (9, 7, True)
    assert out[4]["ok"] is False and out[4]["width"] is None
    assert out[5]["ok"] is False and out[5]["width"] is None


def test_real_codec_decodes_webp_stdlib(spark):
    """r11: WebP dimensions from the stdlib RIFF walk for all three
    RFC 9649 variants (VP8 lossy, VP8L lossless, VP8X extended);
    truncated/corrupt streams yield ok=False rows."""
    import struct

    def riff(fourcc: bytes, payload: bytes) -> bytes:
        chunk = fourcc + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + struct.pack("<HH", 320, 240) + b"\x00" * 8)
    bits = (111 - 1) | ((222 - 1) << 14)
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4)
    vp8x = riff(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (1023).to_bytes(3, "little")
        + (767).to_bytes(3, "little"),
    )
    truncated = vp8[:16]
    df = spark.createDataFrame(
        [
            (1, "image/webp", bytearray(vp8), 0),
            (2, "image/webp", bytearray(vp8l), 0),
            (3, "image/webp", bytearray(vp8x), 0),
            (4, "image/webp", bytearray(truncated), 0),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.decode_metadata(df, use_real_codec=True).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["ok"]) == (320, 240, True)
    assert (out[2]["width"], out[2]["height"], out[2]["ok"]) == (111, 222, True)
    assert (out[3]["width"], out[3]["height"], out[3]["ok"]) == (1024, 768, True)
    assert out[4]["ok"] is False and out[4]["width"] is None


def test_features_shape_and_norm(media):
    feats = MM.extract_features(media).collect()
    assert all(len(r["feat"]) == MM.FEATURE_DIM for r in feats)
    for r in feats[:20]:
        assert abs(sum(r["feat"]) - 1.0) < 1e-9


def test_resize_fixed_payload(spark, media):
    from sparklyclean_spark.operators.multimodal import resize

    out = resize(media, width=8, height=4).collect()
    assert len(out) == media.count()
    assert all(len(r.payload) == 32 for r in out)
    assert all((r.width, r.height) == (8, 4) for r in out)
    # deterministic: same input -> same bytes
    again = {r.media_id: bytes(r.payload) for r in resize(media, 8, 4).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in out)


def test_frame_sample_explodes_rows(spark, media):
    from sparklyclean_spark.operators.multimodal import frame_sample

    out = frame_sample(media, n_frames=3, frame_bytes=16).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    for media_id, frames in by_media.items():
        assert [f.frame_idx for f in sorted(frames, key=lambda f: f.frame_idx)] == list(
            range(len(frames))
        )
        assert all(len(f.frame) <= 16 for f in frames)
        assert len(frames) <= 3


def test_wav_parser_walks_chunks():
    """The WAV parser must walk the chunk list, not assume the fixed
    44-byte layout: a LIST chunk (odd-sized, exercising word
    alignment) precedes fmt, and data precedes fmt."""
    import struct

    from sparklyclean_spark.operators.multimodal import _parse_wav

    data = b"\x01\x02" * 8000  # 16000 bytes
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
    odd = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad byte
    body = odd + struct.pack("<4sI", b"data", len(data)) + data + fmt
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    dur, rate, ch = _parse_wav(wav)
    assert (dur, rate, ch) == (16000 * 1000 // 32000, 8000, 2)

    # truncated payload: the data header declares more bytes than the
    # buffer holds — must raise, not report a duration for missing bytes
    import pytest

    trunc = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + 16000, b"WAVE")
    trunc += fmt + struct.pack("<4sI", b"data", 16000) + data[:100]
    with pytest.raises(ValueError):
        _parse_wav(trunc)


def test_mp4_parser_finds_mvhd_and_rejects_v1():
    import struct

    import pytest

    from sparklyclean_spark.operators.multimodal import _parse_mp4

    def mvhd(version, timescale, duration):
        return (
            struct.pack(">I4sIIIII", 108, b"mvhd", version << 24, 0, 0,
                        timescale, duration)
            + b"\x00" * 80
        )

    free = struct.pack(">I4s", 8, b"free")
    moov = struct.pack(">I4s", 8 + 8 + 108, b"moov") + free + mvhd(0, 600, 1234)
    box = struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0) + moov
    assert _parse_mp4(box) == (1234 * 1000 // 600, 600)

    bad = struct.pack(">I4s", 8 + 108, b"moov") + mvhd(1, 600, 1234)
    with pytest.raises(ValueError):
        _parse_mp4(struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0) + bad)


def test_av_decode_round_trip(spark):
    """Builder -> decoder round trip on real container bytes, corrupt
    rows surfacing as ok=False with -1 sentinels."""
    from sparklyclean_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, "x" * (100 + i)) for i in range(0, 200)] + [(200, None)],
        "doc_id bigint, text string",
    )
    out = {r.media_id: r for r in MM.decode_av_metadata(
        MM.make_av_media_table(docs)).collect()}
    assert len(out) == 201
    # NULL text -> empty data chunk, still a valid container (L=0)
    assert out[200].ok and out[200].n_bytes == 44 and out[200].duration_ms == 0
    assert not out[0].ok and out[0].container == "unknown"  # 0 % 97 == 0
    assert not out[97].ok
    r2 = out[2]  # wav: rate 8000*(1+2%3)=24000, ch 1+(1%2)=2
    L = 102
    assert (r2.container, r2.sample_rate, r2.channels) == ("wav", 24000, 2)
    assert r2.duration_ms == L * 1000 // (24000 * 2 * 2)
    assert r2.timescale == -1 and r2.n_bytes == 44 + L
    r3 = out[3]  # mp4: timescale 1000*(1+3%4)=4000, duration 600*103
    assert (r3.container, r3.timescale) == ("mp4", 4000)
    assert r3.duration_ms == 600 * 103 * 1000 // 4000
    assert r3.sample_rate == -1 and r3.n_bytes == 140 + 103


def test_image_decode_round_trip(spark):
    """r11: builder -> real-codec decoder round trip on real IMAGE
    container bytes (JPEG baseline/progressive, PNG, GIF) — dims are
    closed forms of doc_id, corrupt rows ok=False. This is the pytest
    side of the multimodal_image_meta oracle row."""
    from sparklyclean_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, "x" * (100 + i)) for i in range(0, 200)] + [(200, None)],
        "doc_id bigint, text string",
    )
    out = {r.media_id: r for r in MM.decode_metadata(
        MM.make_image_media_table(docs), use_real_codec=True).collect()}
    assert len(out) == 201
    for i in (2, 5, 7, 8, 101):  # jpeg/png/gif/jpeg-progressive mix
        r = out[i]
        assert r.ok, i
        assert (r.width, r.height) == (i % 317 + 16, i % 211 + 16), i
        L = 0 if i == 200 else 100 + i
        want_kind, want_n = {
            0: ("image/jpeg", 45 + L),
            2: ("image/jpeg", 45 + L),
            1: ("image/png", 77 + L),
            3: ("image/gif", 13 + L),
        }[i % 4]
        assert (r.kind, r.n_bytes) == (want_kind, want_n), i
    # truncated rows (id % 97 == 0) survive as ok=False
    assert not out[0].ok and out[0].n_bytes == 9
    assert not out[97].ok and out[97].width is None
    # NULL text -> header-only container, still decodable
    assert out[200].ok and out[200].n_bytes == 45 + 0  # 200 % 4 == 0: jpeg
