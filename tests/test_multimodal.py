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
    (JPEG here) decode through it in the same hook."""
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (11, 6)).save(buf, format="JPEG")
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(buf.getvalue()), 0)], MM.MEDIA_SCHEMA
    )
    row = MM.decode_metadata(df, use_real_codec=True).collect()[0]
    assert (row["width"], row["height"], row["ok"]) == (11, 6, True)


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
