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


def test_real_codec_stub_marks_failure(media):
    out = MM.decode_metadata(media.limit(5), use_real_codec=True).collect()
    assert all(not r["ok"] and r["width"] is None for r in out)
    assert all(r["n_bytes"] > 0 for r in out)


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
