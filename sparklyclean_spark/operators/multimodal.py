"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a ``kind`` tag and a metadata struct. Decode / feature-extraction run
as Arrow-batched ``mapInPandas`` stages — the ONLY place Python
belongs in this engine, because codec work is inherently
per-byte-buffer. The Spark-side contract (schemas, batch iteration,
partition preservation) is real and tested. The real-codec path
(``_decode_real``) parses PNG/GIF/BMP headers with the stdlib (tested
in-container against real image bytes) and falls back to Pillow when
importable for other formats; audio/video codecs (torchaudio/pyav)
remain deployment swap-ins behind the same hook. The deterministic
fake codec stays the oracle-checkable default for driver queries.

Scale shape: mapInPandas streams Arrow batches, so a 100 TB media
table decodes partition-parallel with constant memory per task;
metadata-only consumers never touch ``payload`` thanks to parquet
column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, src_chars bigint"
)
DECODED_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, width int, height int, ok boolean"
)
FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id bigint, feat array<double>"


def make_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table: each document's UTF-8 bytes
    stand in for an encoded payload (the container has no codecs, so
    tests exercise the plumbing with fake payloads)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("n_chars").alias("src_chars"),
    )


def _decode_real(payload: bytes, kind: str) -> tuple[int, int]:
    """Real codec path: true pixel dimensions from the encoded bytes.

    Tiered so the engine stays dependency-honest:

    1. PNG / GIF / BMP dimensions are parsed from the container header
       with the stdlib only (magic-sniffed, not ``kind``-trusted) —
       fully functional in this container and covered by
       ``tests/test_multimodal.py`` with a real in-memory PNG.
    2. Anything else dispatches to Pillow when importable (JPEG/WebP/
       TIFF/...); heavier media (audio/video) would dispatch to
       soundfile/pyav the same way.
    3. No parser and no Pillow -> NotImplementedError, which
       ``decode_metadata`` surfaces as ok=False rather than failing
       the job (one corrupt blob must never kill a 100 TB decode).
    """
    b = bytes(payload)
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return (w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return (w, abs(h))
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            f"no stdlib parser for this payload and Pillow unavailable ({kind})"
        ) from exc
    with Image.open(BytesIO(b)) as im:
        return im.size


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic fake dimensions derived from payload length —
    keeps the pipeline end-to-end testable (and oracle-checkable,
    since length is visible to SQL)."""
    n = len(payload)
    return (n % 64 + 16, n % 48 + 16)


def decode_metadata(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched decode: (media_id, kind, n_bytes, width, height, ok)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    w, h = (
                        _decode_real(payload, kind)
                        if use_real_codec
                        else _decode_fake(payload)
                    )
                    dims.append((len(payload), w, h, True))
                except Exception:
                    # unparseable/corrupt payload or missing codec lib:
                    # a 100 TB decode must record the failure per-row
                    # (ok=False), never abort the stage
                    dims.append((len(payload), None, None, False))
            out = pd.DataFrame(
                dims, columns=["n_bytes", "width", "height", "ok"]
            )
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction: byte-histogram folded to
    ``dim`` buckets, L1-normalized — a deterministic stand-in for a
    real visual/audio embedding model (same UDF signature and batch
    shape a model-serving stage would use)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                buckets = [0] * dim
                for byte in payload:
                    buckets[byte % dim] += 1
                total = sum(buckets) or 1
                feats.append([b / total for b in buckets])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "feat": feats}
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int"
)
FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def resize(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched resize stage. The transform here is a
    deterministic byte resample (stride-sampled payload truncated/
    padded to width*height) standing in for a real scaler — the
    production swap-in is Pillow's ``Image.resize`` in the same loop.
    Output schema/batching match what a GPU preprocessing stage
    consumes: fixed-size payload per row."""

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if len(b) >= target:
                    step = len(b) // target
                    b = b[:: step][:target]
                b = b.ljust(target, b"\0")
                out_payloads.append(b)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """Arrow-batched frame sampler: one output row per sampled frame
    (media_id, frame_idx, frame) — the row-explosion shape a video
    pipeline feeds to per-frame models. Frames are evenly spaced
    byte windows of the payload (pyav keyframe extraction is the
    production swap-in); payloads too short for ``n_frames`` windows
    yield fewer frames, never padding rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = min(n_frames, max(len(b) // frame_bytes, 1 if b else 0))
                for i in range(n):
                    start = (
                        (len(b) - frame_bytes) * i // (n - 1) if n > 1 else 0
                    )
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(b[start : start + frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
