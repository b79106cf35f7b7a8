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

    1. PNG / GIF / BMP / JPEG / WebP dimensions are parsed from the
       container header with the stdlib only (magic-sniffed, not
       ``kind``-trusted) — fully functional in this container and
       covered by ``tests/test_multimodal.py`` with real in-memory
       bytes. JPEG (the dominant crawl image format) walks the
       marker-segment list to the first SOF frame header (baseline
       SOF0 through SOF15, skipping the non-frame DHT/JPG/DAC markers)
       and reads (height, width) from it — ITU-T T.81 §B.2.2. WebP
       covers all three RFC 9649 variants (VP8/VP8L/VP8X).
    2. Anything else dispatches to Pillow when importable (TIFF/
       AVIF/...); heavier media (audio/video) would dispatch to
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
    if b[:2] == b"\xff\xd8":
        return _parse_jpeg_dims(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _parse_webp_dims(b)
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            f"no stdlib parser for this payload and Pillow unavailable ({kind})"
        ) from exc
    with Image.open(BytesIO(b)) as im:
        return im.size


def _parse_jpeg_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG by walking the marker-segment list
    to the first SOF frame header (ITU-T T.81 §B.2.2). Handles fill
    bytes (repeated 0xFF before a marker), standalone markers
    (TEM/RST/SOI), and every SOFn variant — baseline SOF0, extended
    SOF1, progressive SOF2, lossless SOF3/7/11/15, arithmetic 9/10 —
    while skipping the non-frame 0xC4/0xC8/0xCC (DHT/JPG/DAC). SOF
    always precedes SOS, so the walk never enters entropy-coded data;
    truncation anywhere before SOF raises (→ ok=False upstream)."""
    import struct

    pos = 2  # past SOI
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(b):
            break
        marker = b[pos]
        pos += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # standalone: TEM / RSTn / SOI
        if marker == 0xD9:  # EOI with no frame header
            break
        if pos + 2 > len(b):
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(b):
            raise ValueError("JPEG segment truncated")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 7:
                raise ValueError("SOF segment too short")
            h, w = struct.unpack(">HH", b[pos + 3 : pos + 7])
            return (w, h)
        if marker == 0xDA:  # SOS before any SOF: malformed
            break
        pos += seglen
    raise ValueError("no SOF marker before SOS/EOI/end of buffer")


def _parse_webp_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from a WebP container (RIFF/'WEBP') — all three
    published variants (RFC 9649): 'VP8 ' lossy (dims after the
    0x9d012a start code, 14-bit LE each), 'VP8L' lossless (14-bit
    fields packed into the 4 bytes after the 0x2f signature, stored
    minus one), 'VP8X' extended (24-bit LE canvas dims minus one).
    Truncation raises (→ ok=False upstream)."""
    import struct

    if len(b) < 20:
        raise ValueError("WebP header truncated")
    fourcc = b[12:16]
    p = b[20:]  # first chunk payload
    if fourcc == b"VP8 ":
        if len(p) < 10 or p[3:6] != b"\x9d\x01\x2a":
            raise ValueError("VP8 key-frame start code missing")
        w, h = struct.unpack("<HH", p[6:10])
        return (w & 0x3FFF, h & 0x3FFF)
    if fourcc == b"VP8L":
        if len(p) < 5 or p[0] != 0x2F:
            raise ValueError("VP8L signature missing")
        (bits,) = struct.unpack("<I", p[1:5])
        return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
    if fourcc == b"VP8X":
        if len(p) < 10:
            raise ValueError("VP8X header truncated")
        w = int.from_bytes(p[4:7], "little") + 1
        h = int.from_bytes(p[7:10], "little") + 1
        return (w, h)
    raise ValueError(f"unknown WebP variant {fourcc!r}")


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


AV_DECODED_SCHEMA = (
    "media_id bigint, kind string, container string, n_bytes bigint,"
    " duration_ms bigint, sample_rate int, channels int, timescale int,"
    " ok boolean"
)


def make_av_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic audio/video table: each document's
    UTF-8 bytes become the media DATA (WAV data chunk / MP4 mdat box)
    wrapped in a REAL container header built from doc attributes —
    even doc_ids get a PCM WAV (sample rate 8/16/24 kHz by id mod 3,
    1–2 channels, 16-bit), odd ids an ISO-BMFF MP4 (mvhd timescale
    1–4 kHz by id mod 4, duration 600·n_chars ticks). Every 97th id is
    truncated to 6 bytes — a corrupt blob the decoder must survive
    per-row. The header fields are closed-form functions of
    (doc_id, octet_length(text)), which is what makes the decode
    round-trip oracle-checkable in SQL."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text -> empty data chunk (str(None) would emit the
                # 4-byte payload "None" while the oracle's strlen(text)
                # yields NULL — a latent hash divergence on dirty input)
                data = ("" if text is None else str(text)).encode("utf-8")
                if doc_id % 2 == 0:
                    kind = "audio/wav"
                    rate = 8000 * (1 + doc_id % 3)
                    ch = 1 + (doc_id // 2) % 2
                    block = ch * 2
                    payload = (
                        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
                        + struct.pack(
                            "<4sIHHIIHH",
                            b"fmt ", 16, 1, ch, rate, rate * block, block, 16,
                        )
                        + struct.pack("<4sI", b"data", len(data))
                        + data
                    )
                else:
                    kind = "video/mp4"
                    timescale = 1000 * (1 + doc_id % 4)
                    duration = 600 * len(data)
                    mvhd = struct.pack(
                        ">I4sI II II", 108, b"mvhd", 0, 0, 0, timescale, duration
                    ) + b"\x00" * 80
                    payload = (
                        struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0)
                        + struct.pack(">I4s", 8 + len(mvhd), b"moov")
                        + mvhd
                        + struct.pack(">I4s", 8 + len(data), b"mdat")
                        + data
                    )
                if doc_id % 97 == 0:
                    payload = payload[:6]
                ids.append(doc_id)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="media_id bigint, kind string, payload binary"
    )


def make_image_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic IMAGE table with REAL container bytes —
    the `make_av_media_table` pattern applied to the image ladder so
    the real-codec decode is oracle-checkable end-to-end: each doc's
    UTF-8 bytes become trailing payload data wrapped in a genuine
    header whose dimensions are closed-form functions of doc_id
    (width = doc_id % 317 + 16, height = doc_id % 211 + 16). Format by
    doc_id % 4: 0 → baseline JPEG (SOF0), 2 → progressive JPEG (SOF2)
    — JPEG on half the rows because it dominates real crawls — 1 → PNG
    (CRC-valid chunks; doc bytes ride in a private ancillary chunk so
    total length stays closed-form), 3 → GIF89a (13-byte header + raw
    trailer). Every 97th id is truncated to 9 bytes — a corrupt blob
    the decoder must survive per-row. Payload lengths: JPEG 45+L,
    PNG 77+L, GIF 13+L (L = octet length of the text)."""
    import struct
    import zlib

    def _png_chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    empty_idat = zlib.compress(b"")  # 8 bytes, deterministic

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = ("" if text is None else str(text)).encode("utf-8")
                w = doc_id % 317 + 16
                h = doc_id % 211 + 16
                m = doc_id % 4
                if m in (0, 2):
                    kind = "image/jpeg"
                    sof = 0xC0 if m == 0 else 0xC2
                    payload = (
                        b"\xff\xd8"  # SOI
                        + b"\xff\xe0" + struct.pack(">H", 16)
                        + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
                        + bytes([0xFF, sof]) + struct.pack(">H", 11)
                        + b"\x08" + struct.pack(">HH", h, w)
                        + b"\x01" + b"\x01\x11\x00"
                        + b"\xff\xda" + struct.pack(">H", 8)
                        + b"\x01\x01\x11\x00\x3f\x00"
                        + data
                        + b"\xff\xd9"  # EOI
                    )
                elif m == 1:
                    kind = "image/png"
                    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                    payload = (
                        b"\x89PNG\r\n\x1a\n"
                        + _png_chunk(b"IHDR", ihdr)
                        + _png_chunk(b"IDAT", empty_idat)
                        + _png_chunk(b"duMp", data)
                        + _png_chunk(b"IEND", b"")
                    )
                else:
                    kind = "image/gif"
                    payload = (
                        b"GIF89a"
                        + struct.pack("<HH", w, h)
                        + b"\x00\x00\x00"
                        + data
                    )
                if doc_id % 97 == 0:
                    payload = payload[:9]
                ids.append(doc_id)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="media_id bigint, kind string, payload binary"
    )


def _parse_wav(b: bytes) -> tuple[int, int, int]:
    """(duration_ms, sample_rate, channels) from a RIFF/WAVE header by
    walking the chunk list (fmt may precede or follow other chunks —
    never assume the fixed 44-byte layout). duration_ms floors
    ``data_bytes·1000 / byte_rate``."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, ch, byte_rate, data_size = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack("<4sI", b[pos : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _, ch, rate, byte_rate, _, _ = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if size > len(b) - pos - 8:
                # declared chunk extends past the buffer (truncated
                # payload): don't report a duration for missing bytes
                raise ValueError("data chunk truncated")
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data_size is None or not byte_rate:
        raise ValueError("missing fmt or data chunk")
    return (data_size * 1000 // byte_rate, rate, ch)


def _parse_mp4(b: bytes) -> tuple[int, int]:
    """(duration_ms, timescale) from the ISO-BMFF moov/mvhd box
    (version 0: 32-bit timescale + duration), found by walking the
    top-level box list then moov's children."""
    import struct

    def walk(buf, start, end):
        pos = start
        while pos + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[pos : pos + 8])
            if size < 8:
                raise ValueError("bad box size")
            yield btype, pos + 8, min(pos + size, end)
            pos += size

    for btype, s, e in walk(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in walk(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                version = b[cs]
                if version != 0:
                    raise ValueError("mvhd v1 (64-bit) not supported")
                timescale, duration = struct.unpack(">II", b[cs + 12 : cs + 20])
                if not timescale:
                    raise ValueError("zero timescale")
                return (duration * 1000 // timescale, timescale)
    raise ValueError("no moov/mvhd box")


def decode_av_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched audio/video header decode — tier 1 of the same
    magic-sniffed stdlib ladder as ``_decode_real``: WAV duration/
    rate/channels from the fmt+data chunks, MP4 duration/timescale
    from moov/mvhd. Missing numeric fields are -1, NEVER NULL — a
    NULL in an int column of a hash-checked contract promotes the
    whole column to float64 under pandas fetch (the HUGEINT lesson).
    Corrupt/unknown payloads yield ok=False rows, never a failed
    task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                try:
                    if b[:4] == b"RIFF":
                        dur, rate, ch = _parse_wav(b)
                        rows.append(
                            (media_id, kind, "wav", len(b), dur, rate, ch, -1, True)
                        )
                    elif len(b) >= 8 and b[4:8] == b"ftyp":
                        dur, timescale = _parse_mp4(b)
                        rows.append(
                            (media_id, kind, "mp4", len(b), dur, -1, -1, timescale, True)
                        )
                    else:
                        raise ValueError("unknown container magic")
                except Exception:
                    rows.append(
                        (media_id, kind, "unknown", len(b), -1, -1, -1, -1, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "container", "n_bytes", "duration_ms",
                    "sample_rate", "channels", "timescale", "ok",
                ],
            )

    return media.mapInPandas(run, schema=AV_DECODED_SCHEMA)


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
