"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codec libraries, so decode kernels for
formats needing them (progressive JPEG, MP3, H.264) are deterministic
fakes / clearly-marked stubs — but the Spark-side plumbing is real and
tested (schema contracts, Arrow-batched ``mapInPandas`` transforms, batch
shapes, partition sizing), and five codecs are REAL with no codec
library: :func:`decode_wav_pcm16` (RIFF/WAVE chunk parser),
:func:`decode_bmp24` (24-bit BMP), :func:`decode_png` (compressed PNG —
zlib inflate, CRC validation, predictive scanline unfilter),
:func:`decode_jpeg_gray` (baseline-sequential T.81 JPEG — Huffman
entropy decode, dequant, float IDCT), and :func:`decode_jpeg_color`
(baseline COLOR JPEG — YCbCr 4:2:0 interleaved MCUs, chrominance Huffman
tables), each certified end-to-end through an encode→decode→feature loop
(``multimodal_*_roundtrip``).
Swapping a stub body for PIL/ffmpeg is a one-function change; nothing in
the plan changes.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` governs task sizing, and all
kernels are ``mapInPandas`` (one Arrow batch in, one out) so Python overhead
is per-batch, not per-row.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema contract for a multimodal asset table
ASSET_SCHEMA = (
    "asset_id bigint, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "asset_id bigint, media_type string, n_bytes bigint, checksum string, feature array<double>"

#: checksum-only contract (``extract_features(with_feature=False)``)
FEATURE_SCHEMA_NO_VECTOR = (
    "asset_id bigint, media_type string, n_bytes bigint, checksum string"
)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Build a binary asset table from the documents fixture: payload =
    utf-8 bytes of the text. Stands in for real image/audio bytes so the
    binary-column pipeline is exercised end-to-end on the driver corpus."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB for formats that need codec libraries (progressive/arithmetic
    JPEG, WebP et al.): real deployments decode with PIL/turbojpeg here;
    the container has none. PNG, 24-bit BMP, baseline grayscale JPEG and
    baseline COLOR JPEG (YCbCr 4:2:0) have REAL decoders in this module
    (:func:`decode_png`, :func:`decode_bmp24`, :func:`decode_jpeg_gray`,
    :func:`decode_jpeg_color`)."""
    raise NotImplementedError(
        "progressive/arithmetic JPEG decode requires PIL/libjpeg, not "
        "present in this environment; use decode_png/decode_bmp24/"
        "decode_jpeg_gray/decode_jpeg_color for the library-free formats, "
        "or extract_features' deterministic byte-level fake"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: mean of each of
    ``dim`` byte stripes, scaled to [0,1]. Pure-bytes math → reproducible
    everywhere, and shaped exactly like a real feature vector. Stripe sums
    run as numpy C loops (exact integer sums — identical results to the
    pure-Python formulation, ~20× less Python-interpreter time per batch)."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    n = arr.shape[0]
    stripe = max(n // dim, 1)
    out = []
    for d in range(dim):
        chunk = arr[d * stripe : (d + 1) * stripe]
        if chunk.shape[0] == 0:
            chunk = arr[-stripe:]
        out.append(round(int(chunk.sum(dtype=np.int64)) / (chunk.shape[0] * 255.0), 6))
    return out


def extract_features(assets: DataFrame, dim: int = 8, with_feature: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: n_bytes, sha-256 checksum, and (when ``with_feature``)
    a ``dim``-wide feature vector (deterministic fake — see
    :func:`_fake_feature`). Spark cannot prune output columns *through* a
    ``mapInPandas`` kernel, so checksum-only callers pass
    ``with_feature=False`` to skip the per-byte feature work instead of
    computing and discarding it."""
    import hashlib

    schema = FEATURE_SCHEMA if with_feature else FEATURE_SCHEMA_NO_VECTOR

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            cols = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                "checksum": payloads.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            if with_feature:
                cols["feature"] = payloads.map(lambda b: _fake_feature(b, dim))
            yield pd.DataFrame(cols)

    return assets.mapInPandas(batches, schema=schema)


def resize_images(assets: DataFrame, max_px: int = 512) -> DataFrame:
    """STUB plumbing for image resize: passes payloads through an Arrow batch
    unchanged (a real kernel would decode→resize→re-encode per batch) and
    records the requested bound in ``resize_to``."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["resize_to"] = max_px
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(assets.schema.fields) + [T.StructField("resize_to", T.IntegerType())]
    )
    return assets.mapInPandas(batches, schema=schema)


FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_payload binary, frame_offset_ms int"


def sample_frames(assets: DataFrame, every_ms: int = 1000, frame_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video/audio assets: emit one row per
    sampled frame with a payload slice. The *decode* is a deterministic
    byte-slicing fake (no codecs in this container — a real kernel swaps in
    pyav/ffmpeg per batch); the Spark-side shape is the real one: one input
    asset row fans out to N frame rows inside a single Arrow batch, so
    downstream per-frame operators (feature extraction, dedup) see a plain
    distributed table keyed by (asset_id, frame_idx)."""

    import numpy as np

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    columns=["asset_id", "frame_idx", "frame_payload", "frame_offset_ms"]
                )
                continue
            # vectorized fan-out: compute per-asset frame counts, then build
            # the exploded frame table with numpy repeat/arange — batch-level
            # Python only; the per-frame byte slices are the one remaining
            # per-element op (they produce variable-length binary objects)
            payloads = pdf["payload"].map(lambda b: b or b"")
            plens = payloads.map(len).to_numpy(dtype=np.int64)
            durations = pdf["duration_ms"].fillna(0).to_numpy(dtype=np.int64)
            durations = np.where(durations > 0, durations, np.maximum(plens, 1))
            n_frames = np.maximum(durations // every_ms, 1).astype(np.int64)

            row_pos = np.repeat(np.arange(len(pdf)), n_frames)
            frame_idx = np.concatenate([np.arange(n) for n in n_frames])
            starts = np.where(
                plens[row_pos] > 0, (frame_idx * frame_bytes) % np.maximum(plens[row_pos], 1), 0
            )
            pay = payloads.to_numpy(dtype=object)[row_pos]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy()[row_pos],
                    "frame_idx": frame_idx.astype(np.int32),
                    "frame_payload": [
                        bytes(p[s : s + frame_bytes]) for p, s in zip(pay, starts)
                    ],
                    "frame_offset_ms": (frame_idx * every_ms).astype(np.int32),
                }
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec: uncompressed WAV / PCM16 (RIFF), pure struct — no external
# library. Compressed formats (JPEG/MP3/H.264) stay gated on codec libs;
# this is the genuine decode path for the one media family the standard
# library can handle, and it exercises everything a real decoder must do:
# magic validation, chunk walking, format gating, frame unpacking.
# ---------------------------------------------------------------------------

WAV_FEATURE_SCHEMA = (
    "asset_id bigint, sample_rate int, n_samples int, duration_ms int, "
    "peak_abs int, rms double"
)


def encode_wav_pcm16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: mono PCM16LE. Inverse of
    :func:`decode_wav_pcm16` (roundtrip pinned by pytest)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[int, list[int]]:
    """REAL RIFF/WAVE parser (not a fake): validates magics, walks chunks
    (word-aligned, unknown chunks skipped), gates on mono PCM16, unpacks
    frames. Returns (sample_rate, samples). Raises ``ValueError`` on
    malformed or unsupported payloads — corrupt assets surface as data
    errors, not silent garbage."""
    import struct

    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF file: too short")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: format={audio_format} channels={channels} bits={bits} "
            "(only mono PCM16)"
        )
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return rate, samples


def wav_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction via the REAL decoder:
    sample_rate, sample count, exact integer duration, peak amplitude, and
    6-dp RMS per asset. Any payload :func:`decode_wav_pcm16` rejects fails
    the task loudly (data error, not a skip)."""
    import math

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("asset_id", "sample_rate", "n_samples", "duration_ms", "peak_abs", "rms")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, samples = decode_wav_pcm16(payload)
                n = len(samples)
                ss = sum(s * s for s in samples)
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak_abs"].append(max((abs(s) for s in samples), default=0))
                out["rms"].append(round(math.sqrt(ss / n), 6) if n else 0.0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


def synthesize_wav_assets(
    ids: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic WAV corpus for the encode→decode certification loop:
    asset ``i`` carries ``100 + i % 50`` samples with
    ``sample[j] = ((i*31 + j*17) % 2048) - 1024`` — integer math an SQL
    oracle reproduces exactly, serialized through the REAL encoder so the
    decoder is tested against genuine RIFF bytes."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "asset_id": ids_,
                    "payload": [
                        encode_wav_pcm16(
                            [
                                ((i * 31 + j * 17) % 2048) - 1024
                                for j in range(100 + i % 50)
                            ],
                            sample_rate,
                        )
                        for i in ids_
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(batches, schema="asset_id bigint, payload binary")


# ---------------------------------------------------------------------------
# Real codec: uncompressed 24-bit BMP — the image twin of the WAV path.
# Exercises the quirks a real image decoder must get right: bottom-up row
# order, 4-byte row padding, pixel-array offset indirection, BGR ordering.
# ---------------------------------------------------------------------------

BMP_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double"
)


def encode_bmp24(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Minimal BMP writer: 24bpp uncompressed, BITMAPINFOHEADER. ``pixels``
    is top-down row-major (r, g, b); the file stores bottom-up BGR rows
    padded to 4 bytes, as the format requires."""
    import struct

    row_size = (3 * width + 3) // 4 * 4
    img = bytearray()
    for y in reversed(range(height)):
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        img += row
    off = 14 + 40
    data_size = row_size * height
    return (
        b"BM"
        + struct.pack("<IHHI", off + data_size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0)
        + bytes(img)
    )


def decode_bmp24(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """REAL BMP parser: validates the magic, follows the pixel-array offset,
    gates on 24bpp uncompressed, un-pads and re-orders bottom-up BGR rows
    (top-down negative-height images handled too). Returns (width, height,
    top-down row-major (r, g, b) pixels); raises ``ValueError`` on
    malformed or unsupported payloads."""
    import struct

    if payload is None or len(payload) < 54:
        raise ValueError("not a BMP file: too short")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, width, height_raw = struct.unpack("<Iii", payload[14:26])
    planes, bits, compression = struct.unpack("<HHI", payload[26:34])
    if hdr_size < 40 or planes != 1 or bits != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: header={hdr_size} planes={planes} bits={bits} "
            f"compression={compression} (only 24bpp uncompressed)"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    row_size = (3 * width + 3) // 4 * 4
    if data_off + row_size * height > len(payload):
        raise ValueError("truncated BMP pixel array")
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = data_off + src_y * row_size
        row = payload[base : base + 3 * width]
        pixels.extend((row[3 * x + 2], row[3 * x + 1], row[3 * x]) for x in range(width))
    return width, height, pixels


def bmp_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction via the REAL BMP decoder:
    dimensions and exact per-channel means (6 dp)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("asset_id", "width", "height", "n_pixels", "mean_r", "mean_g", "mean_b")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_bmp24(payload)
                n = w * h
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(n)
                for idx, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[key].append(round(sum(p[idx] for p in px) / n, 6) if n else 0.0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=BMP_FEATURE_SCHEMA)


def synthesize_bmp_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP corpus for the encode→decode certification loop:
    asset ``i`` is ``(4 + i%5) × (3 + i%4)`` with pixel ``p = y*W + x``
    colored ``((i + 13p) % 256, (2i + 7p) % 256, (3i + 11p) % 256)`` —
    integer math an SQL oracle reproduces exactly, serialized through the
    REAL encoder (bottom-up rows, padding) so the decoder faces genuine
    BMP bytes."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            payloads = []
            for i in ids_:
                w, h = 4 + i % 5, 3 + i % 4
                px = [
                    ((i + 13 * p) % 256, (2 * i + 7 * p) % 256, (3 * i + 11 * p) % 256)
                    for p in range(w * h)
                ]
                payloads.append(encode_bmp24(w, h, px))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return ids.select(id_col).mapInPandas(batches, schema="asset_id bigint, payload binary")


def resize_bmp(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize for the uncompressed family: decode each BMP,
    nearest-neighbor resample to ``out_w × out_h`` (source pixel of output
    ``(x, y)`` is ``(x*W div out_w, y*H div out_h)`` — integer math, so an
    SQL oracle replays the exact sampling grid), re-encode. One Arrow batch
    in, one out; the codec quirks (padding, row order) are exercised twice
    per asset."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_, payloads = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_bmp24(payload)
                out = [
                    px[(y * h // out_h) * w + (x * w // out_w)]
                    for y in range(out_h)
                    for x in range(out_w)
                ]
                ids_.append(aid)
                payloads.append(encode_bmp24(out_w, out_h, out))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return assets.mapInPandas(batches, schema="asset_id bigint, payload binary")


# ---------------------------------------------------------------------------
# Real codec: PNG (RGB8) — the COMPRESSED image path, still pure stdlib:
# zlib handles the DEFLATE stream, this module implements the container
# (signature, chunk walk with CRC validation) and the predictive scanline
# filters (None/Sub/Up/Average/Paeth) both directions. The encoder cycles
# filter types across scanlines so every roundtrip exercises every unfilter
# branch. JPEG/MP3/H.264 remain honestly gated on codec libraries.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to the
    linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward scanline filter (encoder side)."""
    n = len(line)
    if ftype == 0:
        return bytes(line)
    out = bytearray(n)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter_line(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """In-place scanline unfilter (decoder side) — exact inverse of
    :func:`_png_filter_line`."""
    if ftype == 0:
        return
    n = len(line)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        line[i] = (line[i] + pred) & 0xFF


def encode_png(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Minimal PNG writer: 8-bit RGB (color type 2), non-interlaced.
    ``pixels`` is top-down row-major (r, g, b). Scanline ``y`` uses filter
    type ``(3*y + 1) % 5`` — a fixed cycle hitting Sub/Paeth/Up on even the
    shortest images, so a decode roundtrip exercises every unfilter branch,
    not just the trivial one."""
    import struct
    import zlib

    bpp = 3
    raw = bytearray()
    prev = bytes(bpp * width)
    for y in range(height):
        line = bytes(
            v for x in range(width) for v in pixels[y * width + x]
        )
        ftype = (3 * y + 1) % 5
        raw.append(ftype)
        raw += _png_filter_line(ftype, line, prev, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """REAL PNG decoder on the standard library alone: validates the
    signature, walks chunks verifying every CRC, gates on 8-bit RGB
    non-interlaced, inflates the concatenated IDAT stream with zlib, and
    reverses the predictive scanline filters (None/Sub/Up/Average/Paeth).
    Returns (width, height, top-down row-major (r, g, b) pixels); raises
    ``ValueError`` on malformed or unsupported payloads — corrupt assets
    surface as data errors, not silent garbage."""
    import struct
    import zlib

    if payload is None or len(payload) < len(_PNG_SIG) + 12:
        raise ValueError("not a PNG file: too short")
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file: bad signature")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            if ihdr is None:
                raise ValueError("IDAT before IHDR")
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not seen_end:
        raise ValueError("truncated PNG: missing IHDR/IEND chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} compression={comp} "
            f"filter={filt} interlace={interlace} (only 8-bit RGB, non-interlaced)"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    bpp = 3
    stride = bpp * width
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {height * (1 + stride)}"
        )
    pixels: list[tuple[int, int, int]] = []
    prev = bytes(stride)
    for y in range(height):
        base = y * (1 + stride)
        line = bytearray(raw[base + 1 : base + 1 + stride])
        _png_unfilter_line(raw[base], line, prev, bpp)
        pixels.extend(
            (line[3 * x], line[3 * x + 1], line[3 * x + 2]) for x in range(width)
        )
        prev = bytes(line)
    return width, height, pixels


PNG_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double, compressed_bytes int"
)


def png_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction via the REAL PNG decoder:
    dimensions, exact per-channel means (6 dp), and the compressed payload
    size (the one column a compressed format adds over BMP)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "compressed_bytes")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_png(payload)
                n = w * h
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(n)
                for idx, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[key].append(round(sum(p[idx] for p in px) / n, 6) if n else 0.0)
                out["compressed_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=PNG_FEATURE_SCHEMA)


def synthesize_png_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG corpus for the encode→decode certification loop:
    asset ``i`` is ``(4 + i%6) × (3 + i%5)`` with pixel ``p = y*W + x``
    colored ``((5i + 19p) % 256, (7i + 23p) % 256, (11i + 29p) % 256)`` —
    integer math an SQL oracle reproduces exactly, serialized through the
    REAL encoder (DEFLATE + cycling scanline filters) so the decoder faces
    genuine compressed PNG bytes and every unfilter branch runs."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            payloads = []
            for i in ids_:
                w, h = 4 + i % 6, 3 + i % 5
                px = [
                    ((5 * i + 19 * p) % 256, (7 * i + 23 * p) % 256, (11 * i + 29 * p) % 256)
                    for p in range(w * h)
                ]
                payloads.append(encode_png(w, h, px))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return ids.select(id_col).mapInPandas(batches, schema="asset_id bigint, payload binary")


def resize_png(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL resize through the compressed path: decode each PNG (inflate +
    unfilter), nearest-neighbor resample with the same integer sampling grid
    as :func:`resize_bmp`, re-encode (filter + deflate). One Arrow batch in,
    one out; the full compress/decompress cycle runs twice per asset."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_, payloads = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_png(payload)
                out = [
                    px[(y * h // out_h) * w + (x * w // out_w)]
                    for y in range(out_h)
                    for x in range(out_w)
                ]
                ids_.append(aid)
                payloads.append(encode_png(out_w, out_h, out))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return assets.mapInPandas(batches, schema="asset_id bigint, payload binary")


def resample_wav(assets: DataFrame, out_rate: int) -> DataFrame:
    """REAL audio resample through the codec: decode each WAV,
    nearest-sample resample to ``out_rate`` (output sample ``j`` takes
    input sample ``j*in_rate div out_rate`` — the audio twin of
    nearest-neighbor image resize, integer math an SQL oracle replays
    exactly), re-encode at the new rate. One Arrow batch in, one out; the
    RIFF container is parsed and rebuilt per asset."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_, payloads = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                in_rate, samples = decode_wav_pcm16(payload)
                n_out = len(samples) * out_rate // in_rate
                out = [samples[j * in_rate // out_rate] for j in range(n_out)]
                ids_.append(aid)
                payloads.append(encode_wav_pcm16(out, out_rate))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return assets.mapInPandas(batches, schema="asset_id bigint, payload binary")


WAV_FRAME_SCHEMA = "asset_id bigint, frame_idx int, n_samples int, peak_abs int, rms double"


def wav_frame_features(assets: DataFrame, frame_len: int = 32) -> DataFrame:
    """REAL audio frame sampling: decode each WAV, split the PCM stream
    into fixed ``frame_len``-sample windows (last window ragged), emit one
    row per frame with peak and 6-dp RMS — the frame-granular feature table
    a speech/audio pipeline feeds downstream. One asset row fans out to its
    frames inside a single Arrow batch."""
    import math

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("asset_id", "frame_idx", "n_samples", "peak_abs", "rms")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _rate, samples = decode_wav_pcm16(payload)
                for f in range((len(samples) + frame_len - 1) // frame_len):
                    win = samples[f * frame_len : (f + 1) * frame_len]
                    ss = sum(s * s for s in win)
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(f)
                    out["n_samples"].append(len(win))
                    out["peak_abs"].append(max((abs(s) for s in win), default=0))
                    out["rms"].append(round(math.sqrt(ss / len(win)), 6) if win else 0.0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=WAV_FRAME_SCHEMA)


#: DFT window for :func:`wav_spectrum_features` and the quantized cos/sin
#: lookup tables shared verbatim with the SQL oracle (scaled to 1e9 integers
#: so every spectral sum is EXACT integer arithmetic — the same
#: literal-table trick the entropy query uses for ln(); a libm-vs-JVM 1-ulp
#: transcendental divergence cannot exist when neither engine calls cos()).
SPECTRUM_N = 64
_COSQ = [
    round(math.cos(2.0 * math.pi * m / SPECTRUM_N) * 1e9) for m in range(SPECTRUM_N)
]
_SINQ = [
    round(math.sin(2.0 * math.pi * m / SPECTRUM_N) * 1e9) for m in range(SPECTRUM_N)
]

WAV_SPECTRUM_SCHEMA = (
    "asset_id bigint, bin_k int, c_k double, s_k double, power_k double"
)


def wav_spectrum_features(
    assets: DataFrame, bins: tuple[int, ...] = (1, 2, 4, 8)
) -> DataFrame:
    """Spectral features through the REAL WAV decoder: DFT cosine/sine
    sums (Goertzel-style single bins) of each asset's first
    ``SPECTRUM_N`` samples at the requested bin frequencies — the
    tone/bandwidth fingerprint an audio-curation pipeline uses to screen
    silence, hum, and clipping.

    Determinism by construction: the cos/sin coefficients are the shared
    1e9-quantized integer tables, so C_k = Σ smp_j·cosq[(k·j) mod N] is an
    exact bigint in BOTH engines (|C| ≤ 1024·1e9·64 < 2⁵³, so the final
    int→double rescale and the power combination are identical IEEE ops —
    no rounding needed anywhere). One Arrow batch per partition; the fan-out
    is |bins| rows per asset."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("asset_id", "bin_k", "c_k", "s_k", "power_k")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _rate, samples = decode_wav_pcm16(payload)
                win = samples[:SPECTRUM_N]
                if len(win) < SPECTRUM_N:
                    raise ValueError(
                        f"asset {aid}: {len(win)} samples < window {SPECTRUM_N}"
                    )
                for k in bins:
                    cq = sum(
                        s * _COSQ[(k * j) % SPECTRUM_N] for j, s in enumerate(win)
                    )
                    sq = sum(
                        s * _SINQ[(k * j) % SPECTRUM_N] for j, s in enumerate(win)
                    )
                    cd, sd = float(cq), float(sq)
                    out["asset_id"].append(aid)
                    out["bin_k"].append(k)
                    out["c_k"].append(cd / 1e9)
                    out["s_k"].append(sd / 1e9)
                    out["power_k"].append((cd * cd + sd * sd) / 1e18)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=WAV_SPECTRUM_SCHEMA)


# ---------------------------------------------------------------------------
# Real codec: GIF89a (animated, palette-indexed) — the MULTI-FRAME container
# path, pure stdlib including the compression: this module implements GIF's
# variable-width LZW in BOTH directions (bit-packed LSB-first, CLEAR/EOI
# codes, width growth at dictionary boundaries, 4096-entry reset, the KwKwK
# special case), the container walk (logical screen descriptor, global +
# local color tables, graphic-control extensions carrying per-frame delays,
# sub-block framing), and 4-pass interlace row order on decode. An animated
# GIF is the honest stand-in for video sampling: a real compressed container
# with N timed frames. JPEG/MP3/H.264 remain gated on codec libraries.
# ---------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """GIF variable-width LZW. Width grows when the next free code reaches
    the current width's capacity (mirrored exactly by the decoder, so the
    bit streams stay aligned); at 4096 entries a CLEAR is emitted and the
    dictionary resets."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, cs = reset()
    emit(clear, cs)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], cs)
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
            if nxt == (1 << cs) and cs < 12:
                cs += 1
        else:
            emit(clear, cs)
            table, nxt, cs = reset()
        w = (k,)
    if w:
        emit(table[w], cs)
    emit(eoi, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`_lzw_compress`; also accepts any spec-conforming
    GIF LZW stream (handles KwKwK, deferred clears, full-table streams)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: dict[int, tuple[int, ...]] = {}
    out: list[int] = []
    cs = min_code_size + 1
    nxt = eoi + 1
    prev: tuple[int, ...] | None = None
    while True:
        code = read(cs)
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            cs, nxt, prev = min_code_size + 1, eoi + 1, None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("GIF: first code after clear not a literal")
            entry = (code,)
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"GIF: code {code} beyond dictionary ({nxt})")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + (entry[0],)
            nxt += 1
        # "early change": the decoder's table lags the encoder's by one
        # entry at every stream position (the encoder adds on emit, the
        # decoder on the NEXT read), so the decoder must widen one entry
        # before its own table hits the boundary to stay bit-aligned
        if nxt == (1 << cs) - 1 and cs < 12:
            cs += 1
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[int]],
    delays_cs: list[int],
) -> bytes:
    """GIF89a writer: global color table (padded to a power of two),
    graphic-control extension per frame (delay in centiseconds), full-frame
    non-interlaced image descriptors, REAL LZW-compressed index streams."""
    import struct

    n = max(2, len(palette))
    depth = max(1, (n - 1).bit_length())
    size = 1 << depth
    pal = list(palette) + [(0, 0, 0)] * (size - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for rgb in pal:
        out += bytes(rgb)
    mcs = max(2, depth)
    for idx, frame in zip(delays_cs, frames):
        out += bytes([0x21, 0xF9, 4, 0, idx & 0xFF, (idx >> 8) & 0xFF, 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
        out.append(mcs)
        out += _gif_subblocks(_lzw_compress(frame, mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[tuple[int, int, int, int, int, list[int]]]]:
    """GIF parser: validates the magic, walks the logical screen descriptor,
    color tables, extensions (per-frame delay from graphic-control, other
    extensions skipped by sub-block framing) and image descriptors,
    LZW-decompresses every frame, and undoes 4-pass interlacing when the
    descriptor says so. Returns ``(width, height, global_palette,
    [(left, top, fw, fh, delay_cs, indices), ...])``."""
    import struct

    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF: truncated or corrupt ({e})") from e


def _decode_gif(payload: bytes):
    import struct

    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF: bad magic")
    W, H, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(size)]
        pos += 3 * size
    frames = []
    delay = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            return W, H, palette, frames
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                delay = payload[pos + 2] | (payload[pos + 3] << 8)
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if iflags & 0x80:  # local color table (skipped: indices returned)
            pos += 3 * (2 << (iflags & 0x07))
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idxs = _lzw_decompress(bytes(data), mcs)
        if len(idxs) < fw * fh:
            raise ValueError("GIF: frame pixel data short")
        idxs = idxs[: fw * fh]
        if iflags & 0x40:  # undo 4-pass interlace
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            rows = [idxs[r * fw : (r + 1) * fw] for r in range(fh)]
            deinter = [None] * fh
            for src, dst in enumerate(order):
                deinter[dst] = rows[src]
            idxs = [v for row in deinter for v in row]
        frames.append((left, top, fw, fh, delay, idxs))
        delay = 0


GIF_FRAME_SCHEMA = (
    "asset_id bigint, frame_idx int, delay_cs int, width int, height int, "
    "n_px int, max_idx int, sum_idx bigint"
)


def gif_frame_features(assets: DataFrame, every_n: int = 1) -> DataFrame:
    """Video-style frame sampling through the REAL animated-GIF decoder:
    each payload is parsed (container walk + LZW decompression per frame),
    every ``every_n``-th frame is kept, and integer-exact per-frame stats
    are emitted — the decode → frame-sample → featurize kernel of a video
    pipeline, with a genuinely compressed container standing in for the
    codec-library formats. One Arrow batch in, one out."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "frame_idx", "delay_cs", "width", "height",
                "n_px", "max_idx", "sum_idx")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _w, _h, _pal, frames = decode_gif(payload)
                for fi, (_l, _t, fw, fh, delay, idxs) in enumerate(frames):
                    if fi % every_n:
                        continue
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(fi)
                    out["delay_cs"].append(delay)
                    out["width"].append(fw)
                    out["height"].append(fh)
                    out["n_px"].append(fw * fh)
                    out["max_idx"].append(max(idxs) if idxs else 0)
                    out["sum_idx"].append(sum(idxs))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64" if k in ("asset_id", "sum_idx")
                              else "int32") for k, v in out.items()}
            )

    return assets.mapInPandas(batches, schema=GIF_FRAME_SCHEMA)


def synthesize_gif_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic animated-GIF corpus for the encode→decode loop: asset
    ``i`` is ``(5 + i%4) × (4 + i%3)`` with ``2 + i%3`` frames over a
    16-color palette; frame ``f`` pixel ``p`` has index
    ``(7i + 13f + 3p) % 16`` and delay ``4 + f`` cs — integer math an SQL
    oracle replays exactly, serialized through the REAL LZW encoder so the
    decoder faces genuine variable-width compressed streams."""
    pal = [((17 * c) % 256, (29 * c) % 256, (43 * c) % 256) for c in range(16)]

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            payloads = []
            for i in ids_:
                w, h = 5 + i % 4, 4 + i % 3
                nf = 2 + i % 3
                frames = [
                    [(7 * i + 13 * f + 3 * p) % 16 for p in range(w * h)]
                    for f in range(nf)
                ]
                payloads.append(encode_gif(w, h, pal, frames, [4 + f for f in range(nf)]))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return ids.select(id_col).mapInPandas(batches, schema="asset_id bigint, payload binary")


BMP_AHASH_SCHEMA = (
    "asset_id bigint, width int, height int, ahash4 int, gray_sum bigint"
)


def bmp_ahash(assets: DataFrame) -> DataFrame:
    """Perceptual average-hash through the REAL BMP decoder: the image is
    split into a 2×2 block grid (left/top blocks take the floor half on
    odd dimensions), each block's bit is 1 when its mean luma exceeds the
    image mean, packed LSB-first as bit (by*2 + bx). Near-duplicate images
    collide on ahash4; any pixel-level edit flips bits — the cheap
    screen-before-expensive-verify used in image dedup pipelines.

    Exactness: luma is the integer per-mil BT.601 weighting
    (299 R + 587 G + 114 B), and every mean comparison is CROSS-MULTIPLIED
    (block_sum * n_total > total_sum * n_block) — pure BIGINT ordering, no
    division, no float anywhere, so the hash is bit-stable by
    construction. Arrow-batched mapInPandas like every multimodal kernel;
    shuffle-free (one pass over payloads)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("asset_id", "width", "height", "ahash4", "gray_sum")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_bmp24(payload)
                gray = [299 * r + 587 * g + 114 * b for (r, g, b) in px]
                total = sum(gray)
                n = w * h
                bs = [[0, 0], [0, 0]]
                bn = [[0, 0], [0, 0]]
                for p, gv in enumerate(gray):
                    bx = 0 if (p % w) < (w // 2) else 1
                    by = 0 if (p // w) < (h // 2) else 1
                    bs[by][bx] += gv
                    bn[by][bx] += 1
                code = 0
                for by in range(2):
                    for bx in range(2):
                        if bs[by][bx] * n > total * bn[by][bx]:
                            code |= 1 << (by * 2 + bx)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash4"].append(code)
                out["gray_sum"].append(total)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=BMP_AHASH_SCHEMA)


BMP_PATCH_SCHEMA = "asset_id bigint, py int, px int, n_px bigint, luma_sum bigint"


def bmp_patches(assets: DataFrame, patch: int = 2) -> DataFrame:
    """ViT-style patchify through the REAL BMP decoder: tile each image
    into non-overlapping ``patch×patch`` grids (partial edge tiles
    dropped, the standard crop-to-multiple preprocessing), emitting one
    row per patch with its grid coordinates, pixel count, and exact
    integer BT.601 luma sum (299R + 587G + 114B per mil) — the token
    grid a vision transformer embeds, with the sum left unreduced so
    downstream normalization stays in exact integers.

    Scale shape: one Arrow-batched ``mapInPandas`` pass over payloads
    (shuffle-free); output is (pixels/patch²) rows per asset — a bounded
    constant-factor fan-out, partitioned exactly like the input
    payloads. The decode is the pure-stdlib BMP codec; no pixel array
    ever crosses the driver."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("asset_id", "py", "px", "n_px", "luma_sum")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_bmp24(payload)
                fw, fh = (w // patch) * patch, (h // patch) * patch
                sums: dict[tuple[int, int], int] = {}
                cnts: dict[tuple[int, int], int] = {}
                for p, (r, g, b) in enumerate(px):
                    x, y = p % w, p // w
                    if x >= fw or y >= fh:
                        continue
                    key = (y // patch, x // patch)
                    sums[key] = sums.get(key, 0) + 299 * r + 587 * g + 114 * b
                    cnts[key] = cnts.get(key, 0) + 1
                for (py_, px_), s in sorted(sums.items()):
                    out["asset_id"].append(aid)
                    out["py"].append(py_)
                    out["px"].append(px_)
                    out["n_px"].append(cnts[(py_, px_)])
                    out["luma_sum"].append(s)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=BMP_PATCH_SCHEMA)


GIF_MOTION_SCHEMA = (
    "asset_id bigint, frame_idx int, n_px int, changed_px int, motion_sum bigint"
)


def gif_motion_energy(assets: DataFrame) -> DataFrame:
    """Motion energy between CONSECUTIVE frames through the real
    animated-GIF decoder — the shot-boundary / static-clip detector of a
    video curation pipeline: for each frame pair (f-1, f) emit the count
    of changed pixels and the exact integer sum of |Δluma| across the
    frame, with luma the per-mil BT.601 weighting of the palette color
    (299R + 587G + 114B). High motion_sum = cut or fast motion; zero =
    duplicated frame (the video-level exact-dup signal).

    One Arrow-batched ``mapInPandas`` pass (shuffle-free); output rows =
    frames-1 per asset. Every quantity is an exact integer — an SQL
    oracle replays the palette arithmetic bit-for-bit."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "frame_idx", "n_px", "changed_px", "motion_sum")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _w, _h, pal, frames = decode_gif(payload)
                luma = [299 * r + 587 * g + 114 * b for (r, g, b) in pal]
                prev = None
                for fi, (_l, _t, fw, fh, _delay, idxs) in enumerate(frames):
                    if prev is not None:
                        changed = sum(1 for a, b in zip(prev, idxs) if a != b)
                        motion = sum(
                            abs(luma[a] - luma[b]) for a, b in zip(prev, idxs)
                        )
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(fi)
                        out["n_px"].append(fw * fh)
                        out["changed_px"].append(changed)
                        out["motion_sum"].append(motion)
                    prev = idxs
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64" if k in ("asset_id", "motion_sum")
                              else "int32") for k, v in out.items()}
            )

    return assets.mapInPandas(batches, schema=GIF_MOTION_SCHEMA)


BMP_EDGE_SCHEMA = (
    "asset_id bigint, width int, height int, "
    "h_energy bigint, v_energy bigint, n_h_pairs bigint, n_v_pairs bigint"
)


def bmp_edge_energy(assets: DataFrame) -> DataFrame:
    """Integer gradient energy through the REAL BMP decoder — the
    blur/complexity screen of an image curation pipeline (near-zero energy
    = flat/blank frame, extreme energy = noise): per image, the exact sums
    of |Δluma| across horizontally and vertically adjacent pixel pairs,
    with luma the per-mil BT.601 weighting (299R + 587G + 114B). Every
    quantity is an exact integer — an SQL oracle replays the pixel
    arithmetic bit-for-bit.

    One Arrow-batched ``mapInPandas`` pass over payloads (shuffle-free);
    output is one row per asset; no pixel array crosses the driver."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "width", "height",
                "h_energy", "v_energy", "n_h_pairs", "n_v_pairs")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_bmp24(payload)
                gray = [299 * r + 587 * g + 114 * b for (r, g, b) in px]
                he = ve = 0
                for p, gv in enumerate(gray):
                    if (p % w) < w - 1:
                        he += abs(gray[p + 1] - gv)
                    if (p // w) < h - 1:
                        ve += abs(gray[p + w] - gv)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["h_energy"].append(he)
                out["v_energy"].append(ve)
                out["n_h_pairs"].append((w - 1) * h)
                out["n_v_pairs"].append(w * (h - 1))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=BMP_EDGE_SCHEMA)


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT, grayscale) — pure stdlib + numpy
# --------------------------------------------------------------------------
# The last gap in the codec matrix: a REAL baseline JPEG encoder/decoder
# with no codec library — canonical Huffman entropy coding (the spec's
# Annex K luminance tables), zigzag run-length AC coding, byte stuffing,
# dequantization and a float IDCT (numpy matrix form of the separable
# 8×8 DCT-II). Grayscale (one component) keeps the certified path free of
# YCbCr rounding; the certified corpus is block-constant, where the
# DC-only transform with quantizer step 8 is EXACT (see
# synthesize_jpeg_assets), so an SQL oracle re-derives every decoded
# pixel. Arbitrary images take the same code path lossily (pytest covers
# the general path with an error bound).

#: zigzag scan order: _JPEG_ZIGZAG[k] = natural index of the k-th coefficient
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.3.3.1 luminance DC table: counts per code length 1..16, values
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))

#: Annex K.3.3.2 luminance AC table
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: quantization table (natural order): DC step 8 — EXACT for the
#: block-constant certified corpus (8·(v−128)/8 = v−128) — AC step 16
_JPEG_QTABLE = [8] + [16] * 63


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Decoder-side map: (length, code) → value."""
    return {(l, c): v for v, (c, l) in _jpeg_huff_codes(bits, vals).items()}


def _dct_matrix():
    """Orthonormal 8×8 DCT-II matrix A: F = A·f·Aᵀ is the T.81 FDCT,
    f = Aᵀ·F·A the IDCT. Built from math.cos once per process."""
    import numpy as np

    a = np.empty((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


_DCT_A = None


def _dct_a():
    global _DCT_A
    if _DCT_A is None:
        _DCT_A = _dct_matrix()
    return _DCT_A


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data, un-stuffing FF 00."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream at FF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker FF{marker:02X} inside entropy data"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lookup: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            v = lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map `size` raw amplitude bits to the signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def encode_jpeg_gray(width: int, height: int, pixels: list[int]) -> bytes:
    """Baseline-sequential JPEG encoder (T.81, SOF0), single grayscale
    component, no subsampling: edge-replicated 8×8 blocks, float FDCT,
    quantization on :data:`_JPEG_QTABLE`, zigzag run-length AC coding and
    differential DC coding through the Annex K luminance Huffman tables,
    with byte stuffing. ``pixels`` is top-down row-major grayscale 0-255."""
    import struct

    import numpy as np

    bw, bh = (width + 7) // 8, (height + 7) // 8
    # edge-replicated padded plane, level-shifted
    plane = np.empty((bh * 8, bw * 8))
    for y in range(bh * 8):
        sy = min(y, height - 1)
        row = pixels[sy * width : (sy + 1) * width]
        plane[y, :width] = row
        plane[y, width:] = row[-1]
    plane -= 128.0

    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            f = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            prev_dc = _jpeg_encode_block(w, f, prev_dc, dc_codes, ac_codes, _JPEG_QTABLE)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = bytes(_JPEG_QTABLE[_JPEG_ZIGZAG[k]] for k in range(64))
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFDB, bytes([0x00]) + qz)  # DQT, 8-bit table 0
        + seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"  # EOI
    )


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL baseline JPEG decoder (stdlib + numpy): walks the marker
    segments (SOI/DQT/SOF0/DHT/SOS/EOI), rebuilds the canonical Huffman
    tables from their BITS/HUFFVAL serialization, entropy-decodes the
    differential-DC / run-length-AC coefficient stream (un-stuffing
    FF 00), dequantizes on the transmitted table, applies the float IDCT
    and level shift, and crops the edge-padded plane to (width, height).
    Gates on baseline/8-bit/1-component; raises ``ValueError`` on
    malformed payloads — corrupt assets surface as data errors."""
    import numpy as np

    qtables, dc_lookup, ac_lookup, comps, width, height, scan, data_pos = (
        _jpeg_parse_segments(payload)
    )
    if len(comps) != 1 or len(scan) != 1:
        raise ValueError(
            f"unsupported JPEG: {len(comps)} components (baseline grayscale only)"
        )
    cid, sampling, tq = comps[0]
    if sampling != 0x11:
        raise ValueError("subsampling not supported for 1-component scan")
    _, td, ta = scan[0]
    if tq not in qtables:
        raise ValueError(f"missing quant table {tq}")
    if td not in dc_lookup or ta not in ac_lookup:
        raise ValueError("missing Huffman table for scan")
    qt = qtables[tq]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    plane = np.empty((bh * 8, bw * 8))
    r = _JpegBitReader(payload, data_pos)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            f, prev_dc = _jpeg_read_block(r, dc_lookup[td], ac_lookup[ta], prev_dc, qt)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = f
    out = np.clip(np.round(plane[:height, :width] + 128.0), 0, 255).astype(int)
    return width, height, [int(v) for v in out.ravel()]


JPEG_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "mean_gray double, compressed_bytes int"
)


def jpeg_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via the REAL baseline JPEG decoder:
    dimensions, exact grayscale mean (6 dp), compressed payload size."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "mean_gray", "compressed_bytes")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_jpeg_gray(payload)
                n = w * h
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(n)
                out["mean_gray"].append(round(sum(px) / n, 6) if n else 0.0)
                out["compressed_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=JPEG_FEATURE_SCHEMA)


def synthesize_jpeg_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic JPEG corpus for the encode→decode certification loop:
    asset ``i`` is ``(8 + i%8) × (8 + i%5)`` grayscale where every pixel of
    8×8 block ``(bx, by)`` holds ``(3i + 7·bx + 11·by) % 256``. On
    block-constant input the DCT has ONLY the DC coefficient, and with DC
    quantizer step 8 the chain 8·(v−128) → /8 → round → ·8 → /8 is exact
    (AC coefficients are analytically zero; their ~1e-13 float residue
    quantizes to zero), so decode returns the source pixels EXACTLY and
    an SQL oracle re-derives them — while the bitstream still exercises
    differential DC Huffman coding across blocks, EOB, byte stuffing and
    edge-replicated padding (partial blocks stay constant because the pad
    replicates the block's own edge)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            payloads = []
            for i in ids_:
                # w stops at 15: no reachable w·h is 2^7·5^k, the class
                # where an odd pixel sum lands exactly on a 6-dp half
                # boundary and Python/DuckDB round() could fork
                w, h = 8 + i % 8, 8 + i % 5
                px = [
                    (3 * i + 7 * (x // 8) + 11 * (y // 8)) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(encode_jpeg_gray(w, h, px))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    return ids.select(id_col).mapInPandas(batches, schema="asset_id bigint, payload binary")

# --------------------------------------------------------------------------
# Baseline COLOR JPEG (T.81 sequential DCT, YCbCr 4:2:0) — pure stdlib+numpy
# --------------------------------------------------------------------------
# The next honest codec increment over the r9 grayscale codec: 3-component
# interleaved MCUs (4 Y blocks + Cb + Cr per 16×16 MCU), separate
# luminance/chrominance Huffman tables (Annex K.3.3), per-component
# differential DC prediction, 2×2-mean chroma subsampling at encode and
# nearest-neighbour upsampling at decode, and the JFIF RGB↔YCbCr color
# transform written in EXACT form (1/1.772 = 250/443, 1/1.402 = 500/701;
# G recovered from the Y definition itself rather than the JFIF Annex's
# 6-digit-truncated 0.344136/0.714136 constants, so the float inverse is
# the true matrix inverse to ~1e-13).
#
# Certification path (multimodal_jpeg_color_roundtrip): on an
# MCU-constant corpus every block is DC-only and the DC quantizer step 8
# makes quantization a plain nearest-integer rounding of the (real-valued)
# YCbCr channel, so the decoded RGB of each palette color is a CLOSED-FORM
# function of the source color — computed independently with
# exact-fraction arithmetic at import time (_jpeg_color_decode_exact) and
# embedded in the SQL oracle as a literal LUT. Palette entries are
# screened so every rounding site sits ≥1e-3 from a half-integer
# (float error ~1e-12 can never flip a round), making the lossy decode
# bit-deterministic and engine-independent.

#: Annex K.3.3.1 chrominance DC table
_JPEG_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_C = list(range(12))

#: Annex K.3.3.2 chrominance AC table
_JPEG_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_JPEG_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
assert sum(_JPEG_AC_BITS_C) == len(_JPEG_AC_VALS_C) == 162
assert sum(_JPEG_DC_BITS_C) == len(_JPEG_DC_VALS_C) == 12

#: chrominance quantization table (slot 1): same DC-step-8 grid as luma so
#: the block-constant exactness argument holds for chroma too
_JPEG_QTABLE_C = list(_JPEG_QTABLE)


def _jpeg_encode_block(w: "_JpegBitWriter", blk, prev_dc: int,
                       dc_codes: dict, ac_codes: dict, qt: list[int]) -> int:
    """FDCT + quantize + entropy-code ONE level-shifted 8×8 block (shared
    by the gray and color encoders); returns the block's quantized DC for
    the component's differential predictor."""
    a = _dct_a()
    coef = a @ blk @ a.T
    q = [
        int(round(coef.flat[_JPEG_ZIGZAG[k]] / qt[_JPEG_ZIGZAG[k]]))
        for k in range(64)
    ]
    diff = q[0] - prev_dc
    size = abs(diff).bit_length()
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        w.put(amp, size)
    run = 0
    for k in range(1, 64):
        v = q[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL: 16 zeros
            w.put(zc, zl)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        w.put(code, length)
        amp = v if v > 0 else v + (1 << size) - 1
        w.put(amp, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.put(ec, el)
    return q[0]


def _jpeg_read_block(r: "_JpegBitReader", dc_lu: dict, ac_lu: dict,
                     prev_dc: int, qt: list[int]):
    """Entropy-decode + dequantize + IDCT one block (shared by the gray
    and color decoders); returns (8×8 level-shifted float block, new DC
    predictor)."""
    import numpy as np

    zz = [0] * 64
    size = r.huff(dc_lu)
    prev_dc += _jpeg_extend(r.bits(size), size)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = r.huff(ac_lu)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _jpeg_extend(r.bits(size), size)
        k += 1
    coef = np.zeros((8, 8))
    for k in range(64):
        if zz[k]:
            nat = _JPEG_ZIGZAG[k]
            coef.flat[nat] = zz[k] * qt[nat]
    a = _dct_a()
    return a.T @ coef @ a, prev_dc


def _jpeg_pad_replicate(arr, mult: int):
    """Edge-replicate a (H, W[, C]) array up to multiples of ``mult``."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ph = (h + mult - 1) // mult * mult
    pw = (w + mult - 1) // mult * mult
    if ph == h and pw == w:
        return arr
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, mode="edge")


def encode_jpeg_color(
    width: int, height: int, pixels: list[tuple[int, int, int]]
) -> bytes:
    """Baseline-sequential COLOR JPEG encoder (T.81 SOF0, JFIF YCbCr,
    4:2:0): RGB → YCbCr in exact-form constants, 2×2-mean chroma
    subsampling, 16×16 interleaved MCUs (Y00 Y01 Y10 Y11 Cb Cr) with
    per-component DC predictors, luminance tables (slot 0) for Y and the
    Annex K chrominance tables (slot 1) for Cb/Cr."""
    import struct

    import numpy as np

    rgb = np.asarray(pixels, dtype=float).reshape(height, width, 3)
    rgb = _jpeg_pad_replicate(rgb, 16)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (b - y) / 1.772
    cr = 128.0 + (r - y) / 1.402
    # 4:2:0: chroma is the mean of each 2×2 (exact when the 2×2 is constant)
    ph, pw = y.shape
    cb_s = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
    cr_s = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
    y = y - 128.0

    dc_y = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_y = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc_c = _jpeg_huff_codes(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C)
    ac_c = _jpeg_huff_codes(_JPEG_AC_BITS_C, _JPEG_AC_VALS_C)
    w = _JpegBitWriter()
    mcw, mch = pw // 16, ph // 16
    pdc = [0, 0, 0]  # per-component DC predictors: Y, Cb, Cr
    for my in range(mch):
        for mx in range(mcw):
            for dy in (0, 1):  # the 4 luma blocks, left-to-right top-down
                for dx in (0, 1):
                    by, bx = my * 2 + dy, mx * 2 + dx
                    blk = y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    pdc[0] = _jpeg_encode_block(w, blk, pdc[0], dc_y, ac_y, _JPEG_QTABLE)
            blk = cb_s[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            pdc[1] = _jpeg_encode_block(w, blk, pdc[1], dc_c, ac_c, _JPEG_QTABLE_C)
            blk = cr_s[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            pdc[2] = _jpeg_encode_block(w, blk, pdc[2], dc_c, ac_c, _JPEG_QTABLE_C)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz_y = bytes(_JPEG_QTABLE[_JPEG_ZIGZAG[k]] for k in range(64))
    qz_c = bytes(_JPEG_QTABLE_C[_JPEG_ZIGZAG[k]] for k in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + qz_y)
        + seg(0xFFDB, bytes([0x01]) + qz_c)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + seg(0xFFC4, bytes([0x01]) + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C))
        + seg(0xFFC4, bytes([0x11]) + bytes(_JPEG_AC_BITS_C) + bytes(_JPEG_AC_VALS_C))
        + seg(0xFFDA, sos)
        + w.flush()
        + b"\xff\xd9"
    )


def _jpeg_parse_segments(payload: bytes):
    """Shared T.81 marker walk: returns (qtables, dc_lookup, ac_lookup,
    components, width, height, scan, data_pos) where components is the
    SOF0 list of (cid, sampling, tq) and scan the SOS list of (cid, td,
    ta). Gates on baseline 8-bit (progressive & friends raise)."""
    import struct

    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_lookup: dict[int, dict] = {}
    ac_lookup: dict[int, dict] = {}
    sof = None
    scan = None
    data_pos = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = body[p + 1 : p + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[_JPEG_ZIGZAG[k]] = zz[k]
                qtables[tq] = nat
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w_, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = [
                (body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c])
                for c in range(ncomp)
            ]
            sof = (w_, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker FF{marker:02X} (baseline only)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                if tc == 0:
                    dc_lookup[th] = _jpeg_huff_lookup(bits, vals)
                else:
                    ac_lookup[th] = _jpeg_huff_lookup(bits, vals)
                p += 17 + nv
        elif marker == 0xDA:  # SOS
            ncomp = body[0]
            scan = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ncomp)
            ]
            data_pos = pos + 2 + length
            break
        pos += 2 + length
    if sof is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF0/SOS")
    return qtables, dc_lookup, ac_lookup, sof[2], sof[0], sof[1], scan, data_pos


def decode_jpeg_color(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """REAL baseline COLOR JPEG decoder (stdlib + numpy): shared marker
    walk, canonical Huffman rebuild, interleaved-MCU entropy decode with
    per-component DC predictors, dequant + float IDCT per block,
    nearest-neighbour chroma upsampling, and the exact-form YCbCr→RGB
    inverse (G recovered from the Y definition). Gates on the baseline
    3-component 4:2:0 layout this engine emits; grayscale payloads decode
    via :func:`decode_jpeg_gray`."""
    import numpy as np

    qtables, dc_lu, ac_lu, comps, width, height, scan, data_pos = (
        _jpeg_parse_segments(payload)
    )
    if len(comps) != 3 or len(scan) != 3:
        raise ValueError(
            f"unsupported JPEG: {len(comps)} components (color decoder needs 3)"
        )
    if [c[1] for c in comps] != [0x22, 0x11, 0x11]:
        raise ValueError("unsupported chroma layout (4:2:0 YCbCr only)")
    table_for = {cid: (td, ta) for cid, td, ta in scan}
    sel = []
    for cid, sampling, tq in comps:
        td, ta = table_for[cid]
        if tq not in qtables or td not in dc_lu or ta not in ac_lu:
            raise ValueError("missing quant/Huffman table for scan")
        sel.append((qtables[tq], dc_lu[td], ac_lu[ta]))
    mcw, mch = (width + 15) // 16, (height + 15) // 16
    yp = np.empty((mch * 16, mcw * 16))
    cbp = np.empty((mch * 8, mcw * 8))
    crp = np.empty((mch * 8, mcw * 8))
    r = _JpegBitReader(payload, data_pos)
    pdc = [0, 0, 0]
    for my in range(mch):
        for mx in range(mcw):
            for dy in (0, 1):
                for dx in (0, 1):
                    blk, pdc[0] = _jpeg_read_block(r, sel[0][1], sel[0][2], pdc[0], sel[0][0])
                    by, bx = my * 2 + dy, mx * 2 + dx
                    yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
            blk, pdc[1] = _jpeg_read_block(r, sel[1][1], sel[1][2], pdc[1], sel[1][0])
            cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk
            blk, pdc[2] = _jpeg_read_block(r, sel[2][1], sel[2][2], pdc[2], sel[2][0])
            crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk
    y = yp[:height, :width] + 128.0
    cb = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)[:height, :width] + 128.0
    cr = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)[:height, :width] + 128.0
    rf = y + 1.402 * (cr - 128.0)
    bf = y + 1.772 * (cb - 128.0)
    gf = (y - 0.299 * rf - 0.114 * bf) / 0.587
    out = np.clip(np.round(np.stack([rf, gf, bf], axis=-1)), 0, 255).astype(int)
    flat = out.reshape(-1, 3)
    return width, height, [tuple(int(v) for v in p) for p in flat]


def _jpeg_color_decode_exact(rgb: tuple[int, int, int]):
    """EXACT-fraction model of what the color codec does to one
    MCU-constant color (forward transform → DC-only quantize-round →
    inverse transform → final round): the independent arbiter the SQL
    oracle's literal LUT is built from — no float, no codec code.
    Returns None when any rounding site sits within 1e-3 of a
    half-integer (such colors are excluded from the certified palette so
    float error ~1e-12 can never flip a round) or when a decoded channel
    leaves [1, 254] (clipping margin)."""
    from fractions import Fraction as Fr

    R, G, B = (Fr(v) for v in rgb)
    y = (299 * R + 587 * G + 114 * B) / 1000
    cb = (B - y) * Fr(250, 443)  # (B−Y)/1.772 in exact form
    cr = (R - y) * Fr(500, 701)  # (R−Y)/1.402 in exact form

    def nearest(x):
        fl = x.__floor__()
        fr = x - fl
        if abs(fr - Fr(1, 2)) < Fr(1, 1000):
            return None
        return fl if fr < Fr(1, 2) else fl + 1

    yq, cbq, crq = nearest(y - 128), nearest(cb), nearest(cr)
    if None in (yq, cbq, crq):
        return None
    yy = 128 + yq
    rf = yy + Fr(701, 500) * crq
    bf = yy + Fr(443, 250) * cbq
    gf = (1000 * yy - 299 * rf - 114 * bf) / 587
    out = []
    for v in (rf, gf, bf):
        if v < 1 or v > 254:
            return None
        n = nearest(v)
        if n is None:
            return None
        out.append(n)
    return tuple(out)


def _jpeg_color_palette(n: int = 64):
    """The certified color palette and its exact decoded twin: the first
    ``n`` colors of a deterministic enumeration that pass every margin
    screen of :func:`_jpeg_color_decode_exact`. Returns (sources,
    decoded), each a list of RGB triples."""
    src, dec = [], []
    k = 0
    while len(src) < n:
        cand = ((97 * k + 13) % 256, (57 * k + 101) % 256, (17 * k + 29) % 256)
        got = _jpeg_color_decode_exact(cand)
        if got is not None:
            src.append(cand)
            dec.append(got)
        k += 1
        if k > 100000:  # pragma: no cover - enumeration is dense
            raise RuntimeError("palette search failed")
    return src, dec


_JPEG_COLOR_SRC, _JPEG_COLOR_DEC = _jpeg_color_palette(64)

JPEG_COLOR_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, sig bigint"
)


def jpeg_color_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via the REAL color JPEG decoder:
    dimensions plus EXACT integer channel sums and a position-weighted
    signature sig = Σ (p+1)·(r + 256·g + 65536·b) — integer outputs keep
    the certification free of any rounding convention (a swapped MCU,
    zigzag slip or chroma-plane offset moves sig even when plain sums
    collide). Per-term bound 800·1.67e7 ≈ 1.3e10, per-asset < 1e13:
    int64-safe."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "asset_id", "width", "height", "n_pixels",
                "sum_r", "sum_g", "sum_b", "sig")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_jpeg_color(payload)
                sr = sg = sb = sig = 0
                for p, (r, g, b) in enumerate(px):
                    sr += r
                    sg += g
                    sb += b
                    sig += (p + 1) * (r + 256 * g + 65536 * b)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(sr)
                out["sum_g"].append(sg)
                out["sum_b"].append(sb)
                out["sig"].append(sig)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=JPEG_COLOR_FEATURE_SCHEMA)


def synthesize_jpeg_color_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic COLOR JPEG corpus for the encode→decode certification
    loop: asset ``i`` is ``(16 + i%17) × (16 + i%9)`` RGB where every
    16×16 MCU cell ``(bx, by)`` holds palette color
    ``(3i + 5·bx + 7·by) % 64`` — MCU-constant, so all six blocks of every
    MCU are DC-only and the decode is the closed-form
    :func:`_jpeg_color_decode_exact` of the palette entry, while the
    bitstream still exercises interleaved MCUs, per-component DC
    prediction, both Huffman table pairs, chroma subsampling, byte
    stuffing and edge-replicated partial MCUs. Widths 16..32 × heights
    16..24 give 1–2 MCUs per axis with partials on both.

    The id frame is round-robin repartitioned to the session's default
    parallelism first: synthesis cost is per-IMAGE Python work, so its
    parallelism must track the cluster, not the (possibly single-split)
    parquet layout of the id source — output content is per-row
    deterministic, so partitioning cannot change the result."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].tolist()
            payloads = []
            for i in ids_:
                w, h = 16 + i % 17, 16 + i % 9
                px = [
                    _JPEG_COLOR_SRC[(3 * i + 5 * (x // 16) + 7 * (y // 16)) % 64]
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(encode_jpeg_color(w, h, px))
            yield pd.DataFrame({"asset_id": ids_, "payload": payloads})

    npart = ids.sparkSession.sparkContext.defaultParallelism
    return (
        ids.select(id_col)
        .repartition(npart)
        .mapInPandas(batches, schema="asset_id bigint, payload binary")
    )
