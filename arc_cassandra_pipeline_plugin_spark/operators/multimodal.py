"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes / clearly-marked stubs — but the Spark-side plumbing is
real and tested: schema contracts, Arrow-batched ``mapInPandas`` transforms,
batch shapes, and partition sizing. Swapping the stub body for PIL/ffmpeg is
a one-function change; nothing in the plan changes.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` governs task sizing, and all
kernels are ``mapInPandas`` (one Arrow batch in, one out) so Python overhead
is per-batch, not per-row.
"""

from __future__ import annotations

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
    """STUB: real deployments decode with PIL/turbojpeg here. The container
    has no codec libraries, so decoding is not implemented."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg, not present in this environment; "
        "extract_features uses a deterministic byte-level fake instead"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: mean of each of
    ``dim`` byte stripes, scaled to [0,1]. Pure-bytes math → reproducible
    everywhere, and shaped exactly like a real feature vector."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    n = len(payload)
    stripe = max(n // dim, 1)
    out = []
    for d in range(dim):
        chunk = payload[d * stripe : (d + 1) * stripe] or payload[-stripe:]
        out.append(round(sum(chunk) / (len(chunk) * 255.0), 6))
    return out


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: n_bytes, sha-256 checksum, and a ``dim``-wide feature
    vector (deterministic fake — see :func:`_fake_feature`)."""
    import hashlib

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "checksum": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


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
