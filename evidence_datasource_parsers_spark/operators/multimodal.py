"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the *decode kernels* are stubs —
either a deterministic fake (for the synthetic header format below) or a
clearly-marked ``NotImplementedError``.  Everything Spark-side is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` plumbing, partitioning.

Synthetic container format (used by tests): a binary blob whose first 14 bytes
are a header ``MM01`` + media-type byte + int32 width/height (big-endian) +
byte depth, followed by the payload.  Real deployments swap ``decode_blob``
for a PIL/ffmpeg-backed kernel with the same signature — the Spark plumbing
does not change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"MM01"
MEDIA_TYPES = {0: "image", 1: "audio", 2: "video"}

META_SCHEMA = (
    "media_type string, width int, height int, depth int, payload_bytes long"
)


def pack_blob(media_type: int, width: int, height: int, depth: int, payload: bytes) -> bytes:
    """Build a synthetic multimodal blob (test/fixture helper)."""
    return MAGIC + struct.pack(">BiiB", media_type, width, height, depth) + payload


def _parse_header(blob: bytes) -> tuple[str, int, int, int, int]:
    if blob is None or len(blob) < 14 or blob[:4] != MAGIC:
        return ("unknown", -1, -1, -1, -1 if blob is None else len(blob))
    mt, w, h, d = struct.unpack(">BiiB", blob[4:14])
    return (MEDIA_TYPES.get(mt, "unknown"), w, h, d, len(blob) - 14)


def extract_media_meta(
    df: DataFrame, binary_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """Decode typed metadata from binary blobs via Arrow-batched mapInPandas.

    The batch loop is vectorized per Arrow batch (no per-row Python calls into
    Spark); at scale this runs one Python worker per core with zero shuffle.
    """
    out_schema = f"{id_col} long, {META_SCHEMA}"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_parse_header(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media_type": [m[0] for m in meta],
                    "width": pd.array([m[1] for m in meta], dtype="int32"),
                    "height": pd.array([m[2] for m in meta], dtype="int32"),
                    "depth": pd.array([m[3] for m in meta], dtype="int32"),
                    "payload_bytes": [m[4] for m in meta],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode, out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    binary_col: str = "blob",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Resize kernel over mapInPandas.

    fake=True emits a deterministic resized blob (header rewritten, payload
    truncated/padded to target_w*target_h) so pipelines are testable without
    codecs.  fake=False marks where a real decoder plugs in.
    """
    out_schema = f"{id_col} long, {binary_col} binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[binary_col]:
                mt_name, w, h, d, _ = _parse_header(blob)
                if mt_name != "image":
                    out.append(None)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv (absent here)"
                    )
                payload = bytes(blob[14:])[: target_w * target_h].ljust(
                    target_w * target_h, b"\0"
                )
                out.append(pack_blob(0, target_w, target_h, d, payload))
            yield pd.DataFrame({id_col: pdf[id_col].values, binary_col: out})

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def extract_features(
    df: DataFrame,
    binary_col: str = "blob",
    id_col: str = "media_id",
    n_bins: int = 16,
) -> DataFrame:
    """Per-blob feature vector via Arrow-batched mapInPandas: a normalized
    ``n_bins``-bucket byte histogram of the payload plus mean/std — a
    deterministic, codec-free stand-in with the SAME signature and output
    shape (``array<float>``) as a real CNN/audio embedding kernel.  The
    output feeds the similarity stack directly (brute_force_topk /
    ann_lsh_topk / ivf_topk on the ``features`` column), so the whole
    blob → embed → index → search pipeline is exercisable end-to-end.

    One narrow pass, no shuffle; at scale one Python worker per core, Arrow
    both ways."""
    out_schema = f"{id_col} long, features array<float>"
    shift = 8 - (n_bins - 1).bit_length()  # byte >> shift buckets into n_bins
    if n_bins & (n_bins - 1):
        raise ValueError(f"n_bins must be a power of two, got {n_bins}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf[binary_col]:
                mt_name, _, _, _, n_payload = _parse_header(blob)
                if mt_name == "unknown" or n_payload <= 0:
                    feats.append(None)
                    continue
                payload = np.frombuffer(bytes(blob[14:]), dtype=np.uint8)
                hist = np.bincount(payload >> shift, minlength=n_bins)
                vec = np.concatenate(
                    [
                        hist / len(payload),
                        [payload.mean() / 255.0, payload.std() / 255.0],
                    ]
                ).astype(np.float32)
                feats.append(vec)
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    frame_bytes: int,
    binary_col: str = "blob",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling: explode every Nth fixed-size payload chunk.

    1 row → M frame rows; the fan-out happens inside mapInPandas so frames of
    one video stay in one partition (locality for downstream per-frame UDFs).
    """
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                mt_name, _, _, _, n_payload = _parse_header(blob)
                if mt_name != "video":
                    continue
                payload = bytes(blob[14:])
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, out_schema)
