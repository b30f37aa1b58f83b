"""AVI (RIFF) container with MJPEG video — stdlib + the native JPEG codec.

MJPEG-in-AVI is the one mainstream VIDEO format a pure-Python stack can
fully decode: the container is a RIFF chunk tree and every frame is a
baseline JPEG (often WITHOUT its DHT segments — the MJPEG convention is to
rely on the Annex K typical tables, which ``decode_jpeg(default_tables=
True)`` supplies).  This closes the image→audio→video progression of the
multimodal tier with REAL decoding, and gives frame-sampling something
honest to sample.

  decoder — RIFF walk (LIST recursion, word-aligned chunks), ``avih``
  frame-rate extraction, ``movi`` frame collection (``..dc``/``..db``
  stream chunks).  Returns the UNDECODED per-frame JPEG blobs + fps —
  deliberately: a sampler that decodes only every k-th frame must not pay
  for the rest, so pixel decode happens per-selected-frame downstream.

  encoder — minimal single-video-stream writer (avih + strl/strh/strf +
  movi) over ``encode_jpeg`` frames, so tests roundtrip fixture-free;
  ``strip_dht=True`` writes spec-realistic MJPEG frames with their DHT
  segments removed.

Scale note: container parse is a cheap byte walk; decode cost is per
SAMPLED frame inside Arrow-batched kernels (operators/multimodal.py).
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _list(tag: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", tag + data)


def strip_jpeg_dht(blob: bytes) -> bytes:
    """Remove every DHT (0xFFC4) segment from a JPEG — the form MJPEG
    frames commonly take in the wild (decoders supply the Annex K
    defaults)."""
    out = bytearray(blob[:2])
    pos, n = 2, len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            break
        marker = blob[pos + 1]
        if marker == 0xDA:  # SOS: copy the rest verbatim
            out += blob[pos:]
            return bytes(out)
        seglen = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        if marker != 0xC4:
            out += blob[pos : pos + 2 + seglen]
        pos += 2 + seglen
    out += blob[pos:]
    return bytes(out)


def encode_avi_mjpeg(
    frames, fps: int = 10, quality: int = 90, strip_dht: bool = False
) -> bytes:
    """List of (h, w, 3)/(h, w) uint8 arrays → single-stream MJPEG AVI."""
    from evidence_datasource_parsers_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("empty frame list")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    if strip_dht:
        jpegs = [strip_jpeg_dht(j) for j in jpegs]
    h, w = frames[0].shape[0], frames[0].shape[1]
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # rate, padding, flags (HASINDEX unset)
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      max_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24,
        struct.unpack("<I", b"MJPG")[0], w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes) -> dict:
    """AVI bytes → ``{"fps": float|None, "n_frames": int, "width": int|None,
    "height": int|None, "frames": [bytes, ...]}`` — per-frame payloads left
    UNDECODED (pass each to ``decode_jpeg(frame, default_tables=True)``).
    Raises ``ValueError`` on malformed containers or when no video frames
    are present."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []
    info: dict = {"fps": None, "width": None, "height": None}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            body = pos + 8
            if body + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"avih" and size >= 40:
                vals = struct.unpack("<10I", blob[body : body + 40])
                if vals[0]:
                    info["fps"] = 1_000_000 / vals[0]
                info["width"], info["height"] = vals[8], vals[9]
            elif cid[2:4] in (b"dc", b"db") and size > 0:
                frames.append(blob[body : body + size])
            pos = body + size + (size & 1)

    walk(12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0]))
    if not frames:
        raise ValueError("AVI with no video frames")
    return {**info, "n_frames": len(frames), "frames": frames}
