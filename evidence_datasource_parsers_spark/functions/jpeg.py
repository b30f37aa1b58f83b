"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec — stdlib + numpy only.

Real web corpora are JPEG-dominated, so the multimodal tier
(operators/multimodal.py) needs a native decode path even in containers
without PIL/libjpeg.  This module implements the baseline sequential DCT
process from the public spec:

  decoder — JFIF/EXIF segment parse, DQT (8- and 16-bit), DHT, SOF0/SOF1,
  DRI + RSTn restart markers, interleaved MCU Huffman decode, dequantize,
  inverse zigzag, vectorized float IDCT, chroma upsampling for integer
  sampling ratios (4:4:4 / 4:2:2 / 4:2:0 / grayscale), BT.601 YCbCr→RGB —
  AND the progressive DCT process (SOF2, T.81 Annex G: spectral-selection
  scans, successive-approximation DC/AC first + refinement passes, EOB
  runs), since a meaningful slice of real crawl JPEGs is progressive.
  Arithmetic coding, hierarchical and 12-bit variants raise
  ``NotImplementedError`` — the same honest unsupported-variant contract
  as the PNG/BMP decoders.  All malformed-input failures are normalized to
  ``ValueError`` so the multimodal kernels' NULL-row contract holds.

  encoder — the matching baseline writer (Annex K quant + Huffman tables,
  libjpeg-style quality scaling, 4:4:4 / 4:2:2 / 4:2:0, optional restart interval)
  plus a progressive (SOF2) writer with a web-typical scan script, so the
  test suite can roundtrip both processes without binary fixtures.

Scale note: entropy decode is a per-image Python bit loop — fine behind the
Arrow-batched kernels (one image per loop, thousands of images per task),
and the honest baseline where PIL's C decoder plugs into the same
``decode_blob`` signature when available.  The block transforms (DCT/IDCT,
dequant, color) are vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits[1..16], values) — Annex K.3 typical tables
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """Orthonormal 8×8 DCT-II matrix: forward = C @ X @ C.T, inverse =
    C.T @ Y @ C.  Float64 — the spec's real-valued reference transform."""
    import numpy as np

    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    C[0, :] = 1.0
    C *= np.where(n[:, None] == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0))
    return C


def _canonical_codes(bits: list[int], values: list[int]):
    """(code, length) per symbol value, per the spec's canonical ordering
    (Annex C): codes of length L are consecutive, doubling on length+1."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]):
    """(length, code) → symbol dict for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables with libjpeg-style quality scale)
# ---------------------------------------------------------------------------


def _scaled_quant(base: list[int], quality: int):
    import numpy as np

    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _jpeg_prep(pixels, quality: int, subsampling: str) -> dict:
    """Shared encoder front half: color convert, subsample, pad to the MCU
    grid, DCT, quantize.  Returns the per-component zigzag coefficient
    grids plus the geometry both writers (baseline and progressive) need."""
    import numpy as np

    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2 or px.shape[2] == 1
    if gray:
        comps_px = [px if px.ndim == 2 else px[:, :, 0]]
        factors = [(1, 1)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        ycc = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if subsampling in ("4:2:0", "4:2:2"):
            # 4:2:0 halves chroma in both axes; 4:2:2 horizontally only
            cy = 2 if subsampling == "4:2:0" else 1
            factors = [(2, cy), (1, 1), (1, 1)]
            comps_px = [ycc[0]]
            h0, w0 = ycc[0].shape
            h2, w2 = -(-h0 // cy) * cy, -(-w0 // 2) * 2
            for c in ycc[1:]:
                p = np.pad(c, ((0, h2 - h0), (0, w2 - w0)), mode="edge")
                comps_px.append(
                    p.reshape(h2 // cy, cy, w2 // 2, 2).mean(axis=(1, 3))
                )
        else:
            factors = [(1, 1)] * 3
            comps_px = ycc
    h, w = (px.shape[0], px.shape[1])
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = [_scaled_quant(QUANT_LUMA, quality)]
    if not gray:
        qt.append(_scaled_quant(QUANT_CHROMA, quality))
    C = _dct_matrix()
    zz = np.asarray(ZIGZAG)

    # per component: pad to the MCU-aligned block grid (edge replication),
    # block-split, DCT, quantize; keep the (block_row, block_col) grid so
    # the MCU loop can interleave h×v blocks per component
    coefs = []
    for ci, plane in enumerate(comps_px):
        ch, cv = factors[ci]
        ph, pw = mcuy * 8 * cv, mcux * 8 * ch
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        f = C @ blocks @ C.T
        q = np.round(f / qt[min(ci, len(qt) - 1)].reshape(8, 8))
        coefs.append(q.reshape(-1, 64)[:, zz].astype(np.int64))
    return {
        "coefs": coefs, "factors": factors, "qt": qt, "h": h, "w": w,
        "mcux": mcux, "mcuy": mcuy, "gray": gray,
        "ncomp": 1 if gray else 3,
    }


def _jpeg_headers(p: dict, sof_marker: int) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOF + DHT for a prepared image."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for ti, t in enumerate(p["qt"]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti)
        out += bytes(int(t[z]) for z in ZIGZAG)
    ncomp = p["ncomp"]
    out += bytes((0xFF, sof_marker)) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, p["h"], p["w"], ncomp
    )
    for ci in range(ncomp):
        ch, cv = p["factors"][ci]
        out += struct.pack(
            "BBB", ci + 1, (ch << 4) | cv, min(ci, len(p["qt"]) - 1)
        )
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUMA), (1, 0, AC_LUMA), (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)
    ):
        if tid == 1 and p["gray"]:
            continue
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    return out


def encode_jpeg(
    pixels,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "4:4:4",
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 → baseline JFIF
    bytes.  ``subsampling`` is ``4:4:4``, ``4:2:2`` (2×1-averaged
    chroma), or ``4:2:0`` (2×2-averaged chroma, the web default); ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's resync)."""
    import numpy as np

    p = _jpeg_prep(pixels, quality, subsampling)
    coefs, factors = p["coefs"], p["factors"]
    mcux, mcuy, ncomp = p["mcux"], p["mcuy"], p["ncomp"]

    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]

    bw = _BitWriter()
    out = _jpeg_headers(p, 0xC0)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tid = min(ci, 1)
        out += struct.pack("BB", ci + 1, (tid << 4) | tid)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    pred = [0] * ncomp
    rst = 0

    def put_block(blk, tid, ci) -> None:
        diff = int(blk[0]) - pred[ci]
        pred[ci] = int(blk[0])
        s, bitsv = _magnitude(diff)
        code, ln = enc_dc[tid][s]
        bw.write(code, ln)
        bw.write(bitsv, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[tid][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s, bitsv = _magnitude(v)
            code, ln = enc_ac[tid][(run << 4) | s]
            bw.write(code, ln)
            bw.write(bitsv, s)
            run = 0
        if last < 63:
            code, ln = enc_ac[tid][0x00]  # EOB
            bw.write(code, ln)

    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bytes(bw.buf)
            bw = _BitWriter()
            out += bytes((0xFF, 0xD0 + (rst % 8)))
            rst += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            ch, cv = factors[ci]
            tid = min(ci, 1)
            for by in range(cv):
                for bx in range(ch):
                    row = my * cv + by
                    col = mx * ch + bx
                    put_block(coefs[ci][row * (mcux * ch) + col], tid, ci)
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — fixture generator for the progressive decode
# path.  Spectral selection + one successive-approximation level, Annex K
# tables.  EOB0 only: the K tables define no EOBn>0 codes, and a run of one
# is always legal — the decoder still implements full EOBn.
# ---------------------------------------------------------------------------


def _ac_first_encode(bw, blk, ss, se, al, table) -> None:
    """G.1.2.2 encoder: band coefficients at precision ``al`` (sign-
    magnitude truncation), ZRL runs, EOB0 terminator."""
    last = ss - 1
    for k in range(ss, se + 1):
        if abs(int(blk[k])) >> al:
            last = k
    r = 0
    for k in range(ss, last + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = table[0xF0]
            bw.write(code, ln)
            r -= 16
        s, bitsv = _magnitude(t if v > 0 else -t)
        code, ln = table[(r << 4) | s]
        bw.write(code, ln)
        bw.write(bitsv, s)
        r = 0
    if last < se:
        code, ln = table[0x00]  # EOB0
        bw.write(code, ln)


def _ac_refine_encode(bw, blk, ss, se, al, table) -> None:
    """G.1.2.3 encoder: ±1 newly-nonzero symbols, buffered correction bits
    for previously-nonzero coefficients, EOB0 carrying the band tail."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = -1  # band index of the last NEWLY-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    pending: list[int] = []  # correction bits since the last symbol
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            code, ln = table[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:  # previously nonzero: its next magnitude bit
            pending.append(t & 1)
            continue
        code, ln = table[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(blk[ss + i]) > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, ln = table[0x00]  # EOB0 — tail correction bits follow
        bw.write(code, ln)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg_progressive(
    pixels, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 → progressive
    (SOF2) JFIF bytes.  Scan script mirrors the common web layout:
    interleaved DC first pass at Al=1, spectral AC bands at Al=1, then DC
    and AC refinement scans down to Al=0 — so the decoder's successive-
    approximation paths (DC bit refine, AC ±1 insertion, correction bits,
    ZRL-in-refine, EOB tails) are all exercised.  Coefficients after all
    scans equal the baseline encoder's exactly, so a progressive decode
    must reproduce ``decode_jpeg(encode_jpeg(px))`` bit-for-bit."""
    p = _jpeg_prep(pixels, quality, subsampling)
    coefs, factors, ncomp = p["coefs"], p["factors"], p["ncomp"]
    mcux, mcuy = p["mcux"], p["mcuy"]
    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    out = _jpeg_headers(p, 0xC2)

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    nb = []  # true (non-padded) block dims per component
    for ci in range(ncomp):
        ch, cv = factors[ci]
        cw = -(-(p["w"] * ch) // hmax)
        chh = -(-(p["h"] * cv) // vmax)
        nb.append((-(-cw // 8), -(-chh // 8)))

    if ncomp == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 1),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
        ]
    else:  # grayscale: single-component (non-interleaved) DC scans too
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    for comps_idx, ss, se, ah, al in script:
        ns = len(comps_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comps_idx:
            tid = min(ci, 1)
            out += struct.pack("BB", ci + 1, (tid << 4) | tid)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)
        bw = _BitWriter()
        if ss == 0:  # DC scan
            if ns > 1:  # interleaved: MCU order, padded grid
                pred = [0] * ncomp
                for m in range(mcux * mcuy):
                    my, mx = divmod(m, mcux)
                    for ci in comps_idx:
                        ch, cv = factors[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                row, col = my * cv + by, mx * ch + bx
                                v = int(
                                    coefs[ci][row * (mcux * ch) + col][0]
                                )
                                if ah == 0:
                                    vq = v >> al
                                    s, bitsv = _magnitude(vq - pred[ci])
                                    pred[ci] = vq
                                    code, ln = enc_dc[min(ci, 1)][s]
                                    bw.write(code, ln)
                                    bw.write(bitsv, s)
                                else:
                                    bw.write((v >> al) & 1, 1)
            else:  # non-interleaved: raster over the true block grid
                ci = comps_idx[0]
                nbx, nby = nb[ci]
                bwpr = mcux * factors[ci][0]
                pred0 = 0
                for b in range(nbx * nby):
                    row, col = divmod(b, nbx)
                    v = int(coefs[ci][row * bwpr + col][0])
                    if ah == 0:
                        vq = v >> al
                        s, bitsv = _magnitude(vq - pred0)
                        pred0 = vq
                        code, ln = enc_dc[min(ci, 1)][s]
                        bw.write(code, ln)
                        bw.write(bitsv, s)
                    else:
                        bw.write((v >> al) & 1, 1)
        else:  # AC scan — always one component
            ci = comps_idx[0]
            nbx, nby = nb[ci]
            bwpr = mcux * factors[ci][0]
            tbl = enc_ac[min(ci, 1)]
            for b in range(nbx * nby):
                row, col = divmod(b, nbx)
                blk = coefs[ci][row * bwpr + col]
                if ah == 0:
                    _ac_first_encode(bw, blk, ss, se, al, tbl)
                else:
                    _ac_refine_encode(bw, blk, ss, se, al, tbl)
        bw.flush()
        out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader: FF00 unstuffing, RSTn awareness.
    Reading past a non-RST marker raises (truncated scan)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG scan")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:  # stuffed
                self.pos += 2
            else:  # a real marker — scan data exhausted
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(blob: bytes, default_tables: bool = False):
    """JFIF/EXIF bytes → (h, w, 3) RGB (or (h, w, 1) grayscale) uint8 array.

    Handles baseline/extended sequential (SOF0/SOF1) and progressive (SOF2,
    spectral selection + successive approximation, T.81 Annex G) DCT
    processes.  Raises ``ValueError`` on corrupt data and
    ``NotImplementedError`` on arithmetic/hierarchical/12-bit variants.

    ``default_tables=True`` supplies the Annex K typical Huffman tables
    for any table id a scan references but the stream never defined — the
    MJPEG convention (AVI frames routinely omit DHT segments and rely on
    the defaults; OpenDML spec).  Off by default: for still JPEGs a
    missing DHT is corrupt data and must stay a ``ValueError``.

    Every malformed-input failure mode is normalized to ``ValueError`` —
    the multimodal kernels' except-tuple contract ("undecodable blobs
    surface as NULL rows, never as task failures") must hold for truncated
    segments (IndexError), SOS before SOF (StopIteration → RuntimeError
    under PEP 479 inside generator kernels), and missing DHT ids (KeyError)
    alike, not just for well-formed-but-unsupported files.
    """
    try:
        return _decode_jpeg_impl(blob, default_tables=default_tables)
    except (ValueError, NotImplementedError):
        raise
    except (
        IndexError, KeyError, StopIteration, RuntimeError,
        struct.error, TypeError, OverflowError,
    ) as exc:
        raise ValueError(f"corrupt JPEG: {exc!r}") from exc


def _default_htables() -> dict:
    """(class, id) → decode table for the Annex K typical tables, ids 0/1."""
    return {
        (0, 0): _decode_table(*DC_LUMA),
        (1, 0): _decode_table(*AC_LUMA),
        (0, 1): _decode_table(*DC_CHROMA),
        (1, 1): _decode_table(*AC_CHROMA),
    }


def _decode_jpeg_impl(blob: bytes, default_tables: bool = False):
    import numpy as np

    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = (
        _default_htables() if default_tables else {}
    )
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    geom = None  # (mcux, mcuy) once progressive coefficient arrays exist
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        seg = blob[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = struct.unpack(">64H", seg[i : i + 128])
                    i += 128
                else:
                    vals = list(seg[i : i + 64])
                    i += 64
                t = np.zeros(64, dtype=np.int32)
                t[np.asarray(ZIGZAG)] = np.asarray(vals, dtype=np.int32)
                qtables[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated SOF component list")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci : 3 + 2 * ci]
                comp = None
                for c in comps:
                    if c["id"] == cs:
                        comp = c
                        break
                if comp is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                # progressive DC-refine scans legitimately omit tables;
                # resolve lazily and validate only when a pass needs one
                comp["dc"] = htables.get((0, tt >> 4))
                comp["ac"] = htables.get((1, tt & 0x0F))
                scan.append(comp)
            if not progressive:
                for c in scan:
                    if c["dc"] is None or c["ac"] is None:
                        raise ValueError("SOS references undefined DHT")
                return _decode_scan(
                    blob, pos, scan, h, w, qtables, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            if geom is None:
                geom = _alloc_coeff_blocks(comps, h, w)
            pos = _decode_progressive_scan(
                blob, pos, scan, ss, se, ah, al,
                restart_interval, geom[0], geom[1],
            )
        # other segments (APPn, COM) are skipped
    if progressive and geom is not None:
        return _reconstruct(comps, h, w, qtables, geom[0], geom[1])
    raise ValueError("no SOS marker before EOI")


def _decode_scan(blob, pos, comps, h, w, qtables, restart_interval):
    import numpy as np

    if not comps or h == 0 or w == 0:
        raise ValueError("SOS before a valid SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid sampling factors")
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer chroma sampling ratio {c['h']}x{c['v']} "
                f"vs {hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["blocks"] = np.zeros(
            (mcuy * c["v"] * mcux * c["h"], 64), dtype=np.float64
        )
        c["bw"] = mcux * c["h"]  # blocks per row for this component
    br = _BitReader(blob, pos)
    pred = {c["id"]: 0 for c in comps}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.align_restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.float64)
                    s = _huff_decode(br, c["dc"])
                    diff = _extend(br.receive(s), s)
                    pred[c["id"]] += diff
                    blk[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, c["ac"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.receive(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["blocks"][row * c["bw"] + col] = blk
    return _reconstruct(comps, h, w, qtables, mcux, mcuy)


def _reconstruct(comps, h, w, qtables, mcux, mcuy):
    """Dequantize + inverse zigzag + vectorized IDCT + chroma upsample +
    color convert — shared by the baseline path (one scan, float blocks)
    and the progressive path (coefficients accumulated over many scans)."""
    import numpy as np

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    zz = np.asarray(ZIGZAG)
    C = _dct_matrix()
    planes = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"component references undefined DQT {c['tq']}")
        q = qtables[c["tq"]].reshape(64).astype(np.float64)
        coeff = c["blocks"].astype(np.float64)
        coz = np.zeros_like(coeff)
        coz[:, zz] = coeff * q[zz]
        blocks = C.T @ coz.reshape(-1, 8, 8) @ C + 128.0
        bh, bw_ = mcuy * c["v"], mcux * c["h"]
        plane = (
            blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample to full resolution and crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[
            :, :, None
        ]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decode (T.81 Annex G: spectral selection + successive
# approximation).  Coefficients accumulate across scans in per-component
# int32 arrays (zigzag order, matching the baseline layout) and one shared
# _reconstruct call renders the final image at EOI.
# ---------------------------------------------------------------------------


def _alloc_coeff_blocks(comps, h, w):
    """Allocate zero coefficient arrays in the padded MCU geometry; record
    each component's true (non-padded) block dims for non-interleaved
    scans.  Returns (mcux, mcuy)."""
    import numpy as np

    if not comps or h == 0 or w == 0:
        raise ValueError("SOS before a valid SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid sampling factors")
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer chroma sampling ratio {c['h']}x{c['v']} "
                f"vs {hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["blocks"] = np.zeros(
            (mcuy * c["v"] * c["bw"], 64), dtype=np.int32
        )
        # true block dims: ceil(component sample dims / 8)
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["nbx"] = -(-cw // 8)
        c["nby"] = -(-ch // 8)
    return mcux, mcuy


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First position at/after ``pos`` holding a non-RST, non-stuffing
    marker (the end of a progressive scan's entropy data)."""
    n = len(data)
    while pos + 1 < n:
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return n


def _refine_nonzero(br, blk, k, al):
    """Append the correction bit of a known-nonzero coefficient (G.1.2.3):
    a 1-bit moves the magnitude toward the next approximation level."""
    p1 = 1 << al
    if br.read_bit() and not (int(blk[k]) & p1):
        blk[k] += p1 if blk[k] >= 0 else -p1


def _ac_first_pass(br, blk, ss, se, al, ac_table, eobrun):
    """G.1.2.2 — first pass over an AC spectral band."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_pass(br, blk, ss, se, al, ac_table, eobrun):
    """G.1.2.3 — refinement pass: one new ±1<<al coefficient per nonzero
    symbol, correction bits for every already-nonzero coefficient crossed.

    ``eobrun`` convention matches the spec's EOB logic: on EOBn the run
    INCLUDES the current block (1<<r + appended bits) so its band tail
    still consumes correction bits below before the decrement — EOB0 with
    pending correction bits is the normal encoder output for a block whose
    refinements all land after the last newly-nonzero coefficient.
    """
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOBn — current block's tail handled below
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                val = p1 if br.read_bit() else -p1
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(br, blk, k, al)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(br, blk, k, al)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    blob, pos, scan, ss, se, ah, al, restart_interval, mcux, mcuy
):
    """Decode one progressive SOS's entropy data into the components'
    coefficient arrays; returns the position of the next marker.

    Scan kinds (T.81 G.1.1.1): DC scans (ss=0, se=0) may interleave all
    components; AC scans (ss>0) carry exactly one component and iterate
    its true (non-padded) block grid in raster order.  ``ah=0`` is a
    first pass, ``ah>0`` a successive-approximation refinement.
    """
    br = _BitReader(blob, pos)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan with nonzero Se")
    if not is_dc and len(scan) != 1:
        raise ValueError("interleaved AC progressive scan")

    if len(scan) > 1:
        # interleaved DC scan: MCU order, every block incl. padding
        pred = {c["id"]: 0 for c in scan}
        if ah == 0:
            for c in scan:
                if c["dc"] is None:
                    raise ValueError("DC first pass without DHT")
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in scan}
            my, mx = divmod(m, mcux)
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        blk = c["blocks"][row * c["bw"] + col]
                        if ah == 0:
                            s = _huff_decode(br, c["dc"])
                            pred[c["id"]] += _extend(br.receive(s), s)
                            blk[0] = pred[c["id"]] << al
                        elif br.read_bit():
                            blk[0] = int(blk[0]) | (1 << al)
        return _next_marker_pos(blob, br.pos)

    # non-interleaved scan (every AC scan; single-component DC scans too):
    # raster order over the component's TRUE block grid — MCU-order with
    # padding skipped is a DIFFERENT sequence for subsampled components
    c = scan[0]
    if is_dc and ah == 0 and c["dc"] is None:
        raise ValueError("DC first pass without DHT")
    if not is_dc and c["ac"] is None:
        raise ValueError("AC scan without DHT")
    pred0 = 0
    eobrun = 0
    for b in range(c["nbx"] * c["nby"]):
        if restart_interval and b and b % restart_interval == 0:
            br.align_restart()
            pred0 = 0
            eobrun = 0
        row, col = divmod(b, c["nbx"])
        blk = c["blocks"][row * c["bw"] + col]
        if is_dc:
            if ah == 0:
                s = _huff_decode(br, c["dc"])
                pred0 += _extend(br.receive(s), s)
                blk[0] = pred0 << al
            elif br.read_bit():
                blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:
            eobrun = _ac_first_pass(br, blk, ss, se, al, c["ac"], eobrun)
        else:
            eobrun = _ac_refine_pass(br, blk, ss, se, al, c["ac"], eobrun)
    return _next_marker_pos(blob, br.pos)
