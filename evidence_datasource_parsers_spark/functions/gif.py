"""GIF (87a/89a) codec — stdlib + numpy only.

Real crawl corpora are jpeg/png/gif-dominated; with JPEG (baseline +
progressive) and PNG (all color types) native, GIF closes the set so the
multimodal stats/pHash/dedup tiers see every mainstream raster format the
sandbox can decode without PIL.

  decoder — header + logical screen descriptor, global/local color tables,
  graphic-control extension (transparency), variable-width LZW decompression
  (code growth to 12 bits, CLEAR/EOI handling, deferred-clear tolerant),
  interlaced row reordering, first frame composed onto the logical screen
  (background-filled).  Animated GIFs decode their FIRST frame — the
  training-data tier treats a GIF as one image, matching how stats/pHash
  consume it.  Malformed inputs raise ``ValueError``.

  encoder — minimal single-frame writer with a REAL greedy-longest-match
  LZW compressor (code-width growth, 4095-entry table reset), so roundtrip
  tests exercise the decoder's dictionary growth without binary fixtures.

Scale note: like the JPEG/PNG decoders this is a per-image Python kernel
behind Arrow-batched ``mapInPandas`` — thousands of images per task, block
transforms vectorized in numpy where possible (palette mapping, interlace
scatter).
"""

from __future__ import annotations

import struct


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the terminating 0x00)."""
    out = bytearray()
    n = len(blob)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = blob[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        out += blob[pos : pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Variable-width GIF-LZW → index list.  Codes are packed LSB-first;
    width grows when the next code would not fit, capped at 12 bits; CLEAR
    resets the table (deferred clears — a full table with no CLEAR — are
    tolerated per the spec's common reading)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {i: (i,) for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = fresh_table()
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("LZW: first code not a literal")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("LZW: code out of sequence")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out  # missing EOI tolerated (common in the wild)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Greedy longest-match GIF-LZW — the real algorithm, so decoding it
    exercises code growth and table resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run: tuple[int, ...] = ()
    for v in indices:
        cand = run + (int(v),)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            # width grows when the NEXT emitted code could be next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset (keeps the decoder's reset path honest)
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (int(v),)
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes):
    """GIF bytes → (h, w, 3|4) uint8 array (RGBA iff the first frame's
    graphic-control extension declares a transparent index).  First frame
    composed onto the background-filled logical screen."""
    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(blob) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed, bg_index, _aspect = blob[10], blob[11], blob[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(blob):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent: int | None = None
    n = len(blob)
    while pos < n:
        introducer = blob[pos]
        pos += 1
        if introducer == 0x3B:  # trailer
            break
        if introducer == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = blob[pos]
            pos += 1
            data, pos = _read_subblocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                if data[0] & 0x01:
                    transparent = data[3]
            continue
        if introducer != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{introducer:02x}")
        # image descriptor — first frame only
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih = struct.unpack("<HHHH", blob[pos : pos + 8])
        ipacked = blob[pos + 8]
        pos += 9
        lct = gct
        if ipacked & 0x80:
            ncol = 2 << (ipacked & 0x07)
            if pos + 3 * ncol > n:
                raise ValueError("truncated local color table")
            lct = np.frombuffer(blob, np.uint8, 3 * ncol, pos).reshape(
                ncol, 3
            )
            pos += 3 * ncol
        if lct is None:
            raise ValueError("GIF frame without any color table")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code = blob[pos]
        pos += 1
        data, pos = _read_subblocks(blob, pos)
        idx = _lzw_decode(data, min_code)
        if len(idx) < iw * ih:
            raise ValueError("GIF LZW stream shorter than the frame")
        frame = np.asarray(idx[: iw * ih], dtype=np.int32)
        if int(frame.max(initial=0)) >= len(lct):
            raise ValueError("GIF palette index out of range")
        frame = frame.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            de = np.zeros_like(frame)
            src = 0
            for start, step in _INTERLACE_PASSES:
                cnt = len(range(start, ih, step))
                de[start::step] = frame[src : src + cnt]
                src += cnt
            frame = de
        channels = 4 if transparent is not None else 3
        canvas = np.zeros((sh, sw, channels), dtype=np.uint8)
        if gct is not None and bg_index < len(gct):
            canvas[:, :, :3] = gct[bg_index]
            if channels == 4:
                canvas[:, :, 3] = 255
        ph = min(ih, max(0, sh - iy))
        pw = min(iw, max(0, sw - ix))
        sub = frame[:ph, :pw]
        canvas[iy : iy + ph, ix : ix + pw, :3] = lct[sub]
        if channels == 4:
            canvas[iy : iy + ph, ix : ix + pw, 3] = np.where(
                sub == transparent, 0, 255
            ).astype(np.uint8)
        return canvas
    raise ValueError("GIF with no image frame")


def encode_gif(
    indices,
    palette,
    *,
    transparent: int | None = None,
    interlace: bool = False,
) -> bytes:
    """(h, w) index array + (n, 3) palette → single-frame GIF89a bytes.
    ``transparent`` adds a graphic-control extension; ``interlace`` writes
    the four-pass row order.  The writer half of the decoder's roundtrip
    proof."""
    import numpy as np

    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    h, w = idx.shape
    ncol = len(pal)
    bits = max(1, (ncol - 1).bit_length())
    size_field = bits - 1
    padded = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | size_field, 0, 0))
    out += pal.tobytes() + b"\x00\x00\x00" * (padded - ncol)
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes((0x01, 0, 0, transparent)) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40,)) if interlace else b"\x00"
    if interlace:
        rows = [idx[s::st] for s, st in _INTERLACE_PASSES]
        seq = np.concatenate(rows).reshape(-1)
    else:
        seq = idx.reshape(-1)
    min_code = max(2, bits)
    out += bytes((min_code,))
    lzw = _lzw_encode(seq.tolist(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)
