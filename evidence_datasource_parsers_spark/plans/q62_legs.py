"""q62's media-decode legs, one named kernel per codec tier.

q62_multimodal_meta is the designated driver-gating host for every
Python-kernel decode tier (the catalog is capped at the 50-query window,
so new kernels ride as LEGS of q62 under its single value hash).  By
round 8 the query body had grown to ~650 lines of nested closures; this
module factors each leg into a module-level kernel with its own schema
fragment so each is unit-testable in isolation (tests/test_q62_legs.py)
and a codec edit touches one function, not the whole chain.  The
registered query (plans/catalog_text.q62) is now just
``to_blobs → decode_mm01 → chain_stats`` + the script-ID columns.

HASH-FROZEN: these kernels sit under q62's driver value hash — any
behavioral change here must keep the oracle SQL in catalog_text in
lockstep or the CORRECTNESS gate breaks.  The kernels reference package
decoders on purpose (q37/q39 proved package-referencing kernels resolve
under the correctness driver).
"""

from __future__ import annotations

__all__ = [
    "CHARSET_SUFFIXES",
    "META_SCHEMA",
    "STATS_LEGS",
    "chain_stats",
    "decode_mm01",
    "to_blobs",
]

CHARSET_SUFFIXES = (
    "São Paulo — café №42",  # 0: UTF-8 + HTTP charset header
    "déjà vu — naïve ünïcode",  # 1: UTF-16-LE BOM
    "São café déjà €99",  # 2: cp1252 behind <meta charset=iso-8859-1>
    "東京 データ 図書館",  # 3: bare UTF-8 (content heuristic)
    "“smart quotes” …",  # 4: cp1252 fallback (invalid UTF-8, undeclared)
)

#: schema after decode_mm01 (the base every stats leg extends)
META_SCHEMA = (
    "media_id long, media_type string, width int, height int,"
    " depth int, payload_bytes long"
)


def to_blobs(batches):
    """documents (doc_id, text) → synthetic MM01-container blobs."""
    import struct as _struct

    import pandas as _pd

    for pdf in batches:
        blobs = [
            b"MM01"
            + _struct.pack(">BiiB", 0, 64, 48, 3)
            + t.encode("utf-8")[:256]
            for t in pdf["text"]
        ]
        yield _pd.DataFrame(
            {"media_id": pdf["doc_id"].values, "blob": blobs}
        )


def decode_mm01(batches):
    """MM01 header → typed metadata columns (the schema/batch contract
    the real codec kernels plug into)."""
    import struct as _struct

    import pandas as _pd

    types = {0: "image", 1: "audio", 2: "video"}
    for pdf in batches:
        meta = []
        for b in pdf["blob"]:
            if b is None or len(b) < 14 or b[:4] != b"MM01":
                meta.append(("unknown", -1, -1, -1, -1))
                continue
            mt, w, h, dep = _struct.unpack(">BiiB", b[4:14])
            meta.append((types.get(mt, "unknown"), w, h, dep, len(b) - 14))
        yield _pd.DataFrame(
            {
                "media_id": pdf["media_id"].values,
                "media_type": [m[0] for m in meta],
                "width": _pd.array([m[1] for m in meta], dtype="int32"),
                "height": _pd.array([m[2] for m in meta], dtype="int32"),
                "depth": _pd.array([m[3] for m in meta], dtype="int32"),
                "payload_bytes": [m[4] for m in meta],
            }
        )


def ppm_stats(batches):
    """REAL PPM decoder leg: a deterministic 16×8 binary PPM (P6) is
    synthesized per document (payload byte k = (doc_id·31 + k·7) mod
    256), parsed by the actual pure-Python decoder (multimodal.
    decode_ppm — header tokenizer, raster extraction), and its pixel
    sum/mean emitted.  DuckDB recomputes those stats arithmetically, so
    a decoder bug breaks the value hash."""
    import numpy as _np

    from evidence_datasource_parsers_spark.operators.multimodal import (
        decode_ppm,
    )

    k = _np.arange(16 * 8 * 3, dtype=_np.int64)
    for pdf in batches:
        sums, means = [], []
        for mid in pdf["media_id"]:
            payload = ((int(mid) * 31 + k * 7) % 256).astype(_np.uint8)
            blob = b"P6\n16 8\n255\n" + payload.tobytes()
            px = decode_ppm(blob).astype(_np.int64)  # the REAL parser
            s = int(px.sum())
            sums.append(s)
            means.append(float(s) / float(px.size))
        out = pdf.copy()
        out["ppm_pixel_sum"] = sums
        out["ppm_pixel_mean"] = means
        yield out


def jpeg_stats(batches):
    """REAL baseline-JPEG codec leg (functions/jpeg.py): a flat
    24×16 RGB image at gray level doc_id%256 is ENCODED (DCT,
    quantize, Huffman) and DECODED (full marker parse, entropy
    decode, IDCT, YCbCr→RGB) per document.  Flat blocks quantize
    losslessly at q95 (only a DC coefficient, and the luma DC
    quantizer 2 divides 8·(v−128)), so the oracle recomputes the
    decoded stats arithmetically — sum = g·1152, mean = g — and any
    drift anywhere in the 700-line codec chain breaks the hash."""
    import numpy as _np

    from evidence_datasource_parsers_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for pdf in batches:
        sums, means = [], []
        for mid in pdf["media_id"]:
            g = int(mid) % 256
            img = _np.full((16, 24, 3), g, dtype=_np.uint8)
            px = decode_jpeg(encode_jpeg(img, quality=95)).astype(
                _np.int64
            )
            s = int(px.sum())
            sums.append(s)
            means.append(float(s) / float(px.size))
        out = pdf.copy()
        out["jpeg_pixel_sum"] = sums
        out["jpeg_pixel_mean"] = means
        yield out


def codec_stats(batches):
    """Round-6 DECODED legs: progressive JPEG, GIF, and palette PNG —
    per document a flat gray image rides the full progressive chain
    (9-scan encode → Annex-G decode; flat blocks quantize losslessly,
    so sum = g·1152 exactly), and ONE deterministic 8×8 index raster
    (idx_k = (doc_id·13 + k·5) mod 16, grayscale palette entry
    i·17 mod 256) rides BOTH the GIF path (real LZW encode → decode,
    palette map) and the palette-PNG path (PLTE + filter pipeline).
    The oracle recomputes all three sums arithmetically, and GIF ≡ PNG
    by construction — two decoders proving each other on the same
    pixels under the value hash."""
    import numpy as _np

    from evidence_datasource_parsers_spark.functions.gif import (
        decode_gif,
        encode_gif,
    )
    from evidence_datasource_parsers_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )
    from evidence_datasource_parsers_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    k = _np.arange(64, dtype=_np.int64)
    pal = _np.stack(
        [(_np.arange(16) * 17) % 256] * 3, axis=1
    ).astype(_np.uint8)
    for pdf in batches:
        pj, gs, ps = [], [], []
        for mid in pdf["media_id"]:
            g = int(mid) % 256
            img = _np.full((16, 24, 3), g, dtype=_np.uint8)
            pj.append(int(
                decode_jpeg(encode_jpeg_progressive(img, quality=95))
                .astype(_np.int64).sum()
            ))
            idx = ((int(mid) * 13 + k * 5) % 16).astype(
                _np.uint8
            ).reshape(8, 8)
            gs.append(int(
                decode_gif(encode_gif(idx, pal)).astype(_np.int64).sum()
            ))
            ps.append(int(
                decode_png(encode_png(idx, palette=pal))
                .astype(_np.int64).sum()
            ))
        out = pdf.copy()
        out["pjpeg_pixel_sum"] = pj
        out["gif_pixel_sum"] = gs
        out["png_pixel_sum"] = ps
        yield out


def av_stats(batches):
    """Audio + video container legs: a deterministic PCM16 WAV
    (sample k = (doc_id·7 + k·13) mod 2001 − 1000, 400 samples) rides
    the REAL RIFF/WAVE parser — emitted sample sum and sign-change
    count are exact integer functions the oracle recomputes — and a
    (doc_id mod 5 + 1)-frame flat MJPEG-AVI rides the REAL container
    walk + frame decode (avi_probe = n_frames·1000 + first decoded
    pixel; flat frames decode losslessly at q95)."""
    import struct as _struct

    import numpy as _np

    from evidence_datasource_parsers_spark.functions.avi import (
        decode_avi,
        encode_avi_mjpeg,
    )
    from evidence_datasource_parsers_spark.functions.jpeg import (
        decode_jpeg,
    )
    from evidence_datasource_parsers_spark.operators.multimodal import (
        decode_wav,
    )

    k = _np.arange(400, dtype=_np.int64)
    for pdf in batches:
        ssums, zcs, probes = [], [], []
        for mid in pdf["media_id"]:
            m = int(mid)
            samples = ((m * 7 + k * 13) % 2001 - 1000).astype("<i2")
            data = samples.tobytes()
            fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            blob = (
                b"RIFF"
                + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt "
                + _struct.pack("<I", len(fmt)) + fmt
                + b"data" + _struct.pack("<I", len(data)) + data
            )
            _rate, _ch, got = decode_wav(blob)  # the REAL parser
            x = got[:, 0].astype(_np.int64)
            ssums.append(int(x.sum()))
            neg = x < 0
            zcs.append(int((neg[1:] != neg[:-1]).sum()))
            nf = m % 5 + 1
            frame = _np.full((8, 8, 3), m % 256, dtype=_np.uint8)
            v = decode_avi(
                encode_avi_mjpeg([frame] * nf, fps=10, quality=95)
            )
            px0 = decode_jpeg(v["frames"][0])
            probes.append(v["n_frames"] * 1000 + int(px0[0, 0, 0]))
        out = pdf.copy()
        out["audio_sample_sum"] = ssums
        out["audio_zero_crossings"] = zcs
        out["avi_probe"] = probes
        yield out


def mp4_stats(batches):
    """Round-8 ISO-BMFF leg (functions/mp4.py): per document a
    (doc_id%4+2)-sample MP4 is written in TWO container layouts
    (mdat-first vs moov-first + free padding + different brand) and
    parsed by the REAL box walk.  mp4_probe packs n_frames/width/
    height from the layout-A parse; mp4_stream_sum is the byte sum of
    the elementary stream extracted from layout B via the sample
    tables — and is forced to −1 unless BOTH layouts yield identical
    stream bytes, so the remux-invariance contract itself sits under
    the value hash (the oracle recomputes the sum arithmetically:
    sample i = byte (doc_id + 3i) mod 256 repeated 20 + i times)."""
    from evidence_datasource_parsers_spark.functions.mp4 import (
        encode_mp4,
        mp4_stream_bytes,
        parse_mp4,
    )

    for pdf in batches:
        probes, ssums = [], []
        for mid in pdf["media_id"]:
            m = int(mid)
            nf = m % 4 + 2
            samples = [
                bytes([(m + i * 3) % 256]) * (20 + i) for i in range(nf)
            ]
            a = encode_mp4(samples, 64, 48, fps=24.0)
            b = encode_mp4(
                samples, 64, 48, fps=24.0, moov_first=True,
                free_bytes=32, brand=b"mp42",
            )
            meta = parse_mp4(a)
            probes.append(
                meta["n_frames"] * 1000000
                + meta["width"] * 1000 + meta["height"]
            )
            sa, sb = mp4_stream_bytes(a), mp4_stream_bytes(b)
            ssums.append(sum(sa) if sa == sb else -1)
        out = pdf.copy()
        out["mp4_probe"] = probes
        out["mp4_stream_sum"] = ssums
        yield out


def audio_meta_stats(batches):
    """Round-8 compressed-audio legs (functions/audiometa.py): per
    document an MP3 frame sequence ((doc_id%7+3) frames at
    44.1 kHz, behind an ID3v2 shell), a FLAC STREAMINFO
    ((doc_id%9+1) s at 44.1 kHz) and an Opus OGG ((doc_id%6+2) s of
    48 kHz granules, zero pre-skip) are written and parsed by the
    REAL walks — frame-length arithmetic, bit-packed STREAMINFO,
    page/granule walk — and integer probes emitted; the oracle
    recomputes each arithmetically, so any drift in the three
    parsers breaks the value hash."""
    from evidence_datasource_parsers_spark.functions.audiometa import (
        encode_flac_header,
        encode_mp3_frames,
        encode_ogg,
        parse_flac,
        parse_mp3,
        parse_ogg,
    )

    for pdf in batches:
        mp3p, flacs, opusd = [], [], []
        for mid in pdf["media_id"]:
            m = int(mid)
            a = parse_mp3(
                encode_mp3_frames(
                    m % 7 + 3, kbps=128, rate=44100, id3_bytes=40
                )
            )
            mp3p.append(a["n_frames"] * 1000000 + a["sample_rate"])
            f = parse_flac(
                encode_flac_header(
                    rate=44100, channels=2,
                    total_samples=(m % 9 + 1) * 44100,
                )
            )
            flacs.append(f["total_samples"])
            o = parse_ogg(
                encode_ogg(
                    "opus", channels=1,
                    total_granules=(m % 6 + 2) * 48000, pre_skip=0,
                )
            )
            opusd.append(int(o["duration_s"]))
        out = pdf.copy()
        out["mp3_probe"] = mp3p
        out["flac_total_samples"] = flacs
        out["opus_duration_s"] = opusd
        yield out


def charset_stats(batches):
    """Round-8 charset tier (functions/charset.py): per document a
    payload is byte-encoded through one of five real charset/
    declaration channels (keyed media_id % 5 — HTTP-declared UTF-8,
    UTF-16-LE BOM, cp1252 behind an iso-8859-1 <meta> alias, bare
    UTF-8 content heuristic, cp1252 fallback on invalid UTF-8) and
    pushed through the REAL HTML5-order sniff + decode kernel; a
    latin-1-mojibake'd twin of the same text goes through the strict
    repair round-trip.  The oracle constructs the expected decoded/
    repaired strings independently, so detection order, the WHATWG
    alias table, BOM stripping, and the repair trigger are all under
    the value hash."""
    import codecs as _codecs

    from evidence_datasource_parsers_spark.functions.charset import (
        _repair_value,
        decode_payload,
    )

    for pdf in batches:
        texts, charsets, srcs, reps = [], [], [], []
        for mid in pdf["media_id"]:
            m = int(mid)
            base = f"doc {m} {CHARSET_SUFFIXES[m % 5]}"
            ctype = None
            br = m % 5
            if br == 0:
                payload = base.encode("utf-8")
                ctype = "text/html; charset=UTF-8"
            elif br == 1:
                payload = _codecs.BOM_UTF16_LE + base.encode(
                    "utf-16-le"
                )
            elif br == 2:
                payload = b"<meta charset=iso-8859-1>" + base.encode(
                    "cp1252"
                )
            elif br == 3:
                payload = base.encode("utf-8")
            else:  # cp1252 bytes, no declaration: invalid UTF-8
                payload = base.encode("cp1252")
            t, c, s = decode_payload(payload, ctype)
            texts.append(t)
            charsets.append(c)
            srcs.append(s)
            reps.append(
                _repair_value(base.encode("utf-8").decode("latin-1"))
            )
        out = pdf.copy()
        out["decoded_text"] = texts
        out["charset"] = charsets
        out["charset_source"] = srcs
        out["repaired_text"] = reps
        yield out


def pdf_stats(batches):
    """Round-8 PDF leg (functions/pdf.py): per document a
    (media_id mod 3 + 1)-page PDF — FlateDecode on even ids, raw
    streams on odd — is written by the standards-valid encoder and
    read back by the REAL tolerant extractor (object scan, stream
    inflate, Tj operator walk, literal-string unescape); the
    extracted text and page count go under the value hash against
    an oracle that constructs the expected strings arithmetically,
    so a parser regression in any link of that chain breaks q62."""
    import pandas as _pd

    from evidence_datasource_parsers_spark.functions.pdf import (
        encode_pdf,
        parse_pdf,
    )

    for pdf in batches:
        texts, npages = [], []
        for mid in pdf["media_id"]:
            m = int(mid)
            blob = encode_pdf(
                [
                    [f"pdf doc {m} page {k}"]
                    for k in range(m % 3 + 1)
                ],
                flate=(m % 2 == 0),
            )
            meta = parse_pdf(blob)
            texts.append(meta["text"])
            npages.append(meta["n_pages"])
        out = pdf.copy()
        out["pdf_text"] = texts
        out["pdf_pages"] = _pd.array(npages, dtype="int32")
        yield out


#: the stats chain: (kernel, schema fragment it appends), applied in
#: order over the META_SCHEMA frame.  Adding a codec leg = one kernel
#: above + one entry here + the matching oracle columns in catalog_text.
STATS_LEGS = [
    (ppm_stats, " ppm_pixel_sum long, ppm_pixel_mean double"),
    (jpeg_stats, " jpeg_pixel_sum long, jpeg_pixel_mean double"),
    (codec_stats,
     " pjpeg_pixel_sum long, gif_pixel_sum long, png_pixel_sum long"),
    (av_stats,
     " audio_sample_sum long, audio_zero_crossings long, avi_probe long"),
    (mp4_stats, " mp4_probe long, mp4_stream_sum long"),
    (audio_meta_stats,
     " mp3_probe long, flac_total_samples long, opus_duration_s long"),
    (charset_stats,
     " decoded_text string, charset string, charset_source string,"
     " repaired_text string"),
    (pdf_stats, " pdf_text string, pdf_pages int"),
]


def chain_stats(meta):
    """Apply every stats leg in order to the META_SCHEMA frame,
    growing the mapInPandas schema leg by leg."""
    schema = META_SCHEMA
    out = meta
    for kernel, fragment in STATS_LEGS:
        schema = schema + "," + fragment
        out = out.mapInPandas(kernel, schema)
    return out
