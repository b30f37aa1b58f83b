"""Per-leg unit fixtures for q62's media-decode kernels
(plans/q62_legs.py) — each kernel is exercised directly on a small
pandas batch against the same arithmetic the DuckDB oracle replays, so
a codec edit is caught at the leg BEFORE it breaks the whole q62 hash.
No Spark session needed: the kernels are plain batch generators."""

from __future__ import annotations

import pandas as pd

from evidence_datasource_parsers_spark.plans import q62_legs as L

IDS = [0, 1, 2, 3, 4, 7, 12, 255, 256, 1000]


def _run(kernel, ids=IDS, extra=None):
    pdf = pd.DataFrame({"media_id": ids})
    if extra:
        for k, v in extra.items():
            pdf[k] = v
    outs = list(kernel(iter([pdf])))
    assert len(outs) == 1
    return outs[0]


def test_to_blobs_and_decode_mm01():
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha", "b" * 500]}
    )
    media = list(L.to_blobs(iter([docs])))[0]
    assert list(media.columns) == ["media_id", "blob"]
    assert media["blob"][0].startswith(b"MM01")
    meta = list(L.decode_mm01(iter([media])))[0]
    assert list(meta["media_type"]) == ["image", "image"]
    assert list(meta["width"]) == [64, 64]
    assert list(meta["payload_bytes"]) == [5, 256]  # 256-byte cap
    # malformed blob → unknown row, not an exception
    bad = pd.DataFrame({"media_id": [9], "blob": [b"JUNK"]})
    m2 = list(L.decode_mm01(iter([bad])))[0]
    assert list(m2["media_type"]) == ["unknown"]


def test_ppm_leg_matches_oracle_formula():
    out = _run(L.ppm_stats)
    for mid, s in zip(out["media_id"], out["ppm_pixel_sum"]):
        want = sum((int(mid) * 31 + k * 7) % 256 for k in range(384))
        assert s == want
    assert all(
        m == s / 384.0
        for s, m in zip(out["ppm_pixel_sum"], out["ppm_pixel_mean"])
    )


def test_jpeg_leg_flat_blocks_lossless():
    out = _run(L.jpeg_stats)
    for mid, s, m in zip(
        out["media_id"], out["jpeg_pixel_sum"], out["jpeg_pixel_mean"]
    ):
        g = int(mid) % 256
        assert s == g * 1152 and m == float(g)


def test_codec_leg_gif_equals_png():
    out = _run(L.codec_stats)
    for mid, pj, gs, ps in zip(
        out["media_id"], out["pjpeg_pixel_sum"],
        out["gif_pixel_sum"], out["png_pixel_sum"],
    ):
        g = int(mid) % 256
        assert pj == g * 1152
        want = sum(
            3 * ((((int(mid) * 13 + k * 5) % 16) * 17) % 256)
            for k in range(64)
        )
        assert gs == want and ps == want  # two decoders, same pixels


def test_av_leg_matches_oracle_formula():
    out = _run(L.av_stats)
    for mid, ss, zc, pr in zip(
        out["media_id"], out["audio_sample_sum"],
        out["audio_zero_crossings"], out["avi_probe"],
    ):
        m = int(mid)
        samples = [(m * 7 + k * 13) % 2001 - 1000 for k in range(400)]
        assert ss == sum(samples)
        want_zc = sum(
            (samples[k] < 0) != (samples[k - 1] < 0)
            for k in range(1, 400)
        )
        assert zc == want_zc
        assert pr == (m % 5 + 1) * 1000 + m % 256


def test_mp4_leg_remux_invariance():
    out = _run(L.mp4_stats)
    for mid, pr, ss in zip(
        out["media_id"], out["mp4_probe"], out["mp4_stream_sum"]
    ):
        m = int(mid)
        nf = m % 4 + 2
        assert pr == nf * 1000000 + 64 * 1000 + 48
        want = sum(((m + i * 3) % 256) * (20 + i) for i in range(nf))
        assert ss == want  # -1 would mean the two layouts diverged


def test_audio_meta_leg():
    out = _run(L.audio_meta_stats)
    for mid, mp3p, fl, op in zip(
        out["media_id"], out["mp3_probe"],
        out["flac_total_samples"], out["opus_duration_s"],
    ):
        m = int(mid)
        assert mp3p == (m % 7 + 3) * 1000000 + 44100
        assert fl == (m % 9 + 1) * 44100
        assert op == m % 6 + 2


def test_charset_leg_branches():
    out = _run(L.charset_stats)
    for mid, text, cs, src, rep in zip(
        out["media_id"], out["decoded_text"], out["charset"],
        out["charset_source"], out["repaired_text"],
    ):
        m = int(mid)
        base = f"doc {m} {L.CHARSET_SUFFIXES[m % 5]}"
        want_prefix = (
            "<meta charset=iso-8859-1>" if m % 5 == 2 else ""
        )
        assert text == want_prefix + base
        assert rep == base  # mojibake'd twin repaired exactly
        assert (cs, src) == {
            0: ("utf-8", "http"),
            1: ("utf-16-le", "bom"),
            2: ("cp1252", "meta"),
            3: ("utf-8", "utf8"),
            4: ("cp1252", "fallback"),
        }[m % 5]


def test_pdf_leg():
    out = _run(L.pdf_stats)
    for mid, text, np_ in zip(
        out["media_id"], out["pdf_text"], out["pdf_pages"]
    ):
        m = int(mid)
        want = "\n".join(
            f"pdf doc {m} page {k}" for k in range(m % 3 + 1)
        )
        assert text == want and np_ == m % 3 + 1


def test_stats_legs_schema_fragments_cover_all_columns():
    """The chain contract: every column a kernel adds appears in its
    schema fragment, in order — the invariant that keeps a new leg from
    silently desynchronizing kernel output and declared schema."""
    base = pd.DataFrame({"media_id": [3]})
    prev_cols = ["media_id"]
    cur = base
    for kernel, fragment in L.STATS_LEGS:
        cur = list(kernel(iter([cur])))[0]
        declared = [
            c.strip().split(" ")[0]
            for c in fragment.strip().split(",") if c.strip()
        ]
        assert list(cur.columns) == prev_cols + declared
        prev_cols = list(cur.columns)
