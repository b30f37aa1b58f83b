"""Per-leg hash forensics for q62_multimodal_meta (round-9 verdict item #4).

q62's single driver value hash covers ~8 codec kernel modules
(plans/q62_legs.py) plus the charset, PDF and script-ID tiers — when it goes
red, the failing KERNEL used to need a manual bisection over ~20 decode
paths.  This module names the culprit instead: it partitions the q62 result
columns into LEGS (one per kernel tier), hashes each leg's sub-frame
(``media_id`` + that leg's columns, driver-replica canonicalization) on both
the Spark and the oracle side, and records per-leg match/mismatch in
``Q62_LEGS_AUDIT.json``.

The audit is PURE over the two pandas frames the verifier has already
computed — it never re-executes the plan, so refreshing it at verify time is
free.  ``tools/verify_local.py`` calls :func:`audit_q62_legs` whenever q62
runs; a seeded-perturbation test (tests/test_q62_legs_audit.py) proves a
kernel fault flips exactly its own leg.
"""

from __future__ import annotations

import json
import os

from evidence_datasource_parsers_spark import forensics
from evidence_datasource_parsers_spark.forensics import (
    _hash_canon,
    canon_pandas,
)

#: result-column partition, one entry per kernel tier.  ``media_id`` is the
#: join key and is prepended to every leg.  Coverage is asserted: every q62
#: result column must belong to exactly one leg, so a new kernel's columns
#: cannot silently ship un-audited.
LEG_COLUMNS = {
    "base_mm01": [
        "media_type", "width", "height", "depth", "payload_bytes",
    ],
    "ppm": ["ppm_pixel_sum", "ppm_pixel_mean"],
    "jpeg": ["jpeg_pixel_sum", "jpeg_pixel_mean"],
    "codec_pjpeg_gif_png": [
        "pjpeg_pixel_sum", "gif_pixel_sum", "png_pixel_sum",
    ],
    "av_wav_avi": [
        "audio_sample_sum", "audio_zero_crossings", "avi_probe",
    ],
    "mp4": ["mp4_probe", "mp4_stream_sum"],
    "audio_meta": ["mp3_probe", "flac_total_samples", "opus_duration_s"],
    "charset": [
        "decoded_text", "charset", "charset_source", "repaired_text",
    ],
    "pdf": ["pdf_text", "pdf_pages"],
    "script_id": [
        "latin_chars", "han_chars", "kata_chars", "cyr_chars",
        "script_guess",
    ],
}


def audit_q62_legs(s_pdf, d_pdf, sf_dir: str = "", write: bool = True) -> dict:
    """Hash each leg's sub-frame on both sides; name any diverging leg.

    ``s_pdf``/``d_pdf`` are the Spark ``toPandas()`` and DuckDB ``rel.df()``
    results of q62 — the exact frames the driver-replica gate compares.
    Returns the audit dict; when ``write`` is set also persists
    ``{ARTIFACT_DIR}/Q62_LEGS_AUDIT.json``.
    """
    mapped = {c for cols in LEG_COLUMNS.values() for c in cols} | {"media_id"}
    unmapped = [c for c in s_pdf.columns if c not in mapped]
    legs = {}
    for leg, cols in LEG_COLUMNS.items():
        entry = {}
        for side, pdf in (("spark", s_pdf), ("oracle", d_pdf)):
            missing = [c for c in ["media_id"] + cols if c not in pdf.columns]
            if missing:
                entry[f"{side}_hash"] = f"MISSING:{missing}"
                continue
            sc, sr = canon_pandas(pdf[["media_id"] + cols])
            entry[f"{side}_hash"] = _hash_canon(sc, sr)
        # a leg absent from EITHER side is un-audited, never a match —
        # two identical MISSING strings must not read as green
        entry["match"] = (
            entry["spark_hash"] == entry["oracle_hash"]
            and not entry["spark_hash"].startswith("MISSING")
        )
        legs[leg] = entry
    failing = sorted(leg for leg, e in legs.items() if not e["match"])
    audit = {
        "query": "q62_multimodal_meta",
        "sf_dir": sf_dir,
        "rows_spark": int(len(s_pdf)),
        "rows_oracle": int(len(d_pdf)),
        "legs": legs,
        "failing_legs": failing,
        "unmapped_columns": unmapped,
        "status": (
            "unmapped-columns" if unmapped
            else ("match" if not failing else "mismatch")
        ),
    }
    if write:
        try:
            path = os.path.join(forensics.ARTIFACT_DIR, "Q62_LEGS_AUDIT.json")
            with open(path, "w") as fh:
                json.dump(audit, fh, indent=1, default=str)
        except Exception:  # noqa: BLE001 — forensics never fails the gate
            pass
    return audit
