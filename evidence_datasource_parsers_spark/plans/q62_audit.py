"""Per-leg hash forensics for multi-leg gate queries (round-9 verdict #4).

The 50-query driver window forces new operators to ride as LEGS of an
existing query's single value hash — q62 hosts ~8 codec kernel tiers,
q42 hosts the whole counter-store family — so a red row used to mean a
manual bisection over every hosted kernel.  This module names the
culprit instead: it partitions a query's result columns into LEGS,
hashes each leg's sub-frame (join key + that leg's columns,
driver-replica canonicalization) on both the Spark and the oracle side,
and records per-leg match/mismatch in ``{Q}_LEGS_AUDIT.json``.

The audit is PURE over the two pandas frames the verifier has already
computed — it never re-executes the plan, so refreshing it at verify
time is free.  ``tools/verify_local.py`` consults :data:`LEG_AUDITS`
for every query it runs; seeded-perturbation tests
(tests/test_q62_legs_audit.py) prove a kernel fault flips exactly its
own leg.
"""

from __future__ import annotations

import json
import os

from evidence_datasource_parsers_spark import forensics
from evidence_datasource_parsers_spark.forensics import (
    _hash_canon,
    canon_pandas,
)

#: q62's result-column partition, one entry per kernel tier.  ``media_id``
#: is the join key and is prepended to every leg.  Coverage is asserted:
#: every q62 result column must belong to exactly one leg, so a new
#: kernel's columns cannot silently ship un-audited.
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

#: q42's partition: one leg per sketch/statistic family it gates.
Q42_LEG_COLUMNS = {
    "percentiles": ["median_qty_c", "p25_price_c", "p75_price_c"],
    "exact_distinct": ["exact_parts"],
    "hll": ["hll_within_5pct", "merged_hll_within_5pct"],
    "gk_quantile": ["approx_p50_within_tol"],
    "histogram": ["hist_qty_c"],
    "cms": ["cms_status_o_c"],
    "bloom": ["bloom_status_o", "bloom_status_zz"],
    "bottomk_sample": ["bk_median_qty_c"],
    "histogram_drift": [
        "drift_tv_num", "drift_tv_den", "drift_within_tol",
    ],
}


def audit_legs(
    query: str,
    key: str,
    leg_columns: dict,
    s_pdf,
    d_pdf,
    sf_dir: str = "",
    artifact: str | None = None,
    write: bool = True,
) -> dict:
    """Hash each leg's sub-frame on both sides; name any diverging leg.

    ``s_pdf``/``d_pdf`` are the Spark ``toPandas()`` and DuckDB
    ``rel.df()`` results — the exact frames the driver-replica gate
    compares.  Returns the audit dict; when ``write`` is set also
    persists ``{ARTIFACT_DIR}/{artifact}``.
    """
    mapped = {c for cols in leg_columns.values() for c in cols} | {key}
    # symmetric coverage: a column present on EITHER side must belong to
    # a leg — an oracle-only column would otherwise ship un-audited with
    # the artifact still claiming 'match'
    unmapped = sorted(
        (set(s_pdf.columns) | set(d_pdf.columns)) - mapped
    )
    legs = {}
    for leg, cols in leg_columns.items():
        entry = {}
        for side, pdf in (("spark", s_pdf), ("oracle", d_pdf)):
            missing = [c for c in [key] + cols if c not in pdf.columns]
            if missing:
                entry[f"{side}_hash"] = f"MISSING:{missing}"
                continue
            sc, sr = canon_pandas(pdf[[key] + cols])
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
        "query": query,
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
    # gate-scale only: a verify run at sf0.001 must not overwrite the
    # committed sf0.01 leg-hash evidence (same rule as forensics._write_status)
    if write and artifact and forensics.is_gate_sf(sf_dir):
        try:
            path = os.path.join(forensics.ARTIFACT_DIR, artifact)
            with open(path, "w") as fh:
                json.dump(audit, fh, indent=1, default=str)
        except Exception:  # noqa: BLE001 — forensics never fails the gate
            pass
    return audit


def audit_q62_legs(s_pdf, d_pdf, sf_dir: str = "", write: bool = True) -> dict:
    return audit_legs(
        "q62_multimodal_meta", "media_id", LEG_COLUMNS, s_pdf, d_pdf,
        sf_dir=sf_dir, artifact="Q62_LEGS_AUDIT.json", write=write,
    )


def audit_q42_legs(s_pdf, d_pdf, sf_dir: str = "", write: bool = True) -> dict:
    return audit_legs(
        "q42_percentiles", "l_returnflag", Q42_LEG_COLUMNS, s_pdf, d_pdf,
        sf_dir=sf_dir, artifact="Q42_LEGS_AUDIT.json", write=write,
    )


#: verify_local's dispatch: query name → leg-audit function.
LEG_AUDITS = {
    "q62_multimodal_meta": audit_q62_legs,
    "q42_percentiles": audit_q42_legs,
}
