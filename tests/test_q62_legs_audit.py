"""Per-leg hash forensics for the multi-leg gate hosts (plans/q62_audit.py).

Covers q62 (codec kernels) and q42 (counter-store family).

q62's single value hash covers ~8 kernel modules; the leg audit must (a)
cover every result column, (b) report all-green on the real query, and (c)
when a kernel is seeded with a fault, flip EXACTLY that kernel's leg —
otherwise a red q62 still means a 20-kernel bisection.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from evidence_datasource_parsers_spark import forensics
from evidence_datasource_parsers_spark.plans import CATALOG
from evidence_datasource_parsers_spark.plans import q62_legs as L
from evidence_datasource_parsers_spark.plans.q62_audit import (
    LEG_COLUMNS,
    audit_q62_legs,
)

NAME = "q62_multimodal_meta"


def _build_frames(spark, sf_dir, name):
    q = CATALOG[name]
    s_pdf = q.builder(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in forensics.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    d_pdf = con.sql(q.oracle).df()
    con.close()
    return s_pdf, d_pdf


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    return _build_frames(spark, sf_dir, NAME)


@pytest.fixture(scope="module")
def q42_frames(spark, sf_dir):
    return _build_frames(spark, sf_dir, "q42_percentiles")


def test_legs_cover_all_columns_and_match(frames, tmp_path, monkeypatch):
    s_pdf, d_pdf = frames
    monkeypatch.setattr(forensics, "ARTIFACT_DIR", str(tmp_path))
    # artifact persistence is GATE-scale only: a non-gate sf_dir must not
    # write (that path overwrote committed gate evidence in rounds 8/9)
    audit = audit_q62_legs(s_pdf, d_pdf, sf_dir="sf-test")
    assert audit["unmapped_columns"] == []
    assert audit["failing_legs"] == []
    assert audit["status"] == "match"
    assert set(audit["legs"]) == set(LEG_COLUMNS)
    assert not os.path.exists(os.path.join(tmp_path, "Q62_LEGS_AUDIT.json"))
    audit = audit_q62_legs(s_pdf, d_pdf, sf_dir="/any/where/sf0.01")
    on_disk = json.load(open(os.path.join(tmp_path, "Q62_LEGS_AUDIT.json")))
    assert on_disk["status"] == "match"
    assert on_disk["rows_spark"] == len(s_pdf)


def test_frame_perturbation_flips_exactly_one_leg(frames):
    s_pdf, d_pdf = frames
    bad = s_pdf.copy()
    bad.loc[bad.index[0], "gif_pixel_sum"] += 1
    audit = audit_q62_legs(bad, d_pdf, write=False)
    assert audit["failing_legs"] == ["codec_pjpeg_gif_png"]


def test_leg_missing_from_both_frames_is_not_a_match(frames):
    """A kernel deleted from BOTH the plan and the oracle must show its
    leg as un-audited (match=False), not green via two identical
    MISSING strings — and a missing join key must not raise."""
    s_pdf, d_pdf = frames
    dropped = [c for c in LEG_COLUMNS["jpeg"]]
    audit = audit_q62_legs(
        s_pdf.drop(columns=dropped), d_pdf.drop(columns=dropped),
        write=False,
    )
    assert audit["legs"]["jpeg"]["match"] is False
    assert "jpeg" in audit["failing_legs"]
    # no media_id anywhere: every leg is un-audited, nothing raises
    audit2 = audit_q62_legs(
        s_pdf.drop(columns=["media_id"]), d_pdf, write=False
    )
    assert all(not e["match"] for e in audit2["legs"].values())


def test_new_unmapped_column_is_flagged(frames):
    s_pdf, d_pdf = frames
    grown = s_pdf.copy()
    grown["new_kernel_stat"] = 0
    audit = audit_q62_legs(grown, d_pdf.assign(new_kernel_stat=0), write=False)
    assert audit["unmapped_columns"] == ["new_kernel_stat"]
    assert audit["status"] == "unmapped-columns"
    # symmetric: a column present ONLY on the oracle side is flagged too
    audit2 = audit_q62_legs(
        s_pdf, d_pdf.assign(oracle_only_stat=0), write=False
    )
    assert audit2["unmapped_columns"] == ["oracle_only_stat"]
    assert audit2["status"] == "unmapped-columns"


def test_seeded_kernel_fault_flips_own_leg(spark, sf_dir, frames, monkeypatch):
    """Seed a real fault INSIDE the jpeg kernel (off-by-one pixel sum) and
    re-run the registered query: only the jpeg leg may go red."""
    _, d_pdf = frames
    orig = L.jpeg_stats

    def faulty_jpeg(batches):
        for pdf in orig(batches):
            pdf = pdf.copy()
            pdf["jpeg_pixel_sum"] = pdf["jpeg_pixel_sum"] + 1
            yield pdf

    idx = next(
        i for i, (k, _) in enumerate(L.STATS_LEGS) if k is L.jpeg_stats
    )
    saved = L.STATS_LEGS[idx]
    L.STATS_LEGS[idx] = (faulty_jpeg, saved[1])
    try:
        s_bad = CATALOG[NAME].builder(spark, sf_dir).toPandas()
    finally:
        L.STATS_LEGS[idx] = saved
    audit = audit_q62_legs(s_bad, d_pdf, write=False)
    assert audit["failing_legs"] == ["jpeg"]
    for leg, entry in audit["legs"].items():
        assert entry["match"] == (leg != "jpeg")


def test_q42_leg_audit_covers_and_localizes(q42_frames):
    """q42 hosts the whole counter-store family under one value hash —
    the generic leg audit must cover every column and name the exact
    sketch leg a fault lands in."""
    from evidence_datasource_parsers_spark.plans.q62_audit import (
        Q42_LEG_COLUMNS,
        audit_q42_legs,
    )

    s_pdf, d_pdf = q42_frames

    audit = audit_q42_legs(s_pdf, d_pdf, write=False)
    assert audit["unmapped_columns"] == []
    assert audit["failing_legs"] == []
    assert set(audit["legs"]) == set(Q42_LEG_COLUMNS)

    bad = s_pdf.copy()
    bad.loc[bad.index[0], "cms_status_o_c"] += 1
    assert audit_q42_legs(bad, d_pdf, write=False)["failing_legs"] == ["cms"]
    bad2 = s_pdf.copy()
    bad2.loc[bad2.index[0], "bloom_status_zz"] = not bool(
        bad2.loc[bad2.index[0], "bloom_status_zz"]
    )
    assert audit_q42_legs(bad2, d_pdf, write=False)["failing_legs"] == [
        "bloom"
    ]
