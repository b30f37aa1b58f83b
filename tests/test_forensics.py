"""Forensics observability (round-5 verdict item #2).

Round 5's audit was silent on success and swallowed every failure, so a red
driver gate could not be distinguished from "the audit never ran".  The
contract now: ``audit_against_oracle`` ALWAYS prints one status line; at the
GATE scale (sf0.01) it also writes ``{NAME}_AUDIT.json`` (match / mismatch /
error); on mismatch it additionally writes the ``{NAME}_DIFF.json``
diverging-row artifact at any scale.  Non-gate scales (sf0.001 smoke,
pytest) never persist the status artifact — that is how a smoke run used to
overwrite committed gate evidence (round-8/9 recurring drift).
"""

from __future__ import annotations

import json
import os

import pytest

from evidence_datasource_parsers_spark import forensics


GATE_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture
def artifact_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(forensics, "ARTIFACT_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_NO_FORENSICS", raising=False)
    return str(tmp_path)


def _read(path):
    with open(path) as fh:
        return json.load(fh)


def test_audit_match_writes_status_artifact(spark, artifact_dir, capsys):
    df = spark.range(3).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_match", df, GATE_SF_DIR, "SELECT range AS n FROM range(3)"
    )
    st = _read(os.path.join(artifact_dir, "T_MATCH_AUDIT.json"))
    assert st["status"] == "match"
    assert st["result_hash"] == st["oracle_hash"]
    assert st["rows_spark"] == st["rows_oracle"] == 3
    assert st["env"]["pyspark"]
    assert not os.path.exists(os.path.join(artifact_dir, "T_MATCH_DIFF.json"))
    assert "t_match self-audit: MATCH" in capsys.readouterr().out


def test_audit_mismatch_writes_both_artifacts(spark, artifact_dir, capsys):
    df = spark.range(3).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_mis", df, GATE_SF_DIR, "SELECT range + 100 AS n FROM range(3)"
    )
    st = _read(os.path.join(artifact_dir, "T_MIS_AUDIT.json"))
    assert st["status"] == "mismatch"
    assert st["result_hash"] != st["oracle_hash"]
    diff = _read(os.path.join(artifact_dir, "T_MIS_DIFF.json"))
    assert diff["spark_only_rows"] and diff["oracle_only_rows"]
    assert "t_mis self-audit: MISMATCH" in capsys.readouterr().out


def test_audit_error_is_recorded_not_swallowed(spark, artifact_dir, capsys):
    df = spark.range(1).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_err", df, GATE_SF_DIR, "SELECT definitely syntax error ("
    )
    st = _read(os.path.join(artifact_dir, "T_ERR_AUDIT.json"))
    assert st["status"] == "error"
    assert "traceback" in st
    assert "t_err self-audit: ERROR" in capsys.readouterr().out


def test_non_gate_sf_never_persists_status_artifact(
    spark, sf_dir, artifact_dir, capsys
):
    # sf_dir fixture = sf0.001 — the smoke scale whose runs kept
    # overwriting the committed sf0.01 artifact (round-8/9 drift)
    df = spark.range(3).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_smoke", df, sf_dir, "SELECT range AS n FROM range(3)"
    )
    assert not os.path.exists(
        os.path.join(artifact_dir, "T_SMOKE_AUDIT.json")
    )
    out = capsys.readouterr().out
    assert "t_smoke self-audit: MATCH" in out
    assert "artifact not persisted" in out
    # mismatch evidence still lands at any scale
    forensics.audit_against_oracle(
        "t_smokemis", df, sf_dir, "SELECT range + 9 AS n FROM range(3)"
    )
    assert not os.path.exists(
        os.path.join(artifact_dir, "T_SMOKEMIS_AUDIT.json")
    )
    # ...in a SCALE-SUFFIXED sibling: the bare DIFF name belongs to the
    # gate scale and must never be clobbered by a smoke mismatch
    assert not os.path.exists(
        os.path.join(artifact_dir, "T_SMOKEMIS_DIFF.json")
    )
    assert os.path.exists(
        os.path.join(artifact_dir, "T_SMOKEMIS_DIFF_sf0.001.json")
    )


def test_status_artifact_is_ts_stable(spark, artifact_dir):
    """Re-running an identical audit leaves the artifact byte-identical
    (ts is NOT refreshed) — three rounds ended with ts-only git drift on
    the committed gate evidence before this guarantee."""
    df = spark.range(3).selectExpr("id AS n")
    path = os.path.join(artifact_dir, "T_TS_AUDIT.json")
    forensics.audit_against_oracle(
        "t_ts", df, GATE_SF_DIR, "SELECT range AS n FROM range(3)"
    )
    first = open(path).read()
    forensics.audit_against_oracle(
        "t_ts", df, GATE_SF_DIR, "SELECT range AS n FROM range(3)"
    )
    assert open(path).read() == first
    # a REAL change (status flips to mismatch) still rewrites
    forensics.audit_against_oracle(
        "t_ts", df, GATE_SF_DIR, "SELECT range + 1 AS n FROM range(3)"
    )
    assert json.loads(open(path).read())["status"] == "mismatch"


def test_smoke_mismatch_never_touches_gate_diff(spark, artifact_dir):
    """ADVICE r10: a smoke-scale mismatch used to overwrite the committed
    gate-scale {NAME}_DIFF.json with smoke rows.  Now the gate artifact
    survives a smoke mismatch AND a smoke match (which cleans only its
    own scale-suffixed sibling)."""
    df = spark.range(3).selectExpr("id AS n")
    gate_diff = os.path.join(artifact_dir, "T_GD_DIFF.json")
    forensics.audit_against_oracle(
        "t_gd", df, GATE_SF_DIR, "SELECT range + 7 AS n FROM range(3)"
    )
    gate_evidence = open(gate_diff).read()
    smoke = "/root/testdata/sf0.001"
    forensics.audit_against_oracle(
        "t_gd", df, smoke, "SELECT range + 9 AS n FROM range(3)"
    )
    assert open(gate_diff).read() == gate_evidence
    forensics.audit_against_oracle(
        "t_gd", df, smoke, "SELECT range AS n FROM range(3)"
    )
    assert open(gate_diff).read() == gate_evidence
    assert not os.path.exists(
        os.path.join(artifact_dir, "T_GD_DIFF_sf0.001.json")
    )


def test_audit_disabled_by_env(spark, sf_dir, artifact_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_FORENSICS", "1")
    df = spark.range(1).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_off", df, sf_dir, "SELECT range AS n FROM range(1)"
    )
    assert os.listdir(artifact_dir) == []


def test_result_hash_stable_under_column_and_row_order(spark):
    a = forensics.result_hash(["b", "a"], [(2, 1), (4, 3)])
    b = forensics.result_hash(["a", "b"], [(3, 4), (1, 2)])
    assert a == b
    c = forensics.result_hash(["a", "b"], [(3, 4), (1, 99)])
    assert a != c


def test_audit_runs_once_per_process_per_sf(spark, artifact_dir, capsys):
    """r13: a second audit of the same (name, sf) in one process skips the
    query+oracle re-execution but still announces itself in the log."""
    df = spark.range(3).selectExpr("id AS n")
    forensics.audit_against_oracle(
        "t_memo", df, GATE_SF_DIR, "SELECT range AS n FROM range(3)"
    )
    first = capsys.readouterr().out
    assert "t_memo self-audit: MATCH" in first
    forensics.audit_against_oracle(
        "t_memo", df, GATE_SF_DIR, "SELECT range AS n FROM range(3)"
    )
    second = capsys.readouterr().out
    assert "t_memo self-audit: SKIPPED" in second
    # a DIFFERENT sf is a different key and audits for real
    forensics.audit_against_oracle(
        "t_memo", df, "/root/testdata/sf0.001",
        "SELECT range AS n FROM range(3)",
    )
    assert "t_memo self-audit: MATCH" in capsys.readouterr().out


def test_audit_error_is_not_memoized(spark, artifact_dir, capsys):
    """r13 review fix: an audit that ERRORs must NOT enter the
    once-per-process memo — a transient failure (bad oracle SQL here)
    would otherwise be SKIPPED forever while the log claims the audit
    ran.  The retry re-executes; a subsequent success memoizes."""
    df = spark.range(2).selectExpr("id AS n")
    bad = "SELECT nonexistent_col FROM range(2)"
    forensics.audit_against_oracle("t_err_memo", df, GATE_SF_DIR, bad)
    assert "t_err_memo self-audit: ERROR" in capsys.readouterr().out
    # same (plan, oracle, sf) again: must RE-AUDIT, not skip
    forensics.audit_against_oracle("t_err_memo", df, GATE_SF_DIR, bad)
    out = capsys.readouterr().out
    assert "SKIPPED" not in out
    assert "t_err_memo self-audit: ERROR" in out
    # a completed audit memoizes as before
    good = "SELECT range AS n FROM range(2)"
    forensics.audit_against_oracle("t_err_memo", df, GATE_SF_DIR, good)
    assert "t_err_memo self-audit: MATCH" in capsys.readouterr().out
    forensics.audit_against_oracle("t_err_memo", df, GATE_SF_DIR, good)
    assert "SKIPPED" in capsys.readouterr().out
