"""CLI surface: list, run (+ --output sink), and error paths — in-process
(get_spark reuses the test session, so no second JVM)."""

from __future__ import annotations

import gzip
import json

from evidence_datasource_parsers_spark.__main__ import main


def test_list_names_every_query(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q62_multimodal_meta" in out
    assert out.count("oracle") == 50  # every entry carries its oracle tag


def test_run_shows_rows(spark, sf_dir, capsys):
    assert main(["run", "q04_region_rollup", "--sf-dir", sf_dir,
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "r_name" in out or "region" in out.lower()


def test_run_writes_gzip_jsonl(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "out.json.gz")
    assert main(["run", "q04_region_rollup", "--sf-dir", sf_dir,
                 "--output", dest]) == 0
    with gzip.open(dest, "rt") as fh:
        rows = [json.loads(line) for line in fh]
    assert len(rows) == 5  # five regions


def test_unknown_query_exits_2(spark, capsys):
    assert main(["run", "q99_nope"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_refresh_media_cli_two_runs(spark, tmp_path, capsys):
    """The media branch as an operation: two CLI runs with the same swap-
    safe pHash store; the second run's re-encode of a stored photo drops
    and the store directory survives the swap discipline."""
    import numpy as np

    from evidence_datasource_parsers_spark.functions.jpeg import encode_jpeg

    y, x = np.mgrid[0:64, 0:64]
    p = np.clip(
        128 + 60 * np.sin(x / 9.0) + 50 * np.cos(y / 7.0)
        + 20 * np.sin((x * y) / 301.0),
        0, 255,
    )
    photo = np.stack([p, p * 0.8 + 20, p * 0.6 + 40], axis=2).astype(np.uint8)
    q = np.clip(128 + 70 * np.cos(x / 5.0) - 40 * np.sin(y / 11.0), 0, 255)
    other = np.stack([q] * 3, axis=2).astype(np.uint8)

    store, out = str(tmp_path / "phash_store"), str(tmp_path / "ready")
    b1 = str(tmp_path / "b1")
    spark.createDataFrame(
        [(1, encode_jpeg(photo, quality=95))], "media_id long, blob binary"
    ).write.parquet(b1)
    assert main(["refresh-media", "--batch", b1, "--store", store,
                 "--out", out]) == 0
    assert "1 fresh images" in capsys.readouterr().out

    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [
            (10, encode_jpeg(photo, quality=60)),   # re-encode → drop
            (11, encode_jpeg(other, quality=95)),   # new → keep
        ],
        "media_id long, blob binary",
    ).write.parquet(b2)
    assert main(["refresh-media", "--batch", b2, "--store", store,
                 "--out", out]) == 0
    assert "1 fresh images" in capsys.readouterr().out

    ready = {r["media_id"] for r in spark.read.parquet(out).collect()}
    assert ready == {1, 11}
    stored = {r["media_id"] for r in spark.read.parquet(store).collect()}
    assert stored == {1, 11}
