"""Parquet layout audit (operators/layout_audit.py).

The metrics must rank layouts the way pruning actually behaves: a
range-sorted layout clusters its sort column (depth ~ 1) and nothing else;
a z-ordered layout bounds BOTH dimensions; a random layout clusters
nothing.  This is the measurement that validates zorder_by's claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.layout_audit import (
    layout_metrics,
    layout_report,
    row_group_stats,
)
from evidence_datasource_parsers_spark.operators.zorder import zorder_by

N = 4096
FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # deterministic decorrelated 2-d data: bit-reversed y breaks any
    # correlation with x, so sorting by x cannot accidentally cluster y
    def bitrev(v: int, bits: int = 12) -> int:
        return int(format(v, f"0{bits}b")[::-1], 2)

    rows = [(i, float(i), float(bitrev(i)), f"s{i % 7}") for i in range(N)]
    return spark.createDataFrame(
        rows, "id long, x double, y double, tag string"
    )


def _metrics(spark, df, path) -> dict[str, dict]:
    df.write.mode("overwrite").parquet(path)
    rep = layout_report(spark, path).collect()
    return {r["column"]: r.asDict() for r in rep}


def test_stats_cover_all_rows_and_columns(spark, grid, tmp_path):
    p = str(tmp_path / "flat")
    grid.repartition(FILES).write.parquet(p)
    stats = row_group_stats(spark, p)
    rows = stats.collect()
    cols = {r["column"] for r in rows}
    assert {"id", "x", "y", "tag"} <= cols
    per_col_rows = sum(r["n_rows"] for r in rows if r["column"] == "x")
    assert per_col_rows == N
    # every numeric row group carries usable min/max
    assert all(
        r["vmin"] is not None and r["vmax"] is not None
        for r in rows
        if r["column"] in ("id", "x", "y") and r["has_stats"]
    )
    # strings surface via the string rendering, not the numeric one
    assert all(
        r["vmin"] is None and r["vmin_str"] is not None
        for r in rows
        if r["column"] == "tag" and r["has_stats"]
    )


def test_sorted_layout_clusters_sort_column_only(spark, grid, tmp_path):
    p = str(tmp_path / "by_x")
    m = _metrics(
        spark,
        grid.repartitionByRange(FILES, "x").sortWithinPartitions("x"),
        p,
    )
    g = m["x"]["n_groups"]
    assert g >= FILES // 2
    # sort column: a point probe touches ~1 group; the orthogonal
    # decorrelated column touches nearly all of them
    assert m["x"]["avg_depth"] <= 2.0
    assert m["x"]["width_amplification"] <= 1.5
    assert m["y"]["avg_depth"] >= 0.8 * g
    # string column is excluded from the numeric metrics
    assert "tag" not in m


def test_zorder_bounds_both_dimensions(spark, grid, tmp_path):
    by_x = _metrics(
        spark,
        grid.repartitionByRange(FILES, "x").sortWithinPartitions("x"),
        str(tmp_path / "zx"),
    )
    zed = _metrics(
        spark,
        zorder_by(grid, ["x", "y"], num_partitions=FILES),
        str(tmp_path / "zz"),
    )
    g = zed["y"]["n_groups"]
    # z-order: BOTH dims prune far better than the single-sort's worst dim
    assert zed["y"]["avg_depth"] <= 0.5 * by_x["y"]["avg_depth"]
    assert zed["x"]["avg_depth"] <= 0.5 * g
    assert zed["y"]["avg_depth"] <= 0.5 * g


def test_random_layout_prunes_nothing(spark, grid, tmp_path):
    m = _metrics(spark, grid.repartition(FILES), str(tmp_path / "rnd"))
    for c in ("x", "y"):
        assert m[c]["avg_depth"] >= 0.8 * m[c]["n_groups"]
        assert m[c]["width_amplification"] >= 0.5 * m[c]["n_groups"]


def test_constant_column_degenerates_honestly(spark, tmp_path):
    df = spark.range(256).select(
        F.col("id"), F.lit(7.0).alias("c")
    )
    p = str(tmp_path / "const")
    df.repartition(4).write.parquet(p)
    m = {
        r["column"]: r.asDict()
        for r in layout_report(spark, p).collect()
    }
    assert m["c"]["width_amplification"] is None
    assert m["c"]["avg_depth"] == m["c"]["n_groups"]


def test_layout_advice_random_triggers_recluster(spark, grid, tmp_path):
    """The recommendation half of the loop (round-11): a layout with NO
    pruning axis is told to re-cluster, naming the candidate columns."""
    from evidence_datasource_parsers_spark.operators.layout_audit import (
        layout_advice,
    )

    p = str(tmp_path / "rnd_adv")
    grid.repartition(FILES).write.parquet(p)
    adv = layout_advice(layout_report(spark, p))
    assert adv["action"] == "recluster"
    assert set(adv["candidates"]) >= {"x", "y"}
    assert "zorder" in adv["reason"]


def test_layout_advice_sorted_and_zordered_leave(spark, grid, tmp_path):
    """A deliberately x-sorted store is LEFT alone (its orthogonal column
    not pruning is the design, not a fault), and so is a z-ordered one
    (per-dimension depth ~ sqrt(G) is partial/clustered, never the
    no-axis case)."""
    from evidence_datasource_parsers_spark.operators.layout_audit import (
        layout_advice,
    )
    from evidence_datasource_parsers_spark.operators.zorder import zorder_by

    p1 = str(tmp_path / "sorted_adv")
    grid.repartitionByRange(FILES, "x").sortWithinPartitions("x") \
        .write.parquet(p1)
    adv = layout_advice(layout_report(spark, p1))
    assert adv["action"] == "leave"
    assert "x" in adv["clustered"]

    p2 = str(tmp_path / "z_adv")
    zorder_by(grid, ["x", "y"], num_partitions=FILES).write.parquet(p2)
    adv2 = layout_advice(layout_report(spark, p2))
    assert adv2["action"] == "leave", adv2


def test_layout_advice_degenerate_cases(spark, tmp_path):
    from evidence_datasource_parsers_spark.operators.layout_audit import (
        layout_advice,
    )

    # constants only → leave (pruning trivially perfect)
    p = str(tmp_path / "const_adv")
    spark.range(256).select(F.lit(7.0).alias("c")).repartition(4) \
        .write.parquet(p)
    adv = layout_advice(layout_report(spark, p))
    assert adv["action"] == "leave"
    # too few groups → leave (compaction target, not clustering)
    p2 = str(tmp_path / "few_adv")
    spark.range(64).selectExpr("CAST(id AS DOUBLE) AS v").coalesce(1) \
        .write.parquet(p2)
    adv2 = layout_advice(layout_report(spark, p2))
    assert adv2["action"] == "leave"


def test_compact_cli_prints_layout_advice(spark, tmp_path, capsys):
    """compact consumes the layout report as an ADVISORY: a hash-bucketed
    fingerprint rewrite (random in value space) prints the re-cluster
    recommendation; nothing is rewritten twice."""
    from evidence_datasource_parsers_spark.__main__ import main

    fp = str(tmp_path / "fp_adv")
    for i in range(8):
        spark.createDataFrame(
            [((i * 7919 + j * 104729) % 100000,) for j in range(512)],
            "content_hash long",
        ).write.mode("append").parquet(fp)
    assert main(["compact", "--store", fp, "--kind", "fingerprint",
                 "--buckets", "8", "--bucket-col", "content_hash"]) == 0
    out = capsys.readouterr().out
    assert "compact: layout recluster" in out
    assert "content_hash" in out


def test_layout_audit_cli_prints_advice(spark, grid, tmp_path, capsys):
    from evidence_datasource_parsers_spark.__main__ import main

    p = str(tmp_path / "cli_adv")
    grid.repartitionByRange(FILES, "x").sortWithinPartitions("x") \
        .write.parquet(p)
    assert main(["layout-audit", p]) == 0
    out = capsys.readouterr().out
    assert "layout-audit: leave — clustered on" in out


def test_layout_advice_hedges_on_string_keyed_layouts(spark, tmp_path):
    """A store whose REAL pruning axis is a string column (term-sorted)
    must not be confidently told to re-cluster on its irrelevant numeric
    columns: the depth metric cannot see string stats (parquet truncates
    them), so the verdict names the unmeasured columns and hedges."""
    from evidence_datasource_parsers_spark.operators.layout_audit import (
        layout_advice,
        layout_metrics,
        row_group_stats,
        string_stat_columns,
    )

    df = spark.createDataFrame(
        [(f"term{i:05d}", (i * 104729) % 4096) for i in range(4096)],
        "term string, n long",
    )
    p = str(tmp_path / "term_sorted")
    df.repartitionByRange(8, "term").sortWithinPartitions("term") \
        .write.parquet(p)
    stats = row_group_stats(spark, p)
    unmeasured = string_stat_columns(stats)
    assert unmeasured == ["term"]
    adv = layout_advice(layout_metrics(stats), unmeasured=unmeasured)
    # n is random → no measured pruning axis → recluster fires, but the
    # verdict must carry the string-column hedge
    assert adv["action"] == "recluster"
    assert adv["unmeasured"] == ["term"]
    assert "unmeasured" in adv["reason"] and "term" in adv["reason"]


def test_distributed_listing_matches_driver_listing(spark, grid, tmp_path):
    """listing='distributed' (binaryFile path frame — the million-file
    path where the driver must not hold the list) yields EXACTLY the
    driver listing's stats rows, and its scan reads only the path column
    (the binary content is pruned)."""
    p = str(tmp_path / "dl")
    grid.repartition(FILES).write.parquet(p)

    def key(r):
        d = r.asDict()
        d["path"] = d["path"].rsplit("/", 1)[-1]  # normalize dir spelling
        return tuple(sorted(d.items()))

    drv = sorted(key(r) for r in row_group_stats(spark, p).collect())
    dist_df = row_group_stats(spark, p, listing="distributed")
    dist = sorted(key(r) for r in dist_df.collect())
    assert drv == dist and len(drv) > 0

    plan = dist_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReadSchema: struct<path:string>" in plan, plan

    with pytest.raises(ValueError, match="driver.*distributed"):
        row_group_stats(spark, p, listing="nope")


def test_compact_cli_apply_layout_reclusters(spark, tmp_path, capsys):
    """--apply-layout acts on the advisory (VERDICT r12 item 6): a
    mis-sorted numeric store is rewritten z-ordered on the candidate
    columns and the post-rewrite audit flips to 'leave' (a pruning axis
    now exists)."""
    from evidence_datasource_parsers_spark.__main__ import main

    def bitrev(v: int, bits: int = 12) -> int:
        return int(format(v, f"0{bits}b")[::-1], 2)

    df = spark.createDataFrame(
        [(i, float(i), float(bitrev(i))) for i in range(N)],
        "id long, x double, y double",
    )
    p = str(tmp_path / "apply_rnd")
    df.repartition(FILES).write.parquet(p)
    assert main(["compact", "--store", p, "--kind", "fingerprint",
                 "--apply-layout"]) == 0
    out = capsys.readouterr().out
    assert "compact: layout reclustered on" in out
    assert "compact: layout now leave" in out
    # the rewrite measurably restored pruning on the chosen axes
    from evidence_datasource_parsers_spark.operators.layout_audit import (
        layout_advice,
        layout_report,
    )

    adv = layout_advice(layout_report(spark, p))
    assert adv["action"] == "leave" and adv["clustered"]


def test_compact_cli_apply_layout_hedged_refusal(spark, tmp_path, capsys):
    """A recluster verdict hedged on unmeasured string columns is NOT
    acted on (the store may key on one of them); --layout-cols overrides
    the hedge with an explicit axis choice."""
    from evidence_datasource_parsers_spark.__main__ import main

    df = spark.createDataFrame(
        [(f"term{i:05d}", (i * 104729) % 4096) for i in range(4096)],
        "term string, n long",
    )
    p = str(tmp_path / "apply_hedge")
    df.repartitionByRange(8, "term").sortWithinPartitions("term") \
        .write.parquet(p)
    assert main(["compact", "--store", p, "--kind", "fingerprint",
                 "--apply-layout"]) == 2
    err = capsys.readouterr().err
    assert "hedged on unmeasured string columns" in err and "term" in err

    # explicit axis choice overrides the hedge
    assert main(["compact", "--store", p, "--kind", "fingerprint",
                 "--apply-layout", "--layout-cols", "n"]) == 0
    out = capsys.readouterr().out
    assert "reclustered on ['n']" in out

    # unknown column keeps the CLI contract
    assert main(["compact", "--store", p, "--kind", "fingerprint",
                 "--apply-layout", "--layout-cols", "nope"]) == 2


def test_compact_cli_apply_layout_refuses_bucketed_store(
    spark, tmp_path, capsys
):
    """A bucketed TABLE store's layout IS its identity: --apply-layout
    must refuse rather than z-order away the bucket co-location."""
    import uuid

    from evidence_datasource_parsers_spark.__main__ import main
    from evidence_datasource_parsers_spark.sources.sinks import (
        write_bucketed_store,
    )

    table = f"apply_bkt_{uuid.uuid4().hex[:8]}"
    p = str(tmp_path / "apply_bkt")
    try:
        write_bucketed_store(
            spark.range(512).selectExpr("id AS content_hash"),
            p, table, ["content_hash"], 4,
        )
        assert main(["compact", "--store", p, "--kind", "fingerprint",
                     "--table", table, "--apply-layout"]) == 2
        err = capsys.readouterr().err
        assert "bucket layout is its identity" in err
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
