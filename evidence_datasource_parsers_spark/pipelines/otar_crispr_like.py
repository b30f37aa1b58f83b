"""ot_crispr-shaped pipeline: config-driven multi-study fan-out (SURVEY F10,
§2.17 M4).

Capability parity with ``partner_preview_scripts/ot_crispr.py:95-355``: a
small study table drives per-study processing — dynamic stat-column rename
(reduce-chained, ot_crispr.py:244-251), per-study threshold filter against its
configured column, control-dataset left_anti removal (:281-293), replicate
collect_list with a size==replicateNumber completeness filter (:153-158,334),
and a final union of all studies.

Spark-first delta: the reference loops on the driver building N sub-plans
(SURVEY §7.4 risk 6 — plan-size blowup).  Study CONFIG is still driver-side
(it is config, rows of a tiny table), but per-study work stays in one plan
per study and the union is by name; where schemas align, callers can instead
tag one multi-file read with ``input_file_name()`` and push the whole fan-out
into a single plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.joins import (
    anti_join,
    union_by_name,
)

# '|' and '.' stat-column name variants (ot_crispr.py:210-258)
STAT_COLS = ["score", "p-value", "fdr", "rank", "goodsgrna", "lfc"]


def normalize_stat_columns(df: DataFrame, sep: str) -> DataFrame:
    """Rename '<dir><sep><stat>' → '<dir>_<stat>' for both variants —
    the reduce-chained bulk rename idiom (ot_crispr.py:244-251)."""
    renames = {}
    for direction in ("neg", "pos"):
        for stat in STAT_COLS:
            src = f"{direction}{sep}{stat}"
            if src in df.columns:
                renames[src] = f"{direction}_{stat.replace('-', '')}"
    return reduce(
        lambda d, kv: d.withColumnRenamed(kv[0], kv[1]),
        renames.items(),
        df,
    )


def process_study(
    screen: DataFrame,
    study: dict,
    control: DataFrame | None = None,
) -> DataFrame:
    """One study: normalize → threshold on the study's filter column →
    drop control hits → replicate completeness → evidence shaping.

    study: {studyId, projectId, diseases '|'-sep, filterColumn (normalized,
    e.g. 'pos_fdr'), threshold, replicateNumber}.
    """
    sep = "|" if any("|" in c for c in screen.columns) else "."
    normalized = normalize_stat_columns(screen, sep)
    hits = normalized.withColumn(
        "targetFromSourceId", F.split(F.col("id"), "_").getItem(0)
    ).where(F.col(study["filterColumn"]) < study["threshold"])
    if control is not None:
        control_hits = normalize_stat_columns(
            control, "|" if any("|" in c for c in control.columns) else "."
        ).select(
            F.split(F.col("id"), "_").getItem(0).alias("targetFromSourceId")
        ).where(F.col(study["filterColumn"]) < study["threshold"])
        hits = anti_join(hits, control_hits, "targetFromSourceId")
    replicated = (
        hits.groupBy("targetFromSourceId")
        .agg(
            F.sort_array(F.collect_list(F.col(study["filterColumn"]))).alias(
                "replicateStats"
            ),
            F.count(F.lit(1)).alias("n_replicates"),
        )
        .where(F.col("n_replicates") == study.get("replicateNumber", 1))
    )
    return replicated.select(
        F.lit("ot_crispr").alias("datasourceId"),
        F.lit(study["studyId"]).alias("studyId"),
        F.lit(study["projectId"]).alias("projectId"),
        F.split(F.lit(study["diseases"]), r"\|").alias("diseases"),
        "targetFromSourceId",
        "replicateStats",
        "n_replicates",
    )


def otar_crispr_evidence(
    studies: list[dict],
    screens: dict[str, DataFrame],
    controls: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Config-driven fan-out over studies, recombined by name (M4)."""
    controls = controls or {}
    parts = [
        process_study(
            screens[s["studyId"]], s, controls.get(s.get("ControlDataset"))
        )
        for s in studies
    ]
    return union_by_name(parts)
