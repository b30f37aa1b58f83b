"""chemicalProbes-shaped pipeline: one-hot matrices + stringified arrays
(SURVEY F14).

Capability parity with ``modules/chemicalProbes.py:34-103,120-264``: 18 one-hot
probe-set indicator columns collapsed to a label array, "['a','b']"-style
stringified cells parsed to real arrays, '-'/0 sentinel nulls normalized,
multi-way join to target xrefs, 11-key groupBy with struct collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.joins import broadcast_lut_join
from evidence_datasource_parsers_spark.operators.reshape import (
    one_hot_to_array,
    parse_stringified_array,
)


def normalize_score(col: str):
    """'-' and 0 sentinels → null, else int (chemicalProbes.py:200-216)."""
    c = F.col(col)
    cleaned = F.when(c == "-", F.lit(None)).otherwise(c).cast("int")
    return F.when(cleaned == 0, F.lit(None)).otherwise(cleaned)


def probes_evidence(
    probes: DataFrame,
    probe_sets: dict[str, str],
    targets: DataFrame,
    score_cols: list[str],
) -> DataFrame:
    """probes: (pdid, compound_name, <one-hot set cols>, action 'a;b',
    <score cols with '-'/0 sentinels>); targets: (pdid, target, uniprot)."""
    collapsed = one_hot_to_array(probes, probe_sets, "probesets")
    typed = collapsed.withColumn(
        "actions", parse_stringified_array("action", ";")
    ).drop("action")
    for sc in score_cols:
        typed = typed.withColumn(sc, normalize_score(sc))
    joined = broadcast_lut_join(typed, targets, on="pdid", how="inner")
    return (
        joined.groupBy("target", "uniprot")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.struct(
                        F.col("compound_name").alias("probe"),
                        F.col("probesets").alias("probesets"),
                        *[F.col(sc).alias(sc) for sc in score_cols],
                    )
                )
            ).alias("probes")
        )
        .withColumn("datasourceId", F.lit("chemical_probes"))
    )
