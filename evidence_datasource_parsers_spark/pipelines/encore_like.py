"""Encore-shaped pipeline: super-wide replicate matrices (SURVEY F11).

Capability parity with ``partner_preview_scripts/encore_parser.py:97-279``:
header-driven melt of per-cell-line×replicate stat columns → Stouffer z-score
combination (sum(z)/sqrt(count), encore_parser.py:246-255) → two-sided normal
p-value from the combined z (encore_parser.py:257-264, scipy UDF in the
reference) → gene-pair 'A~B' exploded into both target orientations
(encore_parser.py:57-95,475-478).

Spark-first deltas: the melt is native ``unpivot`` (no f-string ``stack()``
SQL); the p-from-z kernel is an Arrow-batched pandas UDF over stdlib
``math.erfc`` (no scipy dependency, vectorized transfer); the gene-pair
explode is a pure ``explode(array(struct...))`` — no UDF at all.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from evidence_datasource_parsers_spark.operators.reshape import melt


def p_from_z():
    """Two-sided normal p-value kernel: p = erfc(|z| / sqrt(2)).

    Replaces the reference's scipy ``norm.sf`` driver UDF with an
    Arrow-batched pandas UDF; math.erfc is the same special function.
    Built lazily — pandas_udf registration needs an active SparkSession.
    """

    @pandas_udf("double")
    def _kernel(z: pd.Series) -> pd.Series:
        return z.abs().map(lambda v: math.erfc(v / math.sqrt(2.0)))

    return _kernel


def melt_replicates(
    wide: DataFrame, id_col: str = "id", value_suffix: str = "_zscore"
) -> DataFrame:
    """Wide matrix (one column per cell-line×replicate measurement) → long
    (id, measurement, zscore).  Column discovery is header-driven, as in
    encore_parser.py:137-170, but lands in a parameterized unpivot."""
    value_cols = [c for c in wide.columns if c.endswith(value_suffix)]
    long = melt(wide, [id_col], value_cols, "measurement", "zscore")
    return long.withColumn(
        "cell_line", F.split("measurement", "_").getItem(0)
    ).withColumn("replicate", F.split("measurement", "_").getItem(1))


def stouffer_combine(long: DataFrame, id_col: str = "id") -> DataFrame:
    """Stouffer: z_comb = sum(z) / sqrt(n) per (id, cell_line)
    (encore_parser.py:246-255), then two-sided p via the pandas UDF."""
    combined = (
        long.where(F.col("zscore").isNotNull())
        .groupBy(id_col, "cell_line")
        .agg(
            (F.sum("zscore") / F.sqrt(F.count("zscore"))).alias("zscore_combined"),
            F.count("zscore").alias("n_replicates"),
        )
    )
    return combined.withColumn("pValue", p_from_z()(F.col("zscore_combined")))


def explode_gene_pairs(
    df: DataFrame, pair_col: str = "id", sep: str = "~"
) -> DataFrame:
    """'GENE1~GENE2' → two rows, each orientation tagged with its partner
    (encore_parser.py:57-95 UDF+explode, here pure column expressions)."""
    g1 = F.split(F.col(pair_col), sep).getItem(0)
    g2 = F.split(F.col(pair_col), sep).getItem(1)
    roles = F.array(
        F.struct(
            g1.alias("targetFromSourceId"), g2.alias("interactingTargetFromSourceId")
        ),
        F.struct(
            g2.alias("targetFromSourceId"), g1.alias("interactingTargetFromSourceId")
        ),
    )
    return df.withColumn("__role", F.explode(roles)).select(
        "*", "__role.targetFromSourceId", "__role.interactingTargetFromSourceId"
    ).drop("__role")


def encore_evidence(
    wide: DataFrame,
    p_threshold: float = 0.05,
) -> DataFrame:
    """melt → Stouffer → p-from-z → threshold → both gene orientations."""
    long = melt_replicates(wide)
    combined = stouffer_combine(long)
    significant = combined.where(F.col("pValue") < p_threshold)
    return explode_gene_pairs(significant).select(
        F.lit("encore").alias("datasourceId"),
        "targetFromSourceId",
        "interactingTargetFromSourceId",
        "cell_line",
        F.col("zscore_combined").alias("resourceScore"),
        "pValue",
        "n_replicates",
    )
