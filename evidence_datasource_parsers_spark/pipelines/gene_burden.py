"""GeneBurden-shaped pipeline: multi-source federation (SURVEY §3.2).

Capability parity with ``modules/GeneBurden.py:26-59`` +
``modules/AzGeneBurden.py:48-135``: per-source sub-pipelines with divergent
schemas → rename-to-align → unionByName(allowMissingColumns) → p-value
hygiene (zero-imputation, mantissa/exponent) → negative-control anti-join →
batched expectations → distinct.

Spark-first deltas from the reference: the global-min scalar stays in-plan
(broadcast 1-row agg, no ``collect()``), and all expectation checks run as ONE
action instead of ~10 interleaved eager asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.pvalues import (
    impute_zero_with_min,
    pvalue_mantissa_exponent,
)
from evidence_datasource_parsers_spark.operators.expectations import Expectations
from evidence_datasource_parsers_spark.operators.joins import (
    anti_join,
    union_by_name,
)


def shape_binary_source(binary: DataFrame) -> DataFrame:
    """AZ-binary-like: (Gene, Phenotype, pValue, binOddsRatio, CollapsingModel)
    → canonical columns (AzGeneBurden.py:79-96 rename-to-align idiom)."""
    return binary.select(
        F.col("Gene").alias("targetFromSourceId"),
        F.col("Phenotype").alias("diseaseFromSource"),
        F.col("pValue").cast("double").alias("pValue"),
        F.col("binOddsRatio").cast("double").alias("oddsRatio"),
        F.col("CollapsingModel").alias("statisticalMethod"),
        F.lit("binary").alias("traitType"),
    )


def shape_quant_source(quant: DataFrame) -> DataFrame:
    """AZ-quantitative-like: carries beta instead of oddsRatio."""
    return quant.select(
        F.col("Gene").alias("targetFromSourceId"),
        F.col("Phenotype").alias("diseaseFromSource"),
        F.col("pValue").cast("double").alias("pValue"),
        F.col("beta").cast("double").alias("beta"),
        F.col("CollapsingModel").alias("statisticalMethod"),
        F.lit("quantitative").alias("traitType"),
    )


def gene_burden_evidence(
    sources: list[DataFrame],
    control_models: DataFrame | None = None,
    significance: float = 1e-7,
    expected_rows: tuple[int, int] | None = None,
) -> DataFrame:
    """Union → filter → impute → decompose → anti-join controls → distinct.

    control_models: (targetFromSourceId, statisticalMethod) pairs to drop —
    the synonymous-model negative-control exclusion (AzGeneBurden.py:138-153).
    expected_rows: inclusive count range assertion (AzGeneBurden.py:126-133),
    evaluated in one batched action.
    """
    unioned = union_by_name(sources).filter(F.col("pValue") <= significance)
    imputed = impute_zero_with_min(unioned, "pValue")
    mantissa, exponent = pvalue_mantissa_exponent("pValue")
    shaped = imputed.withColumn("pValueMantissa", mantissa).withColumn(
        "pValueExponent", exponent
    )
    if control_models is not None:
        shaped = anti_join(
            shaped, control_models, ["targetFromSourceId", "statisticalMethod"]
        )
    out = shaped.distinct()
    checks = Expectations().no_rows_where("zero_pvalues", F.col("pValue") <= 0)
    if expected_rows:
        checks.count_between("row_range", *expected_rows)
    out = out.persist()
    checks.run(out)
    return out
