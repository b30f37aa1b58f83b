"""cancerBiomarkers-shaped pipeline: the explode-heavy parser (SURVEY F02).

Capability parity with ``modules/cancerBiomarkers.py:104-296``: multi-valued
';'-separated cells split+exploded (×N columns), dictionary recode, drug-name
bracket cleanup via translate, regexp_extract of PMIDs vs NCT ids, conditional
struct synthesis, then the signature move — a many-key groupBy that rebuilds
the nested ``array<struct>`` evidence payload with collect_set, empty→null.

Spark-first deltas: D2's zip-with-broadcast UDF (cancerBiomarkers.py:318-331)
is ``arrays_zip`` + ``array_repeat``; the gDNA→variant UDF (D1, :301-316) is a
regexp chain (see catalog_ext.q47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.reshape import (
    nullify_empty_array,
)


def explode_multivalued(
    df: DataFrame, cols: dict[str, str], sep: str = ";"
) -> DataFrame:
    """Split+explode each {col → out_col}; trims fragments, drops empties.

    Parity cancerBiomarkers.py:106-124 (five chained split/explode passes).
    """
    out = df
    for col, out_col in cols.items():
        parts = F.transform(
            F.split(F.col(col), sep), lambda x: F.trim(x)
        )
        out = out.withColumn(
            out_col, F.explode(F.filter(parts, lambda x: x != ""))
        ).drop(col)
    return out


def parse_sources(df: DataFrame, col: str = "Source") -> DataFrame:
    """'PMID:123;NCT0045;SomeName' → typed literature/clinicalTrial columns
    (parity cancerBiomarkers.py:84,171-175 regexp extraction)."""
    return (
        df.withColumn(
            "literature",
            F.regexp_extract(F.col(col), r"PMID:(\d+)", 1),
        )
        .withColumn(
            "clinicalTrial",
            F.regexp_extract(F.col(col), r"(NCT\d+)", 1),
        )
        .withColumn(
            "literature",
            F.when(F.col("literature") != "", F.col("literature")),
        )
        .withColumn(
            "clinicalTrial",
            F.when(F.col("clinicalTrial") != "", F.col("clinicalTrial")),
        )
    )


def clean_drug(df: DataFrame, col: str = "Drug") -> DataFrame:
    """Strip brackets, uppercase (translate+initcap idiom,
    cancerBiomarkers.py:121-126)."""
    return df.withColumn(
        "drugName", F.initcap(F.trim(F.translate(F.col(col), "[]", "")))
    )


def biomarkers_evidence(raw: DataFrame, association_recode: dict[str, str]) -> DataFrame:
    """raw: (Biomarker, Gene ';'-sep, Alteration ';'-sep, Drug, Association,
    PrimaryTumorTypeFullName ';'-sep, Source ';'-sep, EvidenceLevel).

    Returns one row per (gene, drug, tumor, level) with nested sorted
    biomarker structs — the 10-key groupBy + collect_set shape
    (cancerBiomarkers.py:269-296)."""
    exploded = explode_multivalued(
        raw,
        {
            "Gene": "targetFromSourceId",
            "PrimaryTumorTypeFullName": "diseaseFromSource",
            # NB: not "source" — Spark's case-insensitive resolution would
            # treat it as replacing "Source" and the subsequent drop removes it
            "Source": "sourceRef",
        },
    )
    typed = parse_sources(clean_drug(exploded), "sourceRef")
    recoded = typed.replace(association_recode, subset=["Association"])
    grouped = (
        recoded.groupBy(
            "targetFromSourceId",
            "diseaseFromSource",
            "drugName",
            "EvidenceLevel",
            "Association",
        )
        .agg(
            F.sort_array(
                F.collect_set(
                    F.struct(
                        F.col("Biomarker").alias("name"),
                        F.col("Alteration").alias("alteration"),
                    )
                )
            ).alias("biomarkers"),
            F.sort_array(
                F.collect_set(F.col("literature"))
            ).alias("literature"),
        )
        .withColumn("literature", nullify_empty_array("literature"))
    )
    return grouped.withColumn(
        "datasourceId", F.lit("cancer_biomarkers")
    )
