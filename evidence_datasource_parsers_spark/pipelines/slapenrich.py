"""SLAPEnrich-shaped pipeline — the minimum end-to-end slice (SURVEY §7.2.2).

Capability parity with ``modules/SLAPEnrich.py:59-93``: threshold filter →
broadcast LUT left join → evidence-shaped projection (lit/split/array/struct)
→ single-file gzip JSON sink.  Exercises S1/S4, F1, J2, P1/P12, R5, K1, M2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.joins import broadcast_lut_join


def slapenrich_evidence(
    pathways: DataFrame,
    disease_lut: DataFrame,
    pval_threshold: float = 1e-4,
    datasource_id: str = "slapenrich",
) -> DataFrame:
    """pathways: (ctype, gene, pathway 'ID: name', SLAPEnrichPval double);
    disease_lut: (Cancer_type_acronym, EFO_id, EFO_name).

    Returns evidence rows with the canonical field vocabulary (SURVEY §1.1).
    """
    significant = pathways.filter(F.col("SLAPEnrichPval") < pval_threshold)
    enriched = broadcast_lut_join(
        significant,
        disease_lut,
        on=[significant["ctype"] == disease_lut["Cancer_type_acronym"]],
        how="inner",
    )
    return enriched.select(
        F.lit(datasource_id).alias("datasourceId"),
        F.lit("affected_pathway").alias("datatypeId"),
        F.col("gene").alias("targetFromSourceId"),
        F.col("EFO_name").alias("diseaseFromSource"),
        F.col("EFO_id").alias("diseaseFromSourceMappedId"),
        F.col("SLAPEnrichPval").alias("resourceScore"),
        F.array(
            F.struct(
                F.split(F.col("pathway"), ": ").getItem(0).alias("id"),
                F.split(F.col("pathway"), ": ").getItem(1).alias("name"),
            )
        ).alias("pathways"),
    ).distinct()
