"""Essentiality-shaped pipeline: wide gene×cell-line matrix → nested evidence.

Capability parity with ``modules/Essentiality.py:149-182,210-308``: melt the
genes-as-columns effect matrix, left-join cell-line metadata, then the
two-level hierarchical aggregation — screens nested under tissues nested under
genes — via chained groupBy+collect_set of structs.

Scale notes: the melted frame is repartitioned by gene before the two
aggregations so both run on one shuffle (the reference repartitions by
depmapId — Essentiality.py:80,247 — we key by the *aggregation* key instead);
dimension metadata joins are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.reshape import melt


def melt_gene_matrix(
    wide: DataFrame, id_col: str = "depmapId", symbol_sep: str = " "
) -> DataFrame:
    """Matrix with header 'SYMBOL (entrezId)' columns → long
    (depmapId, targetSymbol, geneEffect); parity Essentiality.py:232-247 but
    parameterized unpivot instead of f-string stack()."""
    gene_cols = [c for c in wide.columns if c != id_col]
    long = melt(wide, [id_col], gene_cols, "gene_label", "geneEffect")
    return long.withColumn(
        "targetSymbol", F.split("gene_label", symbol_sep).getItem(0)
    ).drop("gene_label")


def essentiality_evidence(
    effect_wide: DataFrame,
    cell_meta: DataFrame,
    essential_threshold: float = -0.5,
) -> DataFrame:
    """cell_meta: (depmapId, cellLineName, tissueFromSource, tissueId).

    Output: one row per gene with depMapEssentiality[].screens[] two-level
    nesting (Essentiality.py:131-147 target shape).
    """
    long = melt_gene_matrix(effect_wide).where(F.col("geneEffect").isNotNull())
    with_meta = long.join(F.broadcast(cell_meta), on="depmapId", how="left")
    keyed = with_meta.repartition("targetSymbol")

    screens = keyed.groupBy("targetSymbol", "tissueFromSource", "tissueId").agg(
        F.sort_array(
            F.collect_set(
                F.struct(
                    F.col("depmapId").alias("depmapId"),
                    F.col("cellLineName").alias("cellLineName"),
                    F.col("geneEffect").alias("geneEffect"),
                    (F.col("geneEffect") <= essential_threshold).alias(
                        "isEssential"
                    ),
                )
            )
        ).alias("screens")
    )
    return screens.groupBy("targetSymbol").agg(
        F.sort_array(
            F.collect_set(
                F.struct(
                    F.col("tissueFromSource").alias("tissueFromSource"),
                    F.col("tissueId").alias("tissueId"),
                )
            )
        ).alias("tissues"),
        F.collect_list(
            F.struct(
                F.col("tissueFromSource").alias("tissueFromSource"),
                F.col("tissueId").alias("tissueId"),
                F.col("screens").alias("screens"),
            )
        ).alias("depMapEssentiality"),
    )
