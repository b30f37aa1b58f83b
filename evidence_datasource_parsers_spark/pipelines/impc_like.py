"""IMPC-shaped pipeline: the reference's most join-dense plan (SURVEY §3.3).

Capability parity with ``modules/IMPC.py:371-470``: 3-hop gene-ID bridge →
phenotype-list explode → collect_set struct aggregations → multi-key left
joins → window top-1 dedup over the evidence identity — 8 joins, 4 aggs, 1
window from one base table, two outputs from the same graph.

Scale notes: every dimension side is broadcast-hinted; the phenotype explode
happens *after* the id bridge so fan-out rows never carry unused columns; the
final dedup uses the shuffle-light struct-max aggregation when the payload
allows, else the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.windows import top_n_per_group

# Evidence identity for dedup, parity IMPC.py:40-50 (UNIQUE_FIELDS).
UNIQUE_FIELDS = [
    "targetFromSourceId",
    "diseaseFromSource",
    "biologicalModelAllelicComposition",
]


def bridge_gene_ids(
    mouse_genes: DataFrame, gene_map: DataFrame, human_genes: DataFrame
) -> DataFrame:
    """3-hop bridge MGI → HGNC → ENSG (IMPC.py:237-245): two broadcast inner
    joins; 1:N mappings fan out by design (IMPC.py:234-236)."""
    return mouse_genes.join(
        F.broadcast(gene_map),
        mouse_genes["targetInModelMgiId"] == gene_map["gene_id"],
    ).join(
        F.broadcast(human_genes), on="hgnc_gene_id"
    ).select(
        "targetInModelMgiId", "targetInModel", "targetFromSourceId"
    )


def explode_phenotypes(models: DataFrame, col: str = "model_phenotypes") -> DataFrame:
    """Packed list 'MP:0001 desc,MP:0002 desc' → one row per phenotype id+term
    (IMPC.py:258-271: regexp_extract_all + explode)."""
    pheno = F.explode(F.split(F.col(col), ",")).alias("__p")
    return (
        models.select("model_id", pheno)
        .select(
            "model_id",
            F.regexp_extract("__p", r"^(\S+)", 1).alias("phenotype_id"),
            F.trim(F.regexp_replace("__p", r"^\S+\s*", "")).alias("phenotype_term"),
        )
        .where(F.col("phenotype_id") != "")
    )


def aggregate_phenotypes(exploded: DataFrame, out_col: str) -> DataFrame:
    """groupBy + collect_set of structs (IMPC.py:343-346,386-391), sorted for
    run-to-run determinism (collect_set order is undefined)."""
    return exploded.groupBy("model_id").agg(
        F.sort_array(
            F.collect_set(F.struct("phenotype_id", "phenotype_term"))
        ).alias(out_col)
    )


def impc_evidence(
    disease_model: DataFrame,
    mouse_genes: DataFrame,
    gene_map: DataFrame,
    human_genes: DataFrame,
    model_phenotypes: DataFrame,
    disease_phenotypes: DataFrame,
    literature: DataFrame | None = None,
) -> DataFrame:
    """The 8-join graph, one lazy plan.

    disease_model: (model_id 'MGI:x#hom#early', marker_id, disease_id,
    disease_term, disease_model_avg_norm, model_description).
    """
    base = disease_model.withColumn(
        "biologicalModelAllelicComposition",
        F.split(F.col("model_id"), "#").getItem(1),
    ).withColumn("targetInModelMgiId", F.col("marker_id"))

    genes = bridge_gene_ids(mouse_genes, gene_map, human_genes)
    with_genes = base.join(F.broadcast(genes), on="targetInModelMgiId")

    model_pheno = aggregate_phenotypes(
        explode_phenotypes(model_phenotypes, "model_phenotypes"),
        "diseaseModelAssociatedModelPhenotypes",
    )
    disease_pheno = aggregate_phenotypes(
        explode_phenotypes(
            disease_phenotypes.withColumnRenamed("disease_id", "model_id"),
            "disease_phenotypes",
        ),
        "diseaseModelAssociatedHumanPhenotypes",
    ).withColumnRenamed("model_id", "disease_id")

    graph = with_genes.join(model_pheno, on="model_id", how="left").join(
        disease_pheno, on="disease_id", how="left"
    )
    if literature is not None:
        lit = literature.groupBy("targetInModelMgiId").agg(
            F.sort_array(F.collect_set("literature")).alias("literature")
        )
        graph = graph.join(F.broadcast(lit), on="targetInModelMgiId", how="left")

    evidence = graph.select(
        F.lit("impc").alias("datasourceId"),
        F.lit("animal_model").alias("datatypeId"),
        "targetFromSourceId",
        "targetInModel",
        "targetInModelMgiId",
        F.col("disease_term").alias("diseaseFromSource"),
        F.col("disease_id").alias("diseaseFromSourceId"),
        # model identifier minus the composition/background suffix —
        # parity with the reference's _cleanup_model_identifier + stable
        # column list (IMPC.py:441,466-470), and the tiebreaker that
        # makes the top-1 window a TOTAL order (score ties between two
        # models of the same identity were previously broken by plan
        # nondeterminism — an oracle gate can't ride that)
        F.split(F.col("model_id"), "#").getItem(0).alias(
            "biologicalModelId"
        ),
        "biologicalModelAllelicComposition",
        F.col("disease_model_avg_norm").alias("resourceScore"),
        "diseaseModelAssociatedModelPhenotypes",
        "diseaseModelAssociatedHumanPhenotypes",
        *(["literature"] if literature is not None else []),
    )
    # top-1 per evidence identity by score (IMPC.py:456-462); the extra
    # ascending keys pin a deterministic winner among equal scores
    return top_n_per_group(
        evidence,
        UNIQUE_FIELDS,
        [
            F.col("resourceScore").desc(),
            F.col("diseaseFromSourceId").asc(),
            F.col("biologicalModelId").asc(),
            F.col("targetInModelMgiId").asc(),
        ],
        n=1,
    )


def mouse_phenotypes_dataset(
    mouse_genes: DataFrame,
    gene_map: DataFrame,
    human_genes: DataFrame,
    model_phenotypes: DataFrame,
) -> DataFrame:
    """Second output from the same graph (IMPC.py:472-525): per human gene,
    the distinct set of mouse phenotypes across its models."""
    genes = bridge_gene_ids(mouse_genes, gene_map, human_genes)
    exploded = explode_phenotypes(model_phenotypes, "model_phenotypes")
    models = model_phenotypes.select(
        "model_id", F.col("marker_id").alias("targetInModelMgiId")
    )
    return (
        exploded.join(models, on="model_id")
        .join(F.broadcast(genes), on="targetInModelMgiId")
        .groupBy("targetFromSourceId")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("phenotype_id", "phenotype_term"))
            ).alias("modelPhenotypes"),
            F.count_distinct("model_id").alias("nModels"),
        )
    )
