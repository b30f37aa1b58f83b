"""Gene2Phenotype-shaped pipeline: multi-panel CSV + priority ranking
(SURVEY F06).

Capability parity with ``modules/Gene2Phenotype.py:79-191``: N panel files in
one read (S3), explicit 21-column schema subset, when/otherwise id-priority
fallback, ';'-separated publications split to an array, and the
highest-priority variant-consequence pick — the reference's D3 UDF replaced
by the native rank-map argmax (functions/priority.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.priority import highest_priority
from evidence_datasource_parsers_spark.sources.readers import read_csv

G2P_SCHEMA = (
    "`g2p id` string, `gene symbol` string, `gene mim` int, `hgnc id` int,"
    " `disease name` string, `disease mim` string, `disease MONDO` string,"
    " confidence string, `variant consequence` string, publications string,"
    " panel string"
)

# SO-consequence priority, most severe wins (Gene2Phenotype.py:153-191 shape).
CONSEQUENCE_RANKING = {
    "absent gene product": 5,
    "altered gene product structure": 4,
    "decreased gene product level": 3,
    "increased gene product level": 2,
    "uncertain": 1,
}


def read_panels(spark: SparkSession, paths: list[str]) -> DataFrame:
    return read_csv(spark, paths, schema=G2P_SCHEMA, header=True)


def g2p_evidence(panels: DataFrame) -> DataFrame:
    disease_id = F.when(
        F.col("`disease MONDO`").isNotNull(), F.col("`disease MONDO`")
    ).otherwise(F.concat(F.lit("OMIM:"), F.col("`disease mim`")))
    return panels.select(
        F.lit("gene2phenotype").alias("datasourceId"),
        F.col("`gene symbol`").alias("targetFromSourceId"),
        F.col("`disease name`").alias("diseaseFromSource"),
        disease_id.alias("diseaseFromSourceId"),
        F.col("confidence").alias("confidence"),
        highest_priority("`variant consequence`", CONSEQUENCE_RANKING).alias(
            "variantFunctionalConsequence"
        ),
        F.filter(
            F.split(F.col("publications"), ";"), lambda x: F.trim(x) != ""
        ).alias("literature"),
        F.col("panel").alias("studyId"),
    )
