"""ClinGen-shaped pipeline: the simple single-source parser (SURVEY §3.1).

Capability parity with ``modules/ClinGen.py:50-98``: headerless CSV with a
6-row metadata preamble and a forced StructType (incl. a TimestampType
classification date), constant-column evidence shaping, date_format, and
array/struct wrapping of single values.

Spark-first delta: the preamble skip is the deterministic ``skip_rows``
reader option (readers.py) instead of ``monotonically_increasing_id``
filtering (ClinGen.py:66-70), which depends on partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.sources.readers import read_csv

CLINGEN_SCHEMA = (
    "gene_symbol string, gene_id string, disease_label string,"
    " disease_id string, moi string, sop string, classification string,"
    " online_report string, classification_date timestamp, gcep string"
)


def read_clingen_csv(spark: SparkSession, path: str, preamble_rows: int = 6) -> DataFrame:
    return read_csv(
        spark, path, schema=CLINGEN_SCHEMA, header=False, skip_rows=preamble_rows
    )


def clingen_evidence(raw: DataFrame) -> DataFrame:
    """Evidence shaping (ClinGen.py:75-98): lit constants, trim, one-element
    arrays, struct wrap, yyyy-MM-dd date formatting."""
    return raw.select(
        F.lit("clingen").alias("datasourceId"),
        F.lit("genetic_literature").alias("datatypeId"),
        F.trim("gene_symbol").alias("targetFromSourceId"),
        F.col("disease_label").alias("diseaseFromSource"),
        F.col("disease_id").alias("diseaseFromSourceId"),
        F.array(F.col("moi")).alias("allelicRequirements"),
        F.struct(
            F.col("classification").alias("classification"),
            F.date_format("classification_date", "yyyy-MM-dd").alias("date"),
        ).alias("confidence"),
        F.array(
            F.struct(
                F.lit("ClinGen Gene Validity").alias("niceName"),
                F.col("online_report").alias("url"),
            )
        ).alias("urls"),
    ).distinct()
