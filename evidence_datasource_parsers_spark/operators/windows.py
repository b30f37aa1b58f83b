"""Window-tier operators (SURVEY §2.7-§2.8).

W1 — top-1-per-group dedup — is the reference's single mandatory window
capability (``modules/IMPC.py:456-462``).  Generalized here to top-N with an
explicit deterministic tie-break, because ``row_number`` over a non-total
order is run-dependent (SURVEY §7.4 risk 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int = 1,
) -> DataFrame:
    """Keep the top-N rows per group under a total ordering.

    Scale note: this is one shuffle on ``partition_by``; with AQE skew-join
    handling enabled, hot groups split automatically.  For top-1 at extreme
    cardinality prefer ``max_by``-style aggregation (no row materialization
    per group) — provided the payload fits a struct.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def top_1_per_group_agg(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Shuffle-light alternative to W1: max_by via struct-max aggregation.

    ``groupBy(keys).agg(max(struct(order, payload)))`` does map-side partial
    aggregation — at 100 TB this beats the window (which must sort every
    group's rows) whenever only the argmax row is needed.  Ties resolve by the
    payload's struct ordering; include a unique id in ``payload_cols`` head
    for determinism.
    """
    packed = F.max(
        F.struct(F.col(order_col).alias("__o"), *[F.col(c) for c in payload_cols])
    ).alias("__top")
    out = df.groupBy(*partition_by).agg(packed)
    return out.select(
        *partition_by,
        F.col("__top.__o").alias(order_col),
        *[F.col(f"__top.{c}").alias(c) for c in payload_cols],
    )
