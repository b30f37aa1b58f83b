"""Maximal Marginal Relevance (MMR) — diverse top-k selection.

Plain top-k by relevance returns near-duplicates (the highest-scoring
documents for a query are usually paraphrases of each other); MMR
(Carbonell & Goldstein, SIGIR 1998) greedily picks

    argmax over candidates c of
        λ·score(c) − (1−λ)·max_{s ∈ selected} cos(c, s)

trading relevance against redundancy.  The training-data uses: picking k
exemplars per topic/cluster for curriculum seeds, diversifying retrieval
results before few-shot prompting, and choosing which near-dup group
members to KEEP when budget allows more than one.

Execution model, stated honestly: greedy MMR is sequential BY DEFINITION
(step i depends on the i−1 selections), so this runs k rounds; each
round is one narrow distributed pass — the newest selected vector
broadcasts as literals, every candidate updates its running
max-similarity, and TakeOrderedAndProject fetches the single argmax (no
global sort).  k is a user-facing result size (tens), not data-scale;
the CANDIDATE side is the distributed dimension and is never collected.
The candidate frame is cached for the k passes and released before
return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def _dot(vec_col, lit_vec: list[float]):
    return sum(
        (F.element_at(vec_col, i + 1) * F.lit(v) for i, v in enumerate(lit_vec)),
        F.lit(0.0),
    )


def mmr_select(
    candidates: DataFrame,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    lambda_: float = 0.7,
) -> list[Row]:
    """The k MMR selections, in pick order (driver-side list — k is small
    by contract; the rows carry ``id_col``, ``score_col``, and the mmr
    value at pick time).

    Vectors must be unit-normalized for the cosine term to be a dot
    product (the ANN operators' convention).  λ=1 degenerates to plain
    top-k by score; λ=0 to pure farthest-point diversity after the top-1.
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    if k < 1:
        raise ValueError("k must be >= 1")
    base = candidates.select(
        F.col(id_col),
        F.col(score_col).cast("double").alias(score_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).persist()  # the handle unpersisted below — not a derived frame
    try:
        picked: list[Row] = []
        # running max cosine to ANY selected vector, updated in place
        cand = base.withColumn("__maxsim", F.lit(float("-inf")))
        for step in range(k):
            if step and step % 8 == 0:
                # lineage grows one filter + one dim-wide dot per round;
                # cut it periodically so round-k analysis stays O(1)
                cand = cand.localCheckpoint(eager=True)
            mmr = (
                F.lit(lambda_) * F.col(score_col)
                - F.lit(1.0 - lambda_)
                * F.when(
                    F.col("__maxsim") == float("-inf"), F.lit(0.0)
                ).otherwise(F.col("__maxsim"))
            )
            top = (
                cand.withColumn("__mmr", mmr)
                .orderBy(F.col("__mmr").desc(), F.col(id_col))
                .limit(1)
                .collect()
            )
            if not top:
                break
            row = top[0]
            picked.append(row)
            vec = list(row[vec_col])
            cand = cand.where(F.col(id_col) != row[id_col]).withColumn(
                "__maxsim",
                F.greatest(F.col("__maxsim"), _dot(F.col(vec_col), vec)),
            )
        return picked
    finally:
        base.unpersist()


def mmr_select_ids(
    candidates: DataFrame,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    lambda_: float = 0.7,
) -> list:
    """Just the ids, in pick order."""
    return [
        r[id_col]
        for r in mmr_select(
            candidates, k, id_col, score_col, vec_col, lambda_
        )
    ]
