"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for similarity search (alongside the random-hyperplane
LSH in operators/similarity.py): partition the corpus into Voronoi cells
around KMeans centroids, then score each query only against its ``n_probe``
nearest cells.  This is the classic IVF-Flat index expressed relationally:

    fit      : MLlib KMeans over (a sample of) the corpus     [train-once]
    assign   : one narrow pass adding cell_id to the corpus   [no shuffle]
    probe    : query × centroids (broadcast, tiny) → top-n_probe cells
    search   : join on cell_id → cosine → window top-k        [one shuffle]

Compute ratio vs brute force ≈ n_probe / n_cells; recall grows with n_probe.
At 100 TB the assigned corpus would be written bucketed by cell_id so the
search join is shuffle-free on the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.similarity import cosine


def fit_ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """KMeans centroids over the corpus (MLlib; deterministic via seed).

    Returns a list[list[float]] — small enough to broadcast as literals.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_cells(vec, centroids: list[list[float]], n_probe: int):
    """Expression: array of the n_probe nearest cell ids (by dot distance
    to literal centroids — centroids are tiny, unrolled as literals)."""
    from evidence_datasource_parsers_spark.operators.similarity import (
        balanced_sum,
    )

    scored = F.array(
        *[
            F.struct(
                (
                    -balanced_sum(
                        [
                            (F.element_at(vec, i + 1) - F.lit(c[i]))
                            * (F.element_at(vec, i + 1) - F.lit(c[i]))
                            for i in range(len(c))
                        ]
                    )
                ).alias("negdist"),
                F.lit(j).alias("cell"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return F.transform(top, lambda s: s["cell"])


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score queries only against their n_probe nearest cells."""
    dim = len(centroids[0])
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn(
        "__cell",
        F.element_at(_nearest_cells(F.col("__cv"), centroids, 1), 1),
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn(
        "__cells", _nearest_cells(F.col("__qv"), centroids, n_probe)
    ).withColumn("__cell", F.explode("__cells"))
    scored = c.join(q.select(query_id, "__qv", "__cell"), on="__cell").where(
        F.col(query_id) != F.col(corpus_id)
    ).select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col("__cv"), dim).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
