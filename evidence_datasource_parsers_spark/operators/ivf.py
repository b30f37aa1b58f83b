"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for similarity search (alongside the random-hyperplane
LSH in operators/similarity.py): partition the corpus into Voronoi cells
around centroids, then score each query only against its ``n_probe``
nearest cells.  This is the classic IVF-Flat index expressed relationally:

    fit      : MLlib KMeans over (a sample of) the corpus     [train-once]
    assign   : one narrow pass adding cell_id to the corpus   [no shuffle]
    probe    : query × centroids (broadcast, tiny) → top-n_probe cells
    search   : join on cell_id → cosine → window top-k        [one shuffle]

Compute ratio vs brute force ≈ n_probe / n_cells; recall grows with n_probe.
At 100 TB the assigned corpus would be written bucketed by cell_id so the
search join is shuffle-free on the corpus side.

Codegen note: the per-cell distances are projected as SEPARATE columns
before any array/sort expression consumes them.  One nested expression
holding n_cells balanced trees of dim terms exceeds whole-stage codegen's
method-size budget and silently falls back to interpreted evaluation (the
exact failure mode the ANN-LSH bucketing had before its vectorized rewrite);
one plain column per cell keeps every generated method small enough for
Janino to compile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.similarity import (
    balanced_sum,
    cosine,
    deterministic_planes,
)


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


def deterministic_centroids(dim: int, n_cells: int) -> list[list[float]]:
    """Unit-norm pseudo-random centroids from the same LCG family as the ANN
    hyperplanes — no RNG state, no data-dependent fit, reproducible across
    engines.  For unit-norm embeddings the Voronoi assignment then reduces to
    argmax dot product, so cells stay direction-driven and roughly balanced.

    KMeans-fitted centroids (fit_ivf_centroids) give better cells in
    production; deterministic centroids exist so an IVF result can be
    replayed bit-for-bit by a second engine (the correctness oracle).
    """
    cells = []
    for row in deterministic_planes(dim, n_cells):
        nrm = sum(v * v for v in row) ** 0.5
        cells.append([v / nrm for v in row])
    return cells


def with_cell_distances(
    df: DataFrame, vec_col: str, centroids: list[list[float]], prefix: str = "__nd"
) -> DataFrame:
    """Project the NEGATED squared L2 distance to each centroid as one plain
    column per cell (``__nd0`` … ``__nd{n-1}``) — a single narrow Project,
    one balanced multiply-add tree per column, each codegen-compilable on
    its own."""
    v = F.col(vec_col)
    cols = [
        (
            -balanced_sum(
                [
                    (F.element_at(v, i + 1) - F.lit(c[i]))
                    * (F.element_at(v, i + 1) - F.lit(c[i]))
                    for i in range(len(c))
                ]
            )
        ).alias(f"{prefix}{j}")
        for j, c in enumerate(centroids)
    ]
    return df.select("*", *cols)


def nearest_cells(n_cells: int, n_probe: int, prefix: str = "__nd"):
    """Expression over the pre-projected distance columns: array of the
    ``n_probe`` nearest cell ids.  Ties break toward the larger cell id
    (struct max), mirrored exactly by the oracle's struct sort."""
    scored = F.array(
        *[
            F.struct(
                F.col(f"{prefix}{j}").alias("negdist"), F.lit(j).alias("cell")
            )
            for j in range(n_cells)
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
    """IVF search: score queries only against their n_probe nearest cells.

    One shuffle (the cell_id join); the probe side is broadcast — it carries
    |queries| × n_probe rows regardless of corpus size."""
    dim = len(centroids[0])
    n_cells = len(centroids)
    c = with_cell_distances(
        corpus.select(
            F.col(corpus_id), F.col(vec_col).cast("array<double>").alias("__cv")
        ),
        "__cv",
        centroids,
    ).select(
        corpus_id,
        "__cv",
        F.element_at(nearest_cells(n_cells, 1), 1).alias("__cell"),
    )
    q = with_cell_distances(
        queries.select(
            F.col(query_id), F.col(vec_col).cast("array<double>").alias("__qv")
        ),
        "__qv",
        centroids,
    ).select(
        query_id,
        "__qv",
        F.explode(nearest_cells(n_cells, n_probe)).alias("__cell"),
    )
    scored = c.join(F.broadcast(q), on="__cell").where(
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
