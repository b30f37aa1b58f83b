"""PageRank over a link graph — crawl-curation authority scores.

Training-data pipelines weigh documents by their site's authority
(OpenWebText filtered by upvotes; most web corpora by link structure):
rank = (1−d)/N + d·Σ_in rank/outdeg, iterated to a fixpoint.  The scores
feed ``quality_binned_sample`` / ``domain_mixture_sample`` as the
authority signal.

Execution model (the duplicate_clusters discipline for iterative ops):

* edges persist ONCE; every iteration is two shuffles on node id (the
  contribution groupBy reuses the same hash partitioning round to round)
* DANGLING nodes (no out-links) redistribute their mass globally — the
  textbook correction; skipping it (as naive implementations do) leaks
  mass and under-ranks everything that dangling pages point at indirectly
* per-iteration lineage is CUT with localCheckpoint (analysis cost would
  otherwise grow without bound), and convergence is checked with one
  cheap max-delta aggregate — the only driver action per round
* raises on non-convergence instead of returning half-iterated ranks

Input: one directed edge per row.  Isolated nodes (appearing in no edge)
are absent — union them in with rank (1−d)/N downstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 40,
    tol: float = 1e-6,
    iteration_counter: list | None = None,
) -> DataFrame:
    """(node, rank) with Σrank = 1 (probability semantics).

    ``tol``: stop when the max per-node rank change is below it.
    ``iteration_counter``: optional list the converged iteration count is
    appended to (observability/testing — convergence speed is a property
    worth asserting on adversarial graphs).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    try:
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0))
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        for it in range(max_iterations):
            contrib_src = ranks.join(outdeg, ranks.node == outdeg.src, "left")
            # dangling mass: total rank sitting on nodes with no out-links,
            # redistributed uniformly (one tiny aggregate, broadcast back)
            dangling = contrib_src.where(F.col("outdeg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            contribs = (
                contrib_src.where(F.col("outdeg").isNotNull())
                .join(e, on="src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__in"))
            )
            new_ranks = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__in"), F.lit(0.0))
                            + F.col("__dm") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), on="node")
                .agg(
                    F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
                )
                .collect()[0]
                .d
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                if iteration_counter is not None:
                    iteration_counter.append(it + 1)
                return ranks
        raise RuntimeError(
            f"pagerank did not converge in {max_iterations} iterations "
            f"(last max delta {delta}) — raise max_iterations or tol"
        )
    finally:
        e.unpersist()
        nodes.unpersist()


def domain_authority(
    docs: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
    **kwargs,
) -> DataFrame:
    """(domain, rank) from a documents frame carrying outbound link
    arrays: the registrable-domain graph's PageRank — the crawl-curation
    signal at the granularity mixing decisions are made."""
    from evidence_datasource_parsers_spark.functions.urls import (
        registrable_domain,
    )

    edges = (
        docs.select(
            registrable_domain(F.col(url_col)).alias("src"),
            F.explode(F.col(links_col)).alias("__l"),
        )
        .select("src", registrable_domain(F.col("__l")).alias("dst"))
        .where(F.col("src") != F.col("dst"))  # self-links carry no signal
    )
    return pagerank(edges, **kwargs).withColumnRenamed("node", "domain")
