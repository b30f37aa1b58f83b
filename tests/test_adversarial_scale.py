"""Adversarial-scale property tests (round-4 verdict item #7).

PageRank on a 10^5-node power-law-ish graph (star hub + deep chain + a
random tail): convergence within the iteration budget, probability-mass
conservation, and the structural ranking property (the hub out-ranks
everything).  Winnowing: the Arrow kernel's per-document cost must stay
~linear in document length — the O(n²) HOF re-inlining hazard (SCALE.md
hazard 11) pinned as a perf regression test with both a ratio and an
absolute guard.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_pagerank_power_law_100k_nodes(spark):
    from evidence_datasource_parsers_spark.operators.pagerank import pagerank

    # star: 80k leaves → hub 0 (hub is dangling: its mass redistributes);
    # chain: 0→100001→100002→…→101000 (slow mixing tail);
    # random: 19k edges over a 10k-node block (power-law-ish bulk)
    star = spark.range(1, 80_001).select(
        F.col("id").alias("src"), F.lit(0).alias("dst")
    )
    chain_start = spark.range(1).select(
        F.lit(0).alias("src"), F.lit(100_001).alias("dst")
    )
    chain = spark.range(100_001, 101_000).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    rand = spark.range(19_000).select(
        (F.pmod(F.hash(F.col("id")), F.lit(10_000)) + 200_000).alias("src"),
        (F.pmod(F.hash(F.col("id") * 7 + 3), F.lit(10_000)) + 200_000).alias(
            "dst"
        ),
    )
    edges = star.unionByName(chain_start).unionByName(chain).unionByName(rand)

    iters: list[int] = []
    ranks = pagerank(
        edges, max_iterations=90, tol=1e-5, iteration_counter=iters
    ).persist()
    try:
        agg = ranks.agg(
            F.sum("rank").alias("mass"),
            F.count(F.lit(1)).alias("n"),
            F.min("rank").alias("min_rank"),
        ).collect()[0]
        assert abs(agg["mass"] - 1.0) < 1e-6  # mass conserved w/ dangling fix
        assert agg["n"] > 90_000
        assert agg["min_rank"] > 0.0
        assert iters and iters[0] <= 90  # converged inside the budget
        top = ranks.orderBy(F.desc("rank")).limit(2).collect()
        assert top[0]["node"] == 0  # the star hub dominates
        # chain head gets the hub's full damped mass → ranks above leaves
        assert top[1]["node"] == 100_001
    finally:
        ranks.unpersist()


def test_winnowing_kernel_linear_in_doc_length(spark):
    """Per-doc fingerprint time must scale ~linearly with length: 4× the
    characters may cost at most ~10× the time (quadratic would be ≥16× and
    the pre-fix HOF path took seconds per single document)."""
    from evidence_datasource_parsers_spark.functions.fingerprint import (
        fingerprint_documents,
    )

    def corpus(n_docs: int, length: int):
        words = "lorem ipsum dolor sit amet consectetur adipiscing elit".split()
        rows = []
        for i in range(n_docs):
            toks = [words[(i * 31 + j * 7) % len(words)] for j in range(length // 6)]
            rows.append((i, " ".join(toks)[:length]))
        return spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)

    def timed(df) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fingerprint_documents(df, "text", "doc_id").select(
                F.sum(F.size("fingerprints"))
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    small = corpus(64, 2_000)
    big = corpus(64, 8_000)
    t_small, t_big = timed(small), timed(big)
    assert t_big < 30.0, f"absolute blowup: {t_big:.1f}s for 64×8k chars"
    assert t_big / max(t_small, 1e-3) < 10.0, (
        f"superlinear: {t_small:.3f}s → {t_big:.3f}s for 4× length"
    )
