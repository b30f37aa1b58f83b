"""PageRank: hand-solvable graphs, mass conservation, dangling-node
correction, convergence guard, and the domain-authority adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.pagerank import (
    domain_authority,
    pagerank,
)


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    r = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for v in r.values():
        assert v == pytest.approx(1 / 3, abs=1e-5)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)


def test_star_center_dominates_and_reference_value(spark):
    # spokes -> center; center dangles.  Solvable by hand with the
    # dangling-redistribution equations at d=0.85, N=4.
    r = _ranks(spark, [("s1", "hub"), ("s2", "hub"), ("s3", "hub")])
    assert r["hub"] > r["s1"] == pytest.approx(r["s2"], abs=1e-9)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    # fixpoint: spoke = base + d*hub/4 ; hub = base + d*(3*spoke + hub/4)
    base, d = 0.15 / 4, 0.85
    spoke, hub = r["s1"], r["hub"]
    assert spoke == pytest.approx(base + d * hub / 4, abs=1e-5)
    assert hub == pytest.approx(base + d * (3 * spoke + hub / 4), abs=1e-5)


def test_mass_conserved_with_danglers(spark):
    r = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "d")])  # d dangles
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    # downstream accumulates authority
    assert r["d"] > r["c"] > r["b"] > r["a"] * 0.999


def test_nonconvergence_raises(spark):
    # asymmetric chain: uniform start is NOT the fixpoint, so one
    # iteration cannot reach tol
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(df, max_iterations=1, tol=1e-12)


def test_damping_guard(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)


def test_domain_authority_adapter(spark):
    docs = spark.createDataFrame(
        [
            ("http://blog.example.com/post1",
             ["https://wiki.example.org/a", "http://news.example.net/x"]),
            ("http://news.example.net/y",
             ["https://wiki.example.org/b"]),
            ("http://wiki.example.org/c",
             ["http://wiki.example.org/d"]),  # self-domain: dropped
        ],
        "url string, links array<string>",
    )
    r = {row.domain: row.rank for row in domain_authority(docs).collect()}
    assert set(r) == {"example.com", "example.org", "example.net"}
    assert r["example.org"] == max(r.values())  # twice-linked wiki wins
