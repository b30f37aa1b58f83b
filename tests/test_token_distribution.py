"""token_distribution_profile: exact vocab/mass numbers, Zipf slope ≈ −1
on a Zipfian corpus, ≈ 0 on a uniform one, and a no-full-sort plan."""

from __future__ import annotations

import pytest

from evidence_datasource_parsers_spark.operators.profiling import (
    token_distribution_profile,
)


def _doc_from_counts(counts: dict[str, int]) -> str:
    return " ".join(w for w, n in counts.items() for _ in range(n))


def test_exact_vocab_and_mass(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c  c"), (3, None)], "doc_id int, text string"
    )
    row = token_distribution_profile(df, "text").collect()[0]
    assert row.vocab_size == 3
    assert row.total_tokens == 6
    assert row.top_n_share == pytest.approx(1.0)


def test_zipf_slope_on_zipfian_corpus(spark):
    # freq(rank r) = 1200 // r for 40 tokens → slope ≈ −1
    counts = {f"w{r:02d}": 1200 // r for r in range(1, 41)}
    df = spark.createDataFrame(
        [(1, _doc_from_counts(counts))], "doc_id int, text string"
    )
    row = token_distribution_profile(df, "text", top_n=40).collect()[0]
    assert row.zipf_slope == pytest.approx(-1.0, abs=0.05)


def test_flat_corpus_slope_near_zero(spark):
    counts = {f"w{r:02d}": 50 for r in range(1, 41)}
    df = spark.createDataFrame(
        [(1, _doc_from_counts(counts))], "doc_id int, text string"
    )
    row = token_distribution_profile(df, "text", top_n=40).collect()[0]
    assert abs(row.zipf_slope) < 0.01


def test_top_n_share_and_plan(spark):
    counts = {f"w{r:03d}": 101 - r for r in range(1, 101)}
    df = spark.createDataFrame(
        [(1, _doc_from_counts(counts))], "doc_id int, text string"
    )
    prof = token_distribution_profile(df, "text", top_n=10)
    row = prof.collect()[0]
    expected_top = sum(101 - r for r in range(1, 11))
    assert row.top_n_share == pytest.approx(
        expected_top / sum(counts.values())
    )
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-N heap, not a global sort


def test_corpus_diff(spark):
    from evidence_datasource_parsers_spark.operators.profiling import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "was null"), (5, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed", 5: "added"}
