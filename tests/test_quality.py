"""Tests for the hashing-trick lexical quality scorer (functions/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.quality import (
    WEIGHT_SCALE,
    lexical_quality_score,
    placeholder_weight,
    placeholder_weight_table,
    score_with_weight_table,
    token_bucket,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "THE  QUICK   brown fox"),  # normalization folds case/spacing
    (3, ""),  # empty text → one empty token, still scored
    (4, None),  # NULL text → NULL score in both tiers
    (5, "completely different content about spark engines and parquet"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_expression_and_table_tiers_agree(spark):
    """The pure-expression score and the broadcast-weight-table score are
    bit-identical when the table materializes the placeholder family —
    including NULL and empty documents."""
    d = _docs(spark)
    expr = {
        r.doc_id: r.s
        for r in d.select(
            "doc_id", lexical_quality_score(F.col("text")).alias("s")
        ).collect()
    }
    table = {
        r.doc_id: r.lexical_score
        for r in score_with_weight_table(
            d, "text", "doc_id", placeholder_weight_table(spark)
        ).collect()
    }
    assert set(expr) == set(table) == {1, 2, 3, 4, 5}
    for k in expr:
        assert expr[k] == table[k], (k, expr[k], table[k])
    assert expr[4] is None
    assert expr[3] is not None
    for k in (1, 2, 3, 5):
        assert -1.0 <= expr[k] <= 1.0


def test_weight_family_bounds_and_bucketing(spark):
    """Placeholder weights stay in [-WEIGHT_SCALE, WEIGHT_SCALE]; buckets
    stay in [0, n_buckets); both are deterministic across sessions."""
    df = spark.range(2048).select(
        F.col("id"),
        placeholder_weight(F.col("id")).alias("w"),
        token_bucket(F.col("id").cast("string"), 4096).alias("b"),
    )
    rows = df.collect()
    assert all(-WEIGHT_SCALE <= r.w <= WEIGHT_SCALE for r in rows)
    assert all(0 <= r.b < 4096 for r in rows)
    again = {r.id: (r.w, r.b) for r in df.collect()}
    assert {r.id: (r.w, r.b) for r in rows} == again


def test_table_tier_broadcasts_weights(spark):
    """The weight table must reach executors as a broadcast — a shuffle
    join against a 4096-row model table would be a plan bug."""
    d = _docs(spark)
    out = score_with_weight_table(
        d, "text", "doc_id", placeholder_weight_table(spark)
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sparse_table_scores_missing_tokens_zero(spark):
    """Tokens whose bucket is absent from the weight table contribute 0 —
    the sparse-model contract."""
    d = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    empty = placeholder_weight_table(spark).where(F.lit(False))
    out = score_with_weight_table(d, "text", "doc_id", empty).collect()
    assert out[0].lexical_score == 0.0
