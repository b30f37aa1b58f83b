"""BPE: learned merge order on a known corpus, greedy application,
determinism across partitionings, and the vocab-cap guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.bpe import (
    EOW,
    apply_bpe,
    bpe_token_count,
    learn_bpe_merges,
    word_frequencies,
)


@pytest.fixture()
def corpus(spark):
    # classic BPE toy corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(1, text)], "doc_id int, text string")


def test_word_frequencies(spark, corpus):
    wf = {r.word: r.n for r in word_frequencies(corpus, "text").collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learned_merge_order(corpus):
    merges = learn_bpe_merges(corpus, "text", 4)
    # counts: ('e','s') appears in newest(6)+widest(3)=9 — the clear first
    # merge; then ('es','t') 9, then ('est','</w>') 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    # fourth: 'l','o' from low(5)+lower(2)=7
    assert merges[3] == ("l", "o")


def test_apply_reproduces_training_segmentation(spark, corpus):
    merges = learn_bpe_merges(corpus, "text", 10)
    df = spark.createDataFrame(
        [(1, "newest low"), (2, None)], "doc_id int, text string"
    )
    out = {r.doc_id: r.toks for r in df.select(
        "doc_id", apply_bpe(merges, "text").alias("toks")).collect()}
    assert out[2] is None
    toks = out[1]
    # 'newest' fully merges given enough rules; tokens must reconstruct text
    assert "".join(toks).replace(EOW, " ").split() == ["newest", "low"]
    n = df.where(F.col("doc_id") == 1).select(
        bpe_token_count(merges, "text").alias("n")).first().n
    assert n == len(toks)


def test_unknown_chars_pass_through(spark, corpus):
    merges = learn_bpe_merges(corpus, "text", 5)
    df = spark.createDataFrame([(1, "zq")], "doc_id int, text string")
    toks = df.select(apply_bpe(merges, "text").alias("t")).first().t
    assert toks == ["z", "q", EOW]


def test_deterministic_across_partitionings(spark, corpus):
    many = corpus.union(corpus).union(corpus).repartition(7)
    # counts triple but RELATIVE order (and thus merges) must be identical
    assert learn_bpe_merges(many, "text", 6) == learn_bpe_merges(
        corpus, "text", 6
    )


def test_max_vocab_guard(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i}") for i in range(40)], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="max_vocab"):
        learn_bpe_merges(df, "text", 2, max_vocab=10)


def test_apply_with_broadcast_merges(spark, corpus):
    merges = learn_bpe_merges(corpus, "text", 10)
    bc = spark.sparkContext.broadcast(merges)
    df = spark.createDataFrame([(1, "newest low")], "doc_id int, text string")
    direct = df.select(apply_bpe(merges, "text").alias("t")).first().t
    via_bc = df.select(apply_bpe(bc, "text").alias("t")).first().t
    assert direct == via_bc
