"""Pack materialization: concat order, boundary offsets, null-token
members, dtype preservation, and partitioning-independence."""

from __future__ import annotations

from evidence_datasource_parsers_spark.operators.packing import (
    materialize_packs,
)


def _df(spark):
    rows = [
        # pack 0: docs 1, 2, 3 (3 should sort AFTER 2 regardless of input order)
        (3, 0, ["e", "f"]),
        (1, 0, ["a", "b", "c"]),
        (2, 0, None),            # scheduled but empty
        # pack 1: single doc
        (9, 1, ["x"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, pack_id long, toks array<string>")


def test_materialize_hand_checked(spark):
    got = {r.pack_id: r for r in
           materialize_packs(_df(spark), "toks").collect()}
    p0 = got[0]
    assert p0.input_ids == ["a", "b", "c", "e", "f"]
    assert p0.doc_ids == [1, 2, 3]
    assert p0.doc_offsets == [0, 3, 3]  # doc 2 is empty: zero-width
    assert (p0.n_tokens, p0.n_docs) == (5, 3)
    p1 = got[1]
    assert p1.input_ids == ["x"] and p1.doc_offsets == [0]


def test_int_tokens_and_partition_cols(spark):
    rows = [("s1", 0, 1, [10, 11]), ("s1", 0, 2, [12]),
            ("s2", 0, 3, [99])]
    df = spark.createDataFrame(
        rows, "source string, pack_id long, doc_id long, toks array<int>"
    )
    got = {(r.source, r.pack_id): r for r in materialize_packs(
        df, "toks", partition_cols=["source"]).collect()}
    assert got[("s1", 0)].input_ids == [10, 11, 12]
    assert got[("s2", 0)].input_ids == [99]
    assert dict(materialize_packs(
        df, "toks", partition_cols=["source"]).dtypes
    )["input_ids"] == "array<int>"


def test_partitioning_independent(spark):
    df = _df(spark)
    a = sorted(map(str, materialize_packs(df, "toks").collect()))
    b = sorted(map(str, materialize_packs(
        df.repartition(7), "toks").collect()))
    assert a == b


def test_bpe_to_pack_end_to_end(spark):
    """tokens from the real BPE feed the materializer; boundaries line up
    with per-doc token counts."""
    from pyspark.sql import functions as F

    from evidence_datasource_parsers_spark.functions.bpe import (
        apply_bpe,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest"), (3, "low newest")],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(docs, "text", 30)
    tk = docs.select(
        "doc_id",
        F.lit(0).alias("pack_id"),
        apply_bpe(merges, "text").alias("toks"),
    )
    pack = materialize_packs(tk, "toks").collect()[0]
    per_doc = {r.doc_id: len(r.toks) for r in tk.collect()}
    assert pack.doc_offsets == [
        0, per_doc[1], per_doc[1] + per_doc[2]
    ]
    assert pack.n_tokens == sum(per_doc.values())
