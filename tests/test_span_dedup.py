"""Exact duplicated-span dedup (operators/span_dedup.py) — unit semantics
plus a brute-force cross-check of the anchor/span chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.span_dedup import (
    duplicated_anchor_positions,
    duplicated_spans,
    remove_duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = "w{} " * 40  # helper to build distinct filler


def _filler(lo, n):
    return " ".join(f"u{lo + i}" for i in range(n))


def test_no_duplicates_no_spans(spark):
    df = _docs(
        spark,
        [(1, _filler(0, 20)), (2, _filler(100, 20))],
    )
    assert duplicated_spans(df, min_tokens=4).count() == 0
    out = remove_duplicated_spans(df, min_tokens=4).collect()
    assert all(r.n_removed_tokens == 0 for r in out)
    # whitespace-normalized passthrough
    assert {r.clean_text for r in out} == {_filler(0, 20), _filler(100, 20)}


def test_cross_doc_duplicate_span_found_and_removed(spark):
    shared = "a b c d e f"  # 6 tokens, L=4 -> anchors 0..2 in each doc
    d1 = f"{_filler(0, 5)} {shared} {_filler(10, 5)}"
    d2 = f"{_filler(20, 5)} {shared} {_filler(30, 5)}"
    df = _docs(spark, [(1, d1), (2, d2)])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, min_tokens=4).collect()
    }
    # shared block occupies word indices 5..10 in both docs
    assert spans == {(1, 5, 10), (2, 5, 10)}
    out = {
        r.doc_id: r for r in remove_duplicated_spans(df, min_tokens=4).collect()
    }
    assert out[1].clean_text == f"{_filler(0, 5)} {_filler(10, 5)}"
    assert out[1].n_removed_tokens == 6
    assert out[2].n_removed_tokens == 6


def test_within_doc_repeat_counts(spark):
    shared = "p q r s"
    df = _docs(spark, [(1, f"{shared} {_filler(0, 6)} {shared}")])
    spans = sorted(
        (r.span_start, r.span_end)
        for r in duplicated_spans(df, min_tokens=4).collect()
    )
    assert spans == [(0, 3), (10, 13)]


def test_straddling_span_caught_unlike_fixed_windows(spark):
    """The motivating case: a duplicate straddling a fixed-window boundary.

    passage_dedup with passage_tokens=8 would hash [0..7] and [8..15]
    separately and miss a duplicate covering words 4..11; the exact
    formulation catches it.
    """
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    d1 = f"{_filler(0, 4)} {shared} {_filler(10, 4)}"
    d2 = f"{_filler(20, 4)} {shared} {_filler(30, 4)}"
    df = _docs(spark, [(1, d1), (2, d2)])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, min_tokens=8).collect()
    }
    assert spans == {(1, 4, 11), (2, 4, 11)}


def test_touching_windows_merge_into_one_span(spark):
    # two duplicated 4-gram regions with a gap of exactly L chain together
    a, b = "a1 a2 a3 a4", "b1 b2 b3 b4"
    # doc 1/2 share a and b with 4 distinct-but-shared middle words, so the
    # whole 12-token block is one duplicated region
    mid = "m1 m2 m3 m4"
    d1 = f"{_filler(0, 3)} {a} {mid} {b}"
    d2 = f"{_filler(20, 3)} {a} {mid} {b}"
    df = _docs(spark, [(1, d1), (2, d2)])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, min_tokens=4).collect()
    }
    assert spans == {(1, 3, 14), (2, 3, 14)}


def test_short_and_empty_docs_pass_through(spark):
    df = _docs(spark, [(1, "one two"), (2, "   "), (3, None)])
    assert duplicated_spans(df, min_tokens=4).count() == 0
    out = {r.doc_id: r for r in remove_duplicated_spans(df, min_tokens=4).collect()}
    assert out[1].n_tokens == 2 and out[1].n_removed_tokens == 0
    assert out[2].n_tokens == 0 and out[2].clean_text == ""
    assert out[3].n_tokens == 0


def test_min_occurrences_threshold(spark):
    shared = "x1 x2 x3 x4"
    rows = [(i, f"{_filler(i * 50, 4)} {shared}") for i in range(3)]
    df = _docs(spark, rows)
    # appears 3x: min_occurrences=3 keeps it, 4 drops it
    assert duplicated_spans(df, min_tokens=4, min_occurrences=3).count() == 3
    assert duplicated_spans(df, min_tokens=4, min_occurrences=4).count() == 0


def test_anchor_positions_brute_force(spark):
    """Cross-check anchors against a driver-side brute-force on small docs."""
    import collections

    rows = [
        (1, "a b c d e a b c d e"),
        (2, "z y a b c d q r s t"),
        (3, "c d e a b c d e z z"),
    ]
    L = 3
    grams = collections.Counter()
    per_doc = {}
    for did, text in rows:
        ws = text.split()
        per_doc[did] = ws
        for i in range(len(ws) - L + 1):
            grams[tuple(ws[i : i + L])] += 1
    expect = {
        (did, i)
        for did, ws in per_doc.items()
        for i in range(len(ws) - L + 1)
        if grams[tuple(ws[i : i + L])] >= 2
    }
    df = _docs(spark, rows)
    got = {
        (r.doc_id, r.pos)
        for r in duplicated_anchor_positions(df, min_tokens=L).collect()
    }
    assert got == expect


def test_plan_has_no_cartesian_and_no_python_eval(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = duplicated_spans(df, min_tokens=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- incremental tier ------------------------------------------------------


def _run_incremental(spark, batch, store):
    from evidence_datasource_parsers_spark.operators.span_dedup import (
        incremental_span_dedupe,
    )

    res = incremental_span_dedupe(batch, store, min_tokens=4)
    cleaned = res.cleaned.collect()
    new_store = res.store.collect()
    res.pinned.unpersist()
    return cleaned, new_store


def test_incremental_cross_batch_duplicate_excised(spark):
    """A passage seen once in batch 1 and once in batch 2 is unique within
    each batch alone — only the store makes the batch-2 copy excisable."""
    shared = "c1 c2 c3 c4 c5"
    b1 = _docs(spark, [(1, f"{_filler(0, 5)} {shared}")])
    b2 = _docs(spark, [(2, f"{_filler(10, 5)} {shared} {_filler(20, 3)}")])

    c1, store1 = _run_incremental(spark, b1, None)
    # batch 1 alone: no duplication, nothing removed
    assert c1[0].n_removed_tokens == 0
    store1_df = spark.createDataFrame(store1)

    c2, store2 = _run_incremental(spark, b2, store1_df)
    assert c2[0].n_removed_tokens == 5
    assert c2[0].clean_text == f"{_filler(10, 5)} {_filler(20, 3)}"


def test_incremental_equals_atrest_union_for_new_batch(spark):
    """Additivity property: batch-2 docs come out of the incremental op
    exactly as the at-rest operator over batch1 ∪ batch2 would clean them."""
    rows1 = [
        (1, f"{_filler(0, 6)} p1 p2 p3 p4 {_filler(10, 2)}"),
        (2, f"q1 q2 q3 q4 {_filler(30, 5)}"),
    ]
    rows2 = [
        (3, f"{_filler(40, 3)} p1 p2 p3 p4"),
        (4, f"q1 q2 q3 q4 q1 q2 q3 q4 {_filler(50, 4)}"),
        (5, _filler(60, 8)),
    ]
    b1, b2 = _docs(spark, rows1), _docs(spark, rows2)
    _, store1 = _run_incremental(spark, b1, None)
    cleaned2, _ = _run_incremental(
        spark, b2, spark.createDataFrame(store1)
    )
    union_clean = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in remove_duplicated_spans(
            _docs(spark, rows1 + rows2), min_tokens=4
        ).collect()
        if r.doc_id in (3, 4, 5)
    }
    got = {r.doc_id: (r.clean_text, r.n_removed_tokens) for r in cleaned2}
    assert got == union_clean


def test_incremental_store_saturates(spark):
    shared = "s1 s2 s3 s4"
    b1 = _docs(spark, [(i, f"{_filler(i * 30, 4)} {shared}") for i in range(4)])
    _, store1 = _run_incremental(spark, b1, None)
    assert max(r.n_seen for r in store1) == 2  # capped at min_occurrences
    # re-ingesting more copies keeps the cap
    b2 = _docs(spark, [(9, f"{shared} {_filler(90, 4)}")])
    _, store2 = _run_incremental(spark, b2, spark.createDataFrame(store1))
    assert max(r.n_seen for r in store2) == 2


def test_incremental_first_batch_within_batch_dup(spark):
    """Within-batch duplication is caught on the very first run (no store)."""
    shared = "w1 w2 w3 w4"
    b1 = _docs(
        spark,
        [(1, f"{shared} {_filler(0, 4)}"), (2, f"{_filler(10, 4)} {shared}")],
    )
    cleaned, store = _run_incremental(spark, b1, None)
    assert {r.doc_id: r.n_removed_tokens for r in cleaned} == {1: 4, 2: 4}
    # store keeps every distinct gram of the batch, saturated correctly
    assert all(r.n_seen in (1, 2) for r in store)


def test_incremental_store_grams_survive_absence(spark):
    """Grams absent from the current batch stay in the store (full outer)."""
    b1 = _docs(spark, [(1, "k1 k2 k3 k4 " + _filler(0, 4))])
    _, store1 = _run_incremental(spark, b1, None)
    b2 = _docs(spark, [(2, _filler(10, 8))])
    _, store2 = _run_incremental(spark, b2, spark.createDataFrame(store1))
    assert set(r.gram_hash for r in store1) <= set(
        r.gram_hash for r in store2
    )


def test_property_multibatch_delta_history_additivity(spark):
    """Hypothesis sweep of the capped-sum algebra under arbitrary batch
    splits: random docs over a tiny vocabulary (duplicates guaranteed)
    are partitioned into up to three batches and carried BOTH ways —
    the in-plan merged store and the raw delta-append history.  For
    every split, (a) the two carries clean every batch identically,
    and (b) the FINAL batch is cleaned exactly as the at-rest operator
    over the full union cleans those docs (earlier batches only have
    earlier knowledge — the documented temporal semantics)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from evidence_datasource_parsers_spark.operators.span_dedup import (
        incremental_span_dedupe,
    )

    token = st.sampled_from([f"t{i}" for i in range(6)])
    doc = st.lists(token, min_size=4, max_size=10).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(doc, min_size=2, max_size=7),
        cuts=st.lists(st.integers(0, 6), min_size=0, max_size=2),
    )
    def check(docs, cuts):
        rows = list(enumerate(docs))
        bounds = sorted({min(c, len(rows)) for c in cuts})
        batches, prev = [], 0
        for b in bounds + [len(rows)]:
            if b > prev:
                batches.append(rows[prev:b])
                prev = b
        if not batches:
            return

        mem_store, hist_store = None, None
        mem_clean, hist_clean = [], []
        for batch_rows in batches:
            b = _docs(spark, batch_rows)
            rm = incremental_span_dedupe(b, mem_store, min_tokens=4)
            mem_clean.append({
                (r.doc_id, r.clean_text, r.n_removed_tokens)
                for r in rm.cleaned.collect()
            })
            mem_store = rm.store.localCheckpoint(eager=True)
            rm.pinned.unpersist()

            rh = incremental_span_dedupe(b, hist_store, min_tokens=4)
            hist_clean.append({
                (r.doc_id, r.clean_text, r.n_removed_tokens)
                for r in rh.cleaned.collect()
            })
            delta = rh.delta.localCheckpoint(eager=True)
            hist_store = (
                delta if hist_store is None
                else hist_store.unionByName(delta)
            )
            rh.pinned.unpersist()

        assert mem_clean == hist_clean  # (a) carry equivalence

        # (b) final batch == at-rest over the union, restricted
        last_ids = {i for i, _ in batches[-1]}
        at_rest = {
            (r.doc_id, r.clean_text, r.n_removed_tokens)
            for r in remove_duplicated_spans(
                _docs(spark, rows), min_tokens=4
            ).collect()
            if r.doc_id in last_ids
        }
        assert mem_clean[-1] == at_rest

    check()
