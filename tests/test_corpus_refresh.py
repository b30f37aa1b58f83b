"""refresh_corpus_batch: two-run store carry, quality-gate store
semantics (rejected docs are still SEEN), mode dispatch, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.pipelines.corpus_refresh import (
    refresh_corpus_batch,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_run_refresh_drops_recrawls(spark):
    b1 = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content about shipping containers"),
    ])
    r1 = refresh_corpus_batch(b1, None, mode="lsh", k=3, num_shards=2)
    assert {r.doc_id for r in r1.ready.select("doc_id").collect()} == {1, 2}
    store = r1.store.localCheckpoint(eager=True)
    r1.done()

    b2 = _docs(spark, [
        (11, "the quick brown fox jumps over the lazy dog again and again"),
        (12, "a genuinely new document about distributed query engines"),
    ])
    r2 = refresh_corpus_batch(b2, store, mode="lsh", k=3, num_shards=2)
    ready = {r.doc_id for r in r2.ready.select("doc_id").collect()}
    assert ready == {12}  # re-crawl 11 dropped against the carried store
    cols = set(r2.ready.columns)
    assert {"quality", "split", "shard", "shard_pos"} <= cols
    r2.done()


def test_quality_rejects_still_enter_store(spark):
    """A doc dropped by the quality gate must still be in the store so the
    next run's re-crawl short-circuits at the dedup stage."""
    junk = "zzz " * 30
    b1 = _docs(spark, [(1, junk.strip())])
    r1 = refresh_corpus_batch(b1, None, mode="exact", min_quality=10.0)
    assert r1.ready.count() == 0  # rejected by quality
    store = r1.store.localCheckpoint(eager=True)
    assert store.count() == 1    # ...but SEEN
    r1.done()

    r2 = refresh_corpus_batch(
        _docs(spark, [(2, junk.strip())]), store, mode="exact",
        min_quality=10.0,
    )
    # re-crawl of the junk dies at dedup (store hit), not at re-scoring
    assert r2.store.count() == 1
    r2.done()


def test_mode_dispatch_and_guard(spark):
    b = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta")])
    for mode in ("exact", "lsh", "simhash"):
        r = refresh_corpus_batch(b, None, mode=mode)
        assert r.ready.count() == 1
        r.done()
    with pytest.raises(ValueError, match="mode"):
        refresh_corpus_batch(b, None, mode="fuzzy")


def test_deterministic_across_runs(spark):
    b = _docs(spark, [
        (i, f"document number {i} with shared filler words common to all")
        for i in range(20)
    ])
    r1 = refresh_corpus_batch(b, None, mode="lsh", k=3, num_shards=4)
    r2 = refresh_corpus_batch(b, None, mode="lsh", k=3, num_shards=4)
    a = sorted((r.doc_id, r.split, r.shard, r.shard_pos)
               for r in r1.ready.collect())
    c = sorted((r.doc_id, r.split, r.shard, r.shard_pos)
               for r in r2.ready.collect())
    assert a == c
    r1.done(); r2.done()


def test_canonicalize_catches_unicode_rerenders(spark):
    """A full-width/ligature re-render of a stored doc is a re-crawl under
    canonicalize=True, and raw text still flows to ready."""
    b1 = _docs(spark, [(1, "file transfer complete")])
    r1 = refresh_corpus_batch(b1, None, mode="exact", canonicalize=True)
    store = r1.store.localCheckpoint(eager=True)
    r1.done()

    rerender = "ﬁle  TRANSFER complete"  # ligature + case + spacing
    b2 = _docs(spark, [(2, rerender), (3, "actually new content")])
    r2 = refresh_corpus_batch(b2, store, mode="exact", canonicalize=True)
    rows = {r.doc_id: r.text for r in
            r2.ready.select("doc_id", "text").collect()}
    assert set(rows) == {3}
    assert rows[3] == "actually new content"  # original text untouched
    assert "__fp_text" not in r2.ready.columns
    r2.done()

    # without canonicalization the re-render slips through
    r3 = refresh_corpus_batch(b2, store, mode="exact")
    assert r3.ready.count() == 2
    r3.done()


def test_lm_perplexity_gate(spark):
    """The CCNet gate inside the refresh loop: docs fluent under the
    clean-corpus LM pass, gibberish is dropped — but still enters the
    store (seen-set semantics, like quality rejects)."""
    from evidence_datasource_parsers_spark.functions.ngram_lm import (
        train_ngram_lm,
    )

    clean = _docs(spark, [
        (i, "the quick brown fox jumps over the lazy dog")
        for i in range(5)
    ])
    lm = train_ngram_lm(clean, "text", n=2)

    batch = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "zz qq vv kk ww pp xx yy"),
    ])
    # calibrate the ceiling: fluent text scores far below gibberish
    loose = refresh_corpus_batch(batch, None, mode="exact", lm=lm,
                                 max_perplexity=1e9)
    ppl = {r.doc_id: r.perplexity for r in
           loose.ready.select("doc_id", "perplexity").collect()}
    assert ppl[1] < ppl[2]
    loose.done()

    ceiling = (ppl[1] + ppl[2]) / 2
    gated = refresh_corpus_batch(batch, None, mode="exact", lm=lm,
                                 max_perplexity=ceiling)
    assert {r.doc_id for r in gated.ready.collect()} == {1}
    assert gated.store.count() == 2  # the gibberish is still SEEN
    gated.done()
