"""End-to-end LLM training-data pipeline over the real documents table:

profile → PII scrub → quality/repetition filter → exact dedup →
repeated-passage removal → decontamination → domain mixing → chunking →
sequence packing — every stage a repo operator, chained on one DataFrame
lineage, collected exactly once at the end.

This is the integration surface a user of the engine actually runs; the
assertions check the contracts BETWEEN stages (ids survive, text only
shrinks, proportions land, packing covers every chunk) rather than any
single operator's internals.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.textstats import (
    repetition_signals,
    scrub_pii,
)
from evidence_datasource_parsers_spark.operators.chunking import chunk_documents
from evidence_datasource_parsers_spark.operators.decontaminate import (
    decontaminate,
)
from evidence_datasource_parsers_spark.operators.dedupe import exact_dedupe
from evidence_datasource_parsers_spark.operators.passage_dedup import (
    remove_repeated_passages,
)
from evidence_datasource_parsers_spark.operators.profiling import corpus_profile
from evidence_datasource_parsers_spark.operators.sampling import (
    domain_mixture_sample,
)


def test_full_corpus_pipeline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. profile — the numbers later stages consume
    prof = corpus_profile(docs, "text", group_col="lang").collect()
    langs = {r["lang"] for r in prof}
    assert sum(r["n_docs"] for r in prof) == n0

    # 1. scrub PII (text may only shrink or stay; ids untouched)
    scrubbed = docs.withColumn("text", scrub_pii("text"))

    # 2. drop high-repetition docs (boilerplate) via the Gopher signals
    filtered = repetition_signals(scrubbed).where(
        (F.col("dup_line_frac") <= 0.9) & (F.col("top_2gram_frac") <= 0.9)
    )

    # 3. exact dedup on normalized content, keep min doc_id
    deduped = exact_dedupe(filtered, "text", "doc_id")
    # pin the expensive repetition-signal + dedup lineage: every assertion
    # below re-evaluates its inputs otherwise
    survivors = filtered.join(
        deduped.select("doc_id"), on="doc_id", how="left_semi"
    ).localCheckpoint(eager=False)

    # 4. cut corpus-recurrent passages
    cleaned = remove_repeated_passages(
        survivors, passage_tokens=16, min_occurrences=3, min_distinct_docs=3
    ).localCheckpoint(eager=False)
    # passage removal preserves the document set and only removes text
    joined = survivors.select(
        "doc_id", F.length("text").alias("len_before")
    ).join(
        cleaned.select("doc_id", F.length("text").alias("len_after")),
        on="doc_id",
    )
    assert joined.count() == survivors.count()
    assert joined.where(F.col("len_after") > F.col("len_before")).count() == 0

    # 5. decontaminate against a fake benchmark built from 5 corpus docs
    evals = docs.orderBy("doc_id").limit(5).selectExpr(
        "doc_id AS eval_id", "text"
    )
    # re-attach lang for the mixing stage
    decon = decontaminate(cleaned, evals, n=8).join(
        docs.select("doc_id", "lang"), on="doc_id"
    ).localCheckpoint(eager=False)
    # the invariant that matters: the surviving corpus shares NO 8-gram
    # with the benchmark (a source doc whose contaminating text was
    # already scrubbed/passage-cut upstream may legitimately survive)
    from evidence_datasource_parsers_spark.operators.decontaminate import (
        find_contaminated,
    )

    assert find_contaminated(decon, evals, n=8).count() == 0

    # 6. mix to a target language distribution
    weights = {lang: 1.0 / len(langs) for lang in langs}
    mixed = domain_mixture_sample(decon, "lang", "doc_id", weights).localCheckpoint(
        eager=False
    )
    counts = {
        r["lang"]: r["n"]
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts, "mixture produced an empty corpus"
    lo, hi = min(counts.values()), max(counts.values())
    assert hi <= lo * 1.5 + 5 * (lo ** 0.5)  # near-equal proportions

    # 7. chunk + 8. pack: every non-empty doc chunks; chunk mass adds up
    chunks = chunk_documents(mixed, chunk_tokens=64, overlap=8)
    assert chunks.select("doc_id").distinct().count() == mixed.count()
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("chunk_token_count").alias("s"), F.count("*").alias("k")
    )
    orig = mixed.select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, 0)
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tokens"),
    )
    mismatch = (
        per_doc.join(orig, "doc_id")
        .where(F.col("s") - (F.col("k") - 1) * 8 != F.col("n_tokens"))
        .count()
    )
    assert mismatch == 0

    # the whole chain stayed lazy until here: one final materialization
    total_chunks = chunks.count()
    assert total_chunks >= mixed.count()


def test_incremental_refresh_pipeline(spark, sf_dir):
    """The batch-refresh twin of the at-rest pipeline: run 1 ingests half
    the corpus and persists the lexical fingerprint store; run 2 ingests
    the other half (which the synthetic corpus seeds with exact and near
    duplicates of run 1's docs), and only genuinely-new content flows
    through scoring → splitting → sharding.  Contracts checked BETWEEN
    stages: drops actually happen, survivors are a subset of the batch,
    the store grows by exactly the survivors, re-runs are deterministic,
    and the final shard assignment is topology-free."""
    from evidence_datasource_parsers_spark.functions.quality import (
        lexical_quality_score,
    )
    from evidence_datasource_parsers_spark.operators.dedupe import (
        incremental_lsh_dedupe,
        lsh_fingerprints,
    )
    from evidence_datasource_parsers_spark.operators.sampling import (
        split_assign,
    )
    from evidence_datasource_parsers_spark.operators.sharding import (
        assign_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    # run 1: first ingest — everything is fresh, store = its fingerprints
    r1 = incremental_lsh_dedupe(b1, None, "text", "doc_id", mode="word", k=3)
    n_b1_distinct = r1.fresh.count()
    store = r1.store.localCheckpoint(eager=True)  # "persisted" between runs
    r1.pinned.unpersist()
    assert store.select("doc_id").distinct().count() == n_b1_distinct

    # run 2: refresh batch — re-crawls must be dropped against the STORE
    r2 = incremental_lsh_dedupe(b2, store, "text", "doc_id", mode="word", k=3)
    fresh_ids = {r.doc_id for r in r2.fresh.select("doc_id").collect()}
    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    assert fresh_ids <= b2_ids
    assert len(fresh_ids) < len(b2_ids), "corpus seeds cross-parity dups"
    # store grew by exactly the surviving docs
    assert (
        r2.store.select("doc_id").distinct().count()
        == n_b1_distinct + len(fresh_ids)
    )
    # determinism: an identical re-run computes the identical fresh set
    r2b = incremental_lsh_dedupe(b2, store, "text", "doc_id", mode="word", k=3)
    assert {r.doc_id for r in r2b.fresh.select("doc_id").collect()} == fresh_ids
    r2b.pinned.unpersist()

    # downstream: quality-score, split leakage-safely, shard deterministically
    scored = r2.fresh.withColumn("q", lexical_quality_score(F.col("text")))
    assert scored.where(F.col("q").isNull()).count() == 0  # no NULL text here
    split = split_assign(scored, "doc_id", {"train": 0.9, "val": 0.1})
    sharded = assign_shards(split, "doc_id", 4)
    rows = {
        r.doc_id: (r.split, r.shard, r.shard_pos) for r in sharded.collect()
    }
    assert set(rows) == fresh_ids
    again = {
        r.doc_id: (r.split, r.shard, r.shard_pos)
        for r in assign_shards(
            split_assign(
                scored.repartition(7), "doc_id", {"train": 0.9, "val": 0.1}
            ),
            "doc_id",
            4,
        ).collect()
    }
    assert again == rows  # end-to-end topology-free
    r2.pinned.unpersist()

    # the incremental path and a from-scratch at-rest pass agree on content:
    # every fresh doc's fingerprint is genuinely absent from run 1's store
    fp2 = lsh_fingerprints(
        r2.fresh, "text", "doc_id", mode="word", k=3
    )
    overlap = fp2.select("content_hash").join(
        store.select("content_hash"), on="content_hash", how="left_semi"
    )
    assert overlap.count() == 0


def test_pretokenization_pipeline(spark, sf_dir):
    """BPE learn → apply/count → chunk → shard: the tokenizer-aware half of
    a training-data pipeline, contracts asserted between stages."""
    from evidence_datasource_parsers_spark.functions.bpe import (
        apply_bpe,
        bpe_token_count,
        learn_bpe_merges,
    )
    from evidence_datasource_parsers_spark.operators.sharding import (
        assign_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    n0 = docs.count()

    # 1. learn a small merge table on the corpus itself
    merges = learn_bpe_merges(docs, "text", n_merges=64)
    assert len(merges) == 64
    bc = spark.sparkContext.broadcast(merges)

    # 2. tokenize: counts must equal the applied token arrays' sizes and
    # reconstruct the original words
    tk = docs.select(
        "doc_id",
        apply_bpe(bc, "text").alias("toks"),
        bpe_token_count(bc, "text").alias("n_tok"),
    )
    bad = tk.where(F.size("toks") != F.col("n_tok")).count()
    assert bad == 0
    sample = tk.orderBy("doc_id").first()
    joined = "".join(sample.toks).replace("</w>", " ").strip()
    orig = docs.orderBy("doc_id").first().text
    assert joined.split() == orig.split()

    # 3. chunk to fixed windows; every doc survives
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=8)
    assert chunks.select("doc_id").distinct().count() == n0

    # 4. deterministic shards over chunk keys
    keyed = chunks.withColumn(
        "chunk_key",
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")),
    )
    sh = assign_shards(keyed, "chunk_key", num_shards=8)
    assert sh.count() == chunks.count()
    a = sorted((r.chunk_key, r.shard, r.shard_pos)
               for r in sh.collect())
    b = sorted((r.chunk_key, r.shard, r.shard_pos)
               for r in assign_shards(
                   keyed.repartition(13), "chunk_key", num_shards=8
               ).collect())
    assert a == b


def test_semantic_refresh_pipeline(spark, sf_dir):
    """The embedding-side refresh loop end-to-end: run 1 ingests half the
    vectors into an int8 store + an IVF index; run 2's batch (seeded with
    near-identical re-embeds of run-1 vectors) dedups against the
    DEQUANTIZED store, survivors append to the maintained index, and
    index health is monitored — contracts asserted between stages."""
    from pyspark.sql import functions as F2

    from evidence_datasource_parsers_spark.operators.ivf import (
        assign_cells,
        cell_occupancy,
        deterministic_centroids,
        ivf_add_batch,
        needs_refit,
    )
    from evidence_datasource_parsers_spark.operators.quantize import (
        incremental_embedding_dedupe_quantized,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F2.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(emb.first().embedding)
    b1 = emb.where(F2.col("vec_id") % 2 == 0)
    # batch 2: genuinely-new odd vectors + EXACT re-embeds of three stored
    # ones under new ids (the re-ingest the store must absorb)
    redo = b1.limit(3).select(
        (F2.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    b2 = emb.where(F2.col("vec_id") % 2 == 1).unionByName(redo)

    r1 = incremental_embedding_dedupe_quantized(
        b1, None, "embedding", "vec_id", dim=dim, threshold=0.98
    )
    n1 = r1.fresh.count()
    store = r1.store.localCheckpoint(eager=True)
    r1.pinned.unpersist()
    assert store.columns == ["vec_id", "q_embedding", "q_scale"]
    assert store.count() == n1

    r2 = incremental_embedding_dedupe_quantized(
        b2, store, "embedding", "vec_id", dim=dim, threshold=0.98
    )
    fresh_ids = {r.vec_id for r in r2.fresh.select("vec_id").collect()}
    assert all(i < 1_000_000 for i in fresh_ids), "re-embeds must drop"
    assert fresh_ids, "genuinely new vectors must survive"
    r2.pinned.unpersist()

    # maintained IVF index: run-1 vectors indexed, survivors appended
    cents = deterministic_centroids(dim, 8)
    idx = assign_cells(b1, cents)
    idx2 = ivf_add_batch(
        idx, r2.fresh.select("vec_id", "embedding"), cents
    )
    assert idx2.count() == n1 + len(fresh_ids)
    # appended rows used the SAME centroids: spot-check one assignment
    occ = cell_occupancy(idx2)
    assert occ.agg(F2.sum("n")).collect()[0][0] == idx2.count()
    assert isinstance(needs_refit(occ, 8), bool)


def test_semantic_decontaminate(spark):
    """Embedding-space eval decontamination: a paraphrase-close corpus doc
    (cosine ≥ θ to an eval vector) drops — including an exact re-ingest —
    while orthogonal and merely-similar-below-θ docs survive.  NULL
    vectors pass through (no fingerprint to match)."""
    import numpy as np

    from evidence_datasource_parsers_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    def unit(i, dim=16):
        v = np.zeros(dim)
        v[i] = 1.0
        return v

    def mix(a, b, t, dim=16):
        v = (1 - t) * unit(a, dim) + t * unit(b, dim)
        return v / np.linalg.norm(v)

    eval_df = spark.createDataFrame(
        [(100, unit(0).tolist()), (101, unit(1).tolist())],
        "doc_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, unit(0).tolist()),          # exact eval item → drop
            (2, mix(0, 2, 0.1).tolist()),   # paraphrase-close → drop
            (3, mix(1, 2, 0.9).tolist()),   # similar-below-θ → keep
            (4, unit(5).tolist()),          # orthogonal → keep
            (5, None),                      # NULL vector → keep
        ],
        "doc_id long, embedding array<double>",
    )
    clean, pinned = semantic_decontaminate(
        corpus, eval_df, dim=16, threshold=0.9,
        n_planes=4, n_tables=8,  # high recall at this tiny scale
    )
    kept = {r["doc_id"] for r in clean.collect()}
    pinned.unpersist()
    assert kept == {3, 4, 5}
