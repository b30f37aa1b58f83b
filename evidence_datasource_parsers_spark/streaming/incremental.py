"""Streaming ingestion against the persistent dedup store.

``dedupe_stream_by_content`` (events.py) is watermark-bounded: it forgets
every hash older than the horizon, which is correct for in-flight duplicate
events but useless against a re-crawl arriving days later.  This module
closes the loop between Structured Streaming and the batch-side
fingerprint-store pattern (``operators.dedupe.incremental_exact_dedupe``):
each micro-batch is deduped against the ON-DISK store that batch refreshes
also maintain, so the live stream and nightly backfills share ONE notion of
"already ingested" with unbounded memory of the past at ~8 bytes/document.

Delivery semantics: the store is swapped in BEFORE the fresh rows are
appended, so a crash between the two writes loses that batch's output but
never double-counts it (at-most-once per batch for the sink, exactly-once
for the store).  Flip the order for at-least-once output and clean up with
an exact dedup downstream.  True exactly-once needs a transactional table
format for both writes — the operator shape is unchanged.

Scale: the per-batch cost is the batch scan + one anti-join against the
store (AQE broadcast while the store is small; see
``sinks.write_bucketed_store`` for the co-located layout once it is not).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def incremental_dedupe_sink(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint: str,
    text_col: str,
    id_col: str,
    mode: str = "exact",
    **dedupe_opts,
):
    """foreachBatch sink: drop every document already in the cross-run
    store, append survivors to ``out_dir`` (parquet), swap the updated
    store into ``store_dir``.  Returns the started StreamingQuery.

    ``mode`` selects the store semantics — the full incremental triad is
    available to the stream:

      * ``'exact'``  — 8-byte content hashes (`incremental_exact_dedupe`);
      * ``'lsh'``    — MinHash-LSH fingerprints: a re-crawl with a few
        changed words is still dropped (`incremental_lsh_dedupe`);
      * ``'simhash'`` — hamming-distance fingerprints
        (`incremental_simhash_dedupe`);
      * ``'embedding'`` — semantic re-embeds dropped against an INT8
        vector store (`quantize.incremental_embedding_dedupe_quantized`);
        ``text_col`` names the vector column.

    ``dedupe_opts`` pass through to the chosen operator (num_perm/bands/k
    for lsh; nbits/max_hamming/n_blocks for simhash; threshold).  The LSH
    operator's shingle ``mode`` ('char'/'word') is passed as
    ``shingle_mode`` here, since ``mode`` selects the store kind.
    """
    from evidence_datasource_parsers_spark.operators import dedupe as dd

    if mode not in ("exact", "lsh", "simhash", "embedding"):
        raise ValueError(f"unknown dedupe mode {mode!r}")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = (
            spark.read.parquet(store_dir)
            if os.path.isdir(store_dir)
            else None
        )
        if mode == "exact":
            fresh, new_store = dd.incremental_exact_dedupe(
                batch_df, store, text_col, id_col, **dedupe_opts
            )
        elif mode == "lsh":
            opts = dict(dedupe_opts)
            if "shingle_mode" in opts:
                opts["mode"] = opts.pop("shingle_mode")
            res = dd.incremental_lsh_dedupe(
                batch_df, store, text_col, id_col, **opts
            )
            fresh, new_store = res.fresh, res.store
            fresh = fresh.persist()  # consumed once; pinned fp covers store
        elif mode == "simhash":
            res = dd.incremental_simhash_dedupe(
                batch_df, store, text_col, id_col, **dedupe_opts
            )
            fresh, new_store = res.fresh, res.store
            fresh = fresh.persist()
        else:  # embedding
            from evidence_datasource_parsers_spark.operators.quantize import (
                incremental_embedding_dedupe_quantized,
            )

            res = incremental_embedding_dedupe_quantized(
                batch_df, store, text_col, id_col, **dedupe_opts
            )
            fresh, new_store = res.fresh, res.store
            fresh = fresh.persist()
        try:
            # 1. materialize the updated store into a tmp dir (it READS
            # store_dir, so an in-place overwrite would corrupt it);
            # 2. sever fresh's lineage from the old store files with an
            # eager checkpoint — the swap below DELETES them, and a lazy
            # fresh would otherwise fail mid-write on the vanished parts;
            # 3. swap; 4. append the checkpointed fresh rows.
            # Crash before the swap: nothing visible changed (stale tmp
            # dirs are garbage to sweep).  Crash between swap and append:
            # store updated, output lost — the documented at-most-once.
            tmp = f"{store_dir}__swap_{uuid.uuid4().hex[:8]}"
            new_store.write.mode("overwrite").parquet(tmp)
            fresh_mat = fresh.localCheckpoint(eager=True)
            if os.path.isdir(store_dir):
                old = f"{store_dir}__old_{uuid.uuid4().hex[:8]}"
                os.rename(store_dir, old)
                os.rename(tmp, store_dir)
                shutil.rmtree(old)
            else:
                os.rename(tmp, store_dir)
            fresh_mat.write.mode("append").parquet(out_dir)
        finally:
            fresh.unpersist()
            if mode != "exact":
                res.pinned.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_distinct_count_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
):
    """foreachBatch sink maintaining the mergeable HLL sketch store
    (operators/sketches.py) across micro-batches AND runs: per batch, fold
    the batch's sketches into the on-disk store and swap atomically.

    The store IS the output — distinct-count dashboards read it with
    ``hll_estimates`` at any time; re-ingested values cannot inflate it
    (HLL registers take maxima).  Exactly-once for the store by the same
    tmp+swap discipline as :func:`incremental_dedupe_sink`; a replayed
    batch merges idempotently rather than double-counting — the property
    that makes sketch stores SAFER under at-least-once delivery than
    exact counters.
    """
    from evidence_datasource_parsers_spark.operators.sketches import (
        incremental_distinct_count,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = (
            spark.read.parquet(store_dir)
            if os.path.isdir(store_dir)
            else None
        )
        updated = incremental_distinct_count(
            store, batch_df, group_cols, value_col, lgk
        )
        tmp = f"{store_dir}__swap_{uuid.uuid4().hex[:8]}"
        updated.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(store_dir):
            old = f"{store_dir}__old_{uuid.uuid4().hex[:8]}"
            os.rename(store_dir, old)
            os.rename(tmp, store_dir)
            shutil.rmtree(old)
        else:
            os.rename(tmp, store_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
