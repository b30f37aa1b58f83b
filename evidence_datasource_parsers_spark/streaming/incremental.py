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
):
    """foreachBatch sink: drop every document already in the cross-run
    store, append survivors to ``out_dir`` (parquet), swap the updated
    store into ``store_dir``.  Returns the started StreamingQuery."""
    from evidence_datasource_parsers_spark.operators.dedupe import (
        incremental_exact_dedupe,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = (
            spark.read.parquet(store_dir)
            if os.path.isdir(store_dir)
            else None
        )
        fresh, new_store = incremental_exact_dedupe(
            batch_df, store, text_col, id_col
        )
        try:
            # store first (see module docstring for the crash semantics);
            # tmp + rename because new_store READS store_dir — Spark
            # refuses an overwrite of a path in its own lineage, and a
            # partial in-place write would corrupt the store
            tmp = f"{store_dir}__swap_{uuid.uuid4().hex[:8]}"
            new_store.write.mode("overwrite").parquet(tmp)
            if os.path.isdir(store_dir):
                old = f"{store_dir}__old_{uuid.uuid4().hex[:8]}"
                os.rename(store_dir, old)
                os.rename(tmp, store_dir)
                shutil.rmtree(old)
            else:
                os.rename(tmp, store_dir)
            fresh.write.mode("append").parquet(out_dir)
        finally:
            fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
