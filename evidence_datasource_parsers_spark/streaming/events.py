"""Structured Streaming surface.

The reference is pure batch (SURVEY §2.16) — streaming here is a beyond-parity
capability for the training-data-pipeline use case: continuously landing event
data with event-time windows, watermarked late-data handling, and gap-based
sessionization as a custom stateful operator.

Batch/stream symmetry: ``windowed_event_counts`` accepts either a static or a
streaming DataFrame (same code path), mirroring catalog q27.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "json", schema: str = EVENT_SCHEMA
) -> DataFrame:
    """File-source stream: each new file in *path* becomes a micro-batch.

    At production scale the source would be Kafka/Kinesis; the file source has
    identical downstream semantics (event-time, watermarks) so every operator
    below is transport-agnostic.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .format(fmt)
        .load(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts + exact cents sums.

    With a streaming input, the watermark bounds state: windows older than the
    watermark are finalized and evicted — constant memory per key at any
    scale.  With a batch input it degenerates to a plain groupBy.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


def dedupe_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop duplicate events within the watermark
    horizon.  State is bounded — ids older than the watermark are evicted,
    which is the only way dedup state stays finite on an unbounded stream.
    Works identically on batch frames (plain dropDuplicates)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "15 minutes",
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join on a key within an event-time interval:
    pair each left event with right events for the same key whose timestamp
    falls in ``[l.ts - within, l.ts + within]`` — e.g. impressions joined to
    clicks, requests to responses, sensor A to sensor B.

    Both sides are watermarked, and the interval condition is what BOUNDS
    the join state: once the watermark passes ``ts + within``, buffered rows
    can never match a future row and are evicted.  A stream-stream join
    without a time-range predicate would buffer both streams forever.

    Columns are prefixed per side (except the join key) because both inputs
    share the event schema."""
    lw = left.withWatermark("ts", watermark)
    rw = right.withWatermark("ts", watermark)
    lcols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != on]
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != on]
    lp = lw.select(on, *lcols)
    rp = rw.select(on, *rcols)
    lts, rts = f"{left_prefix}ts", f"{right_prefix}ts"
    cond = (
        f"{rts} >= {lts} - INTERVAL {within} AND "
        f"{rts} <= {lts} + INTERVAL {within}"
    )
    return lp.join(rp, on=[lp[on] == rp[on], F.expr(cond)], how="inner").drop(
        rp[on]
    )


def run_to_memory(stream_df: DataFrame, table: str) -> None:
    """Drain all available input into an in-memory sink (test harness)."""
    (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (broadcast)
    static dimension — the streaming twin of broadcast_lut_join.  The static
    side is re-resolved per batch, so slowly-changing dims refresh on re-read
    sources (e.g. Delta); no state is kept for it."""
    return stream.join(F.broadcast(dim), on=on, how="left")


def stream_to_evidence_sink(
    stream: DataFrame, out_dir: str, checkpoint: str
):
    """Micro-batch evidence sink via foreachBatch: every batch appends
    partitioned gzip JSON-lines (the streaming analog of the K1 contract —
    single-file coalescing is meaningless on an unbounded stream)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .format("json")
            .option("compression", "org.apache.hadoop.io.compress.GzipCodec")
            .save(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedupe_stream_by_content(
    events: DataFrame,
    text_col: str = "props",  # EVENT_SCHEMA's text payload column
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming EXACT-CONTENT dedup: drop events whose normalized text
    already arrived within the watermark horizon — the streaming twin of
    ``operators.dedupe.exact_dedupe``, with the same normalization and
    portable hash, so batch backfills and the live stream agree on what
    counts as a duplicate.  State carries one 8-byte hash per kept event
    and is watermark-evicted (bounded, like every stateful op here)."""
    from evidence_datasource_parsers_spark.operators.dedupe import (
        content_hash,
    )

    hashed = events.withColumn("__content", content_hash(F.col(text_col)))
    return dedupe_stream(hashed, ["__content"], watermark).drop("__content")
