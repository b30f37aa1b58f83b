"""Stateful streaming operators.

Two tiers, mirroring the engine's general philosophy (built-ins first):

1. ``session_window_agg`` — Spark's native ``session_window`` (gap-based
   session aggregation).  Works identically on batch and streaming frames;
   with a watermark, closed sessions finalize and state is evicted.
2. ``running_user_stats`` — a CUSTOM stateful operator via
   ``applyInPandasWithState``: per-user running counters that survive across
   micro-batches (the shape you need when built-in windows can't express the
   semantics, e.g. sequence-dependent feature extraction for training data).

Scale notes: state is partitioned by the grouping key across executors; the
watermark bounds it in (1); in (2) the state payload is a fixed-width tuple,
so memory is O(|active keys|).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native gap-based session windows (batch/stream symmetric).

    Equivalent batch semantics to catalog q28's lag+cumsum sessionization,
    expressed with the built-in operator so streaming state management
    (merge-adjacent-sessions, watermark eviction) comes for free.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_c"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_c",
        )
    )


STATS_OUTPUT_SCHEMA = (
    "user_id bigint, batch_events int, total_events int, total_value_c bigint"
)
STATS_STATE_SCHEMA = "total_events int, total_value_c bigint"


def _stats_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (total_events, total_value_c) = (
        state.get if state.exists else (0, 0)
    )
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_value_c += int(round(pdf["value"].sum() * 100))
    state.update((total_events, total_value_c))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value_c": [total_value_c],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across micro-batches.

    Emits one row per (user, micro-batch) carrying both the batch delta and
    the all-time running totals held in state.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _stats_fn,
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
