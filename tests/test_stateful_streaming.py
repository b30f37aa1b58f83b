"""Stateful streaming: native session windows + applyInPandasWithState."""

from __future__ import annotations

import json

from evidence_datasource_parsers_spark.streaming.events import read_event_stream
from evidence_datasource_parsers_spark.streaming.stateful import (
    running_user_stats,
    session_window_agg,
)


def _write_events(path, events):
    path.write_text("\n".join(json.dumps(e) for e in events))


def _ev(eid, ts, uid, value):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": "click", "value": value, "props": "{}"}


def test_session_window_batch_semantics(spark, tmp_path):
    src = tmp_path / "sess"
    src.mkdir()
    _write_events(src / "f1.json", [
        _ev(1, "2024-01-01T00:00:00Z", 1, 1.0),
        _ev(2, "2024-01-01T00:10:00Z", 1, 2.0),   # same session (<30min gap)
        _ev(3, "2024-01-01T01:00:00Z", 1, 3.0),   # new session (50min gap)
        _ev(4, "2024-01-01T00:05:00Z", 2, 4.0),
    ])
    static = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).json(str(src))
    rows = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value_c"])
        for r in session_window_agg(static, gap="30 minutes").collect()
    )
    assert rows == [
        (1, "2024-01-01 00:00:00", 2, 300),
        (1, "2024-01-01 01:00:00", 1, 300),
        (2, "2024-01-01 00:05:00", 1, 400),
    ]


def test_session_window_streaming_matches_batch(spark, tmp_path):
    src = tmp_path / "sess_stream"
    src.mkdir()
    events = [
        _ev(1, "2024-01-01T00:00:00Z", 1, 1.0),
        _ev(2, "2024-01-01T00:10:00Z", 1, 2.0),
        _ev(3, "2024-01-01T01:00:00Z", 1, 3.0),
    ]
    _write_events(src / "f1.json", events[:2])
    _write_events(src / "f2.json", events[2:])
    agg = session_window_agg(read_event_stream(spark, str(src)))
    (
        agg.writeStream.format("memory").queryName("sessions_stream")
        .outputMode("complete").trigger(availableNow=True)
        .start().awaitTermination()
    )
    rows = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    )
    assert rows == [
        (1, "2024-01-01 00:00:00", 2),
        (1, "2024-01-01 01:00:00", 1),
    ]


def test_running_user_stats_state_across_batches(spark, tmp_path):
    src = tmp_path / "stateful"
    src.mkdir()
    # two files → maxFilesPerTrigger=8 would merge them; write enough spacing
    _write_events(src / "f1.json", [
        _ev(1, "2024-01-01T00:00:00Z", 7, 1.5),
        _ev(2, "2024-01-01T00:01:00Z", 7, 2.25),
    ])
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory").queryName("user_stats")
        .outputMode("append").trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM user_stats ORDER BY total_events"
    ).collect()
    assert rows[-1]["user_id"] == 7
    assert rows[-1]["total_events"] == 2
    assert rows[-1]["total_value_c"] == 375
    # state carried across micro-batches: if 2 batches ran, the last row's
    # running total (2) exceeds its batch delta
    if len(rows) == 2:
        assert rows[0]["total_events"] == rows[0]["batch_events"] == 1
        assert rows[-1]["batch_events"] == 1
