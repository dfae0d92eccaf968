"""applyInPandasWithState sessionization: sessions split on gaps,
close on watermark timeout, and aggregate correctly."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_clickhouse_pipeline_spark.streaming.sessions import sessionize_stream

RAW = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_stateful_sessionization(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    batches = [
        # user 1: two events 10 min apart (one session); user 2: one event
        [
            {"user_id": 1, "event_id": 1, "ts": "2024-01-15 10:00:00", "value": 5.0},
            {"user_id": 1, "event_id": 2, "ts": "2024-01-15 10:10:00", "value": 7.0},
            {"user_id": 2, "event_id": 3, "ts": "2024-01-15 10:05:00", "value": 1.0},
        ],
        # user 1 again 2h later -> gap splits: first session closes,
        # new one opens; watermark (max ts - 30m) also passes session 1
        [
            {"user_id": 1, "event_id": 4, "ts": "2024-01-15 12:30:00", "value": 2.0},
        ],
        # advance watermark far enough to time out everything
        [
            {"user_id": 3, "event_id": 5, "ts": "2024-01-15 18:00:00", "value": 9.0},
        ],
        [
            {"user_id": 3, "event_id": 6, "ts": "2024-01-15 23:00:00", "value": 4.0},
        ],
    ]
    for i, evs in enumerate(batches):
        with open(src / f"b{i:03d}.jsonl", "w") as f:
            for ev in evs:
                f.write(json.dumps(ev) + "\n")
        time.sleep(1.05)

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .select(F.from_json("value", RAW).alias("d"))
        .select("d.user_id", "d.event_id", F.col("d.ts").cast("timestamp").alias("ts"), "d.value")
    )
    q = (
        sessionize_stream(raw)
        .writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("SELECT * FROM sessions_sink ORDER BY user_id, session_start").collect()
    got = [
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events, r.revenue)
        for r in rows
    ]
    # user 1 session 1: 10:00-10:10, 2 events, 12.0 ; user 2: single event
    assert (1, "2024-01-15T10:00:00", "2024-01-15T10:10:00", 2, 12.0) in got
    assert (2, "2024-01-15T10:05:00", "2024-01-15T10:05:00", 1, 1.0) in got
    # user 1 session 2 (12:30) closes once watermark reaches 18:00-30m
    assert (1, "2024-01-15T12:30:00", "2024-01-15T12:30:00", 1, 2.0) in got
    # user 3's 18:00 session closes after the 23:00 batch advances the watermark
    assert (3, "2024-01-15T18:00:00", "2024-01-15T18:00:00", 1, 9.0) in got


def test_native_session_window_agrees(spark, tmp_path):
    """The built-in session_window variant: same session starts,
    counts, and revenues as the custom stateful operator; window end
    is last_event + gap by construction."""
    from kafka_clickhouse_pipeline_spark.streaming.sessions import (
        sessionize_stream_native,
    )

    src = tmp_path / "in"
    src.mkdir()
    batches = [
        [
            {"user_id": 1, "event_id": 1, "ts": "2024-01-15 10:00:00", "value": 5.0},
            {"user_id": 1, "event_id": 2, "ts": "2024-01-15 10:10:00", "value": 7.0},
            {"user_id": 2, "event_id": 3, "ts": "2024-01-15 10:05:00", "value": 1.0},
        ],
        [{"user_id": 1, "event_id": 4, "ts": "2024-01-15 12:30:00", "value": 2.0}],
        [{"user_id": 3, "event_id": 5, "ts": "2024-01-15 18:00:00", "value": 9.0}],
        [{"user_id": 3, "event_id": 6, "ts": "2024-01-15 23:00:00", "value": 4.0}],
    ]
    for i, evs in enumerate(batches):
        with open(src / f"b{i:03d}.jsonl", "w") as f:
            for ev in evs:
                f.write(json.dumps(ev) + "\n")
        time.sleep(1.05)
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .select(F.from_json("value", RAW).alias("d"))
        .select("d.user_id", "d.event_id", F.col("d.ts").cast("timestamp").alias("ts"), "d.value")
    )
    q = (
        sessionize_stream_native(raw)
        .writeStream.format("memory")
        .queryName("native_sessions_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_native"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql(
        "SELECT * FROM native_sessions_sink ORDER BY user_id, session_start"
    ).collect()
    got = [
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events, r.revenue)
        for r in rows
    ]
    # same sessions as the stateful operator; end = last_event + 30m gap
    assert (1, "2024-01-15T10:00:00", "2024-01-15T10:40:00", 2, 12.0) in got
    assert (2, "2024-01-15T10:05:00", "2024-01-15T10:35:00", 1, 1.0) in got
    assert (1, "2024-01-15T12:30:00", "2024-01-15T13:00:00", 1, 2.0) in got
    assert (3, "2024-01-15T18:00:00", "2024-01-15T18:30:00", 1, 9.0) in got
