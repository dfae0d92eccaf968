"""Watermark-semantics tests for the stateful streaming operators:
window finalization, late-data drop, duplicate drop across batches."""

from __future__ import annotations

import json

from kafka_clickhouse_pipeline_spark.schemas import SALES_RAW_SCHEMA
from kafka_clickhouse_pipeline_spark.sources.kafka import read_json_lines_stream
from kafka_clickhouse_pipeline_spark.streaming.stateful import (
    dedup_stream,
    hourly_rollup_stream,
)
from kafka_clickhouse_pipeline_spark.streaming.transforms import parse_sales


def _sale(event_id, event_time, quantity=1, total=10.0):
    return {
        "event_id": event_id,
        "event_type": "sale",
        "event_time": event_time,
        "product_id": 1,
        "product_name": "a b",
        "category": "Books",
        "quantity": quantity,
        "price": 5.0,
        "discount": 0.0,
        "total": total,
        "store_id": 1,
        "cashier_id": 1,
        "customer_id": "c",
    }


def _run_batches(spark, tmp_path, batches, build_query, mode, name):
    """Write each batch as one file, process with maxFilesPerTrigger=1 so
    the watermark advances between batches, collect from memory sink."""
    import time

    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    for i, events in enumerate(batches):
        with open(src / f"b{i:03d}.jsonl", "w") as f:
            for ev in events:
                f.write(json.dumps(ev) + "\n")
        time.sleep(1.05)  # distinct mtimes -> deterministic batch order
    raw = read_json_lines_stream(spark, str(src), SALES_RAW_SCHEMA, max_files_per_trigger=1)
    out = build_query(parse_sales(raw))
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_windowed_rollup_finalizes_and_drops_late(spark, tmp_path):
    batches = [
        # batch 0: hour-10 rows plus a 12:30 row -> watermark after the
        # batch is 11:30, past the hour-10 window end
        [
            _sale("a", "2024-01-15 10:00:00", quantity=2, total=20.0),
            _sale("b", "2024-01-15 10:15:00", quantity=1, total=5.0),
            _sale("c", "2024-01-15 12:30:00", quantity=1, total=1.0),
        ],
        # batch 1: advances the watermark again; hour-10 window is
        # emitted (watermark propagation to late-row filtering lags one
        # completed batch in Spark, so the drop test arrives in batch 2)
        [_sale("d", "2024-01-15 14:00:00", quantity=1, total=2.0)],
        # batch 2: a row for the long-closed hour-10 window -> must be
        # dropped, finalized windows are immutable
        [
            _sale("late", "2024-01-15 10:05:00", quantity=100, total=999.0),
            _sale("e", "2024-01-15 16:00:00", quantity=1, total=3.0),
        ],
        # batch 3: tail batch advancing the watermark past hour 16
        [_sale("f", "2024-01-15 18:00:00", quantity=1, total=4.0)],
    ]
    rows = _run_batches(
        spark, tmp_path, batches, hourly_rollup_stream, "append", "rollup_sink"
    )
    got = {r.hour.isoformat(): (r.total_quantity, str(r.revenue)) for r in rows}
    # hour 10 closed with only a+b -- the late row was dropped, NOT added
    assert got.get("2024-01-15T10:00:00") == (3, "25.00"), got
    assert got.get("2024-01-15T12:00:00") == (1, "1.00"), got
    assert got.get("2024-01-15T14:00:00") == (1, "2.00"), got
    assert got.get("2024-01-15T16:00:00") == (1, "3.00"), got


def test_sliding_window_rollup_overlapping_membership(spark, tmp_path):
    """Sliding windows (1 h every 30 min): each event lands in exactly
    window/slide = 2 overlapping windows, per-window sums count it in
    both, and finalization still follows the watermark."""
    batches = [
        [
            _sale("a", "2024-01-15 10:00:00", quantity=1, total=1.0),
            _sale("b", "2024-01-15 10:45:00", quantity=2, total=2.0),
            _sale("w", "2024-01-15 13:00:00", quantity=1, total=9.0),
        ],
        [_sale("x", "2024-01-15 15:00:00", quantity=1, total=9.0)],
        [_sale("y", "2024-01-15 17:00:00", quantity=1, total=9.0)],
    ]
    rows = _run_batches(
        spark,
        tmp_path,
        batches,
        lambda df: hourly_rollup_stream(df, slide="30 minutes"),
        "append",
        "sliding_sink",
    )
    got = {r.hour.isoformat(): (r.total_quantity, str(r.revenue)) for r in rows}
    assert got.get("2024-01-15T09:30:00") == (1, "1.00"), got  # a only
    assert got.get("2024-01-15T10:00:00") == (3, "3.00"), got  # a + b
    assert got.get("2024-01-15T10:30:00") == (2, "2.00"), got  # b only


def test_dedup_stream_drops_duplicates_across_batches(spark, tmp_path):
    batches = [
        [_sale("x", "2024-01-15 10:00:00"), _sale("y", "2024-01-15 10:01:00")],
        # same event ids re-delivered (at-least-once replay) within watermark
        [_sale("x", "2024-01-15 10:00:00"), _sale("z", "2024-01-15 10:02:00")],
    ]
    rows = _run_batches(
        spark, tmp_path, batches, dedup_stream, "append", "dedup_sink"
    )
    ids = sorted(r.event_id for r in rows)
    assert ids == ["x", "y", "z"], ids


def test_rocksdb_state_store_parity(spark, tmp_path):
    """The RocksDB provider (off-heap state, the 100 TB-state lever)
    must produce the same rollup as the default in-heap provider, and
    the query must actually run on RocksDB (provider is read from
    session conf at query start)."""
    from kafka_clickhouse_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        use_default_state_store,
        use_rocksdb_state_store,
    )

    batches = [
        [
            _sale("a", "2024-01-15 10:00:00", quantity=2, total=20.0),
            _sale("b", "2024-01-15 12:30:00", quantity=1, total=1.0),
        ],
        [_sale("c", "2024-01-15 14:00:00", quantity=1, total=2.0)],
        [_sale("d", "2024-01-15 16:00:00", quantity=1, total=3.0)],
    ]
    use_rocksdb_state_store(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        rocks = _run_batches(
            spark, tmp_path, batches, hourly_rollup_stream, "append", "rocks_sink"
        )
    finally:
        use_default_state_store(spark)
    default_dir = tmp_path / "default_run"
    default_dir.mkdir()
    default = _run_batches(
        spark, default_dir, batches, hourly_rollup_stream, "append", "default_sink"
    )
    key = lambda r: r.hour
    assert sorted(rocks, key=key) == sorted(default, key=key)
    assert len(rocks) >= 2
