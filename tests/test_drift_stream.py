"""Incremental drift monitoring: streamed per-batch bin-count deltas
reproduce the batch PSI core exactly, replays are no-ops, and the
empty state degrades to uniform smoothed shares."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators.advanced import (
    PSI_BINS,
    psi_table,
)
from kafka_clickhouse_pipeline_spark.streaming.drift import (
    batch_bin_counts,
    current_psi,
    drift_stream,
    drift_writer,
    read_bin_counts,
)

EV_SCHEMA = "event_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps({"event_id": r[0], "ts": r[1], "value": r[2]}) + "\n"
            )


def _ref_counts(spark):
    # reference snapshot: 10 events per bin-representative value
    return spark.createDataFrame(
        [(label, 10) for _, _, label in PSI_BINS], "bin string, n long"
    )


def test_streamed_psi_matches_batch_core(spark, sf_dir, tmp_path):
    """Stream the fixture events in micro-batches; current_psi over the
    accumulated state must equal psi_table fed the same counts computed
    in one batch pass (shared code path = exact agreement)."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    src = tmp_path / "in"
    state = tmp_path / "state"
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    rows = [
        (r["event_id"], str(r["ts"]), r["value"]) for r in events.collect()
    ]
    third = max(1, len(rows) // 3)
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        _write_jsonl(str(src / f"f{i}.jsonl"), chunk)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        drift_stream(stream, str(state), str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    ref = _ref_counts(spark)
    streamed = current_psi(spark, str(state), ref).collect()

    batch_counts = (
        ref.select("bin", F.col("n").alias("n_first"))
        .join(
            batch_bin_counts(events).select(
                "bin", F.col("n").alias("n_second")
            ),
            "bin",
            "full_outer",
        )
        .select(
            "bin",
            F.coalesce("n_first", F.lit(0)).alias("n_first"),
            F.coalesce("n_second", F.lit(0)).alias("n_second"),
        )
    )
    want = psi_table(batch_counts).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in want]
    # state reconciles with the corpus counts
    got = {r["bin"]: r["n"] for r in read_bin_counts(spark, str(state)).collect()}
    exp = {r["bin"]: r["n"] for r in batch_bin_counts(events).collect()}
    assert got == exp


def test_replayed_batch_is_noop(spark, tmp_path):
    import datetime

    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2), 5.0),
         (2, datetime.datetime(2024, 1, 2), 30.0)],
        EV_SCHEMA,
    )
    w = drift_writer(state)
    w(batch, 0)
    before = {r["bin"]: r["n"] for r in read_bin_counts(spark, state).collect()}
    w(batch, 0)  # at-least-once replay
    after = {r["bin"]: r["n"] for r in read_bin_counts(spark, state).collect()}
    assert before == after == {"lt_10": 1, "25_50": 1}


def test_empty_state_yields_uniform_smoothed_psi(spark, tmp_path):
    ref = _ref_counts(spark)
    out = current_psi(spark, str(tmp_path / "nostate"), ref).collect()
    assert len(out) == len(PSI_BINS)
    # reference is uniform and the stream is empty-smoothed-uniform:
    # p == q in every bin -> PSI contribution 0
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert all(r["n_second"] == 0 for r in out)
