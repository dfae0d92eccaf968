"""Incremental mixture-weight maintenance: streamed per-batch count
deltas reproduce the batch operator's thresholds exactly, replays are
no-ops, and the crash-between-publish-and-marker window is safe."""

from __future__ import annotations

import json
import os

from kafka_clickhouse_pipeline_spark.streaming.mixture import (
    batch_source_counts,
    current_thresholds,
    mixture_stream,
    mixture_writer,
    read_counts,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING, source STRING"


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r[0], "text": r[1], "source": r[2]}) + "\n")


def test_streamed_thresholds_match_batch_operator(spark, sf_dir, tmp_path):
    """Stream the fixture documents table in several micro-batches;
    the state-derived thresholds must equal q_temperature_sample's
    thresholds over the full corpus (shared code path = exact
    agreement)."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators.curation import (
        q_temperature_sample,
    )

    src = tmp_path / "in"
    state = tmp_path / "state"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    rows = [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()]
    third = max(1, len(rows) // 3)
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        _write_jsonl(str(src / f"f{i}.jsonl"), chunk)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        mixture_stream(stream, str(state), str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = {
        r["source"]: r["keep_threshold"]
        for r in current_thresholds(spark, str(state)).collect()
    }
    batch = {
        (r["source"], r["keep_threshold"])
        for r in q_temperature_sample(spark, sf_dir).collect()
    }
    assert streamed == dict(batch)
    # counts reconcile with the corpus
    from pyspark.sql import functions as F

    want = {
        r["source"]: r["n_tokens"]
        for r in batch_source_counts(docs).collect()
    }
    got = {
        r["source"]: r["n_tokens"]
        for r in read_counts(spark, str(state)).collect()
    }
    assert got == want


def test_mixture_replay_and_crash_window(spark, tmp_path):
    """Replaying a committed batch id is a no-op (counts unchanged);
    a replay after publish-but-before-marker sweeps the half-published
    delta instead of double counting."""
    from kafka_clickhouse_pipeline_spark.streaming.commit import marker_path

    state = tmp_path / "state"
    batch = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e", "s2")], DOC_SCHEMA
    )
    w = mixture_writer(str(state))
    w(batch, 0)
    base = {
        r["source"]: r["n_tokens"]
        for r in read_counts(spark, str(state)).collect()
    }
    assert base == {"s1": 3, "s2": 2}
    # committed replay: no-op
    w(batch, 0)
    assert {
        r["source"]: r["n_tokens"]
        for r in read_counts(spark, str(state)).collect()
    } == base
    # crash window: marker removed after publish -> replay must sweep
    # the published delta and re-publish exactly once
    os.remove(marker_path(str(state), 0))
    w(batch, 0)
    assert {
        r["source"]: r["n_tokens"]
        for r in read_counts(spark, str(state)).collect()
    } == base
