"""Incremental streaming dedup: within-batch, cross-batch, and
cross-run (historical index) duplicates are all dropped exactly once;
batch replays are no-ops (effectively-once)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.streaming.incremental_dedup import (
    dedup_batch_against_index,
    fingerprint,
    incremental_dedup_stream,
    incremental_dedup_writer,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING, source STRING"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r[0], "text": r[1], "source": r[2]}) + "\n")


def test_dedup_batch_against_index_pure(spark):
    index = _docs(spark, [(0, "seen before", "hist")]).select(
        fingerprint(F.col("text")).alias("fingerprint")
    )
    batch = _docs(
        spark,
        [
            (10, "seen  BEFORE ", "a"),  # dup of history (normalized)
            (11, "brand new", "a"),
            (12, "brand new", "b"),  # within-batch dup; min doc_id wins
        ],
    )
    out = dedup_batch_against_index(batch, index).collect()
    assert {(r["doc_id"], r["text"]) for r in out} == {(11, "brand new")}


def test_streaming_incremental_dedup_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "docs"
    idx = tmp_path / "index"
    ckpt = tmp_path / "ckpt"

    # batch 1 file: one fresh doc + an internal duplicate pair
    _write_jsonl(str(src / "f1.jsonl"), [(1, "alpha", "s"), (2, "beta", "s"), (3, "beta", "s")])
    # batch 2 file: cross-batch duplicate of 'alpha' + one fresh doc
    _write_jsonl(str(src / "f2.jsonl"), [(4, "alpha", "s"), (5, "gamma", "s")])

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(str(src))
    )
    q = incremental_dedup_stream(stream, str(out), str(idx), str(ckpt)).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)

    docs = spark.read.parquet(str(out))
    kept = {(r["doc_id"], r["text"]) for r in docs.collect()}
    # 'beta' kept once (min doc_id 2), 'alpha' kept once (doc 1, batch
    # order by filename), 'gamma' fresh
    assert kept == {(1, "alpha"), (2, "beta"), (5, "gamma")}
    index_rows = spark.read.parquet(str(idx)).collect()
    assert len(index_rows) == 3
    assert len({r["fingerprint"] for r in index_rows}) == 3


def test_writer_replay_is_noop(spark, tmp_path):
    out, idx = str(tmp_path / "docs"), str(tmp_path / "index")
    writer = incremental_dedup_writer(out, idx)
    batch = _docs(spark, [(1, "only doc", "s")])
    writer(batch, 7)
    first = sorted(os.listdir(out))
    writer(batch, 7)  # replay: commit marker short-circuits
    assert sorted(os.listdir(out)) == first
    assert spark.read.parquet(out).count() == 1

    # a NEW batch with the same content is dropped by the index
    writer(_docs(spark, [(2, "only doc", "s")]), 8)
    assert spark.read.parquet(out).count() == 1
    # but its commit marker still lands (the batch itself succeeded)
    assert os.path.exists(os.path.join(out, "_commits", "8"))


def test_replay_after_publish_before_marker_keeps_batch(spark, tmp_path):
    """ADVICE r3 (high): a crash AFTER publish_staged but BEFORE
    write_marker must not lose the batch on replay. Without the
    pre-read sweep, the replayed batch reads the index including its
    own half-published fingerprints, classifies every document as a
    historical duplicate, and permanently publishes an empty output."""
    out, idx = str(tmp_path / "docs"), str(tmp_path / "index")
    writer = incremental_dedup_writer(out, idx)
    batch = _docs(spark, [(1, "alpha", "s"), (2, "beta", "s")])

    # simulate the crashed attempt: run the writer fully, then delete
    # the commit marker -- the on-disk state is exactly 'published but
    # uncommitted' (doc files + index files present, marker absent)
    writer(batch, 3)
    os.remove(os.path.join(out, "_commits", "3"))

    writer(batch, 3)  # the replay
    kept = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    assert kept == {(1, "alpha"), (2, "beta")}
    assert spark.read.parquet(idx).count() == 2
    assert os.path.exists(os.path.join(out, "_commits", "3"))

    # and a subsequent batch still dedups against the recovered index
    writer(_docs(spark, [(9, "alpha", "s"), (10, "delta", "s")]), 4)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 10}


def test_neardup_replay_after_publish_before_marker_keeps_batch(spark, tmp_path):
    """Same replay window for the near-dup writer (shared protocol)."""
    from kafka_clickhouse_pipeline_spark.streaming.incremental_neardup import (
        incremental_neardup_writer,
    )

    out, idx = str(tmp_path / "ndocs"), str(tmp_path / "nindex")
    writer = incremental_neardup_writer(out, idx)
    batch = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today", "s"),
            (2, "completely different sentence about parquet shuffles", "s"),
        ],
    )
    writer(batch, 5)
    os.remove(os.path.join(out, "_commits", "5"))

    writer(batch, 5)  # replay of the 'crashed' attempt
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2}
    assert os.path.exists(os.path.join(out, "_commits", "5"))


def test_neardup_batch_twin_matches_streaming_writer(spark, sf_dir, tmp_path):
    """q_dedup_incremental_near (the oracle-checked batch twin, VERDICT
    r3 #5) must produce exactly the docs the real near-dup streaming
    writer keeps when history flows through as batch 0 and the rest as
    batch 1."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators.dedup import (
        INCR_HISTORY_BOUNDARY,
        q_dedup_incremental_near,
    )
    from kafka_clickhouse_pipeline_spark.streaming.incremental_neardup import (
        incremental_neardup_writer,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    out, idx = str(tmp_path / "ndocs"), str(tmp_path / "nindex")
    writer = incremental_neardup_writer(out, idx)
    writer(docs.filter(F.col("doc_id") < INCR_HISTORY_BOUNDARY), 0)
    writer(docs.filter(F.col("doc_id") >= INCR_HISTORY_BOUNDARY), 1)

    streamed = {
        r["doc_id"]
        for r in spark.read.parquet(out).collect()
        if r["doc_id"] >= INCR_HISTORY_BOUNDARY
    }
    batch_twin = {
        r["doc_id"] for r in q_dedup_incremental_near(spark, sf_dir).collect()
    }
    assert streamed == batch_twin


def test_batch_twin_matches_streaming_writer(spark, sf_dir, tmp_path):
    """q_dedup_incremental (the oracle-checked batch twin) must produce
    exactly the docs the streaming writer would keep when the same
    history/batch partition of `documents` flows through it."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators.dedup import (
        INCR_HISTORY_BOUNDARY,
        q_dedup_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    out, idx = str(tmp_path / "docs"), str(tmp_path / "index")
    writer = incremental_dedup_writer(out, idx)
    # batch 0: the historical corpus bootstraps the index
    writer(docs.filter(F.col("doc_id") < INCR_HISTORY_BOUNDARY), 0)
    # batch 1: the 'incoming' documents
    writer(docs.filter(F.col("doc_id") >= INCR_HISTORY_BOUNDARY), 1)

    streamed = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.read.parquet(out).collect()
        if r["doc_id"] >= INCR_HISTORY_BOUNDARY
    }
    batch_twin = {
        (r["doc_id"], r["fingerprint"])
        for r in q_dedup_incremental(spark, sf_dir).collect()
    }
    assert streamed == batch_twin
