"""Incremental heavy-hitters maintenance: the MG summary state tracks
hot terms across micro-batches with bounded state, replays are no-ops,
crashed half-published attempts are swept, and the no-false-positive
guarantee of the share test holds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.streaming.heavy_hitters import (
    STREAM_MG_CAPACITY,
    batch_term_counts,
    current_heavy_hitters,
    heavy_hitters_writer,
    merge_and_trim,
    read_summary,
)

DOC_SCHEMA = "doc_id bigint, text string"


def _batch(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], DOC_SCHEMA
    )


class TestMergeAndTrim:
    def test_under_capacity_keeps_exact_counts(self, spark):
        prior = spark.createDataFrame([], "term string, cnt long")
        merged = merge_and_trim(prior, batch_term_counts(
            _batch(spark, ["a a b", "a c"])
        ))
        got = {r["term"]: r["cnt"] for r in merged.collect()}
        assert got == {"a": 3, "b": 1, "c": 1, None: 5}

    def test_trim_fires_and_hot_term_survives(self, spark):
        """2000 distinct noise terms + one hot term far above the
        threshold: the trim provably fires (> capacity counters), yet
        the hot term's stored count stays within the undercount bound
        N/(capacity+1)."""
        texts = [" ".join(["hot"] * 50 + [f"n{i}_{j}" for j in range(20)])
                 for i in range(100)]
        prior = spark.createDataFrame([], "term string, cnt long")
        merged = merge_and_trim(prior, batch_term_counts(_batch(spark, texts)))
        rows = {r["term"]: r["cnt"] for r in merged.collect()}
        n_total = rows[None]
        assert n_total == 100 * 70
        true_hot = 100 * 50
        assert "hot" in rows
        assert true_hot - n_total // (STREAM_MG_CAPACITY + 1) <= rows["hot"] <= true_hot
        # bounded state: at most capacity term rows survive
        assert len(rows) - 1 <= STREAM_MG_CAPACITY


class TestWriterProtocol:
    def test_accumulates_across_batches(self, spark, tmp_path):
        state = str(tmp_path / "state")
        w = heavy_hitters_writer(state)
        w(_batch(spark, ["x x y"] * 10), 0)
        w(_batch(spark, ["x z"] * 10, start=100), 1)
        s = {r["term"]: r["cnt"] for r in read_summary(spark, state).collect()}
        assert s["x"] == 30 and s["y"] == 10 and s["z"] == 10
        assert s[None] == 50
        hot = current_heavy_hitters(spark, state, k=3).collect()
        assert [r["term"] for r in hot] == ["x"]  # 30*3 > 50; 10*3 < 50... no: 30 only
        assert hot[0]["n_total"] == 50

    def test_replay_is_noop(self, spark, tmp_path):
        state = str(tmp_path / "state")
        w = heavy_hitters_writer(state)
        b = _batch(spark, ["a a b"])
        w(b, 0)
        before = sorted(map(tuple, read_summary(spark, state).collect()), key=repr)
        w(b, 0)  # at-least-once redelivery
        after = sorted(map(tuple, read_summary(spark, state).collect()), key=repr)
        assert before == after

    def test_crashed_publish_is_swept_on_replay(self, spark, tmp_path):
        """Crash window: batch 1 published files but no marker. The
        replay must sweep them and produce the same state as a clean
        run (no double counting)."""
        from kafka_clickhouse_pipeline_spark.streaming.commit import (
            publish_staged,
        )

        state = str(tmp_path / "state")
        w = heavy_hitters_writer(state)
        w(_batch(spark, ["a a b"]), 0)
        # simulate a crashed attempt of batch 1: publish without marker
        staging = str(tmp_path / "stg" / "1")
        merge_and_trim(
            read_summary(spark, state),
            batch_term_counts(_batch(spark, ["a c"], start=10)),
        ).repartition(1).write.mode("overwrite").parquet(staging)
        publish_staged(staging, state, 1)
        assert read_summary(spark, state).count() > 0  # prior state intact
        # replay batch 1 for real
        w(_batch(spark, ["a c"], start=10), 1)
        s = {r["term"]: r["cnt"] for r in read_summary(spark, state).collect()}
        assert s == {"a": 3, "b": 1, "c": 1, None: 5}

    def test_empty_state_reads_empty(self, spark, tmp_path):
        assert read_summary(spark, str(tmp_path / "nope")).count() == 0
        assert (
            current_heavy_hitters(spark, str(tmp_path / "nope")).count() == 0
        )


class TestNoFalsePositives:
    def test_share_test_uses_lower_bounds(self, spark, tmp_path):
        """After heavy trimming, reported terms still truly exceed the
        share threshold (MG counts are lower bounds)."""
        state = str(tmp_path / "state")
        w = heavy_hitters_writer(state)
        texts = [" ".join(["hot"] * 50 + [f"n{i}_{j}" for j in range(20)])
                 for i in range(50)]
        w(_batch(spark, texts), 0)
        w(_batch(spark, texts, start=10_000), 1)
        hot = current_heavy_hitters(spark, state, k=4).collect()
        total = 100 * 70
        for r in hot:
            assert r["cnt"] * 4 > total  # stored (lower-bound) count passes
            assert r["term"] == "hot"  # and no noise term leaks
        assert len(hot) == 1
