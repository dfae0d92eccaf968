"""Incremental KMV distinct-count maintenance: the per-group bottom-K
sketch state is bit-equal to the batch computation over the
concatenated history (KMV mergeability), estimates are exact under K,
replays are no-ops and crashed half-published attempts are swept."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.streaming.kmv_distinct import (
    batch_hashes,
    current_distinct_estimates,
    kmv_writer,
    merge_bottom_k,
    read_sketch,
)

EV_SCHEMA = "event_id bigint, event_type string, user_id bigint"


def _batch(spark, rows, start=0):
    return spark.createDataFrame(
        [(start + i, t, u) for i, (t, u) in enumerate(rows)], EV_SCHEMA
    )


def _hex32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


class TestMergeEqualsBatch:
    def test_sketch_equals_batch_over_history(self, spark, tmp_path):
        """Mergeability: the maintained sketch after two batches equals
        bottom-K computed directly over the union of both batches."""
        rows1 = [("click", u) for u in range(300)]
        rows2 = [("click", u) for u in range(150, 450)]
        state = str(tmp_path / "state")
        w = kmv_writer(state, k=64)
        w(_batch(spark, rows1), 0)
        w(_batch(spark, rows2, start=1000), 1)
        got = sorted(
            (r["event_type"], r["hv"])
            for r in read_sketch(spark, state).collect()
        )
        union = _batch(spark, rows1).unionByName(_batch(spark, rows2, start=1000))
        want = sorted(
            (r["event_type"], r["hv"])
            for r in merge_bottom_k(
                batch_hashes(union).limit(0), batch_hashes(union), k=64
            ).collect()
        )
        assert got == want and len(got) == 64

    def test_hash_is_the_shared_md5_decode(self, spark):
        hv = {
            r["hv"]
            for r in batch_hashes(_batch(spark, [("c", 7), ("c", 42)])).collect()
        }
        assert hv == {_hex32(7), _hex32(42)}


class TestEstimates:
    def test_under_k_is_exact(self, spark, tmp_path):
        state = str(tmp_path / "state")
        w = kmv_writer(state)  # K = 256 default, 40 users -> exact
        w(_batch(spark, [("click", u) for u in range(30)]), 0)
        w(_batch(spark, [("click", u) for u in range(20, 40)] +
                 [("buy", u) for u in range(5)], start=100), 1)
        est = {
            r["event_type"]: (r["n_kept"], r["distinct_estimate"])
            for r in current_distinct_estimates(spark, state).collect()
        }
        assert est == {"click": (40, 40.0), "buy": (5, 5.0)}

    def test_over_k_estimate_formula(self, spark, tmp_path):
        """At capacity the estimate is (K-1)/u_K of the K-th smallest
        hash -- recomputed here from hashlib over the full history."""
        k = 32
        users = list(range(500))
        state = str(tmp_path / "state")
        w = kmv_writer(state, k=k)
        w(_batch(spark, [("click", u) for u in users[:250]]), 0)
        w(_batch(spark, [("click", u) for u in users[250:]], start=900), 1)
        hs = sorted(_hex32(u) for u in users)
        want = (k - 1) / ((hs[k - 1] + 0.5) / 2**32)
        got = current_distinct_estimates(spark, state, k=k).collect()[0]
        assert got["n_kept"] == k
        assert abs(got["distinct_estimate"] - round(want, 2)) < 1e-9
        # sanity: the estimator lands in the KMV error envelope
        assert 0.5 * 500 < got["distinct_estimate"] < 2 * 500


class TestWriterProtocol:
    def test_replay_is_noop(self, spark, tmp_path):
        state = str(tmp_path / "state")
        w = kmv_writer(state, k=16)
        b = _batch(spark, [("click", u) for u in range(40)])
        w(b, 0)
        before = sorted(map(tuple, read_sketch(spark, state).collect()))
        w(b, 0)  # at-least-once redelivery
        after = sorted(map(tuple, read_sketch(spark, state).collect()))
        assert before == after

    def test_crashed_publish_is_swept_on_replay(self, spark, tmp_path):
        """Crash window: batch 1 published files but no marker. The
        replay must sweep them and produce the same state as a clean
        run (no stale hashes, no double-publish)."""
        from kafka_clickhouse_pipeline_spark.streaming.commit import (
            publish_staged,
        )

        state = str(tmp_path / "state")
        w = kmv_writer(state, k=16)
        w(_batch(spark, [("click", u) for u in range(10)]), 0)
        staging = str(tmp_path / "stg" / "1")
        merge_bottom_k(
            read_sketch(spark, state),
            batch_hashes(_batch(spark, [("click", u) for u in range(10, 20)],
                                start=100)),
            k=16,
        ).repartition(1).write.mode("overwrite").parquet(staging)
        publish_staged(staging, state, 1)
        assert read_sketch(spark, state).count() > 0  # prior state intact
        w(_batch(spark, [("click", u) for u in range(10, 20)], start=100), 1)
        got = sorted(r["hv"] for r in read_sketch(spark, state).collect())
        assert got == sorted(_hex32(u) for u in range(20))[:16]
        est = current_distinct_estimates(spark, state, k=16).collect()[0]
        assert est["n_kept"] == 16

    def test_empty_state_reads_empty(self, spark, tmp_path):
        assert read_sketch(spark, str(tmp_path / "nope")).count() == 0
        assert (
            current_distinct_estimates(spark, str(tmp_path / "nope")).count() == 0
        )
