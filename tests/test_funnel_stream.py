"""Streaming funnel twin: the maintained per-user state reproduces the
batch operator q_funnel_window exactly when events arrive time-ordered
across micro-batches (the documented contract), chains spanning batch
boundaries are caught, replays are no-ops, and state stays bounded by
the trailing window."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.catalog import load_table
from kafka_clickhouse_pipeline_spark.operators.analytics import (
    q_funnel_window,
)
from kafka_clickhouse_pipeline_spark.streaming.funnel import (
    current_funnel,
    funnel_writer,
    read_state,
)

T0 = datetime.datetime(2024, 1, 10, 0, 0, 0)
EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _ev(eid, user, etype, minutes):
    return (eid, T0 + datetime.timedelta(minutes=minutes), user, etype, 1.0, "{}")


def _frame(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


class TestFunnelStream:
    def test_chain_across_three_batches(self, spark, tmp_path):
        """view / click / purchase arriving in three separate
        micro-batches within the 24h window: depth 3 is detected even
        though no single batch holds the whole chain."""
        state = str(tmp_path / "state")
        w = funnel_writer(state)
        w(_frame(spark, [_ev(1, 7, "view", 0)]), 0)
        w(_frame(spark, [_ev(2, 7, "click", 60)]), 1)
        w(_frame(spark, [_ev(3, 7, "purchase", 120)]), 2)
        got = {r["step"]: r["n_users"] for r in current_funnel(spark, state).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_flags_survive_event_ageout(self, spark, tmp_path):
        """A completed chain's flags persist after its events age out
        of the retained window (a much later event advances max t)."""
        state = str(tmp_path / "state")
        w = funnel_writer(state)
        w(_frame(spark, [
            _ev(1, 7, "view", 0),
            _ev(2, 7, "click", 10),
            _ev(3, 7, "purchase", 20),
        ]), 0)
        w(_frame(spark, [_ev(4, 7, "view", 10 * 24 * 60)]), 1)
        got = {r["step"]: r["n_users"] for r in current_funnel(spark, state).collect()}
        assert got == {1: 1, 2: 1, 3: 1}
        # retained events: only the fresh view (+ the flags row)
        events = read_state(spark, state).filter(F.col("et").isNotNull()).collect()
        assert len(events) == 1 and events[0]["et"] == "view"

    def test_replay_is_noop(self, spark, tmp_path):
        state = str(tmp_path / "state")
        w = funnel_writer(state)
        b = _frame(spark, [_ev(1, 7, "view", 0), _ev(2, 7, "click", 30)])
        w(b, 0)
        before = {(r["step"], r["n_users"]) for r in current_funnel(spark, state).collect()}
        w(b, 0)  # replay
        after = {(r["step"], r["n_users"]) for r in current_funnel(spark, state).collect()}
        assert before == after

    def test_batch_parity_on_fixture(self, spark, sf_dir, tmp_path):
        """Stream the fixture events in three chronological chunks:
        the maintained funnel equals the batch q_funnel_window on the
        full table (the pure-transform-twin contract)."""
        state = str(tmp_path / "state")
        events = load_table(spark, sf_dir, "events")
        cuts = [r[0] for r in events.select(
            F.percentile_approx(F.col("ts").cast("timestamp").cast("long"),
                                [0.33, 0.66])
        ).collect()][0]
        lo, hi = int(cuts[0]), int(cuts[1])
        t = F.col("ts").cast("timestamp").cast("long")
        w = funnel_writer(state)
        w(events.filter(t <= lo), 0)
        w(events.filter((t > lo) & (t <= hi)), 1)
        w(events.filter(t > hi), 2)
        stream_counts = {
            r["step"]: r["n_users"] for r in current_funnel(spark, state).collect()
        }
        batch_counts = {
            r["step"]: r["n_users"] for r in q_funnel_window(spark, sf_dir).collect()
        }
        assert stream_counts == batch_counts
