"""Behavioral tests for the round-4 twelfth-batch relational operators
(exact numeric histogram, A/B conversion z-test)."""

from __future__ import annotations

import datetime
import math

import pytest

from kafka_clickhouse_pipeline_spark.operators import advanced

T0 = datetime.datetime(2024, 1, 10)


def _events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


class TestHistogram:
    def test_bin_edges_and_clipping(self, spark, tmp_path):
        rows = [
            (1, T0, 1, "c", 0.0, "{}"),      # bin 0 (lower edge)
            (2, T0, 1, "c", 24.99, "{}"),    # bin 0 (upper interior)
            (3, T0, 1, "c", 25.00, "{}"),    # bin 1 (boundary belongs right)
            (4, T0, 1, "c", 499.99, "{}"),   # bin 19
            (5, T0, 1, "c", 750.0, "{}"),    # clipped into bin 19
            (6, T0, 1, "c", None, "{}"),     # null ignored
        ]
        d = _events(spark, tmp_path, rows)
        out = {r["bin"]: r for r in advanced.q_histogram_value(spark, d).collect()}
        assert len(out) == advanced.HIST_BINS  # spine emits empty bins
        assert out[0]["n"] == 2
        assert out[0]["min_value"] == "0.00"
        assert out[0]["max_value"] == "24.99"
        assert out[1]["n"] == 1 and out[1]["min_value"] == "25.00"
        assert out[19]["n"] == 2  # 499.99 + the clipped 750.0
        assert out[19]["sum_value"] == "1249.99"
        assert out[5]["n"] == 0 and out[5]["min_value"] is None
        assert sum(r["n"] for r in out.values()) == 5  # null excluded


class TestAbTest:
    def test_crafted_rates_and_z(self, spark, tmp_path):
        """Cohort A (even users 2,4,6,8): 3/4 convert. Cohort B (odd
        users 1,3,5,7): 1/4 convert. Pinned z from the pooled
        two-proportion formula."""
        rows = []
        eid = 0
        for u in (2, 4, 6, 8, 1, 3, 5, 7):
            rows.append((eid, T0, u, "click", 1.0, "{}")); eid += 1
        for u in (2, 4, 6, 1):
            rows.append((eid, T0, u, "purchase", 1.0, "{}")); eid += 1
        d = _events(spark, tmp_path, rows)
        r = advanced.q_ab_test_conversion(spark, d).collect()[0]
        assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (4, 3, 4, 1)
        assert r["rate_a"] == 0.75 and r["rate_b"] == 0.25
        assert r["lift_abs"] == 0.5
        pool = 0.5
        z = 0.5 / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
        assert r["z_stat"] == pytest.approx(round(z, 6), abs=1e-9)

    def test_equal_rates_zero_z(self, spark, tmp_path):
        rows = [
            (1, T0, 2, "purchase", 1.0, "{}"),
            (2, T0, 4, "click", 1.0, "{}"),
            (3, T0, 1, "purchase", 1.0, "{}"),
            (4, T0, 3, "click", 1.0, "{}"),
        ]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_ab_test_conversion(spark, d).collect()[0]
        assert r["lift_abs"] == 0.0
        assert r["z_stat"] == 0.0

    def test_degenerate_pool_null_z(self, spark, tmp_path):
        """Everyone converts (true of the synthetic corpus): pooled
        variance is 0, so z is NULL via try_divide -- the same answer
        in ANSI (driver) and non-ANSI sessions; a raw 0/0 double
        division would RAISE DIVIDE_BY_ZERO under the driver's plain
        ANSI session (regression for the r4 driver-sim catch)."""
        rows = [
            (1, T0, 2, "purchase", 1.0, "{}"),
            (2, T0, 1, "purchase", 1.0, "{}"),
        ]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_ab_test_conversion(spark, d).collect()[0]
        assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0
        assert r["lift_abs"] == 0.0
        assert r["z_stat"] is None
