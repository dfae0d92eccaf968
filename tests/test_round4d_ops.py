"""Behavioral tests for the round-4 eighth-batch operators (exact
heavy hitters via Misra-Gries candidates, MAD outliers, EWMA
smoothing). Oracle parity is covered by the strict sweep; these pin
the semantics the oracle alone can't prove — especially that the
bounded-memory candidate stage never loses a true heavy hitter."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators import advanced, curation, text


def _write_docs(spark, d, texts):
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


class TestHeavyHitters:
    def test_adversarial_skew_superset_survives(self, spark, tmp_path):
        """A heavy hitter diluted across many partitions plus a sea of
        near-capacity distinct noise: the Misra-Gries trim fires (far
        more distinct terms than MG_CAPACITY per partition), yet the
        exact rescore still reports the true heavy hitters with exact
        counts."""
        # 'hot' has share 2000/(2000+2000) >> 1/HH_K; each noise word
        # appears once -> 2000 distinct terms, which exceeds
        # MG_CAPACITY in EVERY partition (<= 4 partitions of 500+
        # distinct terms each), so the trim provably fires
        assert 2000 / 4 > text.MG_CAPACITY
        texts = [" ".join(["hot"] * 20 + [f"noise{i}_{j}" for j in range(20)])
                 for i in range(100)]
        d = _write_docs(spark, tmp_path, texts)
        got = {r["term"]: r["cnt"] for r in text.q_heavy_hitters(spark, d).collect()}
        assert got["hot"] == 2000
        total = 2000 + 2000
        # exactness: every reported term truly exceeds the threshold
        assert all(c * text.HH_K > total for c in got.values())
        # and no noise term (count 1) leaks through
        assert all(not t.startswith("noise") for t in got)

    def test_share_and_order(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, ["a a a b b c"] * 5)
        rows = text.q_heavy_hitters(spark, d).collect()
        assert [r["term"] for r in rows] == ["a", "b", "c"]
        assert rows[0]["cnt"] == 15 and rows[0]["share"] == 0.5


class TestMadOutliers:
    """Crafted-value pins for the existing curation.q_mad_outliers
    (the robust-stats class was already covered; these add the
    adversarial fixture the random corpus can't: a single wild point
    that must not widen its own acceptance band)."""

    def test_crafted_outlier_detection(self, spark, tmp_path):
        """9 values tightly around 10 plus one wild value: median 10,
        MAD 1, exactly the wild point beyond 3*MAD."""
        t0 = datetime.datetime(2024, 1, 1)
        vals = [8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0]
        rows = [(i, t0, 1, "click", v, "{}") for i, v in enumerate(vals)]
        d = _write_events(spark, tmp_path, rows)
        out = curation.q_mad_outliers(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r["event_type"] == "click" and r["n_events"] == 10
        assert r["med"] == 10.0 and r["mad"] == 1.0
        assert r["n_outliers"] == 1

    def test_no_outliers_yields_zero_not_null(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(i, t0, 1, "view", 5.0, "{}") for i in range(4)]
        d = _write_events(spark, tmp_path, rows)
        r = curation.q_mad_outliers(spark, d).collect()[0]
        assert r["mad"] == 0.0 and r["n_outliers"] == 0


class TestEwmaHourly:
    def test_exact_recursion(self, spark, tmp_path):
        """Three hours with counts 10, 20, 30: e = 10, then
        0.3*20+0.7*10 = 13, then 0.3*30+0.7*13 = 18.1."""
        t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        eid = 0
        for h, n in [(0, 10), (1, 20), (2, 30)]:
            for _ in range(n):
                rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=1),
                             1, "click", 1.0, "{}"))
                eid += 1
        d = _write_events(spark, tmp_path, rows)
        got = [(r["hour"], r["ewma"]) for r in advanced.q_ewma_hourly(spark, d).collect()]
        assert got == [
            ("2024-01-01 00:00:00", 10.0),
            ("2024-01-01 01:00:00", 13.0),
            ("2024-01-01 02:00:00", round(0.3 * 30 + 0.7 * 13.0, 6)),
        ]
        assert math.isclose(got[2][1], 18.1, rel_tol=1e-9)

    def test_series_independent_per_type(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = [(0, t0, 1, "a", 1.0, "{}"), (1, t0, 1, "b", 1.0, "{}"),
                (2, t0 + datetime.timedelta(hours=1), 1, "b", 1.0, "{}")]
        d = _write_events(spark, tmp_path, rows)
        got = {(r["event_type"], r["hour"]): r["ewma"]
               for r in advanced.q_ewma_hourly(spark, d).collect()}
        assert got[("a", "2024-01-01 00:00:00")] == 1.0
        assert got[("b", "2024-01-01 01:00:00")] == 1.0  # 0.3*1+0.7*1
