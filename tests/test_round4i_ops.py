"""Behavioral tests for the round-4 thirteenth-batch operators
(RRF hybrid retrieval, ingestion-freshness audit, weekly seasonality
profile)."""

from __future__ import annotations

import datetime

import pytest

from kafka_clickhouse_pipeline_spark.operators import advanced, constraints, search


def _docs(spark, d, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


class TestRrfFusion:
    def test_both_lists_beat_single_list(self, spark, tmp_path):
        """A doc ranked well by BOTH rankers fuses above a doc that
        only one ranker retrieves at the same rank: rrf gets two
        1/(60+r) contributions instead of one."""
        texts = [
            "hash join table",   # 0: both terms -> top of both rankers
            "hash scan scan",    # 1: hash only
            "join scan scan",    # 2: join only
            "filter scan row",   # 3: neither -> retrieved by no ranker
        ]
        d = _docs(spark, tmp_path, texts)
        rows = [
            r
            for r in search.q_rrf_hybrid_search(spark, d).collect()
            if r["query_id"] == "hash_join"
        ]
        assert rows[0]["doc_id"] == 0
        assert rows[0]["bm25_rank"] == 1 and rows[0]["vsm_rank"] == 1
        assert rows[0]["rrf_score"] == pytest.approx(2 / 61, abs=1e-9)
        assert 3 not in [r["doc_id"] for r in rows]
        # every fused score is the sum of its rank reciprocals
        for r in rows:
            want = 0.0
            if r["bm25_rank"] is not None:
                want += 1.0 / (search.RRF_K + r["bm25_rank"])
            if r["vsm_rank"] is not None:
                want += 1.0 / (search.RRF_K + r["vsm_rank"])
            assert r["rrf_score"] == pytest.approx(round(want, 9), abs=1e-9)

    def test_rankers_disagree_fusion_arbitrates(self, spark, tmp_path):
        """Construct a corpus where BM25 and the vsm ranker order two
        docs differently (BM25's per-term saturation vs the vsm norm
        over ALL terms), and check the fused list is consistent with
        the reciprocal-rank arithmetic rather than either input
        order."""
        texts = [
            # doc 0: one 'hash' in a long doc of off-query terms: BM25
            # dilutes via length norm; vsm norm grows with every
            # distinct high-idf term
            "hash alpha beta gamma delta epsilon zeta eta theta",
            # doc 1: 'hash hash join' -- short, both terms
            "hash hash join",
            # doc 2: 'join join join' -- saturated single term
            "join join join",
            "scan scan scan",  # 3: neither term
        ]
        d = _docs(spark, tmp_path, texts)
        out = [
            r
            for r in search.q_rrf_hybrid_search(spark, d).collect()
            if r["query_id"] == "hash_join"
        ]
        assert out[0]["doc_id"] == 1  # both-terms doc tops the fusion
        got = {r["doc_id"]: r for r in out}
        # fused ordering matches rrf_score desc with doc_id tiebreak
        scores = [(r["rrf_score"], -r["doc_id"]) for r in out]
        assert scores == sorted(scores, reverse=True)
        assert set(got) == {0, 1, 2}


class TestFreshnessAudit:
    T0 = datetime.datetime(2024, 3, 10, 12, 0, 0)

    def test_stale_type_flagged(self, spark, tmp_path):
        h = datetime.timedelta(hours=1)
        d_ = datetime.timedelta(days=1)
        rows = [
            # 'click': newest event IS the watermark
            (1, self.T0, 1, "click", 1.0, "{}"),
            (2, self.T0 - 2 * h, 1, "click", 1.0, "{}"),
            (3, self.T0 - 8 * d_, 1, "click", 1.0, "{}"),
            # 'purchase': newest is 3 days behind the watermark -> stale
            (4, self.T0 - 3 * d_, 2, "purchase", 1.0, "{}"),
            (5, self.T0 - 4 * d_, 2, "purchase", 1.0, "{}"),
        ]
        d = _events(spark, tmp_path, rows)
        out = {r["event_type"]: r for r in constraints.q_freshness_audit(spark, d).collect()}
        click = out["click"]
        assert click["status"] == "fresh" and click["lag_seconds"] == 0
        assert click["last_ts"] == "2024-03-10 12:00:00"
        assert click["n_last_24h"] == 2  # the 8-day-old event is outside
        assert click["n_last_7d"] == 2
        pur = out["purchase"]
        assert pur["status"] == "stale"
        assert pur["lag_seconds"] == 3 * 86400
        assert pur["n_last_24h"] == 0
        assert pur["n_last_7d"] == 2  # 3d and 4d old, both inside 7d

    def test_boundary_exclusive(self, spark, tmp_path):
        """The rolling windows are (watermark - w, watermark]: an event
        EXACTLY 24 h old is outside the 24 h window."""
        rows = [
            (1, self.T0, 1, "click", 1.0, "{}"),
            (2, self.T0 - datetime.timedelta(hours=24), 1, "click", 1.0, "{}"),
        ]
        d = _events(spark, tmp_path, rows)
        r = constraints.q_freshness_audit(spark, d).collect()[0]
        assert r["n_last_24h"] == 1
        assert r["n_last_7d"] == 2


class TestSeasonalityProfile:
    def test_dow_hour_cells_and_shares(self, spark, tmp_path):
        """2024-03-10 was a Sunday (dow 0) and 2024-03-13 a Wednesday
        (dow 3): pins the integer epoch dow convention; shares are
        exact fractions of the value total; the spine emits all 168
        cells."""
        sun = datetime.datetime(2024, 3, 10, 9, 30)
        wed = datetime.datetime(2024, 3, 13, 23, 5)
        rows = [
            (1, sun, 1, "c", 10.0, "{}"),
            (2, sun, 1, "c", 20.0, "{}"),
            (3, wed, 1, "c", 10.0, "{}"),
            (4, wed, 1, "c", None, "{}"),  # null value excluded
        ]
        d = _events(spark, tmp_path, rows)
        out = {(r["dow"], r["hr"]): r for r in advanced.q_seasonality_profile(spark, d).collect()}
        assert len(out) == 168
        sun_cell = out[(0, 9)]
        assert sun_cell["n"] == 2
        assert sun_cell["sum_value"] == "30.00"
        assert sun_cell["mean_value"] == 15.0
        assert sun_cell["share_of_total"] == 0.75
        wed_cell = out[(3, 23)]
        assert wed_cell["n"] == 1
        assert wed_cell["share_of_total"] == 0.25
        empty = out[(1, 0)]
        assert empty["n"] == 0 and empty["sum_value"] is None
        assert empty["mean_value"] is None
