"""Behavioral tests for the round-4 eleventh-batch operators (BM25
retrieval, LPA modularity audit, inter-event time distribution)."""

from __future__ import annotations

import datetime
import math

import pytest

from kafka_clickhouse_pipeline_spark.operators import analytics, graph, search


def _docs(spark, d, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


class TestBm25:
    def test_ranking_and_idf_boost(self, spark, tmp_path):
        """Query 'hash join': a doc with both terms outranks
        single-term docs, and among single-term docs the RARER term
        scores higher (idf): 'join' appears in fewer docs than
        'hash'."""
        texts = [
            "hash join table",          # 0: both terms
            "hash scan scan",           # 1: hash only (common)
            "join scan scan",           # 2: join only (rarer? equal df...)
            "hash scan row",            # 3: hash only -> df(hash)=3 > df(join)=2
            "filter scan row",          # 4: neither
        ]
        d = _docs(spark, tmp_path, texts)
        rows = [
            r
            for r in search.q_bm25_search(spark, d).collect()
            if r["query_id"] == "hash_join"
        ]
        ranked = [r["doc_id"] for r in rows]
        assert ranked[0] == 0  # both-terms doc wins
        assert rows[0]["n_terms_hit"] == 2
        # idf: join (df 2) > hash (df 3) -> doc 2 outranks docs 1 and 3
        assert ranked.index(2) < ranked.index(1)
        assert ranked.index(2) < ranked.index(3)
        assert 4 not in ranked  # no query term -> not retrieved
        # scores strictly ordered by rank (ties broken by doc_id)
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_topk_bound(self, spark, tmp_path):
        d = _docs(spark, tmp_path, ["hash join"] * 25)
        rows = [
            r
            for r in search.q_bm25_search(spark, d).collect()
            if r["query_id"] == "hash_join"
        ]
        assert len(rows) == search.BM25_TOPK
        assert [r["rank"] for r in rows] == list(range(1, search.BM25_TOPK + 1))
        # identical docs -> identical scores; ranks break ties by doc_id
        assert [r["doc_id"] for r in rows] == list(range(search.BM25_TOPK))


class TestModularity:
    def _graph(self, spark, d, li):
        spark.createDataFrame(
            li, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        return str(d)

    def test_two_cliques_high_modularity(self, spark, tmp_path):
        """Two disjoint triangles: LPA finds them, and Q = 2 *
        (3/6 - (6/12)^2) = 0.5 -- the analytic two-equal-communities
        maximum for this shape."""
        li = [(10, 1), (10, 2), (10, 3), (20, 7), (20, 8), (20, 9)]
        d = self._graph(spark, tmp_path, li)
        rows = graph.q_modularity_lpa(spark, d).collect()
        assert len(rows) == 2
        q = sum(r["q_contrib"] for r in rows)
        assert q == pytest.approx(0.5, abs=1e-9)
        for r in rows:
            assert r["n_nodes"] == 3
            assert r["intra_edges"] == 3
            assert r["degree_sum"] == "6"

    def test_single_community_zero(self, spark, tmp_path):
        """One clique -> one community holding every edge: e_c/m = 1,
        (d_c/2m)^2 = 1 -> Q = 0 exactly (a trivial partition explains
        nothing)."""
        d = self._graph(spark, tmp_path, [(10, 1), (10, 2), (10, 3)])
        rows = graph.q_modularity_lpa(spark, d).collect()
        assert len(rows) == 1
        assert rows[0]["q_contrib"] == 0.0


class TestInterEventTimes:
    def test_exact_gaps(self, spark, tmp_path):
        """User 1 clicks at t=0,10,30 -> gaps 10,20; user 2 clicks at
        t=0,100 -> gap 100. p50 = 20 (2nd of 3), p95 = 100, mean =
        130/3."""
        t0 = datetime.datetime(2024, 1, 10)
        rows = []
        for i, s in enumerate([0, 10, 30]):
            rows.append((i, t0 + datetime.timedelta(seconds=s), 1, "click", 1.0, "{}"))
        for i, s in enumerate([0, 100]):
            rows.append((10 + i, t0 + datetime.timedelta(seconds=s), 2, "click", 1.0, "{}"))
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        r = analytics.q_interevent_times(spark, str(tmp_path)).collect()
        assert len(r) == 1
        row = r[0]
        assert row["n_gaps"] == 3
        assert row["mean_gap_s"] == pytest.approx(130 / 3, abs=1e-6)
        assert row["p50_gap_s"] == 20
        assert row["p95_gap_s"] == 100

    def test_gaps_do_not_cross_users_or_types(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 10)
        rows = [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, t0 + datetime.timedelta(seconds=5), 2, "click", 1.0, "{}"),
            (3, t0 + datetime.timedelta(seconds=9), 1, "purchase", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        assert analytics.q_interevent_times(spark, str(tmp_path)).collect() == []
