"""Behavioral tests for the round-5 operators (windowed funnel,
Adamic-Adar link prediction). Oracle parity is covered by the strict
sweep; these pin the semantics the oracle alone can't prove (window
boundaries, ordering requirements, the inverse-log weighting)."""

from __future__ import annotations

import datetime
import math

import pytest

from kafka_clickhouse_pipeline_spark.operators import analytics, graph

T0 = datetime.datetime(2024, 1, 10, 0, 0, 0)


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


def _ev(eid, user, etype, minutes):
    return (eid, T0 + datetime.timedelta(minutes=minutes), user, etype, 1.0, "{}")


class TestFunnelWindow:
    def _levels(self, spark, d):
        return {
            r["step"]: r["n_users"]
            for r in analytics.q_funnel_window(spark, d).collect()
        }

    def test_full_chain_in_window(self, spark, tmp_path):
        """view -> click -> purchase within 24h: one user at depth 3."""
        d = _write_events(spark, tmp_path, [
            _ev(1, 7, "view", 0),
            _ev(2, 7, "click", 60),
            _ev(3, 7, "purchase", 120),
        ])
        assert self._levels(spark, d) == {1: 1, 2: 1, 3: 1}

    def test_order_matters(self, spark, tmp_path):
        """purchase BEFORE the click never completes step 3, and a
        click before any view never completes step 2."""
        d = _write_events(spark, tmp_path, [
            _ev(1, 7, "purchase", 0),
            _ev(2, 7, "view", 60),
            _ev(3, 7, "click", 120),
            _ev(4, 8, "click", 0),
            _ev(5, 8, "view", 60),
        ])
        assert self._levels(spark, d) == {1: 2, 2: 1, 3: 0}

    def test_window_anchored_at_view(self, spark, tmp_path):
        """The 24h window is anchored at the chain's VIEW: click at
        +23h then purchase at +25h exceeds the view's window even
        though purchase-click is only 2h apart."""
        d = _write_events(spark, tmp_path, [
            _ev(1, 7, "view", 0),
            _ev(2, 7, "click", 23 * 60),
            _ev(3, 7, "purchase", 25 * 60),
        ])
        assert self._levels(spark, d) == {1: 1, 2: 1, 3: 0}

    def test_later_view_reanchors(self, spark, tmp_path):
        """A second view re-anchors the chain: view@0, view@+2h,
        click@+23h, purchase@+25h completes via the second view
        (purchase is 23h after it)."""
        d = _write_events(spark, tmp_path, [
            _ev(1, 7, "view", 0),
            _ev(2, 7, "view", 2 * 60),
            _ev(3, 7, "click", 23 * 60),
            _ev(4, 7, "purchase", 25 * 60),
        ])
        assert self._levels(spark, d) == {1: 1, 2: 1, 3: 1}

    def test_strict_increase_pinned(self, spark, tmp_path):
        """Simultaneous view+click (equal microsecond timestamps) do
        NOT chain -- the strict-increase mode is the pinned
        semantics."""
        d = _write_events(spark, tmp_path, [
            _ev(1, 7, "view", 0),
            _ev(2, 7, "click", 0),
        ])
        assert self._levels(spark, d) == {1: 1, 2: 0, 3: 0}

    def test_monotone_counts_on_fixture(self, spark, sf_dir):
        lv = self._levels(spark, sf_dir)
        assert lv[1] >= lv[2] >= lv[3] >= 0
        assert lv[1] > 0


class TestAdamicAdar:
    @staticmethod
    def _graph(spark, d, li_rows):
        spark.createDataFrame(
            li_rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        return str(d)

    def test_inverse_log_weighting(self, spark, tmp_path):
        """Two candidate pairs with one common neighbor each: the pair
        whose common neighbor is RARE (degree 2) must outscore the
        pair whose common neighbor is a hub (degree 4), and each score
        must equal round(1/ln(deg), 9) exactly."""
        rows = []
        # rare center 100: wedges via orders {100,1},{100,2}
        rows += [(10, 100), (10, 1), (11, 100), (11, 2)]
        # hub center 200: degree 4 via four pairwise orders
        for i, leaf in enumerate((3, 4, 5, 6)):
            rows += [(20 + i, 200), (20 + i, leaf)]
        d = self._graph(spark, tmp_path, rows)
        out = {
            (r["u"], r["v"]): (r["n_common"], r["aa_score"])
            for r in graph.q_adamic_adar(spark, d).collect()
        }
        def nano_str(x):
            n = math.floor(x * 1e9 + 0.5)
            return f"{n // 10**9}.{n % 10**9:09d}"

        rare = nano_str(1 / math.log(2))
        hub = nano_str(1 / math.log(4))
        assert out[(1, 2)] == (1, rare)
        for pair in ((3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6)):
            assert out[pair] == (1, hub)
        assert float(rare) > float(hub)

    def test_linked_pairs_excluded_and_scores_sum(self, spark, tmp_path):
        """Triangle + pendant: linked pairs never appear; a pair with
        two common neighbors sums both weights."""
        # path graph via orders: edges 1-2, 2-3, 1-4, 3-4 (4-cycle):
        # pair (1,3) shares neighbors {2,4}; (2,4) shares {1,3}
        rows = [(10, 1), (10, 2), (11, 2), (11, 3), (12, 1), (12, 4), (13, 3), (13, 4)]
        d = self._graph(spark, tmp_path, rows)
        out = {
            (r["u"], r["v"]): (r["n_common"], r["aa_score"])
            for r in graph.q_adamic_adar(spark, d).collect()
        }
        w = math.floor(1 / math.log(2) * 1e9 + 0.5)  # every node has degree 2
        n = w + w
        two = f"{n // 10**9}.{n % 10**9:09d}"
        assert out == {(1, 3): (2, two), (2, 4): (2, two)}

    def test_empty_graph(self, spark, tmp_path):
        d = self._graph(spark, tmp_path, [])
        assert graph.q_adamic_adar(spark, d).collect() == []


class TestBetweennessSampled:
    @staticmethod
    def _graph(spark, d, li_rows):
        spark.createDataFrame(
            li_rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        return str(d)

    def test_path_graph_middle_node(self, spark, tmp_path):
        """Path 1-2-3 (all nodes are sources at this size): the middle
        node carries one dependency unit from each endpoint (Brandes:
        delta = sigma_B/sigma_C * (1 + 0) = 1), endpoints carry none
        -> single row (2, bc 2.0)."""
        d = self._graph(spark, tmp_path, [(10, 1), (10, 2), (20, 2), (20, 3)])
        rows = graph.q_betweenness_sampled(spark, d).collect()
        assert [(r["node"], r["betweenness"], r["bc_nanos"]) for r in rows] == [
            (2, "2.000000000", 2_000_000_000)
        ]

    def test_diamond_symmetry(self, spark, tmp_path):
        """4-cycle 1-2-4-3-1: two shortest paths between opposite
        corners split the dependency (sigma ratio 1/2 per side), and
        by symmetry every node accumulates exactly 1.0."""
        d = self._graph(
            spark, tmp_path,
            [(10, 1), (10, 2), (20, 1), (20, 3), (30, 2), (30, 4), (40, 3), (40, 4)],
        )
        rows = graph.q_betweenness_sampled(spark, d).collect()
        got = {r["node"]: r["betweenness"] for r in rows}
        assert got == {n: "1.000000000" for n in (1, 2, 3, 4)}

    def test_source_budget_is_a_count(self, spark, tmp_path):
        """sources=1: only the md5-smallest node seeds the sweep; its
        own row never appears (Brandes excludes endpoints)."""
        import hashlib

        d = self._graph(spark, tmp_path, [(10, 1), (10, 2), (20, 2), (20, 3)])
        only = min((hashlib.md5(str(n).encode()).hexdigest(), n) for n in (1, 2, 3))[1]
        rows = graph.q_betweenness_sampled(spark, d, sources=1).collect()
        assert all(r["node"] != only for r in rows)
        # a single path source scores exactly the interior of its path
        if only in (1, 3):
            assert [(r["node"], r["betweenness"]) for r in rows] == [
                (2, "1.000000000")
            ]

    def test_empty_graph(self, spark, tmp_path):
        d = self._graph(spark, tmp_path, [])
        assert graph.q_betweenness_sampled(spark, d).collect() == []
