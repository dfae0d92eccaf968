"""Behavioral tests for the round-4 ninth-batch operators (classifier
AUC/calibration, basket lift, exact KS drift, hourly autocorrelation,
Gini concentration, node-Jaccard link prediction, key-skew audit).
Oracle parity is covered by the strict sweep; these pin the semantics
the oracle alone can't prove (separable fixtures hit the analytic
extreme values: AUC 1/0/0.5, KS 0/1, Gini 0, lift > 1, ...)."""

from __future__ import annotations

import datetime

import pytest

from kafka_clickhouse_pipeline_spark.operators import (
    advanced,
    association,
    constraints,
    evaluation,
    graph,
)

T0 = datetime.datetime(2024, 1, 10, 0, 0, 0)
AFTER = datetime.datetime(2024, 1, 20, 0, 0, 0)  # past PSI_BOUNDARY


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _write_graph(spark, d, li_rows, part_rows=None):
    spark.createDataFrame(
        li_rows, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{d}/lineitem.parquet")
    if part_rows is not None:
        spark.createDataFrame(
            part_rows, "p_partkey bigint, p_brand string"
        ).write.parquet(f"{d}/part.parquet")
    return str(d)


class TestClassifierAuc:
    def test_all_ties_gives_half(self, spark, tmp_path):
        """Identical text -> one score value; half positive labels.
        Tie-aware AUC must be exactly 0.5 (rank-sum with average
        ranks), not 0 or 1."""
        rows = [(i, "same text here", "en" if i < 5 else "ru", "s", 1)
                for i in range(10)]
        d = _write_docs(spark, tmp_path, rows)
        r = evaluation.q_classifier_auc(spark, d).collect()[0]
        assert (r["n"], r["n_pos"], r["n_neg"], r["n_scores"]) == (10, 5, 5, 1)
        assert r["auc"] == pytest.approx(0.5, abs=1e-9)

    def test_separable_scores_give_one_and_zero(self, spark, tmp_path):
        """Assign 'en' to the top-scored half -> AUC 1; to the
        bottom-scored half -> AUC 0."""
        texts = [f"tok{i} tok{i} other{i}" for i in range(8)]
        base = _write_docs(
            spark, tmp_path / "probe",
            [(i, t, "xx", "s", 1) for i, t in enumerate(texts)],
        )
        scored = {
            r["doc_id"]: r["s6"]
            for r in evaluation._scored(spark, base).collect()
        }
        assert len(set(scored.values())) == 8, "fixture needs distinct scores"
        ranked = sorted(scored, key=lambda i: scored[i])
        top = set(ranked[4:])
        d1 = _write_docs(
            spark, tmp_path / "sep",
            [(i, texts[i], "en" if i in top else "ru", "s", 1)
             for i in range(8)],
        )
        assert evaluation.q_classifier_auc(spark, d1).collect()[0]["auc"] == 1.0
        d0 = _write_docs(
            spark, tmp_path / "rev",
            [(i, texts[i], "ru" if i in top else "en", "s", 1)
             for i in range(8)],
        )
        assert evaluation.q_classifier_auc(spark, d0).collect()[0]["auc"] == 0.0


class TestCalibrationBins:
    def test_bin_totals_and_empty_bins(self, spark, tmp_path):
        rows = [(i, "w w w", "en" if i % 2 == 0 else "ru", "s", 1)
                for i in range(6)]
        d = _write_docs(spark, tmp_path, rows)
        out = evaluation.q_calibration_bins(spark, d).collect()
        assert len(out) == evaluation.CALIB_BINS  # spine emits empty bins
        assert sum(r["n_docs"] for r in out) == 6
        assert sum(r["n_pos"] for r in out) == 3
        # identical text -> one score -> exactly one non-empty bin,
        # whose mean matches the score and pos_rate the label mix
        busy = [r for r in out if r["n_docs"] > 0]
        assert len(busy) == 1
        assert busy[0]["pos_rate"] == pytest.approx(0.5)
        assert busy[0]["bin_lo"] <= busy[0]["mean_score"] <= busy[0]["bin_hi"]
        empty = [r for r in out if r["n_docs"] == 0]
        assert all(r["mean_score"] is None and r["pos_rate"] is None
                   for r in empty)


class TestBasketLift:
    def test_planted_affinity(self, spark, tmp_path):
        """Baskets {B1,B2} x2, {B3}, {B1,B2,B3}: lift(B1,B2) =
        3*4/(3*3) > 1, lift(B1,B3) = 1*4/(3*2) < 1."""
        li = [(1, 11), (1, 12), (2, 11), (2, 12), (3, 13),
              (4, 11), (4, 12), (4, 13),
              (1, 11)]  # duplicate item in basket 1: must not double-count
        parts = [(11, "B1"), (12, "B2"), (13, "B3")]
        d = _write_graph(spark, tmp_path, li, parts)
        rows = {(r["brand_a"], r["brand_b"]): r
                for r in association.q_basket_lift(spark, d).collect()}
        r12 = rows[("B1", "B2")]
        assert (r12["n_a"], r12["n_b"], r12["n_ab"], r12["n_baskets"]) == (3, 3, 3, 4)
        assert r12["lift"] == pytest.approx(4 / 3, abs=1e-6)
        assert r12["confidence_a_b"] == 1.0
        assert r12["support"] == 0.75
        r13 = rows[("B1", "B3")]
        assert r13["n_ab"] == 1
        assert r13["lift"] == pytest.approx(4 / 6, abs=1e-6)
        assert ("B2", "B1") not in rows  # canonical a < b only


class TestKsValueDrift:
    def test_identical_halves_zero(self, spark, tmp_path):
        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0] * 4):
            rows.append((i, T0, 1, "click", v, "{}"))
            rows.append((1000 + i, AFTER, 1, "click", v, "{}"))
        d = _write_events(spark, tmp_path, rows)
        r = advanced.q_ks_value_drift(spark, d).collect()[0]
        assert (r["n_first"], r["n_second"]) == (12, 12)
        assert r["ks_stat"] == 0.0

    def test_disjoint_halves_one(self, spark, tmp_path):
        rows = [(i, T0, 1, "click", 1.0, "{}") for i in range(5)]
        rows += [(100 + i, AFTER, 1, "click", 2.0, "{}") for i in range(7)]
        d = _write_events(spark, tmp_path, rows)
        r = advanced.q_ks_value_drift(spark, d).collect()[0]
        assert r["ks_stat"] == 1.0
        # sup is attained at the boundary value 1.00
        assert r["ks_at_value"] == "1.00"
        assert r["n_values"] == 2


class TestAutocorrHourly:
    def test_linear_series_perfect_correlation(self, spark, tmp_path):
        """k events in hour k -> the series and every lag of it are
        linear, so both lag-1 and lag-24 Pearson r are exactly 1."""
        rows = []
        eid = 0
        for h in range(30):
            for _ in range(h + 1):
                rows.append(
                    (eid, T0 + datetime.timedelta(hours=h), 1, "c", 1.0, "{}")
                )
                eid += 1
        d = _write_events(spark, tmp_path, rows)
        r = advanced.q_autocorr_hourly(spark, d).collect()[0]
        assert r["n_hours"] == 30
        assert (r["n_pairs_lag1"], r["n_pairs_lag24"]) == (29, 6)
        assert r["autocorr_lag1"] == pytest.approx(1.0, abs=1e-6)
        assert r["autocorr_lag24"] == pytest.approx(1.0, abs=1e-6)


class TestGini:
    def _orders(self, spark, d, rows):
        spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ).write.parquet(f"{d}/orders.parquet")
        return str(d)

    def test_equal_revenues_zero(self, spark, tmp_path):
        d = self._orders(
            spark, tmp_path, [(i, i, 100.0) for i in range(1, 5)]
        )
        r = advanced.q_gini_customer_revenue(spark, d).collect()[0]
        assert r["n_customers"] == 4
        assert r["total_revenue"] == "400.00"
        assert r["gini"] == 0.0

    def test_extreme_concentration(self, spark, tmp_path):
        """Two customers, one carrying ~everything: G -> 0.5 for n=2."""
        d = self._orders(
            spark, tmp_path, [(1, 1, 0.01), (2, 2, 99999.99)]
        )
        r = advanced.q_gini_customer_revenue(spark, d).collect()[0]
        assert r["gini"] == pytest.approx(0.5, abs=1e-6)

    def test_multi_order_customers_aggregate_first(self, spark, tmp_path):
        """Revenue is per CUSTOMER: two 50s equal one 100."""
        d = self._orders(
            spark, tmp_path,
            [(1, 1, 50.0), (2, 1, 50.0), (3, 2, 100.0)],
        )
        r = advanced.q_gini_customer_revenue(spark, d).collect()[0]
        assert r["n_customers"] == 2
        assert r["gini"] == 0.0


class TestNodeJaccard:
    def test_shared_neighbor_pair(self, spark, tmp_path):
        """Orders {1,2} and {1,3}: nodes 2 and 3 share neighbor 1,
        are not linked -> the single candidate has Jaccard 1."""
        d = _write_graph(spark, tmp_path, [(10, 1), (10, 2), (20, 1), (20, 3)])
        rows = graph.q_node_jaccard(spark, d).collect()
        assert [(r["u"], r["v"], r["n_common"], r["n_union"], r["jaccard"])
                for r in rows] == [(2, 3, 1, 1, 1.0)]

    def test_linked_pairs_excluded(self, spark, tmp_path):
        """A triangle has no non-adjacent pairs -> empty output."""
        d = _write_graph(spark, tmp_path, [(10, 1), (10, 2), (10, 3)])
        assert graph.q_node_jaccard(spark, d).collect() == []

    def test_max_degree_drops_hub_wedges(self, spark, tmp_path):
        """With the hub-center excluded, no wedge generates the pair."""
        d = _write_graph(spark, tmp_path, [(10, 1), (10, 2), (20, 1), (20, 3)])
        assert graph.q_node_jaccard(spark, d, max_degree=1).collect() == []

    def test_capped_excludes_hub_centers_on_skewed_graph(self, spark, tmp_path):
        """The p99-cap's payoff regime (VERDICT r4 #4, SCALE.md): a
        star hub co-ordered with many spokes dominates the wedge
        volume; the discrete-p99 cap lands below the hub degree and
        removes every hub-centered wedge, leaving only the wedges
        through low-degree centers. (On the degree-homogeneous fixture
        graph the same cap removes ~2.5% of wedges -- the knob prices
        skew, not size.)"""
        # hub node 1 linked to 200 spokes, one two-part order each
        # (pairwise orders, not one big order -- a shared order would
        # make a clique, not a star): hub degree 200, spokes degree 1
        rows = []
        for i in range(200):
            rows += [(1000 + i, 1), (1000 + i, 2000 + i)]
        # ten independent wedges {c,l1},{c,l2}: centers degree 2
        for k in range(10):
            c, l1, l2 = 500 + 3 * k, 501 + 3 * k, 502 + 3 * k
            rows += [(300 + 2 * k, c), (300 + 2 * k, l1),
                     (3000 + 2 * k, c), (3000 + 2 * k, l2)]
        d = _write_graph(spark, tmp_path, rows)
        exact = graph.q_node_jaccard(spark, d).collect()
        capped = graph.q_node_jaccard_capped(spark, d).collect()
        # 231 nodes: 220 x d=1, 10 x d=2, hub d=200 -> discrete p99 =
        # degree 2, so every hub-centered spoke pair (C(200,2) wedges,
        # >99% of the wedge volume) is pruned; the 10 wedge-component
        # leaf pairs all survive at jaccard 1.0
        assert len(exact) > len(capped)
        assert len(capped) == 10
        assert {(r["u"], r["v"]) for r in capped} == {
            (501 + 3 * k, 502 + 3 * k) for k in range(10)
        }
        assert all(r["jaccard"] == 1.0 for r in capped)

    def test_capped_equals_exact_when_no_hubs(self, spark, tmp_path):
        """Uniform degrees: the p99 cap equals the max degree and the
        capped mode reproduces the exact result bit-for-bit."""
        d = _write_graph(spark, tmp_path, [(10, 1), (10, 2), (20, 1), (20, 3)])
        assert (
            graph.q_node_jaccard_capped(spark, d).collect()
            == graph.q_node_jaccard(spark, d).collect()
        )


class TestKeySkewAudit:
    def test_exact_profile(self, spark, tmp_path):
        rows = [(1, T0, 7, "c", 1.0, "{}")] * 0
        rows = [(i, T0, 7 if i < 3 else 8, "c", 1.0, "{}") for i in range(4)]
        d = _write_events(spark, tmp_path, rows)
        spark.createDataFrame(
            [(1, 1, 1.0)], "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [(1, 1)], "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        out = {r["table_name"]: r
               for r in constraints.q_key_skew_audit(spark, d).collect()}
        ev = out["events"]
        assert (ev["n_rows"], ev["n_keys"], ev["max_cnt"]) == (4, 2, 3)
        assert ev["avg_cnt"] == 2.0
        assert ev["skew_ratio"] == 1.5
        assert ev["top1_share"] == 0.75
        # single-key tables: perfectly balanced by definition
        assert out["orders"]["skew_ratio"] == 1.0
