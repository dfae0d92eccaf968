"""Behavioral tests for the round-4 seventeenth-batch operators
(Count-Min sketch term counts, Holt linear-trend backtest, sampled
closeness centrality)."""

from __future__ import annotations

import datetime
import hashlib

import pytest

from kafka_clickhouse_pipeline_spark.operators import advanced, graph, text


T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _docs(spark, d, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _cms_bucket(r: int, term: str) -> int:
    return int(
        hashlib.md5(f"cms{r}|{term}".encode()).hexdigest()[:8], 16
    ) % text.CMS_W


class TestCmsTermCounts:
    def test_estimates_match_python_sketch(self, spark, tmp_path):
        """Recompute the full d x w sketch from hashlib over a 300-term
        corpus: every reported estimate must equal min over rows of the
        Python-computed cell, and overestimates are one-sided."""
        # term ti appears (i % 7) + 1 times; tops are alphabetical ties
        counts = {f"t{i:03d}": (i % 7) + 1 for i in range(300)}
        texts = [" ".join([t] * c) for t, c in counts.items()]
        d = _docs(spark, tmp_path, texts)
        out = text.q_cms_term_counts(spark, d).collect()
        assert len(out) == text.CMS_TOP

        cells: dict[tuple[int, int], int] = {}
        for t, c in counts.items():
            for r in range(text.CMS_D):
                k = (r, _cms_bucket(r, t))
                cells[k] = cells.get(k, 0) + c
        head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: text.CMS_TOP]
        want = {
            t: min(cells[(r, _cms_bucket(r, t))] for r in range(text.CMS_D))
            for t, _ in head
        }
        got_terms = [r["term"] for r in out]
        assert got_terms == [t for t, _ in head]
        for r in out:
            assert r["cms_estimate"] == want[r["term"]]
            assert r["exact_cnt"] == counts[r["term"]]
            assert r["overestimate"] == r["cms_estimate"] - r["exact_cnt"]
            assert r["overestimate"] >= 0  # CMS errors are one-sided

    def test_sparse_corpus_is_exact(self, spark, tmp_path):
        """Far fewer terms than buckets: no full-row collision set
        survives the min, so estimates equal exact counts."""
        d = _docs(spark, tmp_path, ["alpha alpha beta", "gamma beta beta"])
        out = {r["term"]: r for r in text.q_cms_term_counts(spark, d).collect()}
        assert {t: r["exact_cnt"] for t, r in out.items()} == {
            "alpha": 2,
            "beta": 3,
            "gamma": 1,
        }
        assert all(r["overestimate"] == 0 for r in out.values())


def _python_holt(ys):
    a, b_ = advanced.HOLT_ALPHA, advanced.HOLT_BETA
    l, b = float(ys[0]), 0.0
    preds = []
    for y in ys[1:]:
        preds.append(l + b)
        nl = a * y + (1 - a) * (l + b)
        nb = b_ * (nl - l) + (1 - b_) * b
        l, b = nl, nb
    return preds, l, b


class TestHoltBacktest:
    def test_recursion_matches_python_replay(self, spark, tmp_path):
        """A ramp series (y = 4 + 3i): the fold's predictions, MAE,
        bias and final (level, trend) must match a step-by-step Python
        replay of the same IEEE recursion."""
        ys = [4 + 3 * i for i in range(24)]
        rows = []
        eid = 0
        for i, y in enumerate(ys):
            for _ in range(y):
                rows.append(
                    (eid, T0 + datetime.timedelta(hours=i), 1, "view", 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        r = advanced.q_holt_backtest(spark, str(tmp_path)).collect()[0]
        preds, fl, fb = _python_holt(ys)
        errs = [y - p for y, p in zip(ys[1:], preds)]
        assert r["n_preds"] == len(ys) - 1
        assert r["mae"] == pytest.approx(
            sum(abs(e) for e in errs) / len(errs), abs=1e-5
        )
        assert r["bias"] == pytest.approx(sum(errs) / len(errs), abs=1e-5)
        assert r["final_level"] == pytest.approx(fl, abs=1e-5)
        assert r["final_trend"] == pytest.approx(fb, abs=1e-5)
        # a trending series: Holt's trend state locks onto the slope
        assert abs(r["final_trend"] - 3.0) < 0.5


class TestClosenessSampled:
    @staticmethod
    def _graph(spark, tmp_path):
        """Path 101-2-3-4-5 plus isolated edge 201-7."""
        pairs = [(101, 2), (2, 3), (3, 4), (4, 5), (201, 7)]
        rows = []
        for ok, (a, b) in enumerate(pairs):
            rows.append((ok, a))
            rows.append((ok, b))
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{tmp_path}/lineitem.parquet")
        return str(tmp_path)

    def test_path_graph_distances(self, spark, tmp_path):
        """With 7 nodes and the default 256-landmark budget every node
        is a landmark; each row is an exact 3-hop-capped BFS ball.
        From 101 the ball reaches {2,3,4} (5 is 4 hops -- truncated);
        the edge component's nodes each reach exactly one node."""
        d = self._graph(spark, tmp_path)
        out = {
            r["node"]: (r["n_reached"], r["sum_hops"], r["closeness"])
            for r in graph.q_closeness_sampled(spark, d).collect()
        }
        assert out == {
            101: (3, 6, pytest.approx(0.5)),
            2: (4, 7, pytest.approx(4 / 7, abs=1e-6)),
            3: (4, 6, pytest.approx(2 / 3, abs=1e-6)),
            4: (4, 7, pytest.approx(4 / 7, abs=1e-6)),
            5: (3, 6, pytest.approx(0.5)),
            201: (1, 1, pytest.approx(1.0)),
            7: (1, 1, pytest.approx(1.0)),
        }

    def test_landmark_budget_is_a_count(self, spark, tmp_path):
        """VERDICT r4 #3: the knob is a fixed COUNT (md5-smallest
        nodes), not a fraction -- landmarks=2 yields exactly two BFS
        sources regardless of graph size, and their rows match the
        full run's rows for the same seeds."""
        import hashlib

        d = self._graph(spark, tmp_path)
        full = {
            r["node"]: (r["n_reached"], r["sum_hops"])
            for r in graph.q_closeness_sampled(spark, d).collect()
        }
        two = graph.q_closeness_sampled(spark, d, landmarks=2).collect()
        assert len(two) == 2
        expect = sorted(
            full, key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n)
        )[:2]
        assert sorted(r["node"] for r in two) == sorted(expect)
        for r in two:
            assert (r["n_reached"], r["sum_hops"]) == full[r["node"]]
