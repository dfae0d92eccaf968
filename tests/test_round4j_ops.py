"""Behavioral tests for the round-4 fourteenth-batch operators
(Welch t-test, Mann-Whitney U, Matryoshka truncation recall,
Efraimidis-Spirakis weighted sampling)."""

from __future__ import annotations

import datetime
import math

import pytest

from kafka_clickhouse_pipeline_spark.operators import advanced, reshape, similarity


T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


def _ev(i, etype, value):
    return (i, T0, i, etype, value, "{}")


class TestWelchTtest:
    def test_known_fixture(self, spark, tmp_path):
        """Hand-computed Welch on a tiny fixture: A = {1, 2, 3},
        B = {2, 4, 6, 8}."""
        rows = [_ev(i, "purchase", v) for i, v in enumerate([1.0, 2.0, 3.0])]
        rows += [
            _ev(10 + i, "click", v) for i, v in enumerate([2.0, 4.0, 6.0, 8.0])
        ]
        rows.append(_ev(99, "view", 100.0))  # other types excluded
        d = _events(spark, tmp_path, rows)
        r = advanced.q_welch_ttest_value(spark, d).collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 4)
        assert r["mean_a"] == pytest.approx(2.0)
        assert r["mean_b"] == pytest.approx(5.0)
        assert r["var_a"] == pytest.approx(1.0)
        assert r["var_b"] == pytest.approx(20.0 / 3.0, abs=1e-5)
        se2 = 1.0 / 3 + (20.0 / 3) / 4
        assert r["t_stat"] == pytest.approx(-3.0 / math.sqrt(se2), abs=1e-5)
        df = se2 * se2 / ((1.0 / 3) ** 2 / 2 + ((20.0 / 3) / 4) ** 2 / 3)
        assert r["df_welch"] == pytest.approx(df, abs=1e-4)

    def test_identical_groups_t_zero(self, spark, tmp_path):
        rows = [_ev(i, "purchase", float(v)) for i, v in enumerate([1, 2, 3])]
        rows += [_ev(10 + i, "click", float(v)) for i, v in enumerate([1, 2, 3])]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_welch_ttest_value(spark, d).collect()[0]
        assert r["t_stat"] == 0.0

    def test_degenerate_single_row_group_null_not_error(self, spark, tmp_path):
        """n=1 gives a 0/0 variance: must be NULL (try_divide), not an
        ANSI DIVIDE_BY_ZERO error."""
        rows = [_ev(0, "purchase", 5.0)]
        rows += [_ev(10 + i, "click", float(v)) for i, v in enumerate([1, 2, 3])]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_welch_ttest_value(spark, d).collect()[0]
        assert r["var_a"] is None and r["t_stat"] is None


class TestMannWhitney:
    def test_known_fixture_with_ties(self, spark, tmp_path):
        """A = {1, 2, 2}, B = {2, 3}: tied value 2 spans both groups.
        Ranks: 1 -> 1; the three 2s -> avg rank 3; 3 -> 5.
        R_a = 1 + 3 + 3 = 7, U_a = 7 - 3*4/2 = 1."""
        rows = [_ev(i, "purchase", v) for i, v in enumerate([1.0, 2.0, 2.0])]
        rows += [_ev(10 + i, "click", v) for i, v in enumerate([2.0, 3.0])]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_mann_whitney_value(spark, d).collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 2)
        assert r["u_stat"] == 1.0
        assert r["mu_u"] == 3.0
        # sigma^2 = n_a*n_b/12 * ((n+1) - sum(t^3-t)/(n(n-1)))
        #         = 6/12 * (6 - 24/20) = 2.4
        assert r["sigma_u"] == pytest.approx(math.sqrt(2.4), abs=1e-5)
        assert r["z_stat"] == pytest.approx((1.0 - 3.0) / math.sqrt(2.4), abs=1e-5)

    def test_disjoint_extremes_u_zero(self, spark, tmp_path):
        """Every A below every B: U_a = 0 (no B beaten by any A)."""
        rows = [_ev(i, "purchase", float(v)) for i, v in enumerate([1, 2])]
        rows += [_ev(10 + i, "click", float(v)) for i, v in enumerate([5, 6])]
        d = _events(spark, tmp_path, rows)
        r = advanced.q_mann_whitney_value(spark, d).collect()[0]
        assert r["u_stat"] == 0.0


class TestMatryoshkaRecall:
    def _emb(self, spark, d, vecs):
        spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>, label int",
        ).write.parquet(f"{d}/embeddings.parquet")
        return str(d)

    def test_prefix_blind_neighbor_missed_full_dim_found(self, spark, tmp_path):
        """Vectors whose similarity lives entirely in the TAIL
        dimensions: the dim-8 truncation must miss what the full
        search finds, and recall reports the gap.

        Query 0 is all-ones. Its full-dim top-5 are five 'tail twins'
        (zero prefix, ones tail: cosine 0.935, beating everything
        else), but at dim 8 their truncated norm is zero -> sentinel
        score -> invisible, so recall@5(dim=8) = 0 for query 0."""
        q = [1.0] * 64
        tail_twin = [0.0] * 8 + [1.0] * 56
        decoy = [1.0] * 8 + [0.0] * 56  # prefix-only: cos 0.354 to q
        # queries 1..9: one-hot tail vectors, far from everything
        one_hots = []
        for i in range(1, similarity.N_QUERIES):
            v = [0.0] * 64
            v[8 + i] = 1.0
            one_hots.append(v)
        vecs = [q] + one_hots + [tail_twin] * 5 + [decoy] * 5
        d = self._emb(spark, tmp_path, vecs)
        out = similarity.q_matryoshka_recall(spark, d).collect()
        by_dim = {}
        for r in out:
            by_dim.setdefault(r["dim"], []).append(r)
        assert set(by_dim) == set(similarity.MATRYOSHKA_DIMS)
        for dd, rows in by_dim.items():
            assert len(rows) == similarity.N_QUERIES
            for r in rows:
                assert r["n_true"] == similarity.TOP_K
                assert 0.0 <= r["recall"] <= 1.0
        q0 = {r["dim"]: r for r in out if r["query_id"] == 0}
        assert q0[8]["recall"] == 0.0
        # the tail twins reappear once the truncation covers the tail
        assert q0[32]["recall"] == 1.0

    def test_prefix_aligned_corpus_full_recall(self, spark, tmp_path):
        """If all similarity signal is in the first 8 dims, every
        truncation >= 8 reproduces the full ranking exactly."""
        import random

        rng = random.Random(7)
        vecs = []
        for i in range(similarity.N_QUERIES + 15):
            head = [rng.uniform(0.5, 1.0) for _ in range(8)]
            vecs.append(head + [0.0] * 56)
        d = self._emb(spark, tmp_path, vecs)
        out = similarity.q_matryoshka_recall(spark, d).collect()
        for r in out:
            assert r["recall"] == 1.0, (r["dim"], r["query_id"], r["recall"])


class TestWeightedSample:
    def _docs(self, spark, d, rows):
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.parquet(f"{d}/documents.parquet")
        return str(d)

    def test_keys_match_aes_arithmetic(self, spark, tmp_path):
        """Every emitted key equals round(ln(u)/w, 9) with u derived
        from the md5 hex prefix -- the exact A-ES key."""
        import hashlib

        rows = [(i, "t", "en", "s", 10 + i) for i in range(30)]
        d = self._docs(spark, tmp_path, rows)
        out = reshape.q_weighted_sample(spark, d).collect()
        assert len(out) == 30  # K=100 > n: everything sampled, ranked
        for r in out:
            v = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
            u = (v + 0.5) / 2**32
            want = round(math.log(u) / max(r["n_chars"], 1), 9)
            assert r["key"] == pytest.approx(want, abs=1e-12)
        # ranked by key desc
        keys = [r["key"] for r in out]
        assert keys == sorted(keys, reverse=True)

    def test_heavy_weights_dominate_sample(self, spark, tmp_path):
        """Size-biased inclusion: with 5 giant docs (w=10^6) among 200
        tiny ones (w=1), all giants must be in a K=100 sample --
        P(miss) ~ (1/2)^(10^6) per giant under A-ES."""
        rows = [(i, "t", "en", "giant", 1_000_000) for i in range(5)]
        rows += [(100 + i, "t", "en", "tiny", 1) for i in range(200)]
        d = self._docs(spark, tmp_path, rows)
        out = reshape.q_weighted_sample(spark, d).collect()
        assert len(out) == reshape.WEIGHTED_K
        got = {r["doc_id"] for r in out}
        assert all(i in got for i in range(5))
        # and the giants outrank every tiny doc
        giant_ranks = [r["rank"] for r in out if r["doc_id"] < 5]
        assert max(giant_ranks) <= 5

    def test_zero_length_doc_guarded(self, spark, tmp_path):
        """n_chars = 0 must not divide by zero; weight floors at 1."""
        rows = [(0, "", "en", "s", 0), (1, "t", "en", "s", 50)]
        d = self._docs(spark, tmp_path, rows)
        out = reshape.q_weighted_sample(spark, d).collect()
        assert {r["doc_id"] for r in out} == {0, 1}
        assert all(r["key"] is not None for r in out)
