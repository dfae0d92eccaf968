"""Behavioral tests for the round-7 fixes and operators. Oracle
parity is covered by the strict sweep; these pin semantics the oracle
alone can't prove."""

from __future__ import annotations

import math

import pytest

from kafka_clickhouse_pipeline_spark.operators import graph


def _write_graph(spark, d, li_rows):
    spark.createDataFrame(
        li_rows, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{d}/lineitem.parquet")
    return str(d)


class TestCappedPackGateBounds:
    """ADVICE r6 (medium): with max_degree engaged, the packed-pair
    gate must bound node ids over the UNFILTERED graph -- a capped-out
    hub with id >= 2^32 still appears as a wedge ENDPOINT in surviving
    centers' nbrs arrays, and min/max over filtered centers would
    silently enable packing and corrupt (u << 32) + v.

    Fixture: hub H = 2^33 with 5 spokes (capped out at max_degree=4);
    x=1, y=2 each co-ordered with center c=3 AND with H. Wedges from
    surviving centers x and y are both (c, H) -- an endpoint past the
    32-bit line while every surviving CENTER id is tiny. Under the
    pre-fix gate, (3, 2^33) packs to 5 << 32, unpacks to (5, 0), and
    the degree join silently drops the pair."""

    HUB = 1 << 33

    def _rows(self):
        x, y, c, H = 1, 2, 3, self.HUB
        rows = [(1, x), (1, c), (2, y), (2, c), (3, x), (3, H), (4, y), (4, H)]
        # three extra spokes push H's degree to 5 (capped at 4)
        rows += [(5, 4), (5, H), (6, 5), (6, H), (7, 6), (7, H)]
        return rows

    def test_node_jaccard_capped_endpoint_past_2_32(self, spark, tmp_path):
        d = _write_graph(spark, tmp_path, self._rows())
        got = {(r["u"], r["v"]): r for r in
               graph.q_node_jaccard(spark, d, max_degree=4).collect()}
        # (c=3, H) share centers x and y: n_common=2, union=2+5-2=5
        assert (3, self.HUB) in got, got.keys()
        r = got[(3, self.HUB)]
        assert r["n_common"] == 2 and r["n_union"] == 5
        assert r["jaccard"] == 0.4
        # (x=1, y=2) share center c: n_common=1, union=2+2-1=3
        assert got[(1, 2)]["jaccard"] == 0.333333

    def test_adamic_adar_capped_endpoint_past_2_32(self, spark, tmp_path):
        d = _write_graph(spark, tmp_path, self._rows())
        got = {(r["u"], r["v"]): r for r in
               graph.q_adamic_adar(spark, d, max_degree=4).collect()}
        assert (3, self.HUB) in got, got.keys()
        per_center = math.floor(1.0 / math.log(2.0) * 1e9 + 0.5)
        aa = 2 * per_center
        assert got[(3, self.HUB)]["aa_score"] == (
            f"{aa // 10**9}.{aa % 10**9:09d}"
        )
        assert got[(3, self.HUB)]["n_common"] == 2

    def test_uncapped_gate_unchanged(self, spark, tmp_path):
        """Uncapped, the centers ARE the node universe, so the
        adjacency-frame bound stays in force (no extra job) and big
        ids still route to the two-column fallback."""
        d = _write_graph(spark, tmp_path, self._rows())
        got = {(r["u"], r["v"]): r for r in
               graph.q_node_jaccard(spark, d).collect()}
        assert (3, self.HUB) in got
        assert got[(3, self.HUB)]["n_common"] == 2


class TestBrandAssortativityDegenerate:
    def test_single_brand_graph_yields_null(self, spark, tmp_path):
        """Cauchy-Schwarz equality (every endpoint one brand) zeroes
        the denominator; the short-circuit must yield NULL, not NaN
        (ADVICE r6: Spark 0/0 double = NaN, DuckDB = NULL)."""
        _write_graph(spark, tmp_path, [(1, 1), (1, 2), (2, 2), (2, 3)])
        spark.createDataFrame(
            [(p, "Brand#1") for p in (1, 2, 3)],
            "p_partkey bigint, p_brand string",
        ).write.parquet(f"{tmp_path}/part.parquet")
        rows = graph.q_brand_assortativity(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["assortativity"] is None
        assert rows[0]["n_directed_edges"] == rows[0]["n_same_brand"] == 4


class TestNodeJaccardMinhash:
    """The approximate wedge twin (VERDICT r6 #2). The oracle proves
    cross-engine parity of the WHOLE construction; these pin the
    semantics parity can't: sound scores, guaranteed recall at j=1,
    and the linked-pair exclusion."""

    def _identical_neighborhood_rows(self):
        # parts 1 and 2 each co-ordered with {10, 11, 12}, never
        # with each other -> N(1) == N(2), jaccard exactly 1.0
        rows = []
        for o, spoke in enumerate((10, 11, 12), start=1):
            rows += [(o, 1), (o, spoke)]
        for o, spoke in enumerate((10, 11, 12), start=4):
            rows += [(o, 2), (o, spoke)]
        return rows

    def test_identical_neighborhoods_always_found(self, spark, tmp_path):
        """j = 1.0 pairs share the full minhash signature, hence every
        band bucket -- LSH recall is exactly 1 there, deterministically,
        not probabilistically."""
        d = _write_graph(spark, tmp_path, self._identical_neighborhood_rows())
        got = {(r["u"], r["v"]): r for r in
               graph.q_node_jaccard_minhash(spark, d).collect()}
        assert (1, 2) in got, got.keys()
        r = got[(1, 2)]
        assert r["n_common"] == 3 and r["n_union"] == 3
        assert r["jaccard"] == 1.0

    def test_scores_match_exact_operator(self, spark, tmp_path):
        """Every emitted pair is verified EXACTLY: its (n_common,
        n_union, jaccard) must equal the exact operator's row for the
        same pair (the approximation affects WHICH pairs are
        considered, never their scores)."""
        d = _write_graph(spark, tmp_path, self._identical_neighborhood_rows())
        exact = {(r["u"], r["v"]): r for r in
                 graph.q_node_jaccard(spark, d).collect()}
        for r in graph.q_node_jaccard_minhash(spark, d).collect():
            e = exact[(r["u"], r["v"])]
            assert (r["n_common"], r["n_union"], r["jaccard"]) == (
                e["n_common"], e["n_union"], e["jaccard"]
            )

    def test_linked_pairs_excluded(self, spark, tmp_path):
        rows = self._identical_neighborhood_rows() + [(7, 1), (7, 2)]
        d = _write_graph(spark, tmp_path, rows)
        got = {(r["u"], r["v"]) for r in
               graph.q_node_jaccard_minhash(spark, d).collect()}
        assert (1, 2) not in got


class TestWedgeMinhashRecall:
    def test_recall_counts_topk_overlap(self, spark, tmp_path):
        rows = []
        for o, spoke in enumerate((10, 11, 12), start=1):
            rows += [(o, 1), (o, spoke)]
        for o, spoke in enumerate((10, 11, 12), start=4):
            rows += [(o, 2), (o, spoke)]
        d = _write_graph(spark, tmp_path, rows)
        exact = {(r["u"], r["v"]) for r in
                 graph.q_node_jaccard(spark, d).collect()}
        approx = {(r["u"], r["v"]) for r in
                  graph.q_node_jaccard_minhash(spark, d).collect()}
        row = graph.q_wedge_minhash_recall(spark, d).collect()[0]
        assert row["hits"] == len(exact & approx)
        assert row["k"] == graph.NODE_JACCARD_TOPK
        assert row["recall"] == round(row["hits"] / row["k"], 6)


class TestConvHexDecode:
    def test_conv_decode_matches_nibble_ladder(self, spark):
        """Round-7 hot-expression swap: conv(substr(md5, 1, 8), 16, 10)
        must be bit-identical to the historical 8-nibble ascii ladder
        (the SQL oracles still spell the ladder; equality here is what
        keeps every md5-uniform consumer on its oracle contract)."""
        from pyspark.sql import functions as F

        df = spark.range(100_000).select(
            (F.col("id") * F.lit(7919) + F.lit(13)).alias("x")
        )
        h = F.md5(F.col("x").cast("string"))
        v = F.lit(0).cast("long")
        for j in range(8):
            a = F.ascii(F.substring(h, j + 1, 1))
            v = v * 16 + (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48)))
        conv = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        assert df.filter(v != conv).count() == 0


from datetime import datetime

from kafka_clickhouse_pipeline_spark.operators import (  # noqa: E402
    advanced,
    analytics,
    curation,
    text,
)

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _write_events(spark, d, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{d}/events.parquet"
    )
    return str(d)


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


class TestBurstinessHourly:
    def test_constant_rate_has_zero_dispersion(self, spark, tmp_path):
        rows = [
            (i, datetime(2024, 1, 1, h), 1, "tick", 1.0, "{}")
            for i, h in enumerate(range(6))
        ]
        d = _write_events(spark, tmp_path, rows)
        r = {x["event_type"]: x for x in
             advanced.q_burstiness_hourly(spark, d).collect()}
        assert r["tick"]["n_hours"] == 6
        assert r["tick"]["dispersion"] == 0.0

    def test_gap_hours_zero_filled(self, spark, tmp_path):
        """Two events at hours 0 and 5 -> grid of 6 hours with four
        zeros; without the dense grid VMR would be 0 (all observed
        counts equal 1). s1=2, s2=2, n=6: VMR=(12-4)/(5*2)=0.8."""
        rows = [
            (1, datetime(2024, 1, 1, 0), 1, "burst", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 5), 1, "burst", 1.0, "{}"),
        ]
        d = _write_events(spark, tmp_path, rows)
        r = advanced.q_burstiness_hourly(spark, d).collect()[0]
        assert r["n_hours"] == 6
        assert r["dispersion"] == 0.8

    def test_single_hour_is_null(self, spark, tmp_path):
        d = _write_events(
            spark, tmp_path,
            [(1, datetime(2024, 1, 1, 0), 1, "once", 1.0, "{}")],
        )
        r = advanced.q_burstiness_hourly(spark, d).collect()[0]
        assert r["dispersion"] is None


class TestSpearmanCorr:
    def _write_li(self, spark, d, rows):
        spark.createDataFrame(
            rows, "l_returnflag string, l_quantity double, "
            "l_extendedprice double, l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        return str(d)

    def test_monotone_is_one(self, spark, tmp_path):
        rows = [("A", float(q), float(q * 10 + 1), q, q) for q in range(1, 6)]
        d = self._write_li(spark, tmp_path, rows)
        r = advanced.q_spearman_corr(spark, d).collect()[0]
        assert r["spearman_rho"] == 1.0

    def test_reversed_is_minus_one(self, spark, tmp_path):
        rows = [("A", float(q), float(100 - q), q, q) for q in range(1, 6)]
        d = self._write_li(spark, tmp_path, rows)
        r = advanced.q_spearman_corr(spark, d).collect()[0]
        assert r["spearman_rho"] == -1.0

    def test_ties_use_average_ranks(self, spark, tmp_path):
        """Two tied quantities share the average rank: with values
        x=(1,1,2), y=(1,2,3), tie-corrected rho = 0.866025 (hand
        computation via Pearson over ranks (1.5,1.5,3))."""
        rows = [
            ("A", 1.0, 1.0, 1, 1),
            ("A", 1.0, 2.0, 2, 2),
            ("A", 2.0, 3.0, 3, 3),
        ]
        d = self._write_li(spark, tmp_path, rows)
        r = advanced.q_spearman_corr(spark, d).collect()[0]
        assert r["spearman_rho"] == 0.866025


class TestAudienceOverlap:
    def test_hand_computed_overlap(self, spark, tmp_path):
        rows = [
            (1, datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1), 2, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 1), 3, "view", 1.0, "{}"),
            (4, datetime(2024, 1, 1), 2, "click", 1.0, "{}"),
            (5, datetime(2024, 1, 1), 3, "click", 1.0, "{}"),
            (6, datetime(2024, 1, 1), 4, "click", 1.0, "{}"),
            (7, datetime(2024, 1, 1), 2, "click", 1.0, "{}"),  # dup user
        ]
        d = _write_events(spark, tmp_path, rows)
        r = analytics.q_audience_overlap(spark, d).collect()[0]
        # click={2,3,4}, view={1,2,3}: shared 2, union 4
        assert (r["type_a"], r["type_b"]) == ("click", "view")
        assert (r["n_a"], r["n_b"], r["n_shared"]) == (3, 3, 2)
        assert r["jaccard"] == 0.5
        assert r["containment"] == 0.666667


class TestCharDiversity:
    def test_extremes(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, [
            (1, "aaaa", "en", "s", 4),
            (2, "ab", "en", "s", 2),
            (3, "x", "en", "s", 1),
        ])
        r = {x["doc_id"]: x for x in
             text.q_char_diversity(spark, d).collect()}
        assert r[1]["gini_simpson"] == 0.0
        assert r[1]["distinct_chars"] == 1
        assert r[1]["top_char_frac"] == 1.0
        assert r[2]["gini_simpson"] == 1.0
        assert r[3]["gini_simpson"] is None  # one char: 0/0


class TestKneserNeyBigram:
    def test_hand_computed_probability(self, spark, tmp_path):
        """Corpus 'a b', 'a b', 'a c': c2(a,b)=2, c2(a,c)=1, c1(a)=3,
        N1+(a,*)=2, N1+(*,b)=1, N1+(*,c)=1, T=2.
        P_KN(b|a) = (2-.75)/3 + .75*2/3*(1/2) = 0.666667
        P_KN(c|a) = (1-.75)/3 + .75*2/3*(1/2) = 0.333333"""
        d = _write_docs(spark, tmp_path, [
            (1, "a b", "en", "s", 3),
            (2, "a b", "en", "s", 3),
            (3, "a c", "en", "s", 3),
        ])
        r = {(x["prev"], x["cur"]): x for x in
             text.q_kneser_ney_bigram(spark, d).collect()}
        assert r[("a", "b")]["p_kn"] == 0.666667
        assert r[("a", "c")]["p_kn"] == 0.333333
        assert r[("a", "b")]["c2"] == 2 and r[("a", "b")]["c1"] == 3


class TestTokenizerFertility:
    def test_camel_and_digit_boundaries(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, [
            (1, "fooBar x9y", "en", "s", 10),
        ])
        r = text.q_tokenizer_fertility(spark, d).collect()[0]
        # ws tokens: [fooBar, x9y] = 2; subwords: [foo, Bar, x, 9y] = 4
        assert (r["ws_tokens"], r["subword_tokens"]) == (2, 4)
        assert r["fertility"] == 2.0
        assert r["bytes_per_token"] == 2.5


class TestEpochShuffleAudit:
    def test_invariants(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, [
            (i, f"doc {i}", "en", "s", 5) for i in range(40)
        ])
        r = curation.q_epoch_shuffle_audit(spark, d).collect()[0]
        assert r["n_docs"] == 40 and r["prefix_k"] == 4
        assert 0 <= r["prefix_overlap"] <= 4
        assert 0 <= r["max_abs_drift"] <= 39
        assert 0.0 <= r["mean_abs_drift"] <= 39.0
        # reshuffle actually permutes: drift cannot be identically zero
        assert r["max_abs_drift"] > 0


class TestHellingerSources:
    def test_identical_and_disjoint_mixes(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, [
            (1, "x", "en", "s1", 1), (2, "x", "de", "s1", 1),
            (3, "x", "en", "s2", 1), (4, "x", "de", "s2", 1),
            (5, "x", "fr", "s3", 1), (6, "x", "fr", "s3", 1),
        ])
        r = {(x["source_a"], x["source_b"]): x for x in
             curation.q_hellinger_sources(spark, d).collect()}
        assert r[("s1", "s2")]["hellinger"] == 0.0
        # s3 shares no language with s1: BC has no common terms ->
        # pair row exists only via shared langs; disjoint mixes have
        # NO join rows, so the pair is absent (documented: absence
        # means disjoint support, H=1)
        assert ("s1", "s3") not in r


class TestWinsorizedStats:
    def test_hand_computed_clip(self, spark, tmp_path):
        """20 rows 1..20, one group: k=1, lo=2, hi=19.
        raw mean 10.5; winsorized sum = 2+2..19+19 = 210-1-20+2+19=210;
        mean 10.5 (symmetric); trimmed mean over 2..19 = 10.5."""
        spark.createDataFrame(
            [(i, "1-URGENT", float(i)) for i in range(1, 21)],
            "o_orderkey bigint, o_orderpriority string, o_totalprice double",
        ).write.parquet(f"{tmp_path}/orders.parquet")
        r = advanced.q_winsorized_stats(spark, str(tmp_path)).collect()[0]
        assert (r["n"], r["k_cut"]) == (20, 1)
        assert (r["lo_val"], r["hi_val"]) == (2.0, 19.0)
        assert r["mean_raw"] == r["mean_winsorized"] == r["mean_trimmed"] == 10.5


class TestCoverageCurve:
    def test_saturating_corpus(self, spark, tmp_path):
        """Ten identical docs: every shingle appears in the first
        decile -> one output row, coverage 1.0 at decile 1."""
        d = _write_docs(spark, tmp_path, [
            (i, "a b c d", "en", "s", 7) for i in range(10)
        ])
        rows = text.q_coverage_curve(spark, d).collect()
        assert len(rows) == 1
        assert rows[0]["decile"] == 1
        assert rows[0]["new_shingles"] == 2  # 'a b c', 'b c d'
        assert rows[0]["coverage_frac"] == 1.0

    def test_disjoint_corpus_accumulates(self, spark, tmp_path):
        """Ten docs with disjoint vocabulary: each decile contributes
        exactly its own shingles; cumulative hits 1.0 at decile 10."""
        d = _write_docs(spark, tmp_path, [
            (i, f"w{i}a w{i}b w{i}c", "en", "s", 11) for i in range(10)
        ])
        rows = text.q_coverage_curve(spark, d).collect()
        assert [r["decile"] for r in rows] == list(range(1, 11))
        assert all(r["new_shingles"] == 1 for r in rows)
        assert rows[-1]["coverage_frac"] == 1.0


class TestIqrOutliers:
    def test_hand_computed_fences(self, spark, tmp_path):
        """Values 1..20 plus an outlier 1000: n=21, q1 at rank
        ceil(21/4)=6, q3 at rank ceil(63/4)=16 -> q1=6, q3=16,
        iqr=10, fences [-9, 31] -> exactly one outlier."""
        rows = [
            (i, datetime(2024, 1, 1), 1, "buy", float(i), "{}")
            for i in range(1, 21)
        ] + [(99, datetime(2024, 1, 1), 1, "buy", 1000.0, "{}")]
        d = _write_events(spark, tmp_path, rows)
        r = advanced.q_iqr_outliers(spark, d).collect()[0]
        assert (r["q1"], r["q3"], r["iqr"]) == (6.0, 16.0, 10.0)
        assert r["n_outliers"] == 1
        assert r["outlier_rate"] == round(1 / 21, 6)


class TestDatasetCardStats:
    def test_hand_computed_card(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, [
            (1, "a b", "en", "s1", 3),
            (2, "a b", "en", "s1", 3),      # exact dup of doc 1
            (3, "c d e", "de", "s1", 5),
            (4, "x", "fr", "s2", 1),
        ])
        r = {x["source"]: x for x in
             curation.q_dataset_card_stats(spark, d).collect()}
        s1 = r["s1"]
        assert (s1["n_docs"], s1["n_tokens"], s1["vocab_size"]) == (3, 7, 5)
        assert s1["exact_dup_rate"] == round(1 - 2 / 3, 6)
        assert s1["p50_doc_tokens"] == 2  # lengths (2,2,3) -> rank 2
        assert (s1["top_lang"], s1["top_lang_share"]) == ("en", 0.666667)
        assert r["s2"]["exact_dup_rate"] == 0.0


class TestSkipgramPairs:
    def test_window_and_normalization(self, spark, tmp_path):
        """'a b c a' with W=3: offsets produce unordered pairs
        (a,b)x2, (b,c)x1, (a,c)x2, (a,a)x1 -> counts with min_count=2
        keep (a,b)=2 and (a,c)=2."""
        d = _write_docs(spark, tmp_path, [(1, "a b c a", "en", "s", 7)])
        rows = {(r["w1"], r["w2"]): r["cnt"] for r in
                text.q_skipgram_pairs(spark, d).collect()}
        assert rows == {("a", "b"): 2, ("a", "c"): 2}


class TestNeardupRateBySource:
    def test_cross_source_attribution(self, spark, tmp_path):
        """Two exact near-dups in different sources plus one unique
        doc: one cross-source pair, zero within-source pairs."""
        body = " ".join(f"tok{i}" for i in range(12))
        d = _write_docs(spark, tmp_path, [
            (1, body, "en", "s1", len(body)),
            (2, body, "en", "s2", len(body)),
            (3, "completely different words entirely here now " * 2,
             "en", "s1", 50),
        ])
        from kafka_clickhouse_pipeline_spark.operators import dedup
        rows = {(r["source_a"], r["source_b"]): r for r in
                dedup.q_neardup_rate_by_source(spark, d).collect()}
        assert list(rows) == [("s1", "s2")]
        r = rows[("s1", "s2")]
        assert r["n_dup_pairs"] == 1
        assert r["n_possible_pairs"] == 2  # n_s1=2, n_s2=1 -> 2 cross
        assert r["dup_pairs_per_million"] == 500000.0
