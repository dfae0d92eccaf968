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
