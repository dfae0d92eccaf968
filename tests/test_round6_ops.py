"""Behavioral tests for the round-6 operators and fixes (capped
Adamic-Adar, the ln faithful-rounding boundary guard). Oracle parity
is covered by the strict sweep; these pin the semantics the oracle
alone can't prove (the hub-exclusion regime) and guard the one
documented cross-engine risk (ADVICE r5: ln is faithfully, not
correctly, rounded on both engines)."""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_clickhouse_pipeline_spark.operators import (
    analytics,
    dedup,
    graph,
    hamming,
)


def _write_graph(spark, d, li_rows):
    spark.createDataFrame(
        li_rows, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{d}/lineitem.parquet")
    return str(d)


def _nano_str(x: float) -> str:
    n = math.floor(x * 1e9 + 0.5)
    return f"{n // 10**9}.{n % 10**9:09d}"


class TestAdamicAdarCapped:
    def test_capped_excludes_hub_centers_on_skewed_graph(self, spark, tmp_path):
        """The p99-cap's payoff regime (VERDICT r5 #3, mirroring the
        q_node_jaccard_capped star test): a hub co-ordered with 200
        spokes holds C(200,2) wedges -- >99% of the wedge volume --
        each carrying the near-zero weight 1/ln(200); the discrete-p99
        cap lands below the hub degree and removes them all, leaving
        only the ten low-degree-center wedges at weight 1/ln(2)."""
        rows = []
        for i in range(200):
            rows += [(1000 + i, 1), (1000 + i, 2000 + i)]
        for k in range(10):
            c, l1, l2 = 500 + 3 * k, 501 + 3 * k, 502 + 3 * k
            rows += [(300 + 2 * k, c), (300 + 2 * k, l1),
                     (3000 + 2 * k, c), (3000 + 2 * k, l2)]
        d = _write_graph(spark, tmp_path, rows)
        exact = graph.q_adamic_adar(spark, d).collect()
        capped = graph.q_adamic_adar_capped(spark, d).collect()
        # 231 nodes: 220 x d=1, 10 x d=2, hub d=200 -> discrete p99 =
        # degree 2; every hub-centered spoke pair is pruned and the
        # ten surviving pairs score exactly 1/ln(2) in nano-units
        assert len(exact) == graph.NODE_JACCARD_TOPK  # hub pairs flood exact
        assert len(capped) == 10
        assert {(r["u"], r["v"]) for r in capped} == {
            (501 + 3 * k, 502 + 3 * k) for k in range(10)
        }
        w2 = _nano_str(1 / math.log(2))
        assert all(r["aa_score"] == w2 and r["n_common"] == 1 for r in capped)

    def test_capped_equals_exact_when_no_hubs(self, spark, tmp_path):
        """Uniform degrees: the p99 cap equals the max degree and the
        capped mode reproduces the exact result bit-for-bit."""
        d = _write_graph(spark, tmp_path, [(10, 1), (10, 2), (20, 1), (20, 3)])
        assert (
            graph.q_adamic_adar_capped(spark, d).collect()
            == graph.q_adamic_adar(spark, d).collect()
        )

    def test_hub_weight_uses_true_degree(self, spark, tmp_path):
        """max_degree filters which CENTERS expand, but a surviving
        center's weight is 1/ln(true degree) -- the cap must not
        re-rank survivors by changing their weights."""
        # center 1 has degree 3 (leaves 2,3,4 via pairwise orders)
        rows = [(10, 1), (10, 2), (11, 1), (11, 3), (12, 1), (12, 4)]
        d = _write_graph(spark, tmp_path, rows)
        out = graph.q_adamic_adar(spark, d, max_degree=3).collect()
        w3 = _nano_str(1 / math.log(3))
        assert {r["aa_score"] for r in out} == {w3}
        assert graph.q_adamic_adar(spark, d, max_degree=2).collect() == []


class TestFunnelWindowEmptyInput:
    def test_zero_funnel_events_yields_zero_counts(self, spark, tmp_path):
        """ADVICE r5: with zero funnel-step events the ungrouped sums
        are NULL without the coalesce while the oracle emits 0 per
        step -- all three steps must report n_users == 0, not NULL."""
        spark.createDataFrame(
            [(1, __import__("datetime").datetime(2024, 1, 1), 7,
              "signup", 1.0, "{}")],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        rows = analytics.q_funnel_window(spark, str(tmp_path)).collect()
        assert [(r["step"], r["n_users"]) for r in rows] == [
            (1, 0), (2, 0), (3, 0),
        ]


class TestHamming:
    @staticmethod
    def _corpus(spark, d, rows):
        """rows: list of (vec_id, 64-float list, label)."""
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        return str(d)

    def test_sign_packing_and_zero_convention(self, spark, tmp_path):
        """Bit i is set iff embedding[i] > 0 STRICTLY: zeros and
        negatives pack to 0-bits. A vector with only dims 1 and 33
        positive packs to lo=1, hi=1."""
        v = [0.0] * 64
        v[0] = 0.5
        v[32] = 2.0
        v[1] = -3.0  # negative stays a 0-bit
        d = self._corpus(spark, tmp_path, [(1, v, 0)])
        row = hamming._sign_codes(spark, d).collect()[0]
        assert (row["lo"], row["hi"]) == (1, 1)

    def test_distance_counts_differing_sign_bits(self, spark, tmp_path):
        """Distance between all-positive and all-negative is 64;
        between identical vectors it is 0; flipping exactly one dim's
        sign gives 1 -- and the all-zeros vector equals the
        all-negatives vector (both pack to 0)."""
        pos = [1.0] * 64
        neg = [-1.0] * 64
        zero = [0.0] * 64
        one_flip = [1.0] * 64
        one_flip[17] = -1.0
        d = self._corpus(
            spark, tmp_path,
            [(0, pos, 0), (1, neg, 0), (2, zero, 0), (3, one_flip, 0)],
        )
        out = {
            (r["query_id"], r["neighbor_id"]): r["hamming"]
            for r in hamming.q_ann_hamming_topk(spark, d).collect()
        }
        assert out[(0, 1)] == 64 and out[(0, 2)] == 64
        assert out[(0, 3)] == 1
        assert out[(1, 2)] == 0  # zeros and negatives share the code
        # symmetry
        assert out[(1, 0)] == out[(0, 1)]

    def test_recall_is_one_when_hamming_preserves_ranking(self, spark, tmp_path):
        """Orthogonal-ish sign patterns: when cosine and Hamming agree
        on the neighbor sets, recall is exactly 1.0 for every query."""
        import random

        rng = random.Random(7)
        rows = []
        for vid in range(12):
            rows.append(
                (vid, [rng.choice((-1.0, 1.0)) for _ in range(64)], 0)
            )
        d = self._corpus(spark, tmp_path, rows)
        # sign vectors: cosine = (64 - 2*hamming)/64, a strictly
        # decreasing function of hamming -> identical rankings up to
        # ties; ties break by neighbor_id in both, so recall == 1
        for r in hamming.q_hamming_recall(spark, d).collect():
            assert r["recall"] == 1.0, r


class TestPrefixFilter:
    @staticmethod
    def _docs(spark, d, texts):
        spark.createDataFrame(
            [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        return str(d)

    def test_agrees_with_inverted_index_algorithm(self, spark, tmp_path):
        """The two exact algorithms must emit identical rows on a
        corpus with near-dups above and below the 0.8 threshold."""
        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
        texts = [
            base,
            base + " mike",          # high-jaccard near-dup of base
            base.replace("alpha", "zulu"),  # moderate overlap
            "one two three four five six seven eight nine ten",  # disjoint
            "one two three four five six seven eight nine ten",  # exact dup
        ]
        d = self._docs(spark, tmp_path, texts)
        a = [tuple(r) for r in dedup.q_dedup_ngram_jaccard(spark, d).collect()]
        b = [tuple(r) for r in dedup.q_dedup_prefix_filter(spark, d).collect()]
        assert a == b
        assert len(a) >= 2  # the near-dup and the exact dup both found

    def test_finds_pair_sharing_only_common_tokens(self, spark, tmp_path):
        """Adversarial for prefix pruning: every shingle of the
        near-dup pair also appears in several other documents (high
        document frequency, so the pair's prefix tokens are its
        'least rare' ones). The theorem says a J>=0.8 pair must still
        share a PREFIX token -- verify no false negative."""
        core = "red green blue cyan magenta yellow black white gray pink"
        noise = [f"{core} filler{i}" for i in range(4)]  # raise every df
        texts = noise + [core, core + " extra"]
        d = self._docs(spark, tmp_path, texts)
        a = [tuple(r) for r in dedup.q_dedup_ngram_jaccard(spark, d).collect()]
        b = [tuple(r) for r in dedup.q_dedup_prefix_filter(spark, d).collect()]
        assert a == b and len(b) >= 1

    def test_empty_and_short_docs(self, spark, tmp_path):
        """Docs shorter than the 3-token shingle window produce no
        shingles and no pairs; the operator returns an empty frame
        rather than erroring."""
        d = self._docs(spark, tmp_path, ["one two", "a", ""])
        assert dedup.q_dedup_prefix_filter(spark, d).collect() == []


class TestNgramNovelty:
    def test_novelty_fractions(self, spark, tmp_path):
        """Three docs: an exact duplicate pair (novelty 0 for both)
        and a disjoint doc (novelty 1); a 7-token doc is omitted
        (no 8-gram shingles)."""
        from kafka_clickhouse_pipeline_spark.operators import curation

        dup = "a b c d e f g h i j"
        spark.createDataFrame(
            [
                (1, dup, "en", "s", len(dup)),
                (2, dup, "en", "s", len(dup)),
                (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "s", 20),
                (4, "one two three four five six seven", "en", "s", 30),
            ],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{tmp_path}/documents.parquet")
        out = {
            r["doc_id"]: (r["n_shingles"], r["n_shared"], r["novelty"])
            for r in curation.q_ngram_novelty(spark, str(tmp_path)).collect()
        }
        assert out[1] == (3, 3, 0.0) and out[2] == (3, 3, 0.0)
        assert out[3] == (2, 0, 1.0)
        assert 4 not in out  # 7 tokens -> no 8-gram


class TestTwoStarComponents:
    @staticmethod
    def _frames(spark, edge_pairs, n_nodes):
        nodes = spark.createDataFrame(
            [(i,) for i in range(1, n_nodes + 1)], "node bigint"
        )
        edges = spark.createDataFrame(
            edge_pairs or [], "src bigint, dst bigint"
        )
        return nodes, edges

    def _labels(self, df):
        return {r["node"]: r["cluster_id"] for r in df.collect()}

    def test_long_path_converges_logarithmically(self, spark):
        """A 200-node path: component minimum must propagate the whole
        chain. Label propagation needs ~200 rounds (its max_iter=20
        would NOT converge here); two-star must finish inside its own
        max_iter=20 because it contracts doubly-logarithmically."""
        from kafka_clickhouse_pipeline_spark.operators.graph import (
            connected_components_twostar,
        )

        nodes, edges = self._frames(
            spark, [(i, i + 1) for i in range(1, 200)], 200
        )
        out = self._labels(connected_components_twostar(nodes, edges))
        assert out == {i: 1 for i in range(1, 201)}

    def test_matches_label_propagation_on_mixed_graph(self, spark):
        """Deterministic pseudo-random graph: both algorithms must
        emit the identical (node, min-id) map, singletons included."""
        from kafka_clickhouse_pipeline_spark.operators.graph import (
            connected_components,
            connected_components_twostar,
        )

        import random

        rng = random.Random(42)
        pairs = [
            (rng.randint(1, 60), rng.randint(1, 60)) for _ in range(45)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        nodes, edges = self._frames(spark, pairs, 80)  # 61..80 isolated
        a = self._labels(connected_components(nodes, edges))
        b = self._labels(connected_components_twostar(nodes, edges))
        assert a == b
        assert all(b[i] == i for i in range(61, 81))

    def test_empty_graph_all_singletons(self, spark):
        from kafka_clickhouse_pipeline_spark.operators.graph import (
            connected_components_twostar,
        )

        nodes, edges = self._frames(spark, [], 5)
        assert self._labels(connected_components_twostar(nodes, edges)) == {
            i: i for i in range(1, 6)
        }


class TestPersonalizedPageRank:
    def test_mass_localizes_to_seed_components(self, spark, tmp_path):
        """The PPR property that distinguishes it from global PageRank:
        rank mass exists ONLY in components reachable from the seed
        set. Ten disjoint co-purchase pairs; the 8 md5-smallest nodes
        are seeds; every scored node must live in a pair touching a
        seed, and every seed must score > 0."""
        import hashlib

        from kafka_clickhouse_pipeline_spark.operators.graph import (
            PPR_SEEDS,
            q_ppr_copurchase,
        )

        pairs = [(2 * i + 1, 2 * i + 2) for i in range(10)]  # nodes 1..20
        rows = []
        for k, (a, b) in enumerate(pairs):
            rows += [(100 + k, a), (100 + k, b)]
        spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{tmp_path}/lineitem.parquet")
        seeds = sorted(
            range(1, 21), key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n)
        )[:PPR_SEEDS]
        seeded_nodes = set()
        for a, b in pairs:
            if a in seeds or b in seeds:
                seeded_nodes |= {a, b}
        out = {r["partkey"]: r["rank_scaled"]
               for r in q_ppr_copurchase(spark, str(tmp_path)).collect()}
        assert set(out) <= seeded_nodes
        assert all(out[s] > 0 for s in seeds)


class TestBasketItemsets3:
    def test_planted_triple_counted(self, spark, tmp_path):
        """Three orders containing brands {A,B,C} (one also has D):
        triple (A,B,C) has support 3; (A,B,D) support 1; output sorted
        lexicographically within each triple."""
        from kafka_clickhouse_pipeline_spark.operators.association import (
            q_basket_itemsets3,
        )

        li, part = [], []
        brands = {1: "A", 2: "B", 3: "C", 4: "D"}
        for pk, br in brands.items():
            part.append((pk, br))
        for ok, pks in ((10, [1, 2, 3]), (11, [1, 2, 3]), (12, [1, 2, 3, 4])):
            li += [(ok, pk) for pk in pks]
        spark.createDataFrame(
            li, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{tmp_path}/lineitem.parquet")
        spark.createDataFrame(
            part, "p_partkey bigint, p_brand string"
        ).write.parquet(f"{tmp_path}/part.parquet")
        out = {
            (r["brand_a"], r["brand_b"], r["brand_c"]): r["n_abc"]
            for r in q_basket_itemsets3(spark, str(tmp_path)).collect()
        }
        assert out[("A", "B", "C")] == 3
        assert out[("A", "B", "D")] == 1
        assert all(a < b < c for a, b, c in out)


class TestSkyline:
    def test_dominance_semantics(self, spark, tmp_path):
        """min-price/max-size skyline: strictly-dominated rows drop,
        exact duplicates both survive (dominance needs one strict
        inequality), and incomparable rows all stay."""
        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_skyline_parts,
        )

        rows = [
            (1, 10.0, 5),   # frontier
            (2, 10.0, 5),   # exact duplicate of 1 -> also frontier
            (3, 10.0, 4),   # dominated by 1 (same price, smaller size)
            (4, 12.0, 5),   # dominated by 1 (pricier, same size)
            (5, 12.0, 7),   # frontier (pricier but bigger)
            (6, 8.0, 2),    # frontier (cheapest)
            (7, 9.0, 1),    # dominated by 6
        ]
        spark.createDataFrame(
            [(pk, price, size) for pk, price, size in rows],
            "p_partkey bigint, p_retailprice double, p_size int",
        ).write.parquet(f"{tmp_path}/part.parquet")
        out = [r["partkey"] for r in q_skyline_parts(spark, str(tmp_path)).collect()]
        assert out == [6, 1, 2, 5]


class TestLnBoundaryGuard:
    """ADVICE r5 (graph.py): the AA nano-weight floor(1/ln(d)*1e9+0.5)
    is bit-identical across engines only while no observed degree d
    puts 1e9/ln(d) within ~1 ulp of the x.5 rounding boundary, because
    ln is faithfully (not correctly) rounded in both JVM Math.log and
    DuckDB ln(). Assert the margin for every degree observed in the
    fixtures the driver and strict sweep actually run (sf0.001 and
    sf0.01), with a ~1e-6 safety factor -- vastly wider than the
    ~1e-7 relative wobble a 1-ulp ln divergence can induce at these
    magnitudes."""

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_observed_degrees_clear_rounding_boundary(self, sf):
        con = duckdb.connect()
        degrees = [
            r[0]
            for r in con.execute(
                f"""
                WITH e AS (
                  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                  FROM '/root/testdata/{sf}/lineitem.parquet' a
                  JOIN '/root/testdata/{sf}/lineitem.parquet' b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey <> b.l_partkey)
                SELECT DISTINCT count(*) AS d FROM e GROUP BY src
                """
            ).fetchall()
        ]
        assert degrees, "fixture produced no co-purchase degrees"
        for d in degrees:
            if d < 2:
                continue
            frac = (1e9 / math.log(d)) % 1.0
            assert abs(frac - 0.5) > 1e-6, (
                f"degree {d}: 1e9/ln(d) fractional part {frac!r} is "
                "within 1e-6 of the x.5 boundary -- a 1-ulp ln "
                "divergence could flip the quantized AA weight"
            )


class TestRandomWalkCorpus:
    def test_walks_follow_edges_and_are_deterministic(self, spark, tmp_path):
        """Every walk starts at its seed, has exactly
        RANDOM_WALK_LEN + 1 positions (the symmetric edge list has no
        dead ends), every consecutive hop is a real edge, and the md5
        coin makes two runs bit-identical."""
        rows = [
            (1, 10), (1, 11), (1, 12),
            (2, 11), (2, 13),
            (3, 12), (3, 13), (3, 14),
        ]
        d = _write_graph(spark, tmp_path, rows)
        out = graph.q_randomwalk_corpus(spark, d).collect()
        walks: dict[int, dict[int, int]] = {}
        for r in out:
            walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
        edges = set()
        for o, grp in [(1, (10, 11, 12)), (2, (11, 13)), (3, (12, 13, 14))]:
            for a in grp:
                for b in grp:
                    if a != b:
                        edges.add((a, b))
        for wid, steps in walks.items():
            assert sorted(steps) == list(range(graph.RANDOM_WALK_LEN + 1))
            assert steps[0] == wid
            for t in range(graph.RANDOM_WALK_LEN):
                assert (steps[t], steps[t + 1]) in edges
        again = graph.q_randomwalk_corpus(spark, d).collect()
        assert [tuple(r) for r in again] == [tuple(r) for r in out]

    def test_single_edge_graph_alternates(self, spark, tmp_path):
        """With one undirected edge the only possible hop is the other
        endpoint, so each walk strictly alternates between the two."""
        d = _write_graph(spark, tmp_path, [(1, 7), (1, 8)])
        out = graph.q_randomwalk_corpus(spark, d).collect()
        walks: dict[int, dict[int, int]] = {}
        for r in out:
            walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
        assert set(walks) == {7, 8}
        for wid, steps in walks.items():
            other = 15 - wid
            for t in range(graph.RANDOM_WALK_LEN + 1):
                assert steps[t] == (wid if t % 2 == 0 else other)


class TestWedgePairPacking:
    def test_fallback_path_matches_packed_path(self, spark, tmp_path):
        """Node ids past 2^32 disable the packed BIGINT pair key; the
        two-column fallback must produce the isomorphic result. Graph:
        orders (A,B,C) and (A,B,D) make (C,D) the unique non-adjacent
        pair with full-overlap neighborhoods (jaccard 1.0)."""
        big = 1 << 33
        small_rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 4)]
        big_rows = [(o, big + p) for o, p in small_rows]
        d_small = _write_graph(spark, tmp_path / "s", small_rows)
        d_big = _write_graph(spark, tmp_path / "b", big_rows)
        got_small = graph.q_node_jaccard(spark, d_small).collect()
        got_big = graph.q_node_jaccard(spark, d_big).collect()
        assert [
            (r["u"] + big, r["v"] + big, r["n_common"], r["n_union"], r["jaccard"])
            for r in got_small
        ] == [tuple(r) for r in got_big]
        top = got_big[0]
        assert (top["u"], top["v"]) == (big + 3, big + 4)
        assert top["jaccard"] == 1.0

    def test_adamic_adar_fallback_matches_packed(self, spark, tmp_path):
        small_rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 4)]
        big = 1 << 33
        d_small = _write_graph(spark, tmp_path / "s", small_rows)
        d_big = _write_graph(
            spark, tmp_path / "b", [(o, big + p) for o, p in small_rows]
        )
        got_small = graph.q_adamic_adar(spark, d_small).collect()
        got_big = graph.q_adamic_adar(spark, d_big).collect()
        assert [
            (r["u"] + big, r["v"] + big, r["n_common"], r["aa_score"])
            for r in got_small
        ] == [tuple(r) for r in got_big]


class TestLocalClustering:
    def test_known_coefficients(self, spark, tmp_path):
        """Order (A,B,C) is a triangle (lcc 1.0 at B and C); the extra
        (A,D) edge dilutes A to 2*1/(3*2) = 0.333333; D has d=1 and is
        excluded from the ranking."""
        d = _write_graph(
            spark, tmp_path, [(1, 1), (1, 2), (1, 3), (2, 1), (2, 4)]
        )
        rows = {r["node"]: r for r in graph.q_local_clustering_topk(spark, d).collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[2]["lcc"] == 1.0 and rows[3]["lcc"] == 1.0
        assert rows[1]["lcc"] == 0.333333
        assert rows[1]["n_triangles"] == 1 and rows[1]["degree"] == 3

    def test_triangle_free_graph_ranks_zero(self, spark, tmp_path):
        """A path graph has no triangles: every eligible node ranks at
        exactly 0.0 (left-join coalesce, not dropped)."""
        d = _write_graph(spark, tmp_path, [(1, 1), (1, 2), (2, 2), (2, 3)])
        rows = graph.q_local_clustering_topk(spark, d).collect()
        assert [r["node"] for r in rows] == [2]
        assert rows[0]["lcc"] == 0.0 and rows[0]["n_triangles"] == 0


class TestNdcgSearchEval:
    def test_label_perfect_ranking_scores_one(self, spark, tmp_path):
        """For the 'hash_join' benchmark query: a two-term doc must
        outrank a one-term doc under BM25, so the top-10 is
        label-perfect and ndcg10 = 1.0; gains/discounts come from the
        shared nano-unit constants (hand-checked here)."""
        from kafka_clickhouse_pipeline_spark.operators import search

        spark.createDataFrame(
            [
                (1, "hash join hash", "en", "s", 14),
                (2, "hash probe build", "en", "s", 16),
                (3, "unrelated words only", "en", "s", 20),
            ],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{tmp_path}/documents.parquet")
        rows = {r["query_id"]: r for r in search.q_ndcg_search_eval(spark, str(tmp_path)).collect()}
        assert set(rows) == {"hash_join"}  # other queries match no doc
        r = rows["hash_join"]
        assert r["n_judged"] == 2
        # ideal = actual: doc 1 (rel 2 -> gain 3) first, doc 2 (rel 1
        # -> gain 1) second; dcg_nanos = 3*W1 + 1*W2
        expect = 3 * search.NDCG_W_NANOS[0] + 1 * search.NDCG_W_NANOS[1]
        assert r["dcg10"] == round(expect / 1e9, 6)
        assert r["dcg10"] == r["idcg10"]
        assert r["ndcg10"] == 1.0

    def test_inverted_ranking_scores_below_one(self, spark, tmp_path):
        """If BM25 puts a lower-label doc first (rare-term idf beats
        term coverage), ndcg10 < 1 -- the metric actually measures the
        ranking, not the labels. Construct it: 'join' appears in one
        doc only (high idf), 'hash' floods the corpus (low idf), so
        the rel-1 doc holding rare 'join' outranks a rel-2 doc with
        both terms buried in a long document."""
        from kafka_clickhouse_pipeline_spark.operators import search

        filler = " ".join(["pad"] * 200)
        docs = [
            (1, "hash join " + filler, "en", "s", 10),  # rel 2, long
            (2, "join", "en", "s", 4),                  # rel 1, rare term
        ]
        # make 'hash' common: many hash-only docs
        docs += [(10 + i, "hash", "en", "s", 4) for i in range(8)]
        spark.createDataFrame(
            docs,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{tmp_path}/documents.parquet")
        r = {x["query_id"]: x for x in search.q_ndcg_search_eval(spark, str(tmp_path)).collect()}["hash_join"]
        # doc 1 is the only rel-2 doc; if it is not ranked first the
        # metric must dip below 1.0 -- and with 'join' idf shared by
        # docs 1 and 2 but doc 1 diluted by 200 padding tokens, BM25
        # prefers doc 2
        assert r["n_judged"] == 10
        assert r["ndcg10"] < 1.0


class TestPaddingWaste:
    def test_bucket_assignment_and_truncation(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators import curation

        spark.createDataFrame(
            [
                (1, " ".join(["t"] * 10), "en", "s", 10),
                (2, " ".join(["t"] * 64), "en", "s", 64),
                (3, " ".join(["t"] * 100), "en", "s", 100),
                (4, " ".join(["t"] * 2000), "en", "s", 2000),
            ],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{tmp_path}/documents.parquet")
        rows = {r["seq_cap"]: r for r in curation.q_padding_waste(spark, str(tmp_path)).collect()}
        assert rows[64]["n_docs"] == 2  # 10-token and exactly-64-token
        assert rows[64]["kept_tokens"] == 74 and rows[64]["padding_tokens"] == 54
        assert rows[128]["n_docs"] == 1 and rows[128]["padding_tokens"] == 28
        assert rows[1024]["n_docs"] == 1
        assert rows[1024]["padding_tokens"] == 0
        assert rows[1024]["truncated_tokens"] == 976
        assert rows[64]["waste_frac"] == round(54 / 128, 6)


class TestBrandAssortativity:
    def _write(self, spark, d, li_rows, brands):
        spark.createDataFrame(
            li_rows, "l_orderkey bigint, l_partkey bigint"
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            brands, "p_partkey bigint, p_brand string"
        ).write.parquet(f"{d}/part.parquet")
        return str(d)

    def test_perfectly_assortative(self, spark, tmp_path):
        """Two same-brand cliques, no cross-brand edges: r = 1.0."""
        from kafka_clickhouse_pipeline_spark.operators import graph

        d = self._write(
            spark, tmp_path,
            [(1, 1), (1, 2), (2, 3), (2, 4)],
            [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        )
        r = graph.q_brand_assortativity(spark, d).collect()[0]
        assert r["n_directed_edges"] == 4 and r["n_same_brand"] == 4
        assert r["assortativity"] == 1.0

    def test_perfectly_disassortative(self, spark, tmp_path):
        """Only cross-brand edges between two brands: r = -1.0."""
        from kafka_clickhouse_pipeline_spark.operators import graph

        d = self._write(
            spark, tmp_path,
            [(1, 1), (1, 3), (2, 2), (2, 4)],
            [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        )
        r = graph.q_brand_assortativity(spark, d).collect()[0]
        assert r["n_same_brand"] == 0
        assert r["assortativity"] == -1.0


class TestHitsPurchases:
    def test_two_rounds_differ_from_degree(self, spark, tmp_path):
        """c1 buys {p1,p2}; c2, c3 buy {p1}. Hand-unrolled two rounds:
        a2(p1)=10, a2(p2)=4, h2(c1)=14, h2(c2)=h2(c3)=10 -- round two
        separates c1 from c2/c3 where raw degree alone would not
        separate p2's buyers."""
        from kafka_clickhouse_pipeline_spark.operators import graph

        spark.createDataFrame(
            [(1, 101), (1, 102), (2, 101), (3, 101)],
            "l_orderkey bigint, l_partkey bigint",
        ).write.parquet(f"{tmp_path}/lineitem.parquet")
        spark.createDataFrame(
            [(1, 11), (2, 12), (3, 13)],
            "o_orderkey bigint, o_custkey bigint",
        ).write.parquet(f"{tmp_path}/orders.parquet")
        rows = graph.q_hits_purchases(spark, str(tmp_path)).collect()
        auth = [(r["node"], r["score"], r["score_norm"]) for r in rows if r["role"] == "authority"]
        hub = [(r["node"], r["score"], r["score_norm"]) for r in rows if r["role"] == "hub"]
        assert auth == [(101, "10", 1.0), (102, "4", 0.4)]
        assert hub == [(11, "14", 1.0), (12, "10", 0.714286), (13, "10", 0.714286)]


class TestKaplanMeier:
    def test_product_limit_with_censoring(self, spark, tmp_path):
        """Four users: A spans day 0..10 (last event at the cutoff ->
        censored), B churns at lifetime 1, C at 0, D at 3. KM must
        step 0.75 -> 0.5 -> 0.25 with risk sets 4/3/2 -- a naive curve
        that counts A as churned would differ."""
        from datetime import datetime

        from kafka_clickhouse_pipeline_spark.operators import curation

        def e(i, day, uid):
            return (i, datetime(2024, 3, 1 + day), uid, "view", 1.0, "{}")

        rows = [e(1, 0, 1), e(2, 10, 1),   # A censored (active at cutoff)
                e(3, 0, 2), e(4, 1, 2),    # B churn t=1
                e(5, 0, 3),                # C churn t=0
                e(6, 0, 4), e(7, 3, 4)]    # D churn t=3
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        out = curation.q_kaplan_meier(spark, str(tmp_path)).collect()
        assert [(r["t_days"], r["n_risk"], r["n_churned"]) for r in out] == [
            (0, 4, 1), (1, 3, 1), (3, 2, 1),
        ]
        assert [r["km_survival"] for r in out] == [0.75, 0.5, 0.25]
        assert [r["hazard"] for r in out] == [0.25, 0.333333, 0.5]

    def test_everyone_churns_ends_at_zero(self, spark, tmp_path):
        """d == n at the final lifetime: survival must short-circuit
        to exactly 0.0, never ln(0)."""
        from datetime import datetime

        from kafka_clickhouse_pipeline_spark.operators import curation

        rows = [
            (1, datetime(2024, 3, 1), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 3, 1), 2, "view", 1.0, "{}"),
            (3, datetime(2024, 3, 21), 3, "view", 1.0, "{}"),
            (4, datetime(2024, 3, 21), 3, "view", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        out = curation.q_kaplan_meier(spark, str(tmp_path)).collect()
        # all three users have lifetime 0; users 1,2 churned, user 3
        # is censored (active on the cutoff day) -> one step, S = 1/3
        assert [(r["t_days"], r["n_risk"], r["n_churned"]) for r in out] == [(0, 3, 2)]
        assert out[0]["km_survival"] == 0.333333


class TestSessionInvariants:
    """Property-style invariants for the continuation-batch operators,
    fuzzed over hypothesis-generated inputs (the oracle proves
    equality; these prove the SEMANTICS hold off the fixture path)."""

    def test_kaplan_meier_survival_monotone_nonincreasing(self, spark, tmp_path):
        from datetime import datetime, timedelta
        from random import Random

        from kafka_clickhouse_pipeline_spark.operators import curation

        rng = Random(11)
        rows = []
        eid = 0
        for uid in range(40):
            start = rng.randrange(0, 20)
            span = rng.randrange(0, 25)
            for day in sorted({start, start + span, start + rng.randrange(0, span + 1)}):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 5, 1) + timedelta(days=day), uid,
                     "view", 1.0, "{}")
                )
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{tmp_path}/events.parquet")
        out = curation.q_kaplan_meier(spark, str(tmp_path)).collect()
        assert out, "fuzz graph produced no churn steps"
        surv = [r["km_survival"] for r in out]
        assert all(0.0 <= s <= 1.0 for s in surv)
        assert all(a >= b for a, b in zip(surv, surv[1:])), surv
        # risk sets shrink strictly along the step curve
        risks = [r["n_risk"] for r in out]
        assert all(a > b for a, b in zip(risks, risks[1:]))
        assert all(r["n_churned"] <= r["n_risk"] for r in out)

    def test_padding_waste_accounting_identity(self, spark, tmp_path):
        from random import Random

        from kafka_clickhouse_pipeline_spark.operators import curation

        rng = Random(5)
        lens = [rng.randrange(1, 1500) for _ in range(120)]
        spark.createDataFrame(
            [(i, " ".join(["t"] * n), "en", "s", n) for i, n in enumerate(lens)],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.parquet(f"{tmp_path}/documents.parquet")
        rows = curation.q_padding_waste(spark, str(tmp_path)).collect()
        caps = curation.PADDING_CAPS
        assert sum(r["n_docs"] for r in rows) == len(lens)
        # kept + truncated re-assembles the exact corpus token count
        assert sum(r["kept_tokens"] + r["truncated_tokens"] for r in rows) == sum(lens)
        for r in rows:
            assert r["seq_cap"] in caps
            # a full bucket is exactly cap * n_docs cells
            assert r["kept_tokens"] + r["padding_tokens"] == r["seq_cap"] * r["n_docs"]
            assert 0.0 <= r["waste_frac"] < 1.0
            if r["seq_cap"] != caps[-1]:
                assert r["truncated_tokens"] == 0

    def test_randomwalk_distribution_follows_adjacency(self, spark, tmp_path):
        """Frequency sanity on a star: from the hub every spoke is
        reachable with ~uniform probability under the md5 coin; all
        odd steps from the hub-seeded walk land on spokes, all even
        back on the hub."""
        from kafka_clickhouse_pipeline_spark.operators import graph

        rows = [(100 + i, 1) for i in range(6)] + [
            (100 + i, 10 + i) for i in range(6)
        ]
        d = _write_graph(spark, tmp_path, rows)
        out = graph.q_randomwalk_corpus(spark, d).collect()
        walks = {}
        for r in out:
            walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
        hub_walk = walks.get(1)
        if hub_walk:  # hub among md5-selected seeds
            for t, node in hub_walk.items():
                if t % 2 == 0:
                    assert node == 1
                else:
                    assert node in range(10, 16)


class TestMarkovStationary:
    @staticmethod
    def _events(spark, d, seq_by_user):
        from datetime import datetime, timedelta

        rows, eid = [], 0
        for uid, seq in seq_by_user.items():
            for i, t in enumerate(seq):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 4, 1) + timedelta(minutes=i), uid,
                     t, 1.0, "{}")
                )
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        return str(d)

    def test_symmetric_chain_is_uniform(self, spark, tmp_path):
        """A <-> B alternation: P is the swap matrix, stationary is
        exactly uniform and the fixed point holds every iteration, so
        8 rounds land on exactly SCALE/2 each (no convergence error,
        only the initial floor)."""
        from kafka_clickhouse_pipeline_spark.operators import analytics

        d = self._events(spark, tmp_path, {1: ["A", "B"] * 8})
        out = {r["event_type"]: r for r in analytics.q_markov_stationary(spark, d).collect()}
        assert set(out) == {"A", "B"}
        assert out["A"]["pi_scaled"] == out["B"]["pi_scaled"] == analytics.MARKOV_SCALE // 2
        assert out["A"]["pi"] == out["B"]["pi"] == 0.5

    def test_asymmetric_chain_converges_to_known_fixpoint(self, spark, tmp_path):
        """Sequence AABAAB...: P(A->A)=P(A->B)=1/2, P(B->A)=1; the
        stationary distribution is (2/3, 1/3), second eigenvalue -1/2
        so 8 power-iteration rounds sit within ~2^-8 of it."""
        from kafka_clickhouse_pipeline_spark.operators import analytics

        d = self._events(spark, tmp_path, {1: ["A", "A", "B"] * 12})
        out = {r["event_type"]: r["pi"] for r in analytics.q_markov_stationary(spark, d).collect()}
        assert abs(out["A"] - 2 / 3) < 5e-3, out
        assert abs(out["B"] - 1 / 3) < 5e-3, out
        # integer floors only ever LOSE mass: total stays in (0.99, 1]
        assert 0.99 < out["A"] + out["B"] <= 1.0

    def test_dangling_target_restricted_to_recurrent_core(self, spark, tmp_path):
        """A type that never transitions OUT (terminal 'Z' at the end
        of the only sequence) is excluded from the chain's state space
        -- the iteration stays row-stochastic instead of leaking all
        mass into an absorbing state the data never exits."""
        from kafka_clickhouse_pipeline_spark.operators import analytics

        d = self._events(spark, tmp_path, {1: ["A", "B"] * 6 + ["Z"]})
        out = {r["event_type"]: r["pi"] for r in analytics.q_markov_stationary(spark, d).collect()}
        assert "Z" not in out
        assert set(out) == {"A", "B"}
