"""Behavioral tests for the round-9 operators. Oracle parity is
covered by the strict sweep; these pin the semantics the oracle alone
can't prove: the occupancy-split knob's identity-on-uniform contract
and its skew payoff (max-share reduction at recall parity)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators import similarity as S


def _write_skewed_embeddings(spark, d, n=600, dim=16, hot_frac=0.5):
    """Synthetic Zipf-style clustered corpus: ``hot_frac`` of vectors
    sit in a TIGHT cone around one direction (the skew ladder's hot
    cluster), the rest are isotropic noise. Hot ids are the ODD
    vec_ids (hot_frac 0.5) so the stride centroids (even multiples of
    n//N_CENTROIDS) all land in the noise -- the whole cone then maps
    to ONE nearest noise centroid and trips the 2x-even-share bound;
    with hot ids on stride multiples instead, the cone seeds its own
    centroids and the skew dissolves (the first draft of this fixture
    measured max_share 0.05: stride picks every ~18th even id)."""
    assert hot_frac in (0.5, 1.0)
    rng = random.Random(9)
    hot = [rng.gauss(0, 1) for _ in range(dim)]
    rows = []
    for i in range(n):
        if hot_frac == 1.0 or i % 2 == 1:
            v = [h + rng.gauss(0, 0.01) for h in hot]
        else:
            v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in v], i % 4))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def _max_share(vecs, centroids):
    """Max bucket share under nearest-centroid assignment against an
    arbitrary centroid set (the q_ivf_bucket_occupancy aggregate)."""
    rows = S._centroid_rows(centroids)
    assigned = vecs.select(
        S._nearest_centroid_udf(rows)(F.col("v")).alias("centroid_id")
    )
    occ = assigned.groupBy("centroid_id").count().collect()
    total = sum(r["count"] for r in occ)
    return max(r["count"] for r in occ) / total


def _recall(spark, sf_dir, fn):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in fn(spark, sf_dir).collect()}
    return len(bf & got) / len(bf)


class TestIvfSplitTopk:
    def test_identity_on_uniform_fixture(self, spark, sf_dir):
        """On the uniform test corpus no stride bucket exceeds 2x the
        even share (measured max_share 0.044 < 0.0625), so the split
        knob must be a NO-OP: byte-identical results to
        q_ann_ivf_topk. This is the knob's core contract -- it only
        pays where skew exists."""
        base = S.q_ann_ivf_topk(spark, sf_dir).collect()
        split = S.q_ann_ivf_split_topk(spark, sf_dir).collect()
        assert [tuple(r) for r in base] == [tuple(r) for r in split]

    def test_split_triggers_and_reduces_max_share_on_skew(
        self, spark, tmp_path
    ):
        """The skew payoff (VERDICT r8 #3): on a hot-cluster corpus
        the stride index concentrates far past the bound; the
        augmented centroid set must (a) actually split -- more
        centroids than the stride index, (b) cut the max bucket share,
        and (c) keep full top-k output shape."""
        d = _write_skewed_embeddings(spark, tmp_path)
        vecs = S._vectors(spark, d)
        cent0 = S._stride_centroids(vecs)
        cent2 = S.split_centroids(vecs)
        share0 = _max_share(vecs, cent0)
        bound = S.IVF_SPLIT_BOUND_NUM / S.N_CENTROIDS
        assert share0 > bound, f"fixture must trip the bound: {share0}"
        assert cent2.count() > cent0.count()
        share2 = _max_share(vecs, cent2)
        assert share2 < share0, (share0, share2)
        out = S.q_ann_ivf_split_topk(spark, d).collect()
        per_query = {}
        for r in out:
            per_query.setdefault(r.query_id, []).append(r.rank)
        assert set(per_query) == set(range(S.N_QUERIES))
        assert all(
            sorted(v) == list(range(1, S.TOP_K + 1))
            for v in per_query.values()
        )

    def test_recall_parity_on_skew(self, spark, tmp_path):
        """Splitting may not buy recall (it exists for straggler /
        memory headroom), but it must not pay for its balance win with
        recall: on the skewed corpus the split index's recall vs brute
        force must be >= the plain stride index's minus a small
        tolerance (one neighbor of the 50)."""
        d = _write_skewed_embeddings(spark, tmp_path)
        r_plain = _recall(spark, d, S.q_ann_ivf_topk)
        r_split = _recall(spark, d, S.q_ann_ivf_split_topk)
        assert r_split >= r_plain - 0.02, (r_plain, r_split)

    def test_small_oversized_bucket_split_is_safe(self, spark, tmp_path):
        """Degenerate geometry: an oversized bucket with fewer members
        than IVF_SPLIT_FACTOR must still re-seed cleanly (q =
        ceil(nv/factor) >= 1 picks every member; no division by zero,
        no duplicate centroid ids)."""
        # 40 vectors, every one in the hot cone -> one giant bucket
        d = _write_skewed_embeddings(spark, tmp_path, n=40, hot_frac=1.0)
        vecs = S._vectors(spark, d)
        cent2 = S.split_centroids(vecs)
        ids = [r["centroid_id"] for r in cent2.collect()]
        assert len(ids) == len(set(ids))
        assert S.q_ann_ivf_split_topk(spark, d).count() > 0


class TestNeardupThresholdMinhash:
    """VERDICT r8 #4: the winning r=2 banding geometry, registered.
    The oracle proves Spark==DuckDB on the banded candidate set; these
    pin the operator-level claims the oracle can't see."""

    def test_planted_twins_all_recovered(self, spark, sf_dir):
        """Every planted twin pair must surface (the regime ladder
        measured recall 1.0 at j in [0.50, 0.64]; the fixture twins
        sit at ~0.7-0.84) and nothing else: the co-purchase background
        tops out at adjacency-jaccard ~0.12, far under the 0.5 floor."""
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.operators import graph as G

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        edges = G.co_purchase_edges(li)
        planted = {
            (r["src"], r["src"] + G.NEARDUP_TWIN_OFFSET)
            for r in edges.filter(
                F.col("src") % G.NEARDUP_TWIN_STRIDE == 0
            )
            .select("src")
            .distinct()
            .collect()
        }
        got = {
            (r["u"], r["v"])
            for r in G.q_neardup_threshold_minhash(spark, sf_dir).collect()
        }
        assert got == planted, (sorted(planted - got), sorted(got - planted))

    def test_threshold_is_exact_integer(self, spark, sf_dir):
        """Every emitted pair satisfies n_common * DEN >= n_union *
        NUM as integers, and the jaccard column is consistent with the
        counts."""
        from kafka_clickhouse_pipeline_spark.operators import graph as G

        for r in G.q_neardup_threshold_minhash(spark, sf_dir).collect():
            assert (
                r["n_common"] * G.NEARDUP_JACCARD_DEN
                >= r["n_union"] * G.NEARDUP_JACCARD_NUM
            )
            assert abs(
                r["jaccard"] - round(r["n_common"] / r["n_union"], 6)
            ) < 1e-12

    def test_general_operator_on_handmade_graph(self, spark):
        """neardup_threshold_pairs on a hand-built graph with one pair
        above and one below the floor: exact expected output (no
        planting involved -- the general operator's contract)."""
        from kafka_clickhouse_pipeline_spark.operators.graph import (
            neardup_threshold_pairs,
        )

        # u=1 and v=2 share 8 of 10 neighbors (j = 8/12 ~ 0.67);
        # u=3 and v=4 share 2 of 10 (j = 2/18 ~ 0.11)
        edges = []
        for n in range(10):
            edges.append((1, 100 + n))
            edges.append((2, 100 + n if n < 8 else 200 + n))
            edges.append((3, 300 + n))
            edges.append((4, 300 + n if n < 2 else 400 + n))
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        rows = neardup_threshold_pairs(df).collect()
        assert [(r["u"], r["v"], r["n_common"], r["n_union"]) for r in rows] == [
            (1, 2, 8, 12)
        ]


class TestSaltedPatterns:
    """The two skew-immunization patterns must be EXACTLY equivalent
    to their unsalted forms (that is their entire contract; the DuckDB
    oracles certify it against plain SQL, these certify it against
    plain Spark) and must actually take the salted physical plans."""

    def test_salted_agg_equals_direct_groupby(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.functions.canon import (
            big,
            money,
        )
        from kafka_clickhouse_pipeline_spark.operators.analytics import (
            DEC,
            SALTED_AGG_TOPK,
            _dec,
            q_salted_agg_revenue,
        )

        li = load_table(spark, sf_dir, "lineitem")
        revenue = (
            _dec("l_extendedprice")
            * (F.lit(1).cast(DEC) - _dec("l_discount"))
        ).cast("decimal(28,4)")
        direct = (
            li.groupBy("l_partkey")
            .agg(
                money(F.sum(revenue), 4).alias("revenue"),
                big(F.count(F.lit(1))).alias("n_items"),
            )
            .select(big("l_partkey").alias("l_partkey"), "revenue", "n_items")
            .orderBy(
                F.col("revenue").cast("decimal(28,4)").desc(), "l_partkey"
            )
            .limit(SALTED_AGG_TOPK)
        )
        assert [tuple(r) for r in q_salted_agg_revenue(spark, sf_dir).collect()] == [
            tuple(r) for r in direct.collect()
        ]

    def test_salted_join_equals_plain_join(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.functions.canon import (
            big,
            money,
        )
        from kafka_clickhouse_pipeline_spark.operators.analytics import (
            _dec,
            q_salted_join_brand_volume,
        )

        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        plain = (
            li.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(
                money(F.sum(_dec("l_quantity"))).alias("total_qty"),
                big(F.count(F.lit(1))).alias("n_items"),
            )
            .orderBy("p_brand")
        )
        assert [
            tuple(r)
            for r in q_salted_join_brand_volume(spark, sf_dir).collect()
        ] == [tuple(r) for r in plain.collect()]

    def test_salted_join_plan_is_shuffled_not_broadcast(self, spark, sf_dir):
        """The dim side is broadcast-able here by size; the pattern
        only demonstrates anything if the hint actually forces the
        shuffled-hash path with the salt in the join keys."""
        from kafka_clickhouse_pipeline_spark.operators.analytics import (
            q_salted_join_brand_volume,
        )

        plan = (
            q_salted_join_brand_volume(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ShuffledHashJoin" in plan, plan[:2000]
        assert "BroadcastHashJoin" not in plan.split("ShuffledHashJoin")[0], (
            "dim side was broadcast despite the hint"
        )

    def test_salted_agg_plan_has_two_aggregate_stages(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.analytics import (
            q_salted_agg_revenue,
        )

        plan = (
            q_salted_agg_revenue(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # (partial, final) per stage x 2 explicit stages
        assert plan.count("HashAggregate") >= 4, plan[:2000]
