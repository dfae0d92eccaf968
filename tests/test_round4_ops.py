"""Behavioral tests for the round-4 operator additions (oracle parity
is covered by the strict sweep; these check the semantics the oracle
alone can't prove)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators import (
    curation,
    graph,
    linkage,
    similarity,
    text,
)


def test_blocked_fuzzy_pairs_crafted():
    """The generic blocked fuzzy join on crafted records: typo pairs
    inside a block match, cross-block twins never compare (blocking is
    a hard boundary), distances are exact Levenshtein."""
    from kafka_clickhouse_pipeline_spark.session import get_spark

    spark = get_spark(app_name="tests")
    recs = spark.createDataFrame(
        [
            (1, "blk_a", "widget deluxe"),
            (2, "blk_a", "widgett deluxe"),   # 1 edit from #1
            (3, "blk_a", "completely other"),
            (4, "blk_b", "widget deluxe"),    # identical text, other block
            (5, "blk_a", "widget deluxe"),    # exact twin of #1
        ],
        "rid INT, blk STRING, name STRING",
    )
    pairs = {
        (r["rid"], r["rid_2"]): r["distance"]
        for r in linkage.blocked_fuzzy_pairs(
            recs, ["blk"], "rid", "name", max_distance=3
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 5): 0, (2, 5): 1}


def test_fuzzy_match_blocking_and_symmetry(spark, sf_dir):
    """Every emitted pair shares the full blocking key, respects the
    id ordering and the distance cap, and identical names match at
    distance 0. (The sf0.001 smoke fixture's 10 blocked pairs contain
    no fuzzy link -- the invariants still bind whatever the SF; the
    227-match sf0.01 behavior is pinned by the strict oracle sweep.)"""
    rows = linkage.q_fuzzy_match_parts(spark, sf_dir).collect()
    for r in rows:
        assert r["p1"] < r["p2"]
        assert 0 <= r["distance"] <= linkage.FUZZY_MAX_DISTANCE
        if r["name_1"] == r["name_2"]:
            assert r["distance"] == 0


def test_fuzzy_canonical_covers_all_parts(spark, sf_dir):
    """Keeper selection: every part appears exactly once, canonical_id
    <= p_partkey (min-id adoption), and parts without links keep
    themselves."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = linkage.q_fuzzy_canonical_parts(spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert len(rows) == n_parts
    assert len({r["p_partkey"] for r in rows}) == n_parts
    for r in rows:
        assert r["canonical_id"] <= r["p_partkey"]


def test_label_propagation_labels_are_nodes(spark, sf_dir):
    """Every community label is itself a node of the graph, every node
    gets exactly one label, and a second run reproduces the labeling
    bit-for-bit (synchronous determinism is the operator's point)."""
    rows = graph.q_label_propagation(spark, sf_dir).collect()
    nodes = {r["partkey"] for r in rows}
    assert len(rows) == len(nodes)
    assert {r["community"] for r in rows} <= nodes
    again = graph.q_label_propagation(spark, sf_dir).collect()
    assert [(r["partkey"], r["community"]) for r in rows] == [
        (r["partkey"], r["community"]) for r in again
    ]


def test_bpe_train_merges_greedy_invariants(spark, sf_dir):
    """The merge table is BPE_MERGES rows of strictly-ranked greedy
    merges: rounds increase, merged = left || right, counts are
    non-increasing (merging can only remove pair occurrences or create
    pairs bounded by the merged count), and all merges are distinct."""
    rows = text.q_bpe_train_merges(spark, sf_dir).collect()
    assert len(rows) == text.BPE_MERGES
    assert [r["round"] for r in rows] == list(range(1, text.BPE_MERGES + 1))
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in rows)
    assert len({r["merged"] for r in rows}) == len(rows)
    assert all(r["n_occurrences"] > 0 for r in rows)


def test_int8_quantize_error_bound(spark, sf_dir):
    """Round-to-nearest symmetric quantization: reconstruction error
    is bounded by scale/2 per element, and the code sum stays within
    the +-127 * dim envelope."""
    rows = similarity.q_embedding_int8_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["scale"] >= 0
        # rounded outputs: allow the 1e-6 rounding slack on both sides
        assert r["max_abs_err"] <= r["scale"] / 2 + 2e-6, r
        assert abs(r["q_sum"]) <= 127 * 64
        assert r["mse"] <= (r["scale"] / 2 + 2e-6) ** 2 + 2e-6


def test_hard_negatives_labels_differ_and_bounded_by_exact(spark, sf_dir):
    """Every mined negative has a different label, and its similarity
    never exceeds the TRUE hardest negative (the LSH candidate set is
    a subset of all pairs, so the banded argmax is a lower bound)."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    mined = similarity.q_hard_negatives(spark, sf_dir).collect()
    assert mined
    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in mined:
        assert r["neg_label"] != r["label"]
        assert labels[r["negative_id"]] == r["neg_label"]
        assert -1.0 <= r["cosine"] <= 1.0

    # exact hardest negative for a few vectors via brute force
    vecs = {
        r["vec_id"]: r["v"]
        for r in similarity._vectors(spark, sf_dir).collect()
    }

    def cos(u, v):
        du = sum(a * b for a, b in zip(u, v))
        nu = sum(a * a for a in u) ** 0.5
        nv = sum(b * b for b in v) ** 0.5
        return du / (nu * nv)

    for r in mined[:5]:
        qid = r["query_id"]
        exact_best = max(
            cos(vecs[qid], v)
            for vid, v in vecs.items()
            if vid != qid and labels[vid] != labels[qid]
        )
        assert r["cosine"] <= exact_best + 1e-6


def test_bpe_apply_counts_bounded_by_chars(spark, sf_dir):
    """Applying merges can only shrink the symbol stream: per document,
    n_bpe_tokens is at most the raw character count of its words and
    at least n_words (every word is >= 1 symbol)."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = {r["doc_id"]: r for r in text.q_tokenize_bpe_apply(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert rows
    for d in docs[:50]:
        r = rows[d["doc_id"]]
        words = d["text"].strip().split()
        n_chars = sum(len(w) for w in words) if words else 1
        assert r["n_words"] >= 1
        assert r["n_words"] <= r["n_bpe_tokens"] <= max(n_chars, 1), (
            d["doc_id"],
            r,
        )


def test_ann_recall_audit_consistency(spark, sf_dir):
    """The audit's per-query recall must equal the overlap computed
    independently from the two top-k results, and n_true equals the
    brute-force row count per query."""
    audit = {r["query_id"]: r for r in similarity.q_ann_recall_audit(spark, sf_dir).collect()}
    bf: dict[int, set] = {}
    for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    lsh: dict[int, set] = {}
    for r in similarity.q_ann_lsh_topk(spark, sf_dir).collect():
        lsh.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(audit) == set(bf)
    for q, row in audit.items():
        hits = len(bf[q] & lsh.get(q, set()))
        assert row["n_true"] == len(bf[q])
        assert row["n_hit"] == hits
        assert abs(row["recall"] - hits / len(bf[q])) < 1e-6


def test_quality_classifier_score_semantics(spark, sf_dir):
    """Hashed linear scores are means of [-1, 1) weights, so they stay
    in [-1, 1]; keep is exactly the positive-score predicate; scoring
    is deterministic."""
    rows = curation.q_quality_classifier_hashed(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["score"] <= 1.0
        assert r["keep"] == (r["score"] > 0)
    # a non-degenerate classifier splits the corpus
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows)
