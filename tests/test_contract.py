"""Meta-tests on the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_rows_only_queries_are_documented():
    """Every rows-only query must state why in its docstring (the judge
    sees which queries lack oracles; the reason must be discoverable)."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name in set(q) - set(o):
        doc = (q[name].__doc__ or "").lower()
        assert "rows-only" in doc or "approximate" in doc or "oracle" in doc, name


def test_all_queries_are_callables_with_two_args():
    """The driver calls fn(spark, sf_dir) positionally: exactly two
    positional parameters, and anything extra (scale knobs like
    q_dedup_embedding_lsh's geometry) must be keyword-only WITH a
    default."""
    import inspect

    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        positional = [
            p
            for p in params
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
        ]
        assert len(positional) == 2, name
        for p in params[2:]:
            assert p.kind == p.KEYWORD_ONLY and p.default is not p.empty, (
                name,
                p.name,
            )


def test_window_is_50_oracle_backed_with_new_operators():
    """Driver window contract after the r4 rotation: exactly the first
    50 queries() entries form the attested window, every one is
    oracle-backed, and both never-attested cohorts -- the round-3
    operators VERDICT r3 #1 named and the round-4 additions -- are
    inside it."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    window = list(q)[:50]
    assert len(window) == 50
    assert tuple(window) == entrymod.PRIORITY
    assert all(n in o for n in window), [n for n in window if n not in o]
    rotated_in = {
        # round-3 cohort (VERDICT r3 #1)
        "q_knn_graph",
        "q_semantic_dedup",
        "q_dedup_embedding_lsh",
        "q_decontaminate_bloom",
        "q_repetition_filters",
        "q_bpe_pair_counts",
        "q_paragraph_dedup",
        "q_triangle_count_copurchase",
        # round-4 cohort
        "q_fuzzy_match_parts",
        "q_fuzzy_canonical_parts",
        "q_label_propagation",
        "q_bpe_train_merges",
        "q_tokenize_bpe_apply",
        "q_embedding_int8_quantize",
        "q_hard_negatives",
        "q_triplet_mining",
        "q_ann_recall_audit",
        "q_quality_classifier_hashed",
        "q_dedup_incremental_near",
        "q_dsir_importance",
        "q_oov_rate",
        "q_cluster_topics",
        "q_quota_sample",
        "q_embedding_top_pc",
        "q_kcore_mutual_knn",
        # round-4 fifth batch
        "q_event_transitions",
        "q_scd2_user_status",
        "q_trend_by_type",
        "q_chi2_type_hour",
        "q_benford_totalprice",
        "q_zorder_layout",
        "q_boilerplate_ngrams",
        "q_media_phash",
        "q_bfs_hops",
        # round-4 eighth batch: extended dialect acceptance
        "q_dialect_flags_report",
        # round-4 seventh batch (governance / drift)
        "q_constraint_audit",
        "q_psi_value_drift",
        # round-4 ninth batch (stats, evaluation, association, graph)
        "q_ks_value_drift",
        "q_autocorr_hourly",
        "q_gini_customer_revenue",
        "q_classifier_auc",
        "q_calibration_bins",
        "q_basket_lift",
        "q_node_jaccard",
        "q_key_skew_audit",
    }
    assert rotated_in <= set(window), rotated_in - set(window)


def test_strict_sweep_agrees_with_latest_driver_correctness():
    """Window-rotation safety net (VERDICT r3 #8): the committed
    STRICT_CHECK.json (latest local sweep) must not diverge from the
    latest driver CORRECTNESS file on the queries both covered —
    strict-ok + driver-fail would mean the local sweep cannot be
    trusted to predict window rotations."""
    import json
    import os

    from tools.strict_check import diff_vs_latest_correctness

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    strict_path = os.path.join(root, "STRICT_CHECK.json")
    if not os.path.exists(strict_path):
        return  # no local sweep committed yet; nothing to diff
    with open(strict_path) as f:
        strict_report = json.load(f)
    assert diff_vs_latest_correctness(strict_report, root) == []
