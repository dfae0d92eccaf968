"""Behavioral tests for the round-4 third-batch operators (event
transitions, SCD2 history, BFS hops, Z-order layout audit, boilerplate
n-grams). Oracle parity is covered by the strict sweep; these pin the
semantics the oracle alone can't prove."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators import analytics, curation, graph, zorder
from kafka_clickhouse_pipeline_spark.schemas import DOCUMENTS_SCHEMA


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def crafted_events_dir(spark, tmp_path_factory):
    """User 1: view -> view -> cart -> view. User 2: cart -> cart."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(1), 1, "view", 1.0, "{}"),
        (3, ts(2), 1, "cart", 1.0, "{}"),
        (4, ts(3), 1, "view", 1.0, "{}"),
        (5, ts(0), 2, "cart", 1.0, "{}"),
        (6, ts(5), 2, "cart", 1.0, "{}"),
    ]
    return _write_events(spark, tmp_path_factory.mktemp("crafted_events"), rows)


def test_event_transitions_counts_and_probs(spark, crafted_events_dir):
    rows = {
        (r["prev_type"], r["next_type"]): r
        for r in analytics.q_event_transitions(spark, crafted_events_dir).collect()
    }
    # user 1 contributes view->view, view->cart, cart->view;
    # user 2 contributes cart->cart
    assert rows[("view", "view")]["n_transitions"] == 1
    assert rows[("view", "cart")]["n_transitions"] == 1
    assert rows[("cart", "view")]["n_transitions"] == 1
    assert rows[("cart", "cart")]["n_transitions"] == 1
    assert rows[("cart", "view")]["p"] == 0.5
    assert rows[("cart", "cart")]["p"] == 0.5
    assert rows[("view", "view")]["p"] == 0.5


def test_event_transitions_rows_normalize(spark, sf_dir):
    rows = analytics.q_event_transitions(spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    for prev, total in by_prev.items():
        assert total == pytest.approx(1.0, abs=1e-4), prev


def test_scd2_collapses_runs_and_versions(spark, crafted_events_dir):
    rows = analytics.q_scd2_user_status(spark, crafted_events_dir).collect()
    u1 = [r for r in rows if r["user_id"] == 1]
    u2 = [r for r in rows if r["user_id"] == 2]
    # user 1: view, cart, view (consecutive duplicate view collapsed)
    assert [r["status"] for r in u1] == ["view", "cart", "view"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # intervals abut: valid_to of row k == valid_from of row k+1
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to"] == b["valid_from"]
    # exactly one open (current) interval per user
    assert [r["is_current"] for r in u1] == [0, 0, 1]
    # user 2: consecutive carts collapse to a single current run
    assert [(r["status"], r["is_current"]) for r in u2] == [("cart", 1)]


def test_scd2_one_current_per_user(spark, sf_dir):
    rows = analytics.q_scd2_user_status(spark, sf_dir).collect()
    current: dict[int, int] = {}
    for r in rows:
        current[r["user_id"]] = current.get(r["user_id"], 0) + r["is_current"]
    assert current and all(v == 1 for v in current.values())


@pytest.fixture(scope="module")
def crafted_graph_dir(spark, tmp_path_factory):
    """Co-purchase path graph 1-2-3-4-5-6 plus isolated pair 7-8:
    orders are the edges (each order holds the two endpoint parts).
    Part 1 is the only seed (1 % 100 == 1)."""
    d = tmp_path_factory.mktemp("crafted_graph")
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (7, 8)]
    rows = []
    for ok, (a, b) in enumerate(pairs):
        rows.append((ok, a))
        rows.append((ok, b))
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{d}/lineitem.parquet")
    return str(d)


def test_bfs_hops_distances_and_truncation(spark, crafted_graph_dir):
    rows = {
        r["node"]: r["hops"]
        for r in graph.q_bfs_hops(spark, crafted_graph_dir).collect()
    }
    # seed at 0 hops; path distances; node 5 is 4 hops away -> cut at 3;
    # the 7-8 component is unreachable
    assert rows == {1: 0, 2: 1, 3: 2, 4: 3}


def test_zorder_blocks_bound_both_dimensions(spark, sf_dir):
    rows = {r["layout"]: r for r in zorder.q_zorder_layout(spark, sf_dir).collect()}
    z, rm = rows["zorder"], rows["rowmajor"]
    # a 64-cell Z block is an 8x8 tile: both spans bounded by 7
    assert z["max_x_span"] <= 7 and z["max_y_span"] <= 7
    # a 64-cell row-major block is a 64x1 strip: y perfectly clustered,
    # x unbounded up to 63
    assert rm["max_y_span"] == 0
    assert rm["max_x_span"] > 7
    # balanced pruning: the worse dimension of Z-order beats the worse
    # dimension of row-major
    assert max(z["avg_x_span"], z["avg_y_span"]) < rm["avg_x_span"]


def test_morton_interleave_formula(spark):
    df = spark.range(1).select(
        zorder.morton_interleave(F.lit(0b1010), F.lit(0b0110)).alias("z")
    )
    # x=0b1010 even bits, y=0b0110 odd bits -> z = 0b01101100
    assert df.first()["z"] == 0b01101100


@pytest.fixture(scope="module")
def crafted_boiler_dir(spark, tmp_path_factory):
    """Source A: 3 docs, two share the 5-gram 'the quick brown fox
    jumps' (df=2 >= max(2, ceil(0.3))) -> boilerplate. Source B: 1 doc
    with the SAME phrase -- but alone in its source, not boilerplate.
    Doc 3 is too short to shingle."""
    d = tmp_path_factory.mktemp("crafted_boiler")
    phrase = "the quick brown fox jumps"
    rows = [
        (0, f"{phrase} over things", "en", "A", 0),
        (1, f"intro words {phrase}", "en", "A", 0),
        (2, "totally unrelated content here now", "en", "A", 0),
        (3, "too short", "en", "A", 0),
        (4, f"{phrase} again", "en", "B", 0),
    ]
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


def test_boilerplate_is_source_scoped_frequency(spark, crafted_boiler_dir):
    rows = {
        r["doc_id"]: r
        for r in curation.q_boilerplate_ngrams(spark, crafted_boiler_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4}
    # docs 0 and 1 each contain the shared gram once among their grams
    assert rows[0]["n_boilerplate"] == 1 and rows[0]["n_grams"] == 3
    assert rows[1]["n_boilerplate"] == 1 and rows[1]["n_grams"] == 3
    # unrelated doc: nothing flagged
    assert rows[2]["n_boilerplate"] == 0
    # short doc: zero grams, frac 0.0 (not NULL)
    assert rows[3]["n_grams"] == 0 and rows[3]["boilerplate_frac"] == 0.0
    # same phrase in source B is NOT boilerplate there (df=1 in B)
    assert rows[4]["n_boilerplate"] == 0
    assert rows[0]["boilerplate_frac"] == pytest.approx(1 / 3, abs=1e-6)


@pytest.fixture(scope="module")
def crafted_media_dir(spark, tmp_path_factory):
    """Payloads with known gradient structure: 0 and 1 are
    byte-identical (hamming 0), 2 is monotonically increasing
    (all-ones hash), 3 monotonically decreasing (all-zeros hash)."""
    d = tmp_path_factory.mktemp("crafted_media")
    inc = "".join(chr(33 + i) for i in range(61))
    dec = "".join(chr(33 + 60 - i) for i in range(61))
    rows = [
        (0, "shared identical payload text here", "en", "A", 0),
        (1, "shared identical payload text here", "en", "A", 0),
        (2, inc, "en", "A", 0),
        (3, dec, "en", "A", 0),
    ]
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


def test_phash_gradient_extremes(spark, crafted_media_dir):
    from kafka_clickhouse_pipeline_spark.operators import multimodal as mm

    rows = {r["doc_id"]: r["phash"] for r in mm.q_media_phash(spark, crafted_media_dir).collect()}
    # 61 strictly increasing bytes sample to themselves: every adjacent
    # gradient bit fires -> all PHASH_BITS ones
    assert rows[2] == (1 << mm.PHASH_BITS) - 1
    # strictly decreasing: no gradient bit fires
    assert rows[3] == 0
    assert rows[0] == rows[1]
    assert 0 <= rows[0] < (1 << mm.PHASH_BITS)


def test_phash_neardup_finds_identical_not_distant(spark, crafted_media_dir):
    from kafka_clickhouse_pipeline_spark.operators import multimodal as mm

    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in mm.q_media_phash_neardup(spark, crafted_media_dir).collect()
    }
    # identical payloads matched at distance 0; the all-ones/all-zeros
    # pair (distance 60) and every cross pair stay out
    assert pairs == {(0, 1): 0}


@pytest.fixture(scope="module")
def crafted_trend_dir(spark, tmp_path_factory):
    """'linear' events follow value = 5 + 2*hours_since_anchor exactly;
    'flat' events are constant."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)  # == advanced.TREND_ANCHOR
    rows = []
    eid = 0
    for h in range(10):
        rows.append((eid, t0 + datetime.timedelta(hours=h), 1, "linear", 5.0 + 2.0 * h, "{}"))
        eid += 1
        rows.append((eid, t0 + datetime.timedelta(hours=h), 1, "flat", 7.5, "{}"))
        eid += 1
    d = tmp_path_factory.mktemp("crafted_trend")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


def test_trend_recovers_exact_line(spark, crafted_trend_dir):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    rows = {
        r["event_type"]: r
        for r in advanced.q_trend_by_type(spark, crafted_trend_dir).collect()
    }
    lin, flat = rows["linear"], rows["flat"]
    # 2 per hour == 48 per day; intercept at the anchor == 5
    assert lin["slope_per_day"] == pytest.approx(48.0, abs=1e-6)
    assert lin["intercept"] == pytest.approx(5.0, abs=1e-6)
    assert flat["slope_per_day"] == pytest.approx(0.0, abs=1e-9)
    assert flat["intercept"] == pytest.approx(7.5, abs=1e-6)


def test_chi2_zero_under_exact_independence(spark, tmp_path_factory):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    # 2 types x 2 hours, equal counts everywhere -> observed == expected
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for etype in ("a", "b"):
        for h in (3, 9):
            for _ in range(5):
                rows.append((eid, t0 + datetime.timedelta(hours=h), 1, etype, 1.0, "{}"))
                eid += 1
    d = tmp_path_factory.mktemp("chi2_indep")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    r = advanced.q_chi2_type_hour(spark, str(d)).first()
    assert r["chi2"] == 0.0
    assert r["n"] == 20 and r["n_types"] == 2 and r["n_hours"] == 2 and r["dof"] == 1


def test_chi2_fixture_sane(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    r = advanced.q_chi2_type_hour(spark, sf_dir).first()
    assert r["chi2"] >= 0.0
    assert r["dof"] == (r["n_types"] - 1) * (r["n_hours"] - 1)


def test_benford_frequencies_are_distributions(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    rows = advanced.q_benford_totalprice(spark, sf_dir).collect()
    assert set(r["digit"] for r in rows) <= set(range(1, 10))
    assert sum(r["obs_freq"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert r["exp_freq"] == advanced.BENFORD_EXPECTED[r["digit"]]
        assert r["deviation"] == pytest.approx(r["obs_freq"] - r["exp_freq"], abs=2e-6)


def test_constraint_audit_clean_fixture_passes(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.operators import constraints

    rows = constraints.q_constraint_audit(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r["passed"] == 1 and r["n_violations"] == 0 for r in rows), [
        (r["check_name"], r["n_violations"]) for r in rows if r["passed"] == 0
    ]
    assert all(r["n_checked"] > 0 for r in rows)


def test_constraint_audit_detects_violations(spark, tmp_path_factory):
    from kafka_clickhouse_pipeline_spark.operators import constraints

    d = tmp_path_factory.mktemp("corrupt_wh")
    # duplicate order key + orphan custkey 999
    spark.createDataFrame(
        [(1, 10, 100.0), (1, 999, 50.0)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(10, "seg")], "c_custkey bigint, c_mktsegment string"
    ).write.parquet(f"{d}/customer.parquet")
    # orphan lineitem order 7
    spark.createDataFrame(
        [(1, 5), (7, 6)], "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{d}/lineitem.parquet")
    import datetime

    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2), 1, "view", None, "{}"),
         (2, datetime.datetime(2024, 1, 3), 1, "view", -5.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [(0, "  ", "en", "A", 2)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")

    rows = {
        r["check_name"]: r
        for r in constraints.q_constraint_audit(spark, str(d)).collect()
    }
    assert rows["orders.o_orderkey unique"]["n_violations"] == 1
    assert rows["orders.o_custkey -> customer.c_custkey"]["n_violations"] == 1
    assert rows["lineitem.l_orderkey -> orders.o_orderkey"]["n_violations"] == 1
    assert rows["events.value complete"]["n_violations"] == 1
    assert rows["events.value >= 0"]["n_violations"] == 1
    assert rows["documents.text non-empty"]["n_violations"] == 1
    assert all(r["passed"] == 0 for n, r in rows.items()
               if n != "customer.c_custkey unique")


def test_psi_zero_for_identical_halves(spark, tmp_path_factory):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    # same per-bin counts in both halves -> every contribution is 0
    t_first = datetime.datetime(2024, 1, 5, 0, 0, 0)
    t_second = datetime.datetime(2024, 1, 25, 0, 0, 0)
    rows = []
    eid = 0
    for t in (t_first, t_second):
        for v in (5.0, 5.0, 30.0, 75.0, 200.0):
            rows.append((eid, t, 1, "view", v, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("psi_same")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    out = advanced.q_psi_value_drift(spark, str(d)).collect()
    assert len(out) == len(advanced.PSI_BINS)
    assert all(r["psi_contrib"] == 0.0 for r in out)
    # the empty 10_25 bin still emits a row (smoothed, equal -> 0)
    assert any(r["bin"] == "10_25" and r["n_first"] == 0 for r in out)


def test_psi_fixture_is_distribution_and_finite(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.operators import advanced

    out = advanced.q_psi_value_drift(spark, sf_dir).collect()
    assert len(out) == len(advanced.PSI_BINS)
    assert sum(r["p_first"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["p_second"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # PSI contributions are always >= 0 ((p-q) and ln(p/q) share sign)
    assert all(r["psi_contrib"] >= 0.0 for r in out)
