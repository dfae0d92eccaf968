"""Behavioral tests for advanced operators (the oracle parity runs in
test_serving.py via the queries()/oracle_sql() contract)."""

from __future__ import annotations

from kafka_clickhouse_pipeline_spark.operators import advanced


def test_rollup_has_all_levels(spark, sf_dir):
    rows = advanced.q_rollup_revenue(spark, sf_dir).collect()
    grand = [r for r in rows if r.c_mktsegment is None and r.o_orderpriority is None]
    subtotals = [r for r in rows if r.c_mktsegment is not None and r.o_orderpriority is None]
    detail = [r for r in rows if r.c_mktsegment is not None and r.o_orderpriority is not None]
    assert len(grand) == 1
    assert len(subtotals) == 5  # five market segments
    assert grand[0].n_orders == sum(r.n_orders for r in subtotals)
    assert grand[0].n_orders == sum(r.n_orders for r in detail)


def test_asof_join_semantics(spark, sf_dir):
    rows = advanced.q_asof_last_signup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.last_signup_ts is not None:
            assert r.last_signup_ts <= r.ts
    # at least one purchase must predate any signup of its user -> null
    # and at least one must have a matched signup (data-dependent but
    # holds for the fixture's uniform event mix)
    assert any(r.last_signup_ts is None for r in rows)
    assert any(r.last_signup_ts is not None for r in rows)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.operators import semistructured

    exact = {
        r.event_type: (r.p50, r.p95)
        for r in semistructured.q_value_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in semistructured.q_value_percentiles_approx(spark, sf_dir).collect()
    }
    for k, (e50, e95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - e50) <= max(1.0, 0.05 * e50), (k, a50, e50)
        assert abs(a95 - e95) <= max(1.0, 0.05 * e95), (k, a95, e95)


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in advanced.q_approx_distinct_users(spark, sf_dir).collect()
    }
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.05 * v), (k, approx[k], v)
