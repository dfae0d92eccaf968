"""cut_lineage: both branches (local vs reliable checkpoint) must
materialize, truncate lineage, and preserve values. The reliable
branch is the 100 TB/preemption-safe default documented in SCALE.md
"Lineage and fault tolerance"."""

from __future__ import annotations

from kafka_clickhouse_pipeline_spark.lineage import (
    CKPT_DIR_CONF,
    RELIABLE_CONF,
    cut_lineage,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _lineage_truncated(df) -> bool:
    """A checkpointed DataFrame's plan is a bare scan of materialized
    partitions (ExistingRDD), not the original operator tree."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "LogicalRDD" in plan or "ExistingRDD" in plan


def test_local_branch_default(spark):
    df = spark.range(100).selectExpr("id", "id * 3 AS thrice")
    spark.conf.unset(RELIABLE_CONF)
    out = cut_lineage(df)
    assert _lineage_truncated(out)
    assert _rows(out) == _rows(df)


def test_reliable_branch(spark, tmp_path):
    import os

    df = spark.range(100).selectExpr("id", "id * 2 AS twice")
    spark.conf.set(RELIABLE_CONF, "true")
    ckpt = tmp_path / "ckpt"
    spark.conf.set(CKPT_DIR_CONF, str(ckpt))
    try:
        out = cut_lineage(df)
        assert _lineage_truncated(out)
        # the checkpoint actually landed in the configured reliable dir
        assert any(files for _, _, files in os.walk(ckpt))
        assert _rows(out) == _rows(df)
    finally:
        spark.conf.unset(RELIABLE_CONF)
        spark.conf.unset(CKPT_DIR_CONF)


def test_iterative_operator_runs_under_reliable_flag(spark, tmp_path, sf_dir):
    """connected_components (the heaviest cut_lineage consumer) must
    produce identical clusters under either checkpoint mode."""
    from kafka_clickhouse_pipeline_spark.operators.graph import q_dedup_clusters

    base = _rows(q_dedup_clusters(spark, sf_dir))
    spark.conf.set(RELIABLE_CONF, "true")
    spark.conf.set(CKPT_DIR_CONF, str(tmp_path / "ckpt2"))
    try:
        assert _rows(q_dedup_clusters(spark, sf_dir)) == base
    finally:
        spark.conf.unset(RELIABLE_CONF)
        spark.conf.unset(CKPT_DIR_CONF)
