"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``kafka_clickhouse_pipeline_spark``; this module
only adapts it to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_clickhouse_pipeline_spark.operators import (
    advanced,
    analytics,
    curation,
    dedup,
    graph,
    multimodal,
    pipeline_queries,
    pq,
    reshape,
    semistructured,
    serving,
    similarity,
    text,
    tpch_extra,
    tpch_subq,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return serving.sales_by_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "sales_by_hour": serving.sales_by_hour,
        "stock_top5": serving.stock_top5,
        "recent_sales": serving.recent_sales,
        "status_counts": serving.status_counts,
        "mv_parse_typed": pipeline_queries.mv_parse_typed,
    }
    q.update(analytics.ANALYTICS_QUERIES)
    q.update(tpch_extra.TPCH_EXTRA_QUERIES)
    q.update(tpch_subq.TPCH_SUBQ_QUERIES)
    q.update(text.TEXT_QUERIES)
    q.update(dedup.DEDUP_QUERIES)
    q.update(similarity.SIMILARITY_QUERIES)
    q.update(pq.PQ_QUERIES)
    q.update(multimodal.MULTIMODAL_QUERIES)
    q.update(advanced.ADVANCED_QUERIES)
    q.update(semistructured.SEMISTRUCTURED_QUERIES)
    q.update(graph.GRAPH_QUERIES)
    q.update(reshape.RESHAPE_QUERIES)
    q.update(curation.CURATION_QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    o: dict[str, str] = {}
    o.update(serving.SERVING_ORACLES)
    o.update(pipeline_queries.PIPELINE_ORACLES)
    o.update(analytics.ANALYTICS_ORACLES)
    o.update(tpch_extra.TPCH_EXTRA_ORACLES)
    o.update(tpch_subq.TPCH_SUBQ_ORACLES)
    o.update(text.TEXT_ORACLES)
    o.update(dedup.DEDUP_ORACLES)
    o.update(similarity.SIMILARITY_ORACLES)
    o.update(multimodal.MULTIMODAL_ORACLES)
    o.update(advanced.ADVANCED_ORACLES)
    o.update(semistructured.SEMISTRUCTURED_ORACLES)
    o.update(graph.GRAPH_ORACLES)
    o.update(reshape.RESHAPE_ORACLES)
    o.update(curation.CURATION_ORACLES)
    return o
