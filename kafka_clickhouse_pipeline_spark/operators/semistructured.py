"""Semi-structured and statistical operators over ``events``:
JSON-path extraction from the ``props`` payload column and exact
percentiles.

The reference handles JSON only at the ingest format layer
(JSONEachRow, SURVEY.md section 2.10); these extend JSON into query
scope -- the common "typed core + JSON props" event-table idiom.

Scale notes: ``get_json_object`` is a JVM expression inside codegen
(no Python); exact percentile is a sort-based aggregate -- fine per
group at this cardinality; a 100 TB pipeline with huge groups would
swap in ``approx_percentile`` (t-digest, mergeable) the same way
``q_approx_distinct_users`` pairs with the exact distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.k`` (JSON int) per event, aggregate per event
    type: count of rows where k is present, exact integer sum of k,
    and mean k (exact int sum / count -> deterministic double)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95 of ``value`` per event type (sort-based exact
    percentile with linear interpolation, matching quantile_cont)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest approximate p50/p95 -- the 100 TB pair of the exact
    variant (mergeable sketches, constant memory per group). Rows-only:
    sketch-dependent values differ from any oracle; the test suite
    bounds the error against the exact percentiles instead."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("p95"),
        )
        .orderBy("event_type")
    )


SEMISTRUCTURED_ORACLES: dict[str, str] = {
    "q_json_extract_stats": """
        WITH k AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
        SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        FROM k WHERE k IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "q_value_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}

SEMISTRUCTURED_QUERIES = {
    "q_json_extract_stats": q_json_extract_stats,
    "q_value_percentiles": q_value_percentiles,
    "q_value_percentiles_approx": q_value_percentiles_approx,  # rows-only
}
