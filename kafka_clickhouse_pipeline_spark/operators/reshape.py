"""Reshaping operators: pivot (long->wide) and deterministic
systematic sampling.

Pivot with an explicit value list compiles to conditional aggregation
(one scan, one shuffle on the group key -- same plan as A4's
incoming/outgoing columns, generalized); never call pivot without the
value list at scale, or Spark runs an extra distinct pass to discover
columns.

Systematic sampling (key mod n) is the deterministic, oracle-checkable
sampling form; Bernoulli ``df.sample`` is partition-order dependent and
belongs to interactive exploration, not reproducible pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide table: one summed-value column per event type
    (explicit pivot values -> no discovery pass)."""
    events = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(dec))
        .orderBy("user_id")
    )


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample of events by key residue."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") % 20 == 0)
        .select("event_id", "user_id", "event_type", F.col("value").cast("decimal(18,2)").alias("value"))
        .orderBy("event_id")
    )


RESHAPE_ORACLES: dict[str, str] = {
    "q_pivot_user_event_values": """
        SELECT user_id,
               sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS click,
               sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,2)) END) AS error,
               sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS purchase,
               sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS signup,
               sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q_sample_systematic": """
        SELECT event_id, user_id, event_type, CAST(value AS DECIMAL(18,2)) AS value
        FROM events WHERE event_id % 20 = 0 ORDER BY event_id
    """,
}

RESHAPE_QUERIES = {
    "q_pivot_user_event_values": q_pivot_user_event_values,
    "q_sample_systematic": q_sample_systematic,
}
