"""Oracle-checkable batch projections of the MV-transform semantics
(SURVEY.md S7/S8/S9, F1/F2/F4, P3) over the ``events`` fixture table.

The real transforms run in ``streaming.transforms``; these queries
exercise the same scalar semantics (lenient string->timestamp parse,
double->Decimal(9,2) cast, null filter, toYYYYMM partition derivation)
in a form the DuckDB oracle can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import parse_datetime_best_effort, to_decimal32, to_yyyymm
from ..functions.canon import ts_str


def mv_parse_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sales_mv-shaped transform (generate_data.py:210-228): round-trip
    ts through the wire string format and leniently re-parse (F1), cast
    the money column to Decimal(9,2) (F2), filter nulls (P3), derive the
    toYYYYMM partition value (F4)."""
    events = load_table(spark, sf_dir, "events")
    wire = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")  # producer format
    parsed = parse_datetime_best_effort(wire)
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_id",
            ts_str(parsed).alias("event_time"),
            # Decimal math stays in to_decimal32's Decimal(9,2); the
            # output boundary renders the fixed-scale string (canon.py
            # decimal ban, VERDICT r2 #1).
            to_decimal32("value").cast("string").alias("total"),
            to_yyyymm(parsed).alias("event_month"),
        )
    )


PIPELINE_ORACLES: dict[str, str] = {
    "mv_parse_typed": """
        SELECT event_id,
               strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS event_time,
               CAST(CAST(value AS DECIMAL(9,2)) AS STRING) AS total,
               CAST(year(ts) * 100 + month(ts) AS INTEGER) AS event_month
        FROM events
        WHERE value IS NOT NULL
    """,
}
