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


#: The extra wire formats q_mv_parse_multiformat exercises (F1's
#: best-effort coalesce list beyond the reference's single producer
#: format): ISO-8601 'T' separator and day-first European order.
MULTIFORMAT_ISO = "yyyy-MM-dd'T'HH:mm:ss"
MULTIFORMAT_DAYFIRST = "dd/MM/yyyy HH:mm:ss"


def q_mv_parse_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parseDateTimeBestEffortOrNull's MULTI-format + failure legs,
    driver-attested (VERDICT r9 #7: every committed fixture emits the
    single reference format, generate_data.py:379, so only F1's
    first-coalesce branch had ever been driven against the oracle).

    Each event's ts is re-serialized into one of four wire shapes by
    ``event_id % 4`` (portable to the oracle, no hash functions
    needed): the reference producer format, ISO-8601 'T', day-first
    ``dd/MM/yyyy``, or a deliberately unparseable string. The ONE
    shared F1 implementation (functions.parse_datetime_best_effort,
    the same expression streaming/transforms.py runs) must recover the
    timestamp from all three real formats -- exercising coalesce
    branches 1, 2 and 3 -- and return NULL, never an error, on the
    corrupt leg. The oracle never runs a lenient parse: it KNOWS the
    ground truth (parse(format(ts)) == ts truncated to seconds), so
    Spark's actual parse path is checked against an identity, the
    strongest available contract."""
    from ..functions import EVENT_TIME_FORMAT

    events = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.col("event_id"), F.lit(4))
    wire = (
        F.when(bucket == 0, F.date_format("ts", EVENT_TIME_FORMAT))
        .when(bucket == 1, F.date_format("ts", MULTIFORMAT_ISO))
        .when(bucket == 2, F.date_format("ts", MULTIFORMAT_DAYFIRST))
        .otherwise(F.concat(F.lit("corrupt:"), F.col("event_id")))
    )
    parsed = parse_datetime_best_effort(
        wire, EVENT_TIME_FORMAT, MULTIFORMAT_ISO, MULTIFORMAT_DAYFIRST
    )
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        bucket.cast("long").alias("fmt_bucket"),
        wire.alias("wire"),
        ts_str(parsed).alias("event_time"),
        F.when(parsed.isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("parsed_ok"),
    )


PIPELINE_QUERIES: dict[str, object] = {
    "mv_parse_typed": mv_parse_typed,
    "q_mv_parse_multiformat": q_mv_parse_multiformat,
}


PIPELINE_ORACLES: dict[str, str] = {
    "q_mv_parse_multiformat": """
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(event_id % 4 AS BIGINT) AS fmt_bucket,
               CASE CAST(event_id % 4 AS INTEGER)
                 WHEN 0 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                 WHEN 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S')
                 WHEN 2 THEN strftime(date_trunc('second', ts), '%d/%m/%Y %H:%M:%S')
                 ELSE 'corrupt:' || CAST(event_id AS VARCHAR)
               END AS wire,
               CASE WHEN event_id % 4 = 3 THEN NULL
                    ELSE strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
               END AS event_time,
               CAST(CASE WHEN event_id % 4 = 3 THEN 0 ELSE 1 END AS BIGINT)
                 AS parsed_ok
        FROM events
    """,
    "mv_parse_typed": """
        SELECT event_id,
               strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS event_time,
               CAST(CAST(value AS DECIMAL(9,2)) AS STRING) AS total,
               CAST(year(ts) * 100 + month(ts) AS INTEGER) AS event_month
        FROM events
        WHERE value IS NOT NULL
    """,
}
