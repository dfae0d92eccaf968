"""The materialized-view transforms as pure ``DataFrame -> DataFrame``
functions -- the body of each Structured Streaming query, testable in
batch without Kafka.

Reference originals:
- ``sales_mv``           generate_data.py:210-228
- ``stock_movements_mv`` generate_data.py:231-246

Both are stateless row-wise transforms (parse, cast, project, filter)
-- exactly what Spark fuses into a single whole-stage-codegen'd map
stage; at 100 TB these scale linearly with input and never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import parse_datetime_best_effort, to_decimal32


def parse_sales(raw: DataFrame) -> DataFrame:
    """sales_kafka -> sales (generate_data.py:210-228).

    - event_time: lenient string->timestamp, null on failure (F1,
      parseDateTimeBestEffortOrNull, generate_data.py:215)
    - price/discount/total: Float64 -> Decimal(9,2) (F2, toDecimal32,
      generate_data.py:220-222)
    - WHERE price IS NOT NULL (P3, generate_data.py:227) -- drops rows
      whose JSON price was missing/broken
    - processing_time DEFAULT now() (S9, generate_data.py:169)
    """
    return (
        raw.select(
            "event_id",
            "event_type",
            parse_datetime_best_effort("event_time").alias("event_time"),
            "product_id",
            "product_name",
            "category",
            "quantity",
            to_decimal32("price").alias("price"),
            to_decimal32("discount").alias("discount"),
            to_decimal32("total").alias("total"),
            "store_id",
            "cashier_id",
            "customer_id",
        )
        .filter(F.col("price").isNotNull())
        .withColumn("processing_time", F.current_timestamp())
    )


def parse_stock(raw: DataFrame) -> DataFrame:
    """warehouse_kafka -> stock_movements (generate_data.py:231-246).

    Parse-only: lenient timestamp, projection, processing_time. No
    filter -- the reference lands every warehouse row, even with null
    event_time (SURVEY.md section 2.8).
    """
    return raw.select(
        "event_id",
        "event_type",
        parse_datetime_best_effort("event_time").alias("event_time"),
        "product_id",
        "product_name",
        "category",
        "warehouse",
        "quantity",
        "movement_type",
        "source",
        "responsible",
    ).withColumn("processing_time", F.current_timestamp())
