"""Explicit schemas -- the engine's declared-DDL contract.

The reference declares every schema in ClickHouse DDL and never infers
(generate_data.py:96-195). We mirror that: explicit ``StructType``s for
the two Kafka event payloads (raw, string-typed where the wire format is
stringly) and for the materialized target tables (typed), plus the
driver fixture tables.

Type mapping notes (SURVEY.md section 1.2):
- UInt64 -> LongType (values 1..50; Spark has no unsigned types)
- UInt32/Int32 -> IntegerType
- Decimal32(2) -> DecimalType(9, 2)
- DateTime -> TimestampType
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Raw Kafka payloads (pre-transform; event_time still a string,
# --- money still doubles), mirroring the Kafka-engine tables
# --- generate_data.py:96-117 (sales) and :120-139 (warehouse).

SALES_RAW_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("event_time", StringType()),  # 'YYYY-MM-DD HH:MM:SS'
        StructField("product_id", LongType()),  # UInt64
        StructField("product_name", StringType()),
        StructField("category", StringType()),
        StructField("quantity", IntegerType()),  # UInt32
        StructField("price", DoubleType()),
        StructField("discount", DoubleType()),
        StructField("total", DoubleType()),
        StructField("store_id", IntegerType()),  # UInt32
        StructField("cashier_id", IntegerType()),  # UInt32
        StructField("customer_id", StringType()),
    ]
)

WAREHOUSE_RAW_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("event_time", StringType()),
        StructField("product_id", LongType()),
        StructField("product_name", StringType()),
        StructField("category", StringType()),
        StructField("warehouse", StringType()),
        StructField("quantity", IntegerType()),  # Int32 (signed)
        StructField("movement_type", StringType()),
        StructField("source", StringType()),
        StructField("responsible", StringType()),
    ]
)

# --- Materialized target tables, mirroring the MergeTree tables
# --- generate_data.py:154-174 (sales) and :177-195 (stock_movements).

SALES_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("event_time", TimestampType()),
        StructField("product_id", LongType()),
        StructField("product_name", StringType()),
        StructField("category", StringType()),
        StructField("quantity", IntegerType()),
        StructField("price", DecimalType(9, 2)),  # Decimal32(2)
        StructField("discount", DecimalType(9, 2)),
        StructField("total", DecimalType(9, 2)),
        StructField("store_id", IntegerType()),
        StructField("cashier_id", IntegerType()),
        StructField("customer_id", StringType()),
        StructField("processing_time", TimestampType()),
    ]
)

STOCK_MOVEMENTS_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("event_time", TimestampType()),
        StructField("product_id", LongType()),
        StructField("product_name", StringType()),
        StructField("category", StringType()),
        StructField("warehouse", StringType()),
        StructField("quantity", IntegerType()),
        StructField("movement_type", StringType()),
        StructField("source", StringType()),
        StructField("responsible", StringType()),
        StructField("processing_time", TimestampType()),
    ]
)

# --- Driver fixture tables (/root/testdata/sf*/, see FIXTURES.md B).

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
