"""Batch file sources/sinks beyond parquet: CSV, JSON-lines, ORC --
all with the engine's declared-schema discipline (explicit StructType,
PERMISSIVE corrupt-record capture, never inference in pipelines).

The reference reads only Kafka JSON; a drop-in replacement engine also
needs the batch formats a warehouse ingests from. Corrupt handling
follows the same philosophy as the Kafka path (S3,
kafka_skip_broken_messages): bad rows are captured or dropped, never
raised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.names:
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    drop_corrupt: bool = True,
) -> DataFrame:
    """CSV with explicit schema. drop_corrupt=True uses DROPMALFORMED
    (bad lines silently skipped -- the kafka_skip_broken_messages
    analog, and it stays column-pruning-safe); drop_corrupt=False keeps
    bad lines in the corrupt column for quarantine."""
    mode = "DROPMALFORMED" if drop_corrupt else "PERMISSIVE"
    reader = (
        spark.read.schema(schema if drop_corrupt else _with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType, drop_corrupt: bool = True
) -> DataFrame:
    """JSON-lines with explicit schema (batch twin of the streaming
    Kafka parse path); corrupt handling as in read_csv."""
    mode = "DROPMALFORMED" if drop_corrupt else "PERMISSIVE"
    reader = (
        spark.read.schema(schema if drop_corrupt else _with_corrupt_field(schema))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (schema travels with the file, like parquet; vectorized
    reader + pushdown apply)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def quarantine_corrupt(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "json"
) -> DataFrame:
    """The corrupt rows only -- the quarantine stream a production
    ingest routes to a dead-letter table."""
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(path) if fmt == "json" else reader.csv(path)
    # Spark forbids querying ONLY the corrupt column from raw files
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); caching
    # the parsed frame first is the documented pattern.
    df = df.cache()
    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
