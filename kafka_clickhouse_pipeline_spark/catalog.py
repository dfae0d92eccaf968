"""Fixture-table access: parquet paths -> DataFrames / temp views.

The reference's catalog is ClickHouse's (CREATE TABLE IF NOT EXISTS,
SHOW TABLES -- generate_data.py:96-195, app.py:19). Here the catalog is
the Spark session catalog over driver-provided parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` keeps the
    vectorized reader + pushdown/pruning path; no schema inference cost
    since parquet carries its schema.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's reader
    rejects; read it as long nanos (legacy conf) and floor-convert to a
    microsecond TimestampType -- the same truncation DuckDB applies when
    surfacing TIMESTAMP_NS to clients, so oracles agree.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL entry point,
    analogous to the reference's SHOW TABLES-visible catalog)."""
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def tables_exist(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> bool:
    """Existence probe, analog of app.py:16-33 check_tables_exist."""
    return all(os.path.exists(table_path(sf_dir, n)) for n in names)
