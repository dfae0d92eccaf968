"""Columnar table sinks -- Spark re-expression of the reference's
MergeTree target tables (S5/S6, generate_data.py:154-195):

    ENGINE = MergeTree()
    PARTITION BY toYYYYMM(event_time)   -> partitionBy(event_month)
    ORDER BY (event_time, product_id)   -> sortWithinPartitions at write
    index_granularity = 8192            -> parquet row-group stats (free)

The sort key matters at 100 TB: parquet row-group min/max stats on
event_time give the same granule-skipping the MergeTree sparse index
provides, so time-range serving queries touch only matching row groups.

Small-file problem (SURVEY.md section 4): streaming micro-batches
produce many small files; ``foreachBatch`` compacts each micro-batch to
a bounded file count before write. A real deployment adds periodic
compaction (Delta OPTIMIZE); here the knob is ``target_files``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import to_yyyymm

#: Sort key of both target tables (generate_data.py:172,193).
SORT_KEY = ("event_time", "product_id")


def with_partition_column(df: DataFrame) -> DataFrame:
    """Derive the toYYYYMM partition column (generate_data.py:171,192).
    Null event_time rows land in a null partition, matching ClickHouse's
    behavior of keeping unparseable-time rows (SURVEY.md section 2.8)."""
    return df.withColumn("event_month", to_yyyymm(F.col("event_time")))


def prepare_batch(df: DataFrame, target_files: int = 4) -> DataFrame:
    """One micro-batch -> compacted, partition-column'd, sorted frame.

    repartition(target_files) bounds files-per-batch (small-file
    control); sortWithinPartitions lays rows out by the MergeTree sort
    key so row-group stats are tight.
    """
    return (
        with_partition_column(df)
        .repartition(target_files)
        .sortWithinPartitions(*SORT_KEY)
    )


def write_stream_to_table(
    df: DataFrame,
    path: str,
    checkpoint: str,
    target_files: int = 4,
    output_format: str = "parquet",
):
    """writeStream into a month-partitioned columnar table via
    foreachBatch (needed for per-batch compaction + sort)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            prepare_batch(batch_df, target_files)
            .write.mode("append")
            .partitionBy("event_month")
            .format(output_format)
            .save(path)
        )

    return df.writeStream.foreachBatch(_write).option("checkpointLocation", checkpoint)


def write_batch_to_table(df: DataFrame, path: str, target_files: int = 4) -> None:
    """Batch variant of the same layout (used by tests and backfills)."""
    (
        prepare_batch(df, target_files)
        .write.mode("overwrite")
        .partitionBy("event_month")
        .parquet(path)
    )


def overwrite_partitions(df: DataFrame, path: str, target_files: int = 4) -> None:
    """Reprocess late/corrected data at partition granularity: only the
    month partitions present in ``df`` are replaced; all other
    partitions are untouched (dynamic partition overwrite -- the
    ClickHouse DROP PARTITION + re-insert pattern, and the right
    backfill primitive at 100 TB where a full-table rewrite is
    unthinkable)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            prepare_batch(df, target_files)
            .write.mode("overwrite")
            .partitionBy("event_month")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
