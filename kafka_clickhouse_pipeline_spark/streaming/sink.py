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


def idempotent_batch_writer(path: str, target_files: int = 4):
    """Effectively-once foreachBatch writer.

    A plain append inside foreachBatch double-writes if a micro-batch
    retries after a partial write (foreachBatch is at-least-once).
    This writer stages each batch to ``_staging/<batch_id>`` (overwrite
    -- retry-safe), then publishes files into the partition layout and
    drops a commit marker; a replayed batch id with a marker is a
    no-op. On an object store the publish step would be a metastore/
    manifest swap; the protocol is the same.
    """
    import glob
    import os
    import shutil

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(path, "_commits", str(batch_id))
        if os.path.exists(marker):
            return  # batch replay after successful publish
        staging = os.path.join(path, "_staging", str(batch_id))
        (
            prepare_batch(batch_df, target_files)
            .write.mode("overwrite")
            .partitionBy("event_month")
            .parquet(staging)
        )
        # a crash mid-publish leaves some files moved but no marker:
        # remove any half-published files of this batch before moving
        # (staged parquet names are fresh UUIDs per attempt)
        for stale in glob.glob(os.path.join(path, "event_month=*", f"b{batch_id}-*")):
            os.remove(stale)
        for part_dir in glob.glob(os.path.join(staging, "event_month=*")):
            dest = os.path.join(path, os.path.basename(part_dir))
            os.makedirs(dest, exist_ok=True)
            for f in glob.glob(os.path.join(part_dir, "*.parquet")):
                # batch id in the name keeps publish idempotent per file
                shutil.move(f, os.path.join(dest, f"b{batch_id}-{os.path.basename(f)}"))
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed")
        shutil.rmtree(staging, ignore_errors=True)

    return _write


def write_stream_to_table(
    df: DataFrame,
    path: str,
    checkpoint: str,
    target_files: int = 4,
):
    """writeStream into a month-partitioned columnar table via
    foreachBatch (needed for per-batch compaction + sort), with the
    effectively-once staged-commit writer."""
    return df.writeStream.foreachBatch(
        idempotent_batch_writer(path, target_files)
    ).option("checkpointLocation", checkpoint)


def write_batch_to_table(df: DataFrame, path: str, target_files: int = 4) -> None:
    """Batch variant of the same layout (used by tests and backfills)."""
    (
        prepare_batch(df, target_files)
        .write.mode("overwrite")
        .partitionBy("event_month")
        .parquet(path)
    )


def compact_partitions(
    spark,
    path: str,
    max_files_per_partition: int = 8,
    target_files: int = 4,
) -> list[str]:
    """Periodic small-file compaction -- the Delta ``OPTIMIZE`` stand-in
    promised in the module docstring. Month partitions whose parquet
    file count exceeds ``max_files_per_partition`` are rewritten to
    ``target_files`` sorted files via dynamic partition overwrite;
    every other partition is untouched. Returns the compacted month
    values.

    At 100 TB this runs as a scheduled maintenance job per table:
    streaming appends keep latency low with small per-batch files, the
    compactor restores scan efficiency (row-group stats + fewer file
    opens). Not concurrency-safe against a writer on plain parquet
    directories -- run between micro-batches or DETACH first (a real
    deployment gets transactional compaction from a table format like
    Delta/Iceberg; the job shape is identical).

    The null-month partition (unparseable event_time rows,
    ``__HIVE_DEFAULT_PARTITION__``) is deliberately skipped: dynamic
    overwrite matches partitions by value and null is not addressable
    that way; those rows are a diagnostic stash, not a scan target.
    """
    import glob
    import os

    crowded = [
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(path, "event_month=*"))
        if os.path.basename(d).split("=", 1)[1] != "__HIVE_DEFAULT_PARTITION__"
        and len(glob.glob(os.path.join(d, "*.parquet"))) > max_files_per_partition
    ]
    if not crowded:
        return []
    months = [int(m) for m in crowded]
    subset = spark.read.parquet(path).filter(F.col("event_month").isin(months))
    overwrite_partitions(subset.drop("event_month"), path, target_files)
    return crowded


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
