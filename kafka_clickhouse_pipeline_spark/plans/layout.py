"""Physical-layout utilities for scale: bucketed tables (shuffle-free
fact-fact joins), salted joins (hot-key skew), and small-file
compaction for streaming sinks.

These are the three operational levers SCALE.md names for the plans
that still shuffle at 100 TB:
- bucketing removes the lineitem><orders exchange entirely when both
  sides are written bucketed by the join key;
- salting splits a pathological hot key across ``salt_buckets``
  sub-keys (AQE skew-join handles moderate skew at runtime; salting is
  the deterministic heavy hammer for known-degenerate keys);
- compaction bounds file counts on continuously-appended tables (the
  MergeTree background-merge analog, SURVEY.md section 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, num_buckets: int = 8
) -> None:
    """Persist as a bucketed session-catalog table; two tables bucketed
    identically on their join key co-locate, and joining them needs no
    exchange (asserted in tests/test_layout.py)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed prior run can leave the managed location behind
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys split across
    ``salt_buckets`` sub-partitions: left rows get a random-ish but
    deterministic salt (hash of the full row key-space via
    monotonically increasing id is NOT deterministic -- use a hash of
    stable columns), the right side is replicated across all salts.

    Result is identical to a plain join (verified in tests); the win is
    that a key with k rows lands in ``salt_buckets`` tasks instead of
    one. Right-side replication costs salt_buckets x |right|, so use
    for dimension-sized or pre-filtered right sides.
    """
    salt: Column = (F.xxhash64(*left.columns) % salt_buckets).cast("int")
    lsalted = left.withColumn("__salt", F.abs(salt))
    rsalted = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = lsalted.join(rsalted, [key, "__salt"], how)
    return out.drop("__salt")


def compact_table(
    spark: SparkSession, path: str, target_files_per_partition: int = 1
) -> None:
    """Rewrite a month-partitioned table with bounded files per
    partition (streaming sinks accrete small files per micro-batch;
    this is the periodic background merge). Preserves the partition
    column and re-sorts by the table sort key."""
    df = spark.read.parquet(path)
    sort_cols = [c for c in ("event_time", "product_id") if c in df.columns]
    compacted = df.repartition(target_files_per_partition, "event_month")
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "__compacting"
    compacted.write.mode("overwrite").partitionBy("event_month").parquet(tmp)
    # atomic-ish swap (HDFS/object stores would use a metastore swap)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
