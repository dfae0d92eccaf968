"""Effectively-once sink: replayed and half-published micro-batches
must not duplicate rows."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kafka_clickhouse_pipeline_spark.streaming.sink import idempotent_batch_writer


def _batch(spark, payloads):
    schema = StructType(
        [StructField("event_time_s", StringType()), StructField("product_id", IntegerType()), StructField("payload", StringType())]
    )
    rows = [(f"2024-01-{i + 1:02d} 00:00:00", i, p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, schema).select(
        F.col("event_time_s").cast("timestamp").alias("event_time"), "product_id", "payload"
    )


def test_replayed_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "tbl")
    writer = idempotent_batch_writer(path, target_files=2)
    df = _batch(spark, ["a", "b", "c"])
    writer(df, 0)
    assert spark.read.parquet(path).count() == 3
    writer(df, 0)  # foreachBatch replay after restart
    assert spark.read.parquet(path).count() == 3
    writer(_batch(spark, ["d"]), 1)  # next batch still appends
    assert spark.read.parquet(path).count() == 4


def test_half_published_batch_retry_does_not_duplicate(spark, tmp_path):
    path = str(tmp_path / "tbl")
    writer = idempotent_batch_writer(path, target_files=2)
    writer(_batch(spark, ["a", "b", "c"]), 0)
    # simulate a crash AFTER publish but BEFORE the commit marker:
    # remove the marker; published files of batch 0 remain
    os.remove(os.path.join(path, "_commits", "0"))
    n_files_before = len(glob.glob(f"{path}/event_month=*/b0-*"))
    assert n_files_before > 0
    writer(_batch(spark, ["a", "b", "c"]), 0)  # retry
    assert spark.read.parquet(path).count() == 3  # no duplicates
    assert os.path.exists(os.path.join(path, "_commits", "0"))
