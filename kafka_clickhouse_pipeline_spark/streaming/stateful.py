"""Stateful streaming extensions beyond the reference's stateless MV
pipeline: watermarked windowed aggregation and streaming deduplication.

The reference computes its hourly buckets at query time over the
materialized table (app.py:57-66) and has no dedup at all (SURVEY.md
section 2.8). These operators move both into the stream, the way a
100 TB/day pipeline would:

- ``hourly_rollup_stream``: tumbling 1-hour windows over event_time
  with a late-data watermark -- the continuously-maintained version of
  ``sales_by_hour``. State is bounded by (watermark / window) windows
  per key.
- ``dedup_stream``: drop duplicate event_ids within the watermark
  horizon (at-least-once Kafka delivery -> effectively-once in the
  table). State is one entry per event id inside the horizon, evicted
  by watermark -- bounded memory at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: RocksDB-backed state store (bundled with Spark 4). The default
#: HDFSBackedStateStoreProvider keeps ALL streaming state in executor
#: JVM heap -- fine for hourly windows, fatal for 100 TB/day dedup
#: state (one entry per event id inside the watermark horizon).
#: RocksDB keeps state off-heap on local SSD with incremental
#: (changelog) checkpointing, so state size is bounded by disk, not
#: heap, and checkpoint cost by the delta, not the full store.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, changelog: bool = True) -> None:
    """Switch streaming state to RocksDB for queries started AFTER this
    call (the provider is read from session conf at query start; running
    queries keep their provider). Call before ``attach``-ing streams
    whose state scales with the key space -- dedup_stream over high-
    cardinality event ids, long-horizon stream-stream joins."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog else "false",
    )


def use_default_state_store(spark: SparkSession) -> None:
    """Revert to the in-heap default provider (new queries only)."""
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )


def hourly_rollup_stream(
    parsed: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Streaming hourly rollup of the parsed sales stream: windowed
    sums of quantity and total (the streaming twin of sales_by_hour,
    SURVEY.md section 2.7.1). Tumbling by default; pass ``slide``
    (e.g. "15 minutes") for overlapping sliding windows -- each event
    then contributes to window/slide windows, state scales by the
    same factor, and the watermark still evicts every window whose
    end has passed.

    Late rows beyond the watermark are dropped; each window finalizes
    (append mode) once the watermark passes its end.
    """
    win = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return (
        parsed.withWatermark("event_time", watermark)
        .groupBy(win.alias("win"))
        .agg(
            F.sum("quantity").alias("total_quantity"),
            F.sum("total").alias("revenue"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "total_quantity",
            "revenue",
        )
    )


def sales_stock_stream_join(
    sales: DataFrame,
    stock: DataFrame,
    watermark: str = "1 hour",
    join_horizon: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each sale joined to stock movements of
    the same product within ``join_horizon`` before the sale.

    Both sides are watermarked, and the time-range predicate bounds the
    join state: Spark keeps only rows inside the horizon per side, so
    state is (rate x horizon) regardless of total stream length -- the
    canonical bounded stream-stream join. Event-time columns are kept
    distinctly named to keep the range condition explicit.
    """
    s = sales.withWatermark("event_time", watermark).select(
        F.col("event_id").alias("sale_id"),
        F.col("product_id"),
        F.col("event_time").alias("sale_time"),
        "quantity",
        "total",
    )
    m = stock.withWatermark("event_time", watermark).select(
        F.col("event_id").alias("movement_id"),
        F.col("product_id").alias("m_product_id"),
        F.col("event_time").alias("movement_time"),
        F.col("movement_type"),
    )
    cond = (
        (F.col("product_id") == F.col("m_product_id"))
        & (F.col("movement_time") <= F.col("sale_time"))
        & (F.col("movement_time") >= F.col("sale_time") - F.expr(f"INTERVAL {join_horizon}"))
    )
    return s.join(m, cond, "inner").select(
        "sale_id", "movement_id", "product_id", "sale_time", "movement_time", "movement_type"
    )


def dedup_stream(
    parsed: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on event id within the watermark horizon.

    ``dropDuplicates`` on a watermarked stream keeps one state entry
    per key until the watermark evicts it -- the standard pattern for
    de-duplicating at-least-once Kafka delivery with bounded state.
    """
    return parsed.withWatermark("event_time", watermark).dropDuplicates(
        (keys or ["event_id"]) + ["event_time"]
    )
