"""Synthetic retail-event generator -- the Spark-native re-expression
of the reference's data generator (data-generator/generate_data.py:
329-453): a fixed 50-product catalog with stable per-product prices,
~70/30 sales/warehouse traffic mix, and the same field distributions.

Unlike the reference's single-threaded Faker loop (~1-2 msg/s,
generate_data.py:449), generation is a distributed Spark job:
hash-based deterministic pseudo-randomness (seeded, reproducible,
partition-independent) producing millions of events/s. Output feeds
the same sinks the reference's producer fed: JSONL files (the file
stand-in) or the Kafka JSON sink (sources/kafka.py::to_kafka_json_sink).

Distribution parity (generate_data.py lines):
- product_id uniform 1..50 from fixed catalog (:334,367)
- price uniform(100, 10000), 2dp, FIXED per product (:370)
- quantity: sales randint(1,5) (:383); stock randint(1,100) (:403)
- discount uniform(0, 0.3) 2dp (:385)
- total = price * (1 - uniform(0,0.3)) -- independent draw, quantity
  ignored, faithfully reproducing the reference's quirk (:386)
- store_id 1..10, cashier_id 1..20 (:387-388)
- warehouse uniform over 6 cities (:335,402)
- movement_type uniform over {supply, relocation, write_off} (:404)
- 70/30 sales/warehouse split (:436-441)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = ("Электроника", "Одежда", "Продукты", "Книги", "Бытовая техника")
WAREHOUSES = ("Москва", "Санкт-Петербург", "Новосибирск", "Екатеринбург", "Казань", "Челябинск")
MOVEMENT_TYPES = ("supply", "relocation", "write_off")


def _u(col, salt: str, seed: int):
    """Deterministic uniform [0,1) from a key column: hash -> positive
    fraction. Stable across partitioning and engines runs."""
    h = F.xxhash64(F.concat(F.lit(f"{salt}#{seed}#"), col.cast("string")))
    return (F.abs(h) % 1_000_000_007).cast("double") / 1_000_000_007.0


def _pick(col, options: tuple[str, ...], salt: str, seed: int):
    arr = F.array(*[F.lit(o) for o in options])
    idx = (F.abs(F.xxhash64(F.concat(F.lit(f"{salt}#{seed}#"), col.cast("string")))) % len(options)).cast("int")
    return F.element_at(arr, idx + 1)


def product_catalog(spark: SparkSession, seed: int = 42) -> DataFrame:
    """The fixed 50-product catalog: stable name/category/price per
    product id (generate_data.py:329-335,364-372)."""
    ids = spark.range(1, 51).select(F.col("id").alias("product_id"))
    return ids.select(
        "product_id",
        F.concat(F.lit("product "), F.col("product_id")).alias("product_name"),
        _pick(F.col("product_id"), CATEGORIES, "cat", seed).alias("category"),
        F.round(_u(F.col("product_id"), "price", seed) * 9900 + 100, 2).alias("price"),
    )


def generate_events(
    spark: SparkSession, n: int, seed: int = 42, start_ts: str = "2024-01-01 00:00:00"
) -> tuple[DataFrame, DataFrame]:
    """n interleaved events -> (sales_raw, warehouse_raw) DataFrames in
    the wire schema (event_time as string, money as double), exactly
    what the Kafka producer would have sent."""
    catalog = product_catalog(spark, seed)
    base = spark.range(n).select(
        F.col("id"),
        (_u(F.col("id"), "mix", seed) < 0.7).alias("is_sale"),
        (F.abs(F.xxhash64(F.concat(F.lit(f"pid#{seed}#"), F.col("id").cast("string")))) % 50 + 1).alias("product_id"),
        F.date_format(
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(start_ts), "yyyy-MM-dd HH:mm:ss")
                + (F.col("id") % 2_592_000)
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("event_time"),
    )
    enriched = base.join(F.broadcast(catalog), "product_id")

    sales = enriched.filter("is_sale").select(
        F.concat(F.lit("sale-"), F.col("id")).alias("event_id"),
        F.lit("sale").alias("event_type"),
        "event_time",
        "product_id",
        "product_name",
        "category",
        (F.abs(F.xxhash64(F.concat(F.lit(f"qty#{seed}#"), F.col("id").cast("string")))) % 5 + 1).cast("int").alias("quantity"),
        "price",
        F.round(_u(F.col("id"), "disc", seed) * 0.3, 2).alias("discount"),
        F.round(F.col("price") * (F.lit(1.0) - _u(F.col("id"), "tot", seed) * 0.3), 2).alias("total"),
        (F.abs(F.xxhash64(F.concat(F.lit(f"store#{seed}#"), F.col("id").cast("string")))) % 10 + 1).cast("int").alias("store_id"),
        (F.abs(F.xxhash64(F.concat(F.lit(f"cash#{seed}#"), F.col("id").cast("string")))) % 20 + 1).cast("int").alias("cashier_id"),
        F.md5(F.concat(F.lit(f"cust#{seed}#"), F.col("id").cast("string"))).alias("customer_id"),
    )

    warehouse = enriched.filter(~F.col("is_sale")).select(
        F.concat(F.lit("stock-"), F.col("id")).alias("event_id"),
        F.lit("stock_movement").alias("event_type"),
        "event_time",
        "product_id",
        "product_name",
        "category",
        _pick(F.col("id"), WAREHOUSES, "wh", seed).alias("warehouse"),
        (F.abs(F.xxhash64(F.concat(F.lit(f"wqty#{seed}#"), F.col("id").cast("string")))) % 100 + 1).cast("int").alias("quantity"),
        _pick(F.col("id"), MOVEMENT_TYPES, "mv", seed).alias("movement_type"),
        F.concat(F.lit("company-"), (F.abs(F.xxhash64(F.concat(F.lit(f"src#{seed}#"), F.col("id").cast("string")))) % 100)).alias("source"),
        F.concat(F.lit("person-"), (F.abs(F.xxhash64(F.concat(F.lit(f"resp#{seed}#"), F.col("id").cast("string")))) % 1000)).alias("responsible"),
    )
    return sales, warehouse


def write_jsonl(df: DataFrame, path: str) -> None:
    """Serialize to JSON lines -- byte-compatible with what the
    reference's producer put on the wire (generate_data.py:353)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)
