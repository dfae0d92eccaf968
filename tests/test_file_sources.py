"""Batch file-format sources/sinks: schema enforcement, corrupt-record
quarantine, ORC round-trip, partition-level overwrite."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_clickhouse_pipeline_spark.sources.files import (
    quarantine_corrupt,
    read_csv,
    read_json,
    read_orc,
    write_orc,
)
from kafka_clickhouse_pipeline_spark.streaming.sink import (
    overwrite_partitions,
    write_batch_to_table,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_csv_with_schema_and_corrupt_drop(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,value\n1,a,1.5\nnot_a_number,b,2.5\n3,c,3.5\n")
    df = read_csv(spark, str(p), SCHEMA)
    rows = sorted((r.id, r.name) for r in df.collect() if r.id is not None)
    assert rows == [(1, "a"), (3, "c")]


def test_json_with_schema_and_quarantine(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "name": "a", "value": 1.5}\nBROKEN LINE\n{"id": 2, "name": "b", "value": 2.5}\n')
    good = read_json(spark, str(p), SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    bad = quarantine_corrupt(spark, str(p), SCHEMA, fmt="json")
    assert bad.count() == 1


def test_orc_round_trip(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, name="a", value=1.5), Row(id=2, name="b", value=2.5)], SCHEMA)
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def _table_df(spark, rows):
    schema = StructType(
        [
            StructField("event_time_s", StringType()),
            StructField("product_id", IntegerType()),
            StructField("payload", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema).select(
        F.col("event_time_s").cast("timestamp").alias("event_time"),
        "product_id",
        "payload",
    )


def test_overwrite_partitions_touches_only_changed_months(spark, tmp_path):
    path = str(tmp_path / "tbl")
    initial = _table_df(
        spark,
        [
            ("2024-01-10 00:00:00", 1, "jan-old"),
            ("2024-02-10 00:00:00", 2, "feb-old"),
        ],
    )
    write_batch_to_table(initial, path)
    # reprocess ONLY January with corrected data
    corrected = _table_df(spark, [("2024-01-10 00:00:00", 1, "jan-new")])
    overwrite_partitions(corrected, path)
    got = {r.payload for r in spark.read.parquet(path).collect()}
    assert got == {"jan-new", "feb-old"}  # February untouched
