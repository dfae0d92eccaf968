"""Stream-stream join: sales matched to prior stock movements of the
same product within the join horizon; out-of-horizon movements
excluded."""

from __future__ import annotations

import json

from kafka_clickhouse_pipeline_spark.schemas import SALES_RAW_SCHEMA, WAREHOUSE_RAW_SCHEMA
from kafka_clickhouse_pipeline_spark.sources.kafka import read_json_lines_stream
from kafka_clickhouse_pipeline_spark.streaming.stateful import sales_stock_stream_join
from kafka_clickhouse_pipeline_spark.streaming.transforms import parse_sales, parse_stock


def test_stream_stream_join_within_horizon(spark, tmp_path):
    sales_in = tmp_path / "s"
    stock_in = tmp_path / "m"
    sales_in.mkdir()
    stock_in.mkdir()

    sale = {
        "event_id": "sale1",
        "event_type": "sale",
        "event_time": "2024-01-15 12:00:00",
        "product_id": 7,
        "product_name": "p",
        "category": "c",
        "quantity": 1,
        "price": 10.0,
        "discount": 0.0,
        "total": 10.0,
        "store_id": 1,
        "cashier_id": 1,
        "customer_id": "c1",
    }
    movements = [
        # in horizon (<= 2h before the sale), same product -> joins
        {"event_id": "m_in", "event_time": "2024-01-15 10:30:00", "product_id": 7},
        # out of horizon -> excluded
        {"event_id": "m_old", "event_time": "2024-01-15 09:00:00", "product_id": 7},
        # after the sale -> excluded
        {"event_id": "m_after", "event_time": "2024-01-15 12:30:00", "product_id": 7},
        # other product -> excluded
        {"event_id": "m_other", "event_time": "2024-01-15 11:00:00", "product_id": 9},
    ]
    with open(sales_in / "b.jsonl", "w") as f:
        f.write(json.dumps(sale) + "\n")
    with open(stock_in / "b.jsonl", "w") as f:
        for m in movements:
            f.write(
                json.dumps(
                    {
                        "event_id": m["event_id"],
                        "event_type": "stock_movement",
                        "event_time": m["event_time"],
                        "product_id": m["product_id"],
                        "product_name": "p",
                        "category": "c",
                        "warehouse": "W",
                        "quantity": 5,
                        "movement_type": "supply",
                        "source": "A",
                        "responsible": "R",
                    }
                )
                + "\n"
            )

    sales = parse_sales(read_json_lines_stream(spark, str(sales_in), SALES_RAW_SCHEMA))
    stock = parse_stock(read_json_lines_stream(spark, str(stock_in), WAREHOUSE_RAW_SCHEMA))
    joined = sales_stock_stream_join(sales, stock)
    q = (
        joined.writeStream.format("memory")
        .queryName("join_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM join_sink").collect()
    assert [(r.sale_id, r.movement_id) for r in rows] == [("sale1", "m_in")]


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: the streaming sales feed enriched with a
    static dimension (store_id -> region) via broadcast -- no stream
    state, the dimension evaluates per micro-batch. The standard
    pattern for dimension lookups at any stream scale."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    sales_in = tmp_path / "s2"
    sales_in.mkdir()
    rows = []
    for i, store in enumerate((1, 2, 3)):
        rows.append(
            {
                "event_id": f"e{i}",
                "event_type": "sale",
                "event_time": f"2024-01-15 12:0{i}:00",
                "product_id": 1,
                "product_name": "p",
                "category": "c",
                "quantity": 2,
                "price": 10.0,
                "discount": 0.0,
                "total": 20.0,
                "store_id": store,
                "cashier_id": 1,
                "customer_id": "u",
            }
        )
    with open(sales_in / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    dim = spark.createDataFrame(
        [(1, "north"), (2, "south")], "store_id int, region string"
    )
    raw = read_json_lines_stream(spark, str(sales_in), SALES_RAW_SCHEMA)
    enriched = (
        parse_sales(raw)
        .join(broadcast(dim), "store_id", "left")
        .select("event_id", "store_id", F.coalesce("region", F.lit("unknown")).alias("region"))
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.region for r in spark.sql("SELECT * FROM enriched_sink").collect()}
    assert got == {"e0": "north", "e1": "south", "e2": "unknown"}


def test_streaming_decontamination_guard(spark, tmp_path):
    """Ingest-time benchmark decontamination: a streaming document that
    shares an 8-token shingle with the static benchmark corpus is
    dropped; clean and too-short documents pass. Stateless (no
    watermark) -- the benchmark shingle set is one broadcast row per
    micro-batch."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.operators.curation import decontaminate_stream

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog tonight", "src0")],
        "doc_id long, text string, source string",
    )
    docs_in = tmp_path / "docs_in"
    docs_in.mkdir()
    rows = [
        # contains the benchmark 8-gram "quick brown fox jumps over the lazy dog"
        {"doc_id": 1, "text": "intro quick brown fox jumps over the lazy dog outro"},
        {"doc_id": 2, "text": "a completely different document with no overlap at all here"},
        {"doc_id": 3, "text": "too short to shingle"},
    ]
    with open(docs_in / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(docs_in))
    )
    clean = decontaminate_stream(stream, bench)
    q = (
        clean.select("doc_id")
        .writeStream.format("memory")
        .queryName("decontam_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_decontam"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r.doc_id for r in spark.sql("SELECT * FROM decontam_sink").collect())
    assert kept == [2, 3]
