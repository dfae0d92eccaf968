"""Multiplexed single-stream pipeline: interleaved sales + warehouse
events through one stream, demuxed into both target tables."""

from __future__ import annotations

import json

from kafka_clickhouse_pipeline_spark.streaming.ingest import multiplexed_file_pipeline


def test_multiplexed_stream_routes_both_kinds(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    events = []
    # ~70/30 mix like the reference's topic split (generate_data.py:436)
    for i in range(10):
        if i % 10 < 7:
            events.append(
                {
                    "event_id": f"s{i}",
                    "event_type": "sale",
                    "event_time": f"2024-01-15 10:{i:02d}:00",
                    "product_id": i,
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
            )
        else:
            events.append(
                {
                    "event_id": f"w{i}",
                    "event_type": "stock_movement",
                    "event_time": f"2024-01-15 11:{i:02d}:00",
                    "product_id": i,
                    "product_name": "p",
                    "category": "c",
                    "warehouse": "W1",
                    "quantity": 5,
                    "movement_type": "supply",
                    "source": "Acme",
                    "responsible": "R",
                }
            )
    with open(src / "mixed.jsonl", "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")

    mgr = multiplexed_file_pipeline(
        spark,
        str(src),
        str(tmp_path / "sales"),
        str(tmp_path / "stock"),
        str(tmp_path / "ckpt"),
    )
    q = mgr.attach("multiplex_mv", trigger_available_now=True)
    q.awaitTermination(120)
    mgr.detach_all()

    sales = spark.read.parquet(str(tmp_path / "sales"))
    stock = spark.read.parquet(str(tmp_path / "stock"))
    assert sorted(r.event_id for r in sales.collect()) == [f"s{i}" for i in range(10) if i % 10 < 7]
    assert sorted(r.event_id for r in stock.collect()) == [f"w{i}" for i in range(10) if i % 10 >= 7]
    # each table got its kind-specific typed schema
    assert "price" in sales.columns and "warehouse" not in sales.columns
    assert "movement_type" in stock.columns and "price" not in stock.columns
