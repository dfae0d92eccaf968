"""Golden end-to-end pipeline test (SURVEY.md section 5.2): JSON-lines
events (with the three A1 edge cases) -> file-source stream ->
MV transform -> partitioned parquet, availableNow trigger."""

from __future__ import annotations

import json

from kafka_clickhouse_pipeline_spark.streaming.ingest import file_pipeline

SALES_EVENTS = [
    # normal
    {
        "event_id": "s1",
        "event_type": "sale",
        "event_time": "2024-01-15 10:30:00",
        "product_id": 1,
        "product_name": "a b",
        "category": "Books",
        "quantity": 2,
        "price": 100.50,
        "discount": 0.10,
        "total": 90.45,
        "store_id": 1,
        "cashier_id": 1,
        "customer_id": "c1",
    },
    # second month -> second partition
    {
        "event_id": "s2",
        "event_type": "sale",
        "event_time": "2024-02-02 08:00:00",
        "product_id": 2,
        "product_name": "c d",
        "category": "Books",
        "quantity": 1,
        "price": 10.00,
        "discount": 0.00,
        "total": 10.00,
        "store_id": 1,
        "cashier_id": 2,
        "customer_id": "c2",
    },
    # missing price -> dropped by WHERE price IS NOT NULL
    {
        "event_id": "s3",
        "event_type": "sale",
        "event_time": "2024-01-15 11:00:00",
        "product_id": 3,
        "product_name": "e f",
        "category": "Books",
        "quantity": 1,
        "discount": 0.0,
        "total": 5.0,
        "store_id": 1,
        "cashier_id": 1,
        "customer_id": "c3",
    },
    # unparseable event_time -> lands with null event_time
    {
        "event_id": "s4",
        "event_type": "sale",
        "event_time": "xxxx",
        "product_id": 4,
        "product_name": "g h",
        "category": "Books",
        "quantity": 1,
        "price": 7.77,
        "discount": 0.0,
        "total": 7.77,
        "store_id": 1,
        "cashier_id": 1,
        "customer_id": "c4",
    },
]

STOCK_EVENTS = [
    {
        "event_id": "w1",
        "event_type": "stock_movement",
        "event_time": "2024-01-20 09:00:00",
        "product_id": 5,
        "product_name": "i j",
        "category": "Books",
        "warehouse": "W1",
        "quantity": 50,
        "movement_type": "supply",
        "source": "Acme",
        "responsible": "A B",
    }
]


def test_end_to_end_file_pipeline(spark, tmp_path):
    sales_in = tmp_path / "in_sales"
    stock_in = tmp_path / "in_stock"
    sales_in.mkdir()
    stock_in.mkdir()
    with open(sales_in / "batch1.jsonl", "w") as f:
        for ev in SALES_EVENTS:
            f.write(json.dumps(ev) + "\n")
        f.write("{this is not json\n")  # kafka_skip_broken_messages analog
    with open(stock_in / "batch1.jsonl", "w") as f:
        for ev in STOCK_EVENTS:
            f.write(json.dumps(ev) + "\n")

    mgr = file_pipeline(
        spark,
        str(sales_in),
        str(stock_in),
        str(tmp_path / "sales"),
        str(tmp_path / "stock"),
        str(tmp_path / "ckpt"),
    )
    for name in ("sales_mv", "stock_movements_mv"):
        q = mgr.attach(name, trigger_available_now=True)
        q.awaitTermination(120)
    mgr.detach_all()

    sales = spark.read.parquet(str(tmp_path / "sales"))
    got = {r.event_id: r for r in sales.collect()}
    # s3 (null price) dropped; malformed JSON line dropped; s1/s2/s4 land
    assert set(got) == {"s1", "s2", "s4"}
    assert got["s4"].event_time is None
    assert str(got["s1"].price) == "100.50"
    # month partition column derived from event_time (toYYYYMM analog)
    assert got["s1"].event_month == 202401
    assert got["s2"].event_month == 202402
    assert got["s4"].event_month is None

    stock = spark.read.parquet(str(tmp_path / "stock"))
    srows = stock.collect()
    assert len(srows) == 1 and srows[0].event_id == "w1"


def test_detach_then_reattach_resumes_from_checkpoint(spark, tmp_path):
    """DETACH/ATTACH lifecycle (D4/D5): stop, add more input, re-attach;
    the checkpoint resumes without reprocessing old files."""
    sales_in = tmp_path / "in_sales"
    sales_in.mkdir()
    with open(sales_in / "b1.jsonl", "w") as f:
        f.write(json.dumps(SALES_EVENTS[0]) + "\n")

    mgr = file_pipeline(
        spark,
        str(sales_in),
        str(sales_in),
        str(tmp_path / "sales"),
        str(tmp_path / "stock"),
        str(tmp_path / "ckpt"),
    )
    q = mgr.attach("sales_mv", trigger_available_now=True)
    q.awaitTermination(120)
    mgr.detach("sales_mv")
    assert spark.read.parquet(str(tmp_path / "sales")).count() == 1

    ev2 = dict(SALES_EVENTS[0], event_id="s9")
    with open(sales_in / "b2.jsonl", "w") as f:
        f.write(json.dumps(ev2) + "\n")
    q = mgr.attach("sales_mv", trigger_available_now=True)
    q.awaitTermination(120)
    mgr.detach("sales_mv")

    ids = sorted(r.event_id for r in spark.read.parquet(str(tmp_path / "sales")).collect())
    assert ids == ["s1", "s9"]  # s1 not duplicated, s9 appended
