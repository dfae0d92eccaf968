"""Generator parity tests: distributions, determinism, and round-trip
through the real ingestion pipeline."""

from __future__ import annotations

from kafka_clickhouse_pipeline_spark.datagen import generate_events, product_catalog, write_jsonl
from kafka_clickhouse_pipeline_spark.streaming.ingest import file_pipeline


def test_distribution_parity(spark):
    sales, warehouse = generate_events(spark, 5000)
    n_s, n_w = sales.count(), warehouse.count()
    assert 0.65 < n_s / (n_s + n_w) < 0.75  # 70/30 mix
    srow = sales.limit(500).collect()
    assert all(1 <= r.product_id <= 50 for r in srow)
    assert all(1 <= r.quantity <= 5 for r in srow)
    assert all(0.0 <= r.discount <= 0.3 for r in srow)
    assert all(100 <= r.price <= 10000 for r in srow)
    assert all(1 <= r.store_id <= 10 and 1 <= r.cashier_id <= 20 for r in srow)
    wrow = warehouse.limit(500).collect()
    assert all(1 <= r.quantity <= 100 for r in wrow)
    assert all(r.movement_type in ("supply", "relocation", "write_off") for r in wrow)


def test_price_fixed_per_product(spark):
    """The catalog assigns one stable price per product
    (generate_data.py:370): every sale of product p carries p's price."""
    sales, _ = generate_events(spark, 2000)
    per_product = sales.groupBy("product_id").agg(
        {"price": "min", "price": "max"}
    )
    from pyspark.sql import functions as F

    bad = (
        sales.groupBy("product_id")
        .agg(F.countDistinct("price").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0


def test_deterministic_across_runs(spark):
    a, _ = generate_events(spark, 100, seed=7)
    b, _ = generate_events(spark, 100, seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c, _ = generate_events(spark, 100, seed=8)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_generated_events_flow_through_pipeline(spark, tmp_path):
    """End-to-end: generator -> JSONL wire format -> streaming MV
    pipeline -> typed tables (the reference's full loop, minus the
    broker)."""
    sales, warehouse = generate_events(spark, 300)
    write_jsonl(sales, str(tmp_path / "in_sales"))
    write_jsonl(warehouse, str(tmp_path / "in_stock"))
    mgr = file_pipeline(
        spark,
        str(tmp_path / "in_sales"),
        str(tmp_path / "in_stock"),
        str(tmp_path / "sales"),
        str(tmp_path / "stock"),
        str(tmp_path / "ckpt"),
    )
    for name in ("sales_mv", "stock_movements_mv"):
        q = mgr.attach(name, trigger_available_now=True)
        q.awaitTermination(120)
    mgr.detach_all()
    landed_sales = spark.read.parquet(str(tmp_path / "sales"))
    landed_stock = spark.read.parquet(str(tmp_path / "stock"))
    assert landed_sales.count() == sales.count()  # no null prices generated
    assert landed_stock.count() == warehouse.count()
    assert dict(landed_sales.dtypes)["price"] == "decimal(9,2)"
    assert dict(landed_stock.dtypes)["event_time"] == "timestamp"


def test_catalog_is_50_products(spark):
    cat = product_catalog(spark).collect()
    assert len(cat) == 50
    assert len({r.product_id for r in cat}) == 50
