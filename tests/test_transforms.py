"""Unit tests for the MV transforms (SURVEY.md section 5.3): pure
DataFrame -> DataFrame, edge cases from FIXTURES.md A1."""

from __future__ import annotations

import decimal

from pyspark.sql import Row

from kafka_clickhouse_pipeline_spark.schemas import SALES_RAW_SCHEMA, WAREHOUSE_RAW_SCHEMA
from kafka_clickhouse_pipeline_spark.streaming.transforms import parse_sales, parse_stock


def _sale(**overrides):
    base = dict(
        event_id="e1",
        event_type="sale",
        event_time="2024-01-15 10:30:00",
        product_id=7,
        product_name="alpha beta",
        category="Books",
        quantity=3,
        price=123.45,
        discount=0.12,
        total=98.76,
        store_id=2,
        cashier_id=5,
        customer_id="c1",
    )
    base.update(overrides)
    return Row(**base)


def test_parse_sales_happy_path(spark):
    out = parse_sales(spark.createDataFrame([_sale()], SALES_RAW_SCHEMA)).collect()[0]
    assert out.event_time.isoformat() == "2024-01-15T10:30:00"
    assert out.price == decimal.Decimal("123.45")
    assert out.discount == decimal.Decimal("0.12")
    assert out.total == decimal.Decimal("98.76")
    assert out.processing_time is not None  # DEFAULT now() analog


def test_parse_sales_drops_null_price(spark):
    """WHERE price IS NOT NULL (generate_data.py:227)."""
    df = spark.createDataFrame([_sale(), _sale(event_id="e2", price=None)], SALES_RAW_SCHEMA)
    out = parse_sales(df).collect()
    assert [r.event_id for r in out] == ["e1"]


def test_parse_sales_bad_event_time_lands_with_null(spark):
    """parseDateTimeBestEffortOrNull: unparseable time -> null, row kept
    (sales filter only checks price)."""
    df = spark.createDataFrame([_sale(event_time="not-a-time")], SALES_RAW_SCHEMA)
    out = parse_sales(df).collect()
    assert len(out) == 1 and out[0].event_time is None


def test_parse_sales_decimal_truncation_agreement(spark):
    """SURVEY.md F2 edge: inputs pre-rounded to 2 dp are exact; a 3-dp
    input documents the Spark HALF_UP rounding choice."""
    df = spark.createDataFrame([_sale(price=10.005)], SALES_RAW_SCHEMA)
    assert parse_sales(df).collect()[0].price == decimal.Decimal("10.01")


def test_parse_stock_no_filter(spark):
    """stock_movements_mv has no WHERE: every row lands, even with null
    event_time (generate_data.py:231-246)."""
    rows = [
        Row(
            event_id="w1",
            event_type="stock_movement",
            event_time="garbage",
            product_id=9,
            product_name="x y",
            category="c",
            warehouse="W",
            quantity=-5,
            movement_type="write_off",
            source="Acme",
            responsible="A B",
        )
    ]
    out = parse_stock(spark.createDataFrame(rows, WAREHOUSE_RAW_SCHEMA)).collect()
    assert len(out) == 1
    assert out[0].event_time is None
    assert out[0].quantity == -5  # Int32 signed
