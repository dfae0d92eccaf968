"""Catalog operator coverage (SURVEY.md section 2.6 D1-D7)."""

from __future__ import annotations

from kafka_clickhouse_pipeline_spark.catalog import register_views, tables_exist


def test_register_views_and_show_tables(spark, sf_dir):
    register_views(spark, sf_dir)  # D1 analog
    names = {t.name for t in spark.catalog.listTables()}  # D6 SHOW TABLES
    assert {"events", "lineitem", "documents", "embeddings"} <= names
    # views are queryable through SQL (the reference's serving path)
    assert spark.sql("SELECT count(*) AS c FROM events").collect()[0]["c"] > 0
    spark.catalog.dropTempView("events")  # D3 DROP TABLE
    assert "events" not in {t.name for t in spark.catalog.listTables()}
    register_views(spark, sf_dir)  # idempotent re-create (IF NOT EXISTS analog)


def test_tables_exist_probe(spark, sf_dir):
    assert tables_exist(spark, sf_dir, ("events", "lineitem"))  # D7
    assert not tables_exist(spark, sf_dir, ("events", "no_such_table"))
