"""Structured Streaming re-expression of the reference's ingest
pipeline: Kafka topics -> materialized-view transforms -> partitioned
columnar tables (generate_data.py:96-246)."""
