"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference streaming pipeline
(andreynetrebin/kafka_clickhouse_pipeline).

The reference is a Kafka -> ClickHouse ETL demo: JSON events land in two
Kafka topics, ClickHouse Kafka-engine tables consume them, materialized
views parse/cast/filter into MergeTree tables, and a Flask dashboard runs
four analytical queries. This package re-expresses that surface
Spark-first:

- ``sources``   -- Kafka / file readers (reference: Kafka-engine tables,
                   generate_data.py:96-139)
- ``streaming`` -- the materialized-view transforms as Structured
                   Streaming queries (generate_data.py:210-246)
- ``operators`` -- the serving/analytical queries (web-app/app.py:57-160)
                   plus large-scale extensions (dedup, similarity search,
                   text analysis, multimodal) the reference lacks
- ``functions`` -- ClickHouse scalar-function equivalents built from
                   pyspark.sql.functions (no Python UDFs on hot paths)
- ``plans``     -- plan-inspection helpers (pushdown/broadcast asserts)

Everything is DataFrame-declarative so Catalyst supplies pushdown,
pruning, partial aggregation and whole-stage codegen; no RDDs.
"""

__version__ = "0.1.0"
