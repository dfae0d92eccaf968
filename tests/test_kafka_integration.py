"""Live-broker Kafka integration smoke (VERDICT r3 #6).

Runs ONLY when BOTH a reachable broker (``KAFKA_BOOTSTRAP``, default
``localhost:9092``) and the spark-sql-kafka connector package are
present; cleanly skipped otherwise. This sandbox ships neither
(DEPLOY.md "Kafka connectivity"), so the suite records a skip here --
the brokerless round-trip tests in test_streaming.py cover the
identical parse/serialize path through the file-source twin; THIS test
is the one that exercises ``readStream.format("kafka")`` /
``write.format("kafka")`` themselves when an environment provides
them (reference stack: docker-compose.yml:10-34 broker +
generate_data.py producers).

To run it for real:
    spark-submit --packages \
        org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> ...
    KAFKA_BOOTSTRAP=broker:9092 python -m pytest \
        tests/test_kafka_integration.py -q
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _connector_present(spark) -> bool:
    """Probe the classpath only (never touches the network): a missing
    provider fails DataSource lookup before any broker I/O."""
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "classpath_probe").load()
        return True
    except Exception as exc:  # noqa: BLE001
        return "Failed to find data source" not in str(exc)


@pytest.mark.skipif(
    not _broker_reachable(),
    reason=f"no Kafka broker reachable at {BOOTSTRAP} (expected in this "
    "sandbox -- see DEPLOY.md)",
)
def test_kafka_roundtrip_one_microbatch(spark, tmp_path):
    """One micro-batch end-to-end through the REAL connector: produce
    two valid JSON sales events plus one malformed payload with the
    production serializer, consume via read_kafka_json_stream, assert
    the two valid rows land typed and the corrupt one is dropped."""
    if not _connector_present(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")

    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.schemas import SALES_RAW_SCHEMA
    from kafka_clickhouse_pipeline_spark.sources.kafka import (
        read_kafka_json_stream,
        serialize_json_payload,
    )

    topic = f"smoke_{uuid.uuid4().hex[:8]}"
    valid = spark.createDataFrame(
        [
            ("e1", "sale", "2024-03-01 10:00:00", 7, "Widget", "tools",
             2, 10.5, 0.0, 21.0, 1, 1, "c1"),
            ("e2", "sale", "2024-03-01 10:00:05", 8, "Gadget", "tools",
             1, 5.0, 0.5, 5.0, 1, 2, "c2"),
        ],
        SALES_RAW_SCHEMA,
    )
    (
        serialize_json_payload(valid)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    (
        spark.createDataFrame([("{not json",)], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    parsed = read_kafka_json_stream(spark, BOOTSTRAP, topic, SALES_RAW_SCHEMA)
    name = f"kafka_smoke_{topic}"
    q = (
        parsed.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(f"SELECT * FROM {name} ORDER BY event_id").collect()
    assert [r["event_id"] for r in rows] == ["e1", "e2"]
    assert rows[0]["quantity"] == 2 and rows[0]["price"] == 10.5
