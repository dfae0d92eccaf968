"""Fuzzed oracle parity: run core aggregation semantics over
hypothesis-generated event tables (not just the driver fixtures) and
compare Spark vs DuckDB on the same parquet bytes."""

from __future__ import annotations

import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

event_strategy = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.datetimes(
        min_value=__import__("datetime").datetime(2024, 1, 1),
        max_value=__import__("datetime").datetime(2024, 1, 30),
    ).map(lambda d: d.replace(microsecond=0)),
    st.sampled_from(["purchase", "view", "click"]),
    st.one_of(
        st.none(),
        st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_strategy, min_size=0, max_size=60))
def test_grouped_decimal_agg_parity_on_random_data(spark, tmp_path_factory, rows):
    tmp = str(tmp_path_factory.mktemp("fuzz"))
    path = os.path.join(tmp, "events.parquet")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)

    sdf = (
        spark.read.parquet(path)
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.max("ts").alias("latest"),
        )
        .orderBy("event_type")
    )
    srows = [(r.event_type, r.n, str(r.total), r.latest) for r in sdf.collect()]

    con = duckdb.connect()
    drows = con.execute(
        f"""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS total,
               max(ts) AS latest
        FROM read_parquet('{path}/*.parquet')
        WHERE value IS NOT NULL
        GROUP BY event_type ORDER BY event_type
        """
    ).fetchall()
    con.close()
    assert [(a, b, c, d) for a, b, c, d in drows] == srows
