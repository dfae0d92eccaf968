"""SQL-string entry point: the reference's four queries as raw SQL via
spark.sql must produce exactly what the DataFrame forms produce."""

from __future__ import annotations

import pytest

from kafka_clickhouse_pipeline_spark.operators import serving


@pytest.mark.parametrize("name", sorted(serving.SERVING_SQL))
def test_sql_equals_dataframe(spark, sf_dir, name):
    sql_rows = [tuple(r) for r in serving.run_sql(spark, sf_dir, serving.SERVING_SQL[name]).collect()]
    df_fn = getattr(serving, name)
    df_rows = [tuple(r) for r in df_fn(spark, sf_dir).collect()]
    assert sql_rows == df_rows
