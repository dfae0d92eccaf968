"""Order-insensitive Spark-vs-DuckDB comparison, mimicking the driver's
correctness gate (row count + column names + value hash)."""

from __future__ import annotations

import decimal
import math
from datetime import date, datetime


def _norm(v):
    """Normalize a cell so Spark and DuckDB renderings hash alike."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical(rows, colnames) -> list[str]:
    """Rows -> sorted list of canonical strings, columns sorted by name
    (the driver sorts columns by name before hashing)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = list(row)
        out.append("|".join(_norm(vals[i]) for i in order))
    out.sort()
    return out


def assert_query_matches_oracle(spark, oracle, query_fn, sql, sf_dir):
    sdf = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = oracle.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = canonical(spark_rows, spark_cols)
    d = canonical(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
