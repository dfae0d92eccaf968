"""Concurrent query execution on one SparkSession: the serving app
handles overlapping dashboard polls (ThreadingHTTPServer), so the
engine must produce correct results when queries run in parallel on
shared session state. Spark sessions are thread-safe by contract; this
pins it for OUR query surface (catalog view registration, canonical
output selects, broadcast joins)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entrymod

#: A mixed workload: aggregation, top-K, join, window, text.
WORKLOAD = [
    "sales_by_hour",
    "stock_top5",
    "status_counts",
    "q4_order_priority",
    "q_token_stats",
    "q_window_percent_rank",
]


def test_parallel_queries_match_serial_results(spark, sf_dir):
    qs = entrymod.queries()

    def run(name):
        return name, sorted(map(tuple, qs[name](spark, sf_dir).collect()))

    serial = dict(run(n) for n in WORKLOAD)

    with ThreadPoolExecutor(max_workers=len(WORKLOAD)) as pool:
        parallel = dict(pool.map(run, WORKLOAD))

    assert parallel == serial


def test_repeated_parallel_rounds_are_stable(spark, sf_dir):
    """Three overlapping rounds of the same query (the 5-second
    dashboard poll pattern) return identical results every time."""
    qs = entrymod.queries()

    def run(_):
        return sorted(map(tuple, qs["stock_top5"](spark, sf_dir).collect()))

    with ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(run, range(3)))
    assert results[0] == results[1] == results[2]
