"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized with the no-op sink (executors do all
the work, nothing collects to the driver), timed after a session
warm-up so JVM startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kafka_clickhouse_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Headline set: the reference's four serving queries + the heaviest
#: representative of each extension family.
HEADLINE = [
    "sales_by_hour",
    "stock_top5",
    "recent_sales",
    "status_counts",
    "mv_parse_typed",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q10_top_returning_customers",
    "q_window_running_revenue",
    "q_token_stats",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce_topk",
    "q_multimodal_features",
]


def main() -> None:
    import __spark_entry__ as entry

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # warm up the JVM, codegen, and input-table file indexes without
    # billing any query (a long-running cluster has all of these hot)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        load_table(spark, SF_DIR, t).limit(1).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": f"headline_queries_total_runtime_local[{CPUS}]",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
