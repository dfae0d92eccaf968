"""Per-stage wall/metric breakdown for one registered query (guide
section 1/7: find WHERE the time goes before touching anything).

Runs the named query in THIS process (fresh session, same warm-up as
bench.py), then pulls every stage of the run from the Spark status
REST API and prints stages sorted by executorRunTime, with shuffle
read/write bytes, task counts, and max-task skew.

Usage:
    python tools/stage_profile.py [--sf DIR] [--runs 1] name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from kafka_clickhouse_pipeline_spark.session import get_spark

    spark = get_spark(app_name="stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        load_table(spark, args.sf, t).limit(1).collect()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry.queries()

    def stages() -> dict[int, dict]:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            data = json.loads(r.read())
        return {s["stageId"]: s for s in data}

    for name in args.names:
        before = stages()
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        after = stages()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot_run = sum(s.get("executorRunTime", 0) for s in new)
        print(f"\n=== {name}: wall {best:.2f}s, {len(new)} stages, "
              f"sum executorRunTime {tot_run/1000.0:.1f}s ===")
        print(f"{'stage':>6} {'run_s':>8} {'cpu_s':>8} {'tasks':>6} "
              f"{'in_MB':>8} {'sh_r_MB':>8} {'sh_w_MB':>8} {'rows_out':>12}  name")
        for s in new[: args.top]:
            print(
                f"{s['stageId']:>6} "
                f"{s.get('executorRunTime', 0)/1000.0:>8.2f} "
                f"{s.get('executorCpuTime', 0)/1e9:>8.2f} "
                f"{s.get('numCompleteTasks', 0):>6} "
                f"{s.get('inputBytes', 0)/1e6:>8.1f} "
                f"{s.get('shuffleReadBytes', 0)/1e6:>8.1f} "
                f"{s.get('shuffleWriteBytes', 0)/1e6:>8.1f} "
                f"{s.get('outputRecords', 0) or s.get('shuffleWriteRecords', 0):>12} "
                f" {s.get('name', '')[:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
