"""Dump .explain("formatted") for named registered queries to files.

Usage:
    python tools/explain_dump.py --sf /root/testdata/sf0.1 \
        --outdir plans/r11 --suffix _after name [name ...]

Writes <outdir>/<name><suffix>.txt with the formatted physical plan
(initial AQE plan -- the judge-checkable artifact the round deliverables
require; guide section 7.2).
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--outdir", default="plans/r11")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from kafka_clickhouse_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
