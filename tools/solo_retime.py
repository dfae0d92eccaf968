"""Solo fresh-session retiming harness (VERDICT r8 #2).

The Arrow-UDF ANN family (q_ann_ivf_topk, q_ann_ivf_kmeans_topk,
q_knn_graph) showed a monotonic 3.7x bench slowdown across rounds on
byte-identical code (git-verified: zero modified lines since r6).
In-sweep numbers can't isolate the cause: the registry sweep leaves
GC/page-cache pressure, and the driver box is sometimes contended.
This harness times each named query SOLO -- its own fresh JVM
(subprocess), its own warm-up, min of N in-session runs -- and records
the loadavg + library-version witness beside every number so the
result is comparable across rounds.

Usage:
    python tools/solo_retime.py [--sf /root/testdata/sf0.1]
        [--runs 5] [--out RETIME.json] name [name ...]

Writes one JSON file: {name: {"min_sec", "runs", "all_sec",
"loadavg_before", "loadavg_after"}, "_versions": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, @ROOT@)
import __spark_entry__ as entry
from kafka_clickhouse_pipeline_spark.session import get_spark

name, sf_dir, runs = @NAME@, @SF@, @RUNS@
load_before = round(os.getloadavg()[0], 2)
spark = get_spark(app_name="solo_retime")
spark.sparkContext.setLogLevel("ERROR")
# same warm-up bench.py gives every query: JVM/codegen + table file
# indexes hot, so the number is steady-state engine cost
spark.range(1_000_000).selectExpr("sum(id)").collect()
from kafka_clickhouse_pipeline_spark.catalog import load_table
from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES
for t in FIXTURE_TABLES:
    load_table(spark, sf_dir, t).limit(1).collect()
fn = entry.queries()[name]
all_sec = []
for _ in range(runs):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    all_sec.append(round(time.perf_counter() - t0, 3))
load_after = round(os.getloadavg()[0], 2)
print("SOLO_RESULT " + json.dumps(dict(
    min_sec=min(all_sec), runs=runs, all_sec=all_sec,
    loadavg_before=load_before, loadavg_after=load_after,
)))
spark.stop()
"""


def retime(names: list[str], sf_dir: str, runs: int) -> dict:
    sys.path.insert(0, ROOT)
    from bench import _versions

    out: dict = {"_versions": _versions(), "_sf_dir": sf_dir}
    for name in names:
        code = (
            _CHILD.replace("@ROOT@", repr(ROOT))
            .replace("@NAME@", repr(name))
            .replace("@SF@", repr(sf_dir))
            .replace("@RUNS@", str(runs))
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=1800,
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("SOLO_RESULT "):
                rec = json.loads(line[len("SOLO_RESULT "):])
        if rec is None:
            rec = {"error": (proc.stderr or proc.stdout)[-400:]}
        out[name] = rec
        print(name, json.dumps(rec))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    out = retime(args.names, args.sf, args.runs)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
