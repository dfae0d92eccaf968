"""Interleaved gate-toggled A/B of the wedge-pair Arrow kernel
(VERDICT r11 #2): in ONE fresh session, alternate kernel-on and
kernel-off (graph.WEDGE_KERNEL_ENABLED) runs of q_node_jaccard_capped
back-to-back for N pairs. Adjacent runs see the same box state, so the
per-pair ratio fallback/kernel is robust to the host-side ghost load
that smears absolute wall numbers on this box (r11: 176% canary
spread; r12 baseline sweep: 1.6x median smear at loadavg 0.26).

The off arm keeps the fallback's own broadcast gates intact (unlike
the equality tests' edge-gate=-1 trick), so the comparison is
kernel-vs-JVM-aggregate at the shapes production would actually run.

Usage:
    python tools/wedge_ab.py [--sf /root/testdata/sf0.1] [--pairs 5]
        [--out WEDGE_AB.json] [names...]
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
from kafka_clickhouse_pipeline_spark.operators import graph
from kafka_clickhouse_pipeline_spark.session import get_spark

name, sf_dir, pairs = @NAME@, @SF@, @PAIRS@
load_before = round(os.getloadavg()[0], 2)
spark = get_spark(app_name="wedge_ab")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
from kafka_clickhouse_pipeline_spark.catalog import load_table
from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES
for t in FIXTURE_TABLES:
    load_table(spark, sf_dir, t).limit(1).collect()
fn = entry.queries()[name]

def run(kernel):
    graph.WEDGE_KERNEL_ENABLED = kernel
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)

# one untimed warm pass per arm (codegen + python worker spin-up)
run(True); run(False)
obs = []
for _ in range(pairs):
    k = run(True)
    f = run(False)
    obs.append((k, f))
load_after = round(os.getloadavg()[0], 2)
ratios = sorted(f / k for k, f in obs)
mid = len(ratios) // 2
median_ratio = ratios[mid] if len(ratios) % 2 else (ratios[mid-1]+ratios[mid])/2
print("AB_RESULT " + json.dumps(dict(
    name=name, pairs=obs,
    kernel_min=min(k for k, _ in obs), fallback_min=min(f for _, f in obs),
    median_fallback_over_kernel=round(median_ratio, 3),
    loadavg_before=load_before, loadavg_after=load_after,
)))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or ["q_node_jaccard_capped"]

    results = []
    for name in names:
        child = (
            _CHILD.replace("@ROOT@", repr(ROOT))
            .replace("@NAME@", repr(name))
            .replace("@SF@", repr(args.sf))
            .replace("@PAIRS@", repr(args.pairs))
        )
        proc = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("AB_RESULT ")
            ),
            None,
        )
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child failed for {name}")
        rec = json.loads(line[len("AB_RESULT "):])
        print(json.dumps(rec))
        results.append(rec)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
