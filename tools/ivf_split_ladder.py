"""IVF occupancy-split ladder (round 9, VERDICT r8 #3).

Measures, on the round-8 Zipf-skew embedding fixtures (tools/ladder.py
--skew) and their uniform twins, what the occupancy-bounded bucket
split buys: max/top-3 bucket share before vs after the split, centroid
counts, min-of-2 warm wall-clock, and top-k recall vs brute force for
both the plain stride index (q_ann_ivf_topk) and the split index
(q_ann_ivf_split_topk).

Usage:
    python tools/ivf_split_ladder.py [--sf /root/testdata/sf0.1]
        [--replicas 1 4] [--workdir /tmp/spark_graft_ladder]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shares(vecs, centroids):
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.operators import similarity as S

    rows = S._centroid_rows(centroids)
    occ = (
        vecs.select(
            S._nearest_centroid_udf(rows)(F.col("v")).alias("centroid_id")
        )
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in occ), reverse=True)
    total = sum(counts)
    return {
        "n_buckets": len(counts),
        "n_centroids": len(rows),
        "max_share": round(counts[0] / total, 4),
        "top3_share": round(sum(counts[:3]) / total, 4),
    }


def _recall(spark, fx, fn):
    from kafka_clickhouse_pipeline_spark.operators import similarity as S

    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.q_ann_bruteforce_topk(spark, fx).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in fn(spark, fx).collect()}
    return round(len(bf & got) / len(bf), 4)


def _timeit(spark, fx, fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, fx).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--workdir", default="/tmp/spark_graft_ladder")
    args = ap.parse_args()

    from kafka_clickhouse_pipeline_spark.operators import similarity as S
    from kafka_clickhouse_pipeline_spark.session import get_spark
    from tools.ladder import build_replicated

    spark = get_spark(app_name="ivf_split_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg())
    out = []
    for n in args.replicas:
        for skew in (False, True):
            suffix = "_skew" if skew else ""
            fx = os.path.join(
                args.workdir, f"{os.path.basename(args.sf)}_x{n}{suffix}"
            )
            build_replicated(spark, args.sf, n, fx, skew=skew)
            vecs = S._vectors(spark, fx)
            pre = _shares(vecs, S._stride_centroids(vecs))
            post = _shares(vecs, S.split_centroids(vecs))
            rec = {
                "fixture": f"{'skew' if skew else 'uniform'} {n}x",
                "stride": pre,
                "split": post,
                "plain_sec": _timeit(spark, fx, S.q_ann_ivf_topk),
                "split_sec": _timeit(spark, fx, S.q_ann_ivf_split_topk),
                "plain_recall": _recall(spark, fx, S.q_ann_ivf_topk),
                "split_recall": _recall(spark, fx, S.q_ann_ivf_split_topk),
            }
            out.append(rec)
            print(json.dumps(rec))
    print("loadavg", os.getloadavg())
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
