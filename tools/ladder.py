"""Salted replication ladder: measure how an operator's wall-clock
grows when the corpus is replicated 1x/4x/10x.

Round 3 measured this ad hoc (SCALE.md "Round-3 replication ladder");
this tool makes the methodology reproducible. Replicas are id-offset
and content-salted so cross-replica rows never collide (a per-replica
token prefix for documents, rolled vectors for embeddings, offset
order/part keys for lineitem) -- growth curves measure the operator,
not artificial duplication.

Usage:
    python tools/ladder.py [--sf /root/testdata/sf0.1] \
        [--replicas 1 4 10] [--runs 2] q_name [q_name...]

Prints one line per (query, replication) with min-of-N seconds, plus a
JSON summary. Replicated corpora are built once per replication level
under --workdir (default /tmp/spark_graft_ladder) and reused.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Large id offset per replica: keeps replica key spaces disjoint for
#: every integer-keyed table (fixture ids are far below 10^9).
OFFSET = 1_000_000_000

#: Round 6 adds events (offset user_id/event_id: n x volume, n x
#: distinct users, per-user event counts unchanged) and orders
#: (o_orderkey offset in lockstep with l_orderkey so the FK holds and
#: join-shaped queries ladder meaningfully; o_custkey stays, so each
#: customer carries n x orders -- the realistic growth direction).
SALTED_TABLES = ("lineitem", "documents", "embeddings", "events", "orders")

#: Power-law salting mode (VERDICT r6 #4): with --skew, a fixed
#: percentage of lineitem rows is remapped onto a small shared hub
#: part set (same hub ids in EVERY replica, so hub degree grows with
#: replication while the rest of the graph stays the baseline ladder).
#: 3% of 10x-replicated lineitem over 50 hubs gives hub co-purchase
#: degrees in the thousands vs the ~10^2 baseline -- the regime where
#: the p99 degree cap's payoff can be MEASURED instead of asserted
#: (the fixture graph is degree-homogeneous and the cap prunes ~2.5%).
#: Hub ids sit above every replica offset (and above 2^32, matching
#: the 10x rung's packed-pair fallback regime).
SKEW_PCT = 3
SKEW_NHUBS = 50
SKEW_HUB_BASE = 98_000_000_000

#: Embedding skew mode (VERDICT r7 #8): with --skew, embeddings are
#: remapped onto K cluster directions with ZIPF(1) sizes (cluster c
#: gets ~1/(c+1) of the corpus; the head cluster ~20%), by blending
#: each vector 90/10 with a deterministic per-cluster direction. The
#: IVF assignment then piles vectors into a few mega-buckets -- the
#: probe-imbalance stress for the ANN family, the same way the hub
#: remap stresses wedges (graph ladder). Cluster membership and
#: directions are xxhash-deterministic, so replicas and reruns agree.
EMB_SKEW_CLUSTERS = 32
EMB_SKEW_BLEND = 0.9


def build_replicated(
    spark, sf_dir: str, n: int, out_dir: str, skew: bool = False
) -> None:
    """Write an n-times salted replication of sf_dir into out_dir.
    Non-salted tables are passed through unchanged (symlinked)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.catalog import load_table, table_path
    from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES

    os.makedirs(out_dir, exist_ok=True)
    for name in FIXTURE_TABLES:
        src = table_path(sf_dir, name)
        if not os.path.exists(src):
            continue
        dst = table_path(out_dir, name)
        if os.path.exists(dst):
            continue
        # n == 1 passes through untouched ONLY without --skew: a
        # 1x-skew rung must still get the hub/cluster remap, else the
        # ladder's 1x row silently measures the uniform fixture
        if name not in SALTED_TABLES or (n == 1 and not skew):
            os.symlink(src, dst)
            continue
        base = load_table(spark, sf_dir, name)
        parts = []
        for r in range(n):
            off = F.lit(r * OFFSET)
            if name == "lineitem":
                rep = base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + off
                ).withColumn("l_partkey", F.col("l_partkey") + off)
                if skew:
                    h = F.md5(
                        F.concat_ws(
                            ":", F.col("l_orderkey"), F.col("l_partkey")
                        )
                    )
                    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
                    hub = (
                        F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
                        % SKEW_NHUBS
                    )
                    rep = rep.withColumn(
                        "l_partkey",
                        F.when(
                            u % 100 < SKEW_PCT,
                            F.lit(SKEW_HUB_BASE) + hub,
                        ).otherwise(F.col("l_partkey")),
                    )
            elif name == "documents":
                rep = base.withColumn("doc_id", F.col("doc_id") + off)
                if r:
                    rep = rep.withColumn(
                        "text", F.concat(F.lit(f"replica{r} "), F.col("text"))
                    )
            elif name == "events":
                rep = base.withColumn(
                    "event_id", F.col("event_id") + off
                ).withColumn("user_id", F.col("user_id") + off)
            elif name == "orders":
                rep = base.withColumn("o_orderkey", F.col("o_orderkey") + off)
            else:  # embeddings: roll the vector r positions
                rep = base.withColumn("vec_id", F.col("vec_id") + off)
                dim = len(base.select("embedding").first()[0])
                if r:
                    k = r % dim
                    rep = rep.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", k + 1, dim - k),
                            F.slice("embedding", 1, k),
                        ),
                    )
                if skew:
                    # Zipf(1) cluster id via inverse CDF of the
                    # xxhash-uniform draw: c = floor(e^(u ln(K+1))) - 1
                    # => P(c) = ln(1 + 1/(c+1)) / ln(K+1) ~ 1/(c+1)
                    kk = EMB_SKEW_CLUSTERS
                    u = (
                        F.pmod(F.xxhash64("vec_id"), F.lit(1_000_003))
                        .cast("double")
                        / 1_000_003.0
                    )
                    c = (
                        F.floor(F.exp(u * float(__import__("math").log(kk + 1))))
                        .cast("long")
                        - 1
                    )
                    # deterministic per-cluster direction in [-1, 1]^dim
                    center = F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda j: (
                            F.pmod(F.xxhash64(c, j), F.lit(2001))
                            .cast("double")
                            - 1000.0
                        )
                        / 1000.0,
                    )
                    blend = float(EMB_SKEW_BLEND)
                    rep = rep.withColumn(
                        "embedding",
                        F.zip_with(
                            "embedding",
                            center,
                            lambda a, b: (
                                a.cast("double") * (1.0 - blend) + b * blend
                            ).cast("float"),
                        ),
                    )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 4, 10])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/spark_graft_ladder")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="power-law hub salting of lineitem (see SKEW_* constants)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from kafka_clickhouse_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ladder")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    results: dict[str, dict[int, float]] = {n: {} for n in args.names}
    for n in args.replicas:
        suffix = "_skew" if args.skew else ""
        level_dir = os.path.join(
            args.workdir, f"{os.path.basename(args.sf)}_x{n}{suffix}"
        )
        build_replicated(spark, args.sf, n, level_dir, skew=args.skew)
        for name in args.names:
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                qs[name](spark, level_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][n] = round(best, 2)
            print(f"{name:42s} x{n:<3d} {best:7.2f}s", flush=True)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
