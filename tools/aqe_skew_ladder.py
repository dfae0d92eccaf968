"""AQE-skew-join crossover ladder (round 10, VERDICT r9 #6).

q_salted_join_brand_volume's docstring routes real workloads to
broadcast first, AQE skew-join second, and names the explicit salt as
the remedy of last resort -- this ladder MEASURES that triage instead
of asserting it. Fixture: a fact table with a single Zipf-hot key
(hot fraction p of all rows on one key, remainder uniform over 100k
keys) shuffle-joined to a deliberately non-broadcastable dim
(autoBroadcastJoinThreshold=-1), three ways:

  - ``aqe_off``   plain shuffled join, AQE skew handling disabled --
                  the straggler baseline (one reducer owns the hot key)
  - ``aqe_on``    AQE skew-join enabled. NOTE: at fixture scale the
                  DEFAULT trigger (5x median AND >256 MB partition,
                  spark.sql.adaptive.skewJoin.skewedPartitionThreshold-
                  InBytes) never fires, which is itself the headline
                  finding -- a hot partition can straggle badly while
                  staying under the byte threshold. The tuned rung
                  lowers the threshold/advisory size so the splitter
                  can act, modeling the production-scale ratio.
  - ``salt``      the explicit salt-replicated join exactly as
                  q_salted_join_brand_volume builds it (fact side
                  salted mod 32, dim replicated per salt).

Reported per rung: min-of-2 warm wall for a full materialization, and
the max/median join-task output rows (spark_partition_id captured
BEFORE any later exchange) -- max-task-rows is the straggler witness:
wall-clock on local[32] under-reports skew because 31 idle cores hide
one busy one far better than a 1000-executor stage ever could.

Usage:
    python tools/aqe_skew_ladder.py [--rows 8000000] [--keys 100000]
        [--hot 0.0 0.2 0.5] [--salts 32]

Results land in SCALE.md ("Round-10 AQE-skew-join crossover ladder");
run on an idle box and rebuild nothing -- the fixture is generated
in-session from spark.range (deterministic, no files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fact(spark, rows: int, keys: int, hot: float):
    from pyspark.sql import functions as F

    # deterministic hot assignment: the first hot*rows ids by modulus
    # stripe (not a prefix -- a prefix would co-locate the hot key in
    # a few input partitions and confound the shuffle measurement)
    den = 1_000_000
    hot_mod = int(hot * den)
    return spark.range(rows).select(
        "id",
        F.when(F.col("id") % den < hot_mod, F.lit(0))
        .otherwise((F.col("id") % keys) + 1)
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("x"),
    )


def _dim(spark, keys: int):
    from pyspark.sql import functions as F

    return spark.range(keys + 1).select(
        F.col("id").alias("k"), (F.col("id") % 31).cast("double").alias("w")
    )


def _join(fact, dim):
    from pyspark.sql import functions as F

    return fact.join(dim.hint("shuffle_hash"), "k").select(
        "k", (F.col("x") + F.col("w")).alias("y")
    )


def _salted_join(spark, fact, dim, salts: int):
    from pyspark.sql import functions as F

    # salt off a high-cardinality column, exactly as the registered
    # pattern salts off l_orderkey (a low-cardinality salt source
    # re-concentrates the hot key onto few salts)
    salted = fact.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(salts))
    )
    sids = spark.range(salts).select(F.col("id").cast("long").alias("salt"))
    replicated = dim.crossJoin(F.broadcast(sids)).hint("shuffle_hash")
    return salted.join(replicated, ["k", "salt"]).select(
        "k", (F.col("x") + F.col("w")).alias("y")
    )


def _measure(spark, df):
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall = min(wall1, time.perf_counter() - t0)
    # straggler witness: rows per join-output task, captured before
    # the diagnostic aggregation's own exchange. The payload column
    # rides along (summed) so Catalyst cannot column-prune the join
    # shuffle down to the constant hot key -- AQE's skew decisions
    # read COMPRESSED map-output sizes, and an all-constant partition
    # compresses below any threshold, which would make this diagnostic
    # run un-split even when the measured run split (observed while
    # building this ladder).
    per_task = (
        df.select(F.spark_partition_id().alias("pid"), "y")
        .groupBy("pid")
        .agg(F.count("*").alias("count"), F.sum("y"))
        .collect()
    )
    counts = sorted((r["count"] for r in per_task), reverse=True)
    mid = counts[len(counts) // 2] if counts else 0
    return {
        "wall_sec": round(wall, 2),
        "n_tasks": len(counts),
        "max_task_rows": counts[0] if counts else 0,
        "median_task_rows": mid,
        "skew_ratio": round(counts[0] / max(mid, 1), 1) if counts else 0.0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--hot", type=float, nargs="+", default=[0.0, 0.2, 0.5])
    ap.add_argument("--salts", type=int, default=32)
    args = ap.parse_args()

    from kafka_clickhouse_pipeline_spark.session import get_spark

    spark = get_spark(app_name="aqe_skew_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    dim = _dim(spark, args.keys)

    def configure(mode: str):
        # static baseline AND the salt pattern run with adaptive fully
        # off: the salt is exactly the plan-stable form for engines/
        # regimes where no runtime re-planner exists, and the static
        # rung must show the raw hot reducer (AQE's partition
        # COALESCING alone already rewrites small-fixture task counts
        # and would mask the straggler witness)
        if mode in ("static", "salt"):
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            return
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        if mode == "aqe_default":
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        elif mode == "aqe_tuned":
            # production-ratio trigger at fixture scale: the default
            # 256 MB floor is far above this fixture's whole shuffle
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "4m",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m"
            )

    results = []
    for hot in args.hot:
        fact = _fact(spark, args.rows, args.keys, hot)
        for mode in ("static", "aqe_default", "aqe_tuned", "salt"):
            configure(mode)
            df = (
                _salted_join(spark, fact, dim, args.salts)
                if mode == "salt"
                else _join(fact, dim)
            )
            rec = {"hot": hot, "mode": mode, **_measure(spark, df)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n| hot | mode | wall s | tasks | max task rows | median | skew ratio |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['hot']} | {r['mode']} | {r['wall_sec']} | {r['n_tasks']} "
            f"| {r['max_task_rows']} | {r['median_task_rows']} "
            f"| {r['skew_ratio']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
