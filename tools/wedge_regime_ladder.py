"""Winning-regime ladder for the minhash wedge twin (VERDICT r7 #5).

The round-7 ladder measured q_node_jaccard_minhash only in the
LOW-jaccard top-K regime (the fixture's exact top-20 sits at j ~ 0.09),
where one-row bands must pass nearly everything and the twin loses at
1x. Its claimed winning regime -- a HIGH similarity floor, where
r >= 2 banding collapses candidates superlinearly (pass probability
1-(1-j^r)^b) -- was asserted from the band curve, not measured. This
tool measures it.

Fixture (planted near-dup adjacency twins on a noisy background):
  * T twin pairs (u, v): 16 + (i % 9) SHARED neighbors plus 8 private
    neighbors each -> adjacency Jaccard 0.50-0.64 (the "mirror
    products" a near-dup screen hunts).
  * B background nodes, each co-ordered with k=24 parts drawn
    hash-deterministically from a pool of P parts -> background pairs
    share ~k^2/P ~ 0.3 neighbors (j ~ 0.006), and pool parts acquire
    degree ~B*k/P, so the EXACT wedge volume sum C(d,2) is dominated
    by ~P * C(Bk/P, 2) + B * C(k, 2) -- real work, none of it
    relevant to the j >= 0.5 question.
  * Rungs scale B and P together (per-pool degree constant), so exact
    wedge volume grows ~linearly and the ladder isolates the
    CANDIDATE-GENERATION constant, not a blowup artifact.

Measured per rung:
  exact        q_node_jaccard (full wedge expansion) wall clock +
               wedge volume sum C(d,2) + distinct pairs examined
  twin r=2     q_node_jaccard_minhash(bands=16, rows=2) wall clock +
               candidate count (post anti-join) + top-K overlap vs
               exact
  twin r=1     the registered default (bands=32, rows=1) at the 1x
               rung only -- the same-fixture control showing the
               r-knob, not fixture luck, is what wins

Usage:
    python tools/wedge_regime_ladder.py [--rungs 1,2,4] [--out DIR]

NOTE (memory: ladder-runs-need-idle-cpus): run alone on an idle box;
concurrent pytest/bench pollutes the timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from kafka_clickhouse_pipeline_spark.session import get_spark  # noqa: E402

#: 1x geometry (scaled by the rung factor). Background picks/pool are
#: sized so a background pair's minhash pass probability -- (m/u)^2
#: per two-row band, m = shared neighbors, u = union size -- is
#: quadratically suppressed (u ~ 94) while the exact wedge volume
#: (= sum over pairs of m) stays large: the first 1x attempt with
#: k=24/P=2000 (u ~ 47) measured 4.5M noise candidates and no
#: wall-clock win; doubling the set sizes at constant overlap cuts
#: noise ~4x per pair by the same law the operator docstring states.
TWIN_PAIRS = 50
BACKGROUND_NODES = 24_000
POOL_PARTS = 4_000
PICKS_PER_NODE = 48

#: High-similarity band geometry under test (32 hashes, like the
#: registered default, re-cut into 16 two-row bands).
WIN_BANDS, WIN_ROWS = 16, 2


def build_fixture(spark: SparkSession, out_dir: str, factor: int) -> None:
    """Write lineitem.parquet with the planted-twin co-purchase graph."""
    T = TWIN_PAIRS * factor
    B = BACKGROUND_NODES * factor
    P = POOL_PARTS * factor

    # twin pairs: u=2i, v=2i+1; shared neighbors 10M+i*64+j (degree 2:
    # exactly the twin wedge), private neighbors degree 1 (no wedges)
    twins = spark.range(T).select(F.col("id").alias("i"))
    shared_n = F.lit(16) + (F.col("i") % 9)  # j in [0.50, 0.64]
    sh = twins.select(
        "i", F.explode(F.sequence(F.lit(0), shared_n - 1)).alias("j")
    )
    shared_part = F.lit(10_000_000) + F.col("i") * 64 + F.col("j")
    twin_rows = (
        sh.select(
            (F.lit(1_000_000_000) + F.col("i") * 64 + F.col("j")).alias(
                "l_orderkey"
            ),
            (F.col("i") * 2).alias("l_partkey"),
            shared_part.alias("other"),
        )
        .union(
            sh.select(
                (F.lit(2_000_000_000) + F.col("i") * 64 + F.col("j")).alias(
                    "l_orderkey"
                ),
                (F.col("i") * 2 + 1).alias("l_partkey"),
                shared_part.alias("other"),
            )
        )
    )
    priv = twins.select(
        "i", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j")
    )
    pu = priv.select(
        (F.lit(3_000_000_000) + F.col("i") * 16 + F.col("j")).alias(
            "l_orderkey"
        ),
        (F.col("i") * 2).alias("l_partkey"),
        (F.lit(20_000_000) + F.col("i") * 64 + F.col("j")).alias("other"),
    )
    pv = priv.select(
        (F.lit(4_000_000_000) + F.col("i") * 16 + F.col("j")).alias(
            "l_orderkey"
        ),
        (F.col("i") * 2 + 1).alias("l_partkey"),
        (F.lit(30_000_000) + F.col("i") * 64 + F.col("j")).alias("other"),
    )

    # background: node ids 1M.., pool part ids 5M..; picks are a
    # deterministic xxhash64 draw (a multiplicative-congruence pick
    # makes every node's set a translate of ONE arithmetic
    # progression -- structured, heavy-tailed overlaps; measured 4.6M
    # noise candidates before this fix). Duplicates within a node's k
    # picks just shrink its set -- realistic and harmless.
    bg = spark.range(B).select((F.lit(1_000_000) + F.col("id")).alias("n"))
    picks = bg.select(
        "n", F.explode(F.sequence(F.lit(0), F.lit(PICKS_PER_NODE - 1))).alias("j")
    )
    pool_part = F.lit(5_000_000) + F.pmod(
        F.xxhash64(F.col("n"), F.col("j")), F.lit(P)
    )
    bg_rows = picks.select(
        (F.lit(5_000_000_000) + F.col("n") * 64 + F.col("j")).alias(
            "l_orderkey"
        ),
        F.col("n").alias("l_partkey"),
        pool_part.alias("other"),
    )

    all_pairs = twin_rows.union(pu).union(pv).union(bg_rows)
    li = all_pairs.select("l_orderkey", "l_partkey").union(
        all_pairs.select("l_orderkey", F.col("other").alias("l_partkey"))
    )
    li.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )


def wedge_volume(edges: DataFrame) -> int:
    """Exact wedge volume sum C(d,2) over the co-purchase adjacency --
    the pair count exact expansion must materialize."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
    ).collect()[0][0]


def run_rung(spark: SparkSession, sf_dir: str, factor: int,
             include_r1: bool) -> dict:
    from kafka_clickhouse_pipeline_spark.lineage import cut_lineage
    from kafka_clickhouse_pipeline_spark.operators.graph import (
        co_purchase_edges,
        q_node_jaccard,
        q_node_jaccard_minhash,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    edges = co_purchase_edges(li).transform(cut_lineage)
    edges.write.mode("overwrite").format("noop").save()  # warm the input

    out: dict = {"factor": factor}
    out["n_edges_directed"] = edges.count()
    out["wedge_volume"] = wedge_volume(edges)

    t0 = time.perf_counter()
    exact_top = [
        (r["u"], r["v"]) for r in q_node_jaccard(spark, sf_dir).collect()
    ]
    out["exact_sec"] = round(time.perf_counter() - t0, 1)

    def _twin(bands: int, rows: int, key: str) -> None:
        t0 = time.perf_counter()
        top = [
            (r["u"], r["v"])
            for r in q_node_jaccard_minhash(
                spark, sf_dir, bands=bands, rows=rows
            ).collect()
        ]
        out[f"{key}_sec"] = round(time.perf_counter() - t0, 1)
        out[f"{key}_recall_vs_exact_topk"] = round(
            len(set(top) & set(exact_top)) / max(len(exact_top), 1), 3
        )
        # candidate count: rebuild the candidate stage alone (cheap
        # relative to the full run; the twin's verify is the other half)
        from kafka_clickhouse_pipeline_spark.operators import graph as g

        nb = edges.select(
            "src", F.md5(F.col("dst").cast("string")).alias("base")
        )
        sigs = nb.groupBy("src").agg(
            *[
                F.min(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("base")))
                ).alias(f"h{i}")
                for i in range(bands * rows)
            ]
        )
        band_keys = F.array(
            *[
                F.md5(
                    F.concat(
                        *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                )
                for b in range(bands)
            ]
        )
        bands_df = sigs.select(
            "src", F.posexplode(band_keys).alias("band", "bucket")
        )
        a, b2 = bands_df.alias("a"), bands_df.alias("b").hint("shuffle_hash")
        cand = (
            a.join(
                b2,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.src") < F.col("b.src")),
            )
            .select(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
            .distinct()
        )
        out[f"{key}_candidates"] = cand.count()

    _twin(WIN_BANDS, WIN_ROWS, "twin_r2")
    if include_r1:
        _twin(32, 1, "twin_r1")
    out["candidate_cut_r2"] = round(
        out["wedge_volume"] / max(out["twin_r2_candidates"], 1), 1
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="1,2,4")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    spark = get_spark(app_name="wedge-regime-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    base = args.out or tempfile.mkdtemp(prefix="wedge_regime_")
    results = []
    for factor in rungs:
        d = os.path.join(base, f"x{factor}")
        build_fixture(spark, d, factor)
        res = run_rung(spark, d, factor, include_r1=(factor == rungs[0]))
        print(json.dumps(res))
        results.append(res)
    print(json.dumps({"ladder": results, "loadavg": os.getloadavg()[0]}))
    spark.stop()


if __name__ == "__main__":
    main()
