"""Binary (sign-quantized) embedding search: pack each embedding's
sign bits into two 32-bit halves of BIGINTs, rank neighbors by Hamming
distance (XOR + popcount), and audit what the 32x compression costs in
top-k recall against the exact cosine ranking.

Why this is a first-class 100 TB operator: binary quantization is the
standard production prefilter for web-scale retrieval -- 64-dim float
embeddings are 256 bytes/vector, the sign code is 16 bytes (here two
BIGINT halves; 32x smaller than the float array), and the distance is
two XORs + two popcounts per pair, pure integer ALU work inside
whole-stage codegen. A 10^9-vector corpus's codes fit in ~16 GB --
broadcastable cluster-wide -- where the float corpus would be 256 GB
and shuffle-bound. The standard pipeline is Hamming-prefilter ->
exact re-rank on the survivors; q_hamming_recall measures the
prefilter's honesty on this corpus.

Determinism / oracle exactness: the sign bit (x > 0) is decided on
the raw float values identically in both engines; packing is integer
sums of distinct powers of two (exact); distance is integer popcount
of XOR -- no floating-point anywhere past the sign decision, so the
DuckDB twins are byte-exact with no rounding discipline needed. Bits
land in two 32-bit halves so every shifted value stays far from the
BIGINT sign bit (a 64-bit pack would need 1<<63, which overflows to
the sign bit and drags engine-specific overflow semantics in).

Reference scope note: the reference pipeline (ClickHouse DDL + Flask,
app.py) has no vector surface; this module is part of the extension
families the build brief asks for (similarity search at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .similarity import N_QUERIES, SIMILARITY_ORACLES, TOP_K
from .topk import grouped_topk

HAMMING_QUERIES: dict = {}
HAMMING_ORACLES: dict[str, str] = {}

#: Embedding dimensionality of the fixture corpus (two 32-bit halves).
DIM = 64
_HALF = 32


def _sign_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, lo, hi): sign-bit codes of each embedding, bit i of
    ``lo`` = (embedding[i+1] > 0) for dims 1..32, ``hi`` likewise for
    dims 33..64. One JVM-side higher-order-function pass per half --
    no UDF, no shuffle; the aggregate is a sum of distinct powers of
    two, exact in BIGINT."""

    def half(start: int) -> str:
        return (
            f"aggregate(zip_with(slice(embedding, {start}, {_HALF}), "
            f"sequence(0, {_HALF - 1}), "
            "(x, i) -> IF(x > 0, shiftleft(1L, i), 0L)), "
            "0L, (a, x) -> a + x)"
        )

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(half(1)).alias("lo"),
        F.expr(half(_HALF + 1)).alias("hi"),
    )


#: Shared DuckDB CTE: identical packing (1-based subscripts).
_CODES_SQL = f"""
    codes AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN i <= {_HALF} AND x > 0
                           THEN (1::BIGINT << (i - 1)) ELSE 0 END)
                  AS BIGINT) AS lo,
             CAST(sum(CASE WHEN i > {_HALF} AND x > 0
                           THEN (1::BIGINT << (i - {_HALF + 1})) ELSE 0 END)
                  AS BIGINT) AS hi
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY vec_id)
"""


def q_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming top-k over sign-quantized embeddings: for each query
    vector (vec_id < N_QUERIES), the TOP_K nearest other vectors by
    popcount(XOR) distance over the packed sign codes; ties break by
    neighbor_id, matching the brute-force family's discipline.

    Plan shape: codes are computed in one map pass, the N_QUERIES-row
    query side is broadcast, distance is two XOR+popcounts inside
    whole-stage codegen, and grouped_topk's map-side heap means only
    ~batches x queries x k rows reach the rank shuffle -- the corpus
    is scanned once and never shuffled. At 100 TB the float corpus
    never loads at all: codes can be precomputed once (16 bytes/row)
    and this query becomes an integer-only scan."""
    codes = _sign_codes(spark, sf_dir)
    queries = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    corpus = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("lo").alias("nlo"),
        F.col("hi").alias("nhi"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.bit_count(F.expr("qlo ^ nlo")) + F.bit_count(F.expr("qhi ^ nhi"))
        )
        .cast("long")
        .alias("hamming"),
    )
    return grouped_topk(
        scored, ["query_id"], [("hamming", True), ("neighbor_id", True)], TOP_K
    ).orderBy("query_id", "rank")


HAMMING_QUERIES["q_ann_hamming_topk"] = q_ann_hamming_topk
HAMMING_ORACLES["q_ann_hamming_topk"] = f"""
    WITH {_CODES_SQL},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.lo, c.lo))
                  + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
      FROM codes q JOIN codes c
        ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, hamming, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
"""


def q_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the Hamming (sign-quantized) top-k against the
    exact cosine top-k, per query -- the honesty audit every
    quantized prefilter ships with (the q_ann_recall_audit /
    q_matryoshka_recall pattern applied to binary codes). n_true is
    always TOP_K; n_hit counts exact-cosine neighbors the Hamming
    ranking also surfaced at the same k."""
    from .similarity import q_ann_bruteforce_topk

    bf = q_ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hm = q_ann_hamming_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("h_neighbor")
    )
    return (
        bf.join(
            hm,
            (bf.query_id == hm.query_id)
            & (bf.neighbor_id == hm.h_neighbor),
            "left",
        )
        .drop(hm.query_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.count("h_neighbor").cast("long").alias("n_hit"),
            F.round(
                F.count("h_neighbor") / F.count(F.lit(1)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


HAMMING_QUERIES["q_hamming_recall"] = q_hamming_recall
HAMMING_ORACLES["q_hamming_recall"] = f"""
    WITH bf AS ({SIMILARITY_ORACLES["q_ann_bruteforce_topk"]}),
    hm AS ({HAMMING_ORACLES["q_ann_hamming_topk"]})
    SELECT bf.query_id,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST(count(hm.neighbor_id) AS BIGINT) AS n_hit,
           round(count(hm.neighbor_id) * 1.0 / count(*), 6) AS recall
    FROM bf LEFT JOIN hm
      ON bf.query_id = hm.query_id
     AND bf.neighbor_id = hm.neighbor_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""
