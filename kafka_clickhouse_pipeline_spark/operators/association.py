"""Market-basket association mining: pairwise support / confidence /
lift over order baskets -- the co-occurrence analytics layer
(ClickHouse users run exactly this shape over order-item tables; it is
also the curation-side "which sources co-occur in the same crawl
snapshot" primitive).

Items are part BRANDS (the 25-value p_brand attribute) rather than raw
part keys: attribute-level rules are what the analysis consumes, and
the bounded item vocabulary is what makes the pair space tractable --
the pair keyspace is at most |brands|^2 regardless of corpus size.

Scale shape (no self-join):
- lineitem joins the part dimension by BROADCAST (parts : orders is
  1 : 7.5 in TPC-H, but only (p_partkey, p_brand) is shipped; at a
  scale where even that projection outgrows broadcast, the join falls
  back to shuffle and everything downstream is unchanged).
- ONE shuffle groups baskets: groupBy(l_orderkey) -> collect_set of
  distinct brands (buffer bounded by |brands| = 25, so no group can
  blow up regardless of order size -- unlike partkey baskets).
- Pair expansion is MAP-SIDE from the basket array (the
  co_purchase_edges pattern, graph.py:216): explode x explode with
  a < b, then ONE tiny groupBy over the <= |brands|^2/2 pair keyspace
  with map-side partial aggregation, so the second shuffle moves at
  most a few hundred partial rows per task.
- Per-item counts and the basket total are map-side-combined
  aggregates over the same basket frame; both join back by broadcast
  (25 rows / 1 row).

Counts are exact integers; support / confidence / lift are single
double divisions of exact integers (IEEE-identical in both engines),
rounded once at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..lineage import cut_lineage


def brand_baskets(li: DataFrame, part: DataFrame) -> DataFrame:
    """(l_orderkey, brands): distinct sorted brand set per order."""
    items = li.select("l_orderkey", "l_partkey").join(
        broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("brands")
    )


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All brand pairs that ever co-occur in an order, with support
    (pair share of baskets), directional confidence P(b | a), and lift
    (observed co-occurrence over the independence expectation) -- the
    association-rule screen behind "frequently bought together".

    Output is the full (bounded) pair table ordered by brand for
    stable comparison; lift > 1 rows are the affinity signal. TPC-H
    assigns parts to orders uniformly, so lifts SHOULD hover near 1 --
    the crafted-fixture test pins a planted affinity instead."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = brand_baskets(li, part).transform(cut_lineage)
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = (
        baskets.select(F.explode("brands").alias("brand_a"), "brands")
        .select("brand_a", F.explode("brands").alias("brand_b"))
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    enriched = (
        pairs.join(
            broadcast(
                item_counts.select(
                    F.col("brand").alias("brand_a"), F.col("n_item").alias("n_a")
                )
            ),
            "brand_a",
        )
        .join(
            broadcast(
                item_counts.select(
                    F.col("brand").alias("brand_b"), F.col("n_item").alias("n_b")
                )
            ),
            "brand_b",
        )
        .crossJoin(broadcast(n_baskets))
    )
    nab = F.col("n_ab").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = F.col("n_baskets").cast("double")
    return enriched.select(
        "brand_a",
        "brand_b",
        "n_a",
        "n_b",
        "n_ab",
        "n_baskets",
        F.round(nab / nn, 6).alias("support"),
        F.round(nab / na, 6).alias("confidence_a_b"),
        F.round(nab / nb, 6).alias("confidence_b_a"),
        F.round(nab * nn / (na * nb), 6).alias("lift"),
    ).orderBy("brand_a", "brand_b")


ASSOCIATION_ORACLES: dict[str, str] = {}

ASSOCIATION_ORACLES["q_basket_lift"] = """
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items),
    ic AS (SELECT brand, count(*) AS n_item FROM items GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(n.n_baskets AS BIGINT) AS n_baskets,
           round(CAST(p.n_ab AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), 6)
             AS support,
           round(CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE), 6)
             AS confidence_a_b,
           round(CAST(p.n_ab AS DOUBLE) / CAST(ib.n_item AS DOUBLE), 6)
             AS confidence_b_a,
           round(CAST(p.n_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)
                 / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)), 6)
             AS lift
    FROM pairs p
    JOIN ic ia ON ia.brand = p.brand_a
    JOIN ic ib ON ib.brand = p.brand_b
    CROSS JOIN n
    ORDER BY brand_a, brand_b
"""

#: Depth-3 itemset output bound: top-K by (count desc, brands) keeps
#: the result deterministic and metadata-sized at any corpus size.
ITEMSET3_TOPK = 50


def q_basket_itemsets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand TRIPLES: the depth-3 level of the A-priori
    lattice q_basket_lift's pairs sit on -- "customers who buy A and B
    also buy C" rule mining needs the 3-itemset supports, and naive
    SQL gets them with a triple self-join that shuffles the items
    relation three times. Here the basket array (<= 7 items per TPC-H
    order, a hard fanout bound) expands its <= C(7,3)=35 sorted
    triples MAP-SIDE -- zero joins, one count shuffle whose width is
    the triple count -- then top-K by support with full tiebreak.
    The DuckDB twin is the classic three-way join, so this is another
    two-plans-one-answer entry."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = brand_baskets(li, part)
    triples = (
        baskets.select(F.explode("brands").alias("a"), "brands")
        .select("a", F.explode("brands").alias("b"), "brands")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.explode("brands").alias("c"))
        .filter(F.col("b") < F.col("c"))
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_abc"))
    )
    return (
        triples.select(
            F.col("a").alias("brand_a"),
            F.col("b").alias("brand_b"),
            F.col("c").alias("brand_c"),
            "n_abc",
        )
        .orderBy(
            F.col("n_abc").desc(), "brand_a", "brand_b", "brand_c"
        )
        .limit(ITEMSET3_TOPK)
    )


ASSOCIATION_ORACLES["q_basket_itemsets3"] = f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT a.brand AS brand_a, b.brand AS brand_b, c.brand AS brand_c,
           CAST(count(*) AS BIGINT) AS n_abc
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
    JOIN items c ON b.l_orderkey = c.l_orderkey AND b.brand < c.brand
    GROUP BY 1, 2, 3
    ORDER BY n_abc DESC, brand_a, brand_b, brand_c
    LIMIT {ITEMSET3_TOPK}
"""

ASSOCIATION_QUERIES = {
    "q_basket_lift": q_basket_lift,
    "q_basket_itemsets3": q_basket_itemsets3,
}
