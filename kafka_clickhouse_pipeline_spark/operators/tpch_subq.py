"""Subquery-shaped TPC-H adaptations (Q2, Q11, Q12, Q20, Q21).

These close the remaining TPC-H operator families the contract did not
yet exercise: correlated-min scalar subquery decorrelated into a
group-and-join-back (Q2), HAVING against a global-scalar threshold
(Q11), two-way conditional counts over a late-shipment join (Q12),
IN-subquery as an explicit left-semi join (Q20), and the classic
EXISTS + NOT EXISTS pair as a semi join followed by an anti join on the
same fact (Q21).

Adaptations to the fixture schema (TESTDATA.md): there is no partsupp
table, so the part-supplier relation is derived from lineitem's
(l_partkey, l_suppkey) pairs, with min(l_extendedprice) standing in for
ps_supplycost and sum(l_quantity) for ps_availqty. lineitem has no
l_shipmode / l_commitdate / l_receiptdate, so Q12 groups by
l_returnflag and Q12/Q21 define "late" as shipping more than N days
after the order date.

Reference context: the reference app has no joins at all (SURVEY.md
section 2.10; web-app/app.py:57-160 is the whole query surface), so
this module is pure extension -- proving the engine generalizes to the
subquery/semi-join space Catalyst handles natively.

Scale design: every derived part-supplier aggregate shuffles once on
its group key; dimension sides (part, supplier, nation, region, the
one-row scalar thresholds, and the per-part min table) broadcast.
Thresholds compared as doubles are derived deterministically from
exact decimal sums, so Spark and DuckDB agree bit-for-bit; every LIMIT
is preceded by a total-order ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..functions.canon import money

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: for STANDARD parts of size 15, the EUROPE
    supplier(s) offering the minimum supply cost for each part, where
    supply cost is the minimum extended price this supplier ever
    charged for the part (exact decimal, so the equality join back is
    deterministic). The correlated min subquery decorrelates into a
    per-part aggregate broadcast-joined back on (partkey, cost)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eur = (
        supplier.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("supplycost")
    )
    cand = ps.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey")).join(
        broadcast(supp_eur), F.col("l_suppkey") == F.col("s_suppkey")
    )
    min_cost = cand.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        cand.join(
            broadcast(min_cost),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "s_suppkey", money("supplycost").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: per-part inventory value held by one nation's
    suppliers (value = sum of extendedprice*quantity over that nation's
    lineitems), keeping parts whose value exceeds 0.1% of the nation
    total. The HAVING threshold is a one-row scalar broadcast; the only
    fact shuffle is the per-part aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp_n = supplier.join(
        broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    value = F.sum(
        (_dec("l_extendedprice") * _dec("l_quantity")).cast("decimal(28,4)")
    ).alias("value")
    per_part = (
        li.join(broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(value)
    )
    total = per_part.agg(F.sum("value").alias("tot"))
    return (
        per_part.join(
            broadcast(total),
            F.col("value").cast("double") > F.lit(0.001) * F.col("tot").cast("double"),
        )
        .orderBy(F.col("value").desc(), "partkey")
        .select("partkey", money("value", 4).alias("value"))
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: for lines that shipped late (more than 90
    days after the order date) during 1996, count urgent/high-priority
    vs other orders per return flag (standing in for ship mode).
    Conditional integer counts over one fact-fact shuffle join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: NATION_7 suppliers who shipped more than 30%
    of any '%ing%' part's total 1996 volume. The IN subquery is an
    explicit left-semi join; the excess set is built from two
    aggregations of the same filtered fact slice (per part-supplier,
    per part), with the per-part totals broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%ing%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    li96 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_ps = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("ps_qty")
    )
    per_part = li96.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("part_qty")
    )
    excess = per_ps.join(
        broadcast(per_part), F.col("l_partkey") == F.col("t_partkey")
    ).filter(
        F.col("ps_qty").cast("double") > F.lit(0.3) * F.col("part_qty").cast("double")
    )
    return (
        supplier.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            excess.select(F.col("l_suppkey").alias("x_suppkey")),
            F.col("s_suppkey") == F.col("x_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: NATION_3 suppliers whose late line (shipped
    more than 60 days after the order date) is the ONLY late line in a
    multi-supplier order. EXISTS becomes a left-semi join (another
    supplier's line in the same order) and NOT EXISTS a left-anti join
    (no other supplier late in the same order) -- both shuffling on
    orderkey against the same fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    supp_n = supplier.join(
        broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        late.join(broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


TPCH_SUBQ_ORACLES: dict[str, str] = {
    "q2_min_cost_supplier": """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
          FROM lineitem GROUP BY 1, 2),
        cand AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                 s_suppkey, supplycost, l_partkey
          FROM ps
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               s_suppkey, CAST(supplycost AS STRING) AS supplycost
        FROM cand c1
        WHERE supplycost = (SELECT min(c2.supplycost) FROM cand c2
                            WHERE c2.l_partkey = c1.l_partkey)
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        LIMIT 100
    """,
    "q11_important_stock": """
        WITH per_part AS (
          SELECT l_partkey AS partkey,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_quantity AS DECIMAL(18,2))
                          AS DECIMAL(28,4))) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY 1)
        SELECT partkey, CAST(value AS STRING) AS value
        FROM per_part
        WHERE CAST(value AS DOUBLE) >
              0.001 * (SELECT CAST(sum(value) AS DOUBLE) FROM per_part)
        ORDER BY partkey
    """,
    "q12_shipmode_priority": """
        SELECT l_returnflag AS ship_mode,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1 ORDER BY 1
    """,
    "q20_excess_suppliers": """
        WITH li96 AS (
          SELECT l_partkey, l_suppkey, l_quantity
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%ing%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'),
        per_ps AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_qty
          FROM li96 GROUP BY 1, 2),
        per_part AS (
          SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
          FROM li96 GROUP BY 1)
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (
            SELECT l_suppkey FROM per_ps
            JOIN per_part USING (l_partkey)
            WHERE CAST(ps_qty AS DOUBLE) > 0.3 * CAST(part_qty AS DOUBLE))
        ORDER BY s_name
    """,
    "q21_waiting_suppliers": """
        WITH late AS (
          SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        SELECT s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
}

TPCH_SUBQ_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}
