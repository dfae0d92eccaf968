"""Additional TPC-H-shaped analytical queries (Q6, Q7, Q8, Q14, Q15,
Q17, Q18, Q19, Q22 -- adapted to the fixture schema, which has no
partsupp table and a reduced column set).

These widen the engine's proven analytical surface beyond the
reference's four serving queries (the reference has no joins at all,
SURVEY.md section 2.10): scan-only predicate aggregation (Q6), two-sided
nation joins with role-playing dimensions (Q7), market-share conditional
ratios over an 8-way join (Q8), promo ratio (Q14), scalar-subquery max
(Q15), correlated avg-threshold subquery (Q17), HAVING-gated fact
self-aggregation feeding a join (Q18), OR-of-conjuncts pushdown (Q19),
and scalar-threshold + anti-join grouping (Q22).

Scale design (unchanged from analytics.py): dims broadcast, fact-fact
joins shuffle on the join key, money stays decimal until the final
double division, every threshold comparison is exact (decimal sums or
integer-valued doubles) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..functions.canon import big as big_int, money, ts_str

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def _volume():
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(28,4)"
    )


_VOL_SQL = """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(28,4))"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + conjunctive predicate + single aggregate.
    The whole query is one codegen'd scan stage with every predicate
    pushed to parquet -- the canonical predicate-pushdown benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(
                F.sum((_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(28,4)")),
                4,
            ).alias("revenue")
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    The nation dimension role-plays twice (supplier side and customer
    side) -- both broadcast; only lineitem><orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (
                ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(money(F.sum(_volume()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue inside the
    ASIA region per order-year. Conditional-sum ratio over an 8-way
    join; everything but lineitem><orders is a broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _volume()
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(broadcast(region), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                F.lit(0).cast("decimal(28,4)")
            )).alias("nation_volume"),
            F.sum(vol).alias("total_volume"),
        )
        .select(
            "o_year",
            (
                F.col("nation_volume").cast("double")
                / F.col("total_volume").cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp, so profit = discounted revenue):
    per supplier-nation per order-year, for parts whose name matches a
    pattern. LIKE-filtered broadcast part dim + nation role-play."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%ing%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(money(F.sum(_volume()), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per (brand, type, size
    bucket), using lineitem's (partkey, suppkey) pairs as the
    part-supplier relation, excluding one brand and one type prefix.
    DISTINCT aggregation behind negated predicates + IN-list."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    Conditional-sum ratio; part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    vol = _volume()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(
                F.lit(0).cast("decimal(28,4)")
            )).alias("promo"),
            F.sum(vol).alias("total"),
        )
        .select(
            (F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"))
            .alias("promo_revenue")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.
    The max is a one-row scalar subquery joined back by exact decimal
    equality (decimal sums are order-insensitive, so the equality is
    deterministic in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_volume()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", money("total_revenue", 4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not filled, for one
    brand+type. The correlated avg subquery becomes a per-part
    aggregate joined back on partkey. l_quantity is integer-valued, so
    its double average is exact in both engines and the threshold
    comparison is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above 300 total quantity.
    The HAVING-gated self-aggregation of lineitem feeds the join --
    filtering to big orders BEFORE joining orders/customer, so the join
    input is tiny. Deterministic top-100 (o_orderkey tiebreak)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey"))
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ts_str("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            money("sum_qty").alias("sum_qty"),
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from an OR of three (brand, size, quantity)
    conjunct groups. Catalyst extracts the common partkey equi-join and
    pushes the shared predicates; part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(money(F.sum(_volume()), 4).alias("revenue"))
    )


def q22_untapped_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: market segments of above-average-balance
    customers with no RECENT order (none since 1999 -- "never ordered"
    is empty at every fixture SF, which would make the check vacuous).
    The global average is an exact scalar (decimal sum / count, divided
    as double -- identical in both engines); no-recent-order is a
    left-anti join against the filtered orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    thr = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thr")
    )
    return (
        customer.join(broadcast(thr), F.col("c_acctbal") > F.col("thr"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(F.sum(_dec("c_acctbal"))).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


TPCH_EXTRA_ORACLES: dict[str, str] = {
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS STRING) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(sum({_VOL_SQL}) AS STRING) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q8_market_share": f"""
        WITH flat AS (
          SELECT year(o_orderdate) AS o_year,
                 {_VOL_SQL} AS volume,
                 ns.n_name AS supp_nation
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation nc ON c_nationkey = nc.n_nationkey
          JOIN region   ON nc.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ns ON s_nationkey = ns.n_nationkey
          WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01')
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                             ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) /
               CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM flat GROUP BY o_year ORDER BY o_year
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum({_VOL_SQL}) AS STRING) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%ing%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_VOL_SQL}
                                     ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) /
               CAST(sum({_VOL_SQL}) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey, sum({_VOL_SQL}) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_revenue AS STRING) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "q17_small_quantity_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q18_large_volume_customers": """
        WITH big AS (
          SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
               o_totalprice, CAST(sum_qty AS STRING) AS sum_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_discounted_revenue": f"""
        SELECT CAST(sum({_VOL_SQL}) AS STRING) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_untapped_segments": """
        WITH thr AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                 AS thr
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total_acctbal
        FROM customer, thr
        WHERE c_acctbal > thr
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
}

TPCH_EXTRA_QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_untapped_segments": q22_untapped_segments,
}
