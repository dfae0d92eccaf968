"""Reshaping operators: pivot (long->wide) and deterministic
systematic sampling.

Pivot with an explicit value list compiles to conditional aggregation
(one scan, one shuffle on the group key -- same plan as A4's
incoming/outgoing columns, generalized); never call pivot without the
value list at scale, or Spark runs an extra distinct pass to discover
columns.

Systematic sampling (key mod n) is the deterministic, oracle-checkable
sampling form; Bernoulli ``df.sample`` is partition-order dependent and
belongs to interactive exploration, not reproducible pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.canon import money

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide table: one summed-value column per event type
    (explicit pivot values -> no discovery pass)."""
    events = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(dec))
    )
    return wide.select(
        "user_id", *[money(t).alias(t) for t in EVENT_TYPES]
    ).orderBy("user_id")


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample of events by key residue."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") % 20 == 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            money(F.col("value").cast("decimal(18,2)")).alias("value"),
        )
        .orderBy("event_id")
    )


#: Per-source sample size for the hash-ranked sampler.
SAMPLE_K = 40


def q_sample_hash_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random per-stratum sampling: within each
    source keep the SAMPLE_K documents with the smallest md5(doc_id) --
    a reproducible uniform sample (the hash is the random order, so the
    sample is stable across runs, engines, and partitionings; the
    standard trick for auditable subsampling of a training corpus).

    Scale path: ``grouped_topk`` prunes map-side to <= k rows per
    source per Arrow batch before the rank shuffle -- O(batches x
    sources x k) shuffled rows instead of the full corpus (the
    window-only formulation the oracle uses ships every row)."""
    from .topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    top = grouped_topk(
        keyed, ["source"], [("h", True), ("doc_id", True)], SAMPLE_K, rank_col="rnk"
    )
    return top.select("source", "doc_id", "h", "rnk").orderBy("source", "rnk")


#: Overall sampling budget for the quota sampler, as an exact integer
#: fraction of the corpus: numerator/denominator (40%). A fraction --
#: not an absolute count -- so per-source quotas can never exceed the
#: source's size at any scale factor.
QUOTA_NUM, QUOTA_DEN = 2, 5


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact largest-remainder (Hamilton) quota sampling: allocate a
    global 40% document budget across sources exactly proportionally
    -- floor quotas first, then the leftover seats to the largest
    fractional remainders -- and fill each source's quota with its
    md5-smallest documents. This is how a training-mixture budget is
    actually apportioned when 'sample 40%, keep source proportions
    EXACT' matters: per-source modulus/Bernoulli sampling
    (q_stratified_rebalance, q_temperature_sample) only hits the
    target in expectation; Hamilton allocation hits it exactly.

    All quota arithmetic is INTEGER (cnt * B div total and its
    remainder), so both engines agree bit-for-bit with no float
    anywhere; the fill order is the md5(doc_id) hash -- the same
    reproducible uniform order q_sample_hash_per_source uses.

    Scale shape: per-source counts (tiny agg), quota math on the
    #sources-row frame (the only unpartitioned window, bounded by the
    source vocabulary -- model metadata, like a centroid table), one
    bounded collect of max(quota) to size the map-side prune, then
    grouped_topk keeps <= max-quota rows per source per Arrow batch
    before the rank shuffle -- the corpus never shuffles whole."""
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    from .topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.agg(F.sum("cnt").alias("total"))
    q0 = (
        per.crossJoin(broadcast(tot))
        .withColumn("b", F.expr(f"(total * {QUOTA_NUM}) div {QUOTA_DEN}"))
        .withColumn("base", F.expr("(cnt * b) div total"))
        .withColumn("rem", F.expr("(cnt * b) % total"))
    )
    ex = q0.agg((F.first("b") - F.sum("base")).alias("extra"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    quotas = (
        q0.crossJoin(broadcast(ex))
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "quota", F.expr("base + if(rk <= extra, 1, 0)").cast("long")
        )
        .select("source", "quota")
    )
    max_quota = quotas.agg(F.max("quota")).first()[0] or 0
    keyed = docs.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    top = grouped_topk(
        keyed,
        ["source"],
        [("h", True), ("doc_id", True)],
        max(int(max_quota), 1),
        rank_col="pick_rank",
    )
    return (
        top.join(broadcast(quotas), "source")
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select("source", "doc_id", "pick_rank", "quota")
        .orderBy("source", "pick_rank")
    )


def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long): quantity/extendedprice/discount melted
    into (measure, val) rows, then aggregated per measure. Unpivot is
    a per-row explode (map-side, no shuffle); the only shuffle is the
    3-group final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    wide = li.select(
        "l_orderkey",
        dec("l_quantity").alias("quantity"),
        dec("l_extendedprice").alias("extendedprice"),
        dec("l_discount").alias("discount"),
    )
    long = wide.unpivot(
        ["l_orderkey"], ["quantity", "extendedprice", "discount"], "measure", "val"
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("val")).alias("total"),
            money(F.min("val")).alias("min_val"),
            money(F.max("val")).alias("max_val"),
        )
        .orderBy("measure")
    )


def q_ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles over customer balance (deterministic total order
    via the custkey tiebreak): per-quartile count and balance range.
    A global ntile needs a single total order -- fine for ranked
    reporting output; at scale, prefer approx percentiles for cutoffs
    (q_value_percentiles_approx) and reserve ntile for bounded result
    sets."""
    from pyspark.sql.window import Window

    customer = load_table(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    w = Window.orderBy(F.col("bal"), F.col("c_custkey"))
    return (
        customer.select("c_custkey", dec.alias("bal"))
        .withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.min("bal")).alias("min_bal"),
            money(F.max("bal")).alias("max_bal"),
        )
        .orderBy("quartile")
    )


RESHAPE_ORACLES: dict[str, str] = {
    "q_unpivot_lineitem_measures": """
        WITH long AS (
          SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS val FROM lineitem
          UNION ALL
          SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
          UNION ALL
          SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem)
        SELECT measure, count(*) AS n,
               CAST(CAST(sum(val) AS DECIMAL(38,2)) AS STRING) AS total,
               CAST(min(val) AS STRING) AS min_val,
               CAST(max(val) AS STRING) AS max_val
        FROM long GROUP BY measure ORDER BY measure
    """,
    "q_ntile_acctbal_quartiles": """
        WITH ranked AS (
          SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
                 ntile(4) OVER (ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey)
                   AS quartile
          FROM customer)
        SELECT quartile, count(*) AS n,
               CAST(min(bal) AS STRING) AS min_bal,
               CAST(max(bal) AS STRING) AS max_bal
        FROM ranked GROUP BY quartile ORDER BY quartile
    """,
    "q_pivot_user_event_values": """
        SELECT user_id,
               CAST(CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS STRING) AS click,
               CAST(CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS STRING) AS error,
               CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS STRING) AS purchase,
               CAST(CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS STRING) AS signup,
               CAST(CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS STRING) AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q_sample_systematic": """
        SELECT event_id, user_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) AS STRING) AS value
        FROM events WHERE event_id % 20 = 0 ORDER BY event_id
    """,
    "q_sample_hash_per_source": f"""
        WITH h AS (SELECT source, doc_id,
                          md5(CAST(doc_id AS VARCHAR)) AS h
                   FROM documents),
        r AS (SELECT source, doc_id, h,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY h, doc_id) AS rnk
              FROM h)
        SELECT source, doc_id, h, rnk FROM r WHERE rnk <= {SAMPLE_K}
        ORDER BY source, rnk
    """,
    "q_quota_sample": f"""
        WITH per AS (SELECT source, count(*) AS cnt
                     FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM per),
        q0 AS (
          SELECT source, cnt, total,
                 (total * {QUOTA_NUM}) // {QUOTA_DEN} AS b,
                 (cnt * ((total * {QUOTA_NUM}) // {QUOTA_DEN})) // total AS base,
                 (cnt * ((total * {QUOTA_NUM}) // {QUOTA_DEN})) % total AS rem
          FROM per, tot),
        ex AS (SELECT b, b - sum(base) AS extra FROM q0 GROUP BY b),
        qf AS (
          SELECT source,
                 CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END
                      AS BIGINT) AS quota
          FROM (SELECT source, base, rem,
                       row_number() OVER (ORDER BY rem DESC, source) AS rk
                FROM q0), ex),
        rankd AS (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) AS pick_rank
          FROM documents)
        SELECT r.source, r.doc_id, CAST(r.pick_rank AS BIGINT) AS pick_rank,
               q.quota
        FROM rankd r JOIN qf q ON r.source = q.source
        WHERE r.pick_rank <= q.quota
        ORDER BY r.source, r.pick_rank
    """,
}

RESHAPE_QUERIES = {
    "q_sample_hash_per_source": q_sample_hash_per_source,
    "q_unpivot_lineitem_measures": q_unpivot_lineitem_measures,
    "q_ntile_acctbal_quartiles": q_ntile_acctbal_quartiles,
    "q_pivot_user_event_values": q_pivot_user_event_values,
    "q_sample_systematic": q_sample_systematic,
    "q_quota_sample": q_quota_sample,
}


# ---- weighted sampling without replacement (Efraimidis-Spirakis) ----

#: Sample size for the weighted sampler.
WEIGHTED_K = 100


def _hex32(col):
    """First 8 hex digits of md5(col) decoded as a 32-bit unsigned
    integer -- the fine-grained portable uniform the weighted sampler
    draws from (curation._hash256 is the same decode at 2 digits;
    8 digits give the 2^-32 resolution a weighted key needs). Decoded
    with one conv(hex, 16, 10) call -- bit-identical to the historical
    8-nibble ascii ladder and ~2.8x faster (round-7 hot-expression
    sweep; the SQL twin keeps the ladder, values are identical)."""
    h = F.md5(F.col(col).cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _hex32_sql(expr: str) -> str:
    """DuckDB twin of _hex32 over the md5-hex expression `expr`."""
    out = "CAST(0 AS BIGINT)"
    for j in range(1, 9):
        a = f"ascii(substr({expr}, {j}, 1))"
        d = f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"
        out = f"({out} * 16 + {d})"
    return out


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: WEIGHTED_K
    documents drawn with probability proportional to length (n_chars)
    by the Efraimidis-Spirakis A-ES scheme -- each item gets key =
    u^(1/w) for a uniform u, and the k largest keys ARE a w-weighted
    sample without replacement (the one-pass distributed form of
    weighted reservoir sampling; the standard trick for size-biased
    corpus subsampling, e.g. favoring long documents for long-context
    training mixes).

    Determinism/portability: u = (hex32(md5(doc_id)) + 0.5) / 2^32 --
    the md5 decode both engines share -- and the key is compared in
    log space, ln(u)/w (monotone in u^(1/w), avoiding the
    non-bit-portable pow); ln on an exact-dyadic-rational input is the
    DSIR-proven portable op. Keys are rounded to 9 dp before ranking
    (the established cross-engine comparison grid), with doc_id
    breaking grid ties identically in both engines. w =
    greatest(n_chars, 1) guards degenerate zero-length docs.

    Scale shape: pure map to compute keys, then grouped_topk map-side
    pruning -- only ~batches x K rows reach the final rank shuffle, so
    the sampler is one corpus scan regardless of K or skew. (A
    row_number window would shuffle every row to one reducer.)"""
    from .topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    u = (_hex32("doc_id").cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.log(u) / w, 9).alias("key"),
    ).withColumn("g", F.lit(1))
    top = grouped_topk(
        keyed, ["g"], [("key", False), ("doc_id", True)], WEIGHTED_K
    )
    return top.select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "source",
        "n_chars",
        "key",
    ).orderBy("rank")


RESHAPE_ORACLES["q_weighted_sample"] = f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(ln(({_hex32_sql("md5(CAST(doc_id AS VARCHAR))")}
                       + 0.5) / 4294967296.0)
                   / greatest(CAST(n_chars AS DOUBLE), 1.0), 9) AS key
      FROM documents),
    ranked AS (
      SELECT doc_id, source, n_chars, key,
             CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
               AS rank
      FROM keyed)
    SELECT rank, doc_id, source, n_chars, key
    FROM ranked WHERE rank <= {WEIGHTED_K}
    ORDER BY rank
"""

RESHAPE_QUERIES["q_weighted_sample"] = q_weighted_sample
