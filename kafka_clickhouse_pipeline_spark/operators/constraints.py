"""Data-contract constraint auditing (the Deequ/Great-Expectations
layer of a production pipeline): declarative uniqueness, completeness,
range, and referential-integrity checks evaluated in full over the
fixture warehouse, one result row per check.

Why this is an engine operator: at 100 TB "validate before publish" is
a distributed job, not a notebook cell -- each check must be a single
map-side-combinable aggregate (uniqueness = count vs count distinct,
completeness/range = conditional counts) or a keyed anti-join (FK
orphans), never a collect. The audit's output is metadata-sized (one
row per constraint), so it can gate a publish step cheaply no matter
the input size.

Scale notes per check kind:
- uniqueness: count(*) vs count(DISTINCT key) -- two partial-agg
  passes fused into one shuffle; for approximate gating at extreme
  scale swap in approx_count_distinct (documented trade-off).
- completeness / range: conditional sums, purely map-side until the
  final 1-row combine.
- referential integrity: LEFT ANTI join fact->dim on the key;
  dimension sides (customer) broadcast, fact-fact (lineitem->orders)
  shuffles on the join key where AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..functions.canon import ts_str


def _check(name: str, checked: F.Column, violations: F.Column):
    return (
        F.lit(name).alias("check_name"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    )


def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over the warehouse: key uniqueness, FK
    integrity, completeness, and value-range contracts. Output one row
    per constraint: (constraint, n_checked, n_violations, passed)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    uniq_orders = orders.agg(
        *_check(
            "orders.o_orderkey unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
        )
    )
    uniq_cust = customer.agg(
        *_check(
            "customer.c_custkey unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("c_custkey"),
        )
    )
    fk_orders_cust = (
        orders.join(
            broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
        .crossJoin(broadcast(orders.agg(F.count(F.lit(1)).alias("n"))))
        .select(
            *_check(
                "orders.o_custkey -> customer.c_custkey",
                F.col("n"),
                F.col("orphans"),
            )
        )
    )
    fk_li_orders = (
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
        .crossJoin(broadcast(lineitem.agg(F.count(F.lit(1)).alias("n"))))
        .select(
            *_check(
                "lineitem.l_orderkey -> orders.o_orderkey",
                F.col("n"),
                F.col("orphans"),
            )
        )
    )
    ev_complete = events.agg(
        *_check(
            "events.value complete",
            F.count(F.lit(1)),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)),
        )
    )
    ev_range = events.agg(
        *_check(
            "events.value >= 0",
            F.count(F.lit(1)),
            F.sum(F.when(F.col("value") < 0, 1).otherwise(0)),
        )
    )
    doc_nonempty = docs.agg(
        *_check(
            "documents.text non-empty",
            F.count(F.lit(1)),
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0),
                    1,
                ).otherwise(0)
            ),
        )
    )
    out = (
        uniq_orders.unionByName(uniq_cust)
        .unionByName(fk_orders_cust)
        .unionByName(fk_li_orders)
        .unionByName(ev_complete)
        .unionByName(ev_range)
        .unionByName(doc_nonempty)
    )
    return out.select(
        "check_name",
        "n_checked",
        "n_violations",
        F.when(F.col("n_violations") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("passed"),
    ).orderBy("check_name")


CONSTRAINT_ORACLES = {
    "q_constraint_audit": """
        WITH checks AS (
          SELECT 'orders.o_orderkey unique' AS check_name,
                 count(*) AS n_checked,
                 count(*) - count(DISTINCT o_orderkey) AS n_violations
          FROM orders
          UNION ALL
          SELECT 'customer.c_custkey unique', count(*),
                 count(*) - count(DISTINCT c_custkey)
          FROM customer
          UNION ALL
          SELECT 'orders.o_custkey -> customer.c_custkey',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey))
          UNION ALL
          SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey))
          UNION ALL
          SELECT 'events.value complete', count(*),
                 sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
          FROM events
          UNION ALL
          SELECT 'events.value >= 0', count(*),
                 sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)
          FROM events
          UNION ALL
          SELECT 'documents.text non-empty', count(*),
                 sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
                          THEN 1 ELSE 0 END)
          FROM documents)
        SELECT check_name,
               CAST(n_checked AS BIGINT) AS n_checked,
               CAST(n_violations AS BIGINT) AS n_violations,
               CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS passed
        FROM checks ORDER BY check_name
    """,
}

CONSTRAINT_QUERIES = {"q_constraint_audit": q_constraint_audit}


# ---- join-key skew audit ----


def _key_skew(df: DataFrame, table: str, key: str) -> DataFrame:
    """One skew-profile row for (table, key): per-key counts from a
    map-side-combined groupBy, then a metadata-sized fold."""
    per_key = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    n_rows = F.col("n_rows").cast("double")
    n_keys = F.col("n_keys").cast("double")
    mx = F.col("max_cnt").cast("double")
    return m.select(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key_name"),
        "n_rows",
        "n_keys",
        "max_cnt",
        F.round(n_rows / n_keys, 6).alias("avg_cnt"),
        # hot-key amplification: how many times its fair share the
        # hottest key carries -- >> 1 means salt this key before a
        # shuffle join at scale
        F.round(mx * n_keys / n_rows, 6).alias("skew_ratio"),
        F.round(mx / n_rows, 6).alias("top1_share"),
    )


def q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for the warehouse's three hottest shuffle
    keys (lineitem.l_orderkey, orders.o_custkey, events.user_id) --
    the planning audit that decides, BEFORE a 100 TB join, whether a
    key needs salting / AQE skew handling: ``skew_ratio`` is the
    hottest key's multiple of its fair share and ``top1_share`` the
    fraction of all rows a single reducer would receive.

    Scale shape: each profile is one map-side-combined groupBy(key)
    followed by a metadata-sized fold; the three profiles union into a
    3-row report. Exact integer counts, ratios divided once at the
    boundary. (Approximate variant at extreme key cardinality: a CMS /
    sample-based profile -- this exact form is itself cheap because
    partial aggregation compacts per task before the shuffle.)"""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        _key_skew(li, "lineitem", "l_orderkey")
        .unionByName(_key_skew(orders, "orders", "o_custkey"))
        .unionByName(_key_skew(events, "events", "user_id"))
        .orderBy("table_name")
    )


def _key_skew_sql(table: str, key: str) -> str:
    return f"""
      SELECT '{table}' AS table_name, '{key}' AS key_name,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS avg_cnt,
             round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                   / CAST(sum(cnt) AS DOUBLE), 6) AS skew_ratio,
             round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
               AS top1_share
      FROM (SELECT CAST({key} AS VARCHAR) AS k, count(*) AS cnt
            FROM {table} GROUP BY 1)"""


CONSTRAINT_QUERIES["q_key_skew_audit"] = q_key_skew_audit
CONSTRAINT_ORACLES["q_key_skew_audit"] = f"""
    SELECT * FROM (
      {_key_skew_sql("lineitem", "l_orderkey")}
      UNION ALL
      {_key_skew_sql("orders", "o_custkey")}
      UNION ALL
      {_key_skew_sql("events", "user_id")}
    ) ORDER BY table_name
"""


# ---- ingestion-freshness audit ----

#: Staleness SLA: a stream whose newest event lags the corpus
#: watermark by more than this is flagged. 24 h is the batch-pipeline
#: convention; it is a literal in both engines.
FRESH_SLA_SECONDS = 24 * 3600


def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ingestion freshness: event count, newest event,
    lag behind the corpus watermark (the global max ts), rolling 24 h /
    7 d arrival counts relative to that watermark, and a fresh/stale
    status under the 24 h SLA -- the pipeline-health readout a platform
    team alerts on (Airflow/dbt 'source freshness' as a query over the
    data itself, no scheduler metadata needed).

    Exactness: all window membership runs on whole-second BIGINT
    epochs (ts cast long <-> floor(epoch(ts)) -- the q_trend_by_type
    proven pair), so the 24 h / 7 d cutoffs are integer comparisons
    with no sub-second representation skew between Spark's
    microsecond timestamps and DuckDB's nanosecond ones; the newest
    event renders through the canonical second-resolution string.

    Scale shape: ONE 1-row watermark aggregate broadcast across the
    scan, then ONE map-side-combined groupBy(event_type); output is
    |event types| rows."""
    events = load_table(spark, sf_dir, "events")
    sec = events.select(
        "event_type",
        "ts",
        # NTZ -> LTZ -> long: the q_trend_by_type proven path (NTZ has
        # no direct numeric cast); session TZ is UTC so the epoch
        # agrees with DuckDB's floor(epoch(ts))
        F.col("ts").cast("timestamp").cast("long").alias("ts_sec"),
    )
    watermark = sec.agg(F.max("ts_sec").alias("gmax_sec"))
    per = (
        sec.crossJoin(broadcast(watermark))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("ts").alias("last_ts_t"),
            F.max("ts_sec").alias("last_sec"),
            F.max("gmax_sec").alias("gmax_sec"),
            F.sum(
                F.when(
                    F.col("ts_sec") > F.col("gmax_sec") - F.lit(86400), 1
                ).otherwise(0)
            ).cast("long").alias("n_last_24h"),
            F.sum(
                F.when(
                    F.col("ts_sec") > F.col("gmax_sec") - F.lit(604800), 1
                ).otherwise(0)
            ).cast("long").alias("n_last_7d"),
        )
    )
    lag = (F.col("gmax_sec") - F.col("last_sec")).cast("long")
    return per.select(
        "event_type",
        "n_events",
        ts_str("last_ts_t").alias("last_ts"),
        lag.alias("lag_seconds"),
        "n_last_24h",
        "n_last_7d",
        F.when(lag > F.lit(FRESH_SLA_SECONDS), F.lit("stale"))
        .otherwise(F.lit("fresh"))
        .alias("status"),
    ).orderBy("event_type")


CONSTRAINT_QUERIES["q_freshness_audit"] = q_freshness_audit
CONSTRAINT_ORACLES["q_freshness_audit"] = f"""
    WITH sec AS (
      SELECT event_type, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events),
    g AS (SELECT max(ts_sec) AS gmax_sec FROM sec),
    per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts) AS last_ts_t,
             max(ts_sec) AS last_sec,
             max(g.gmax_sec) AS gmax_sec,
             CAST(sum(CASE WHEN ts_sec > g.gmax_sec - 86400
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h,
             CAST(sum(CASE WHEN ts_sec > g.gmax_sec - 604800
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_last_7d
      FROM sec CROSS JOIN g GROUP BY event_type)
    SELECT event_type, n_events,
           strftime(last_ts_t, '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(gmax_sec - last_sec AS BIGINT) AS lag_seconds,
           n_last_24h, n_last_7d,
           CASE WHEN gmax_sec - last_sec > {FRESH_SLA_SECONDS}
                THEN 'stale' ELSE 'fresh' END AS status
    FROM per ORDER BY event_type
"""


# ---- k-anonymity audit ----

#: Minimum group size a quasi-identifier combination must reach; the
#: conventional re-identification floor.
K_ANON = 5


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    quasi-identifier tuple (market segment, nation, account-balance
    band): every combination seen fewer than K_ANON times is a
    re-identification risk -- the privacy-governance gate a dataset
    must pass before quasi-identifier columns are released (the
    release-readiness companion to q_pii_redact_stats, which handles
    DIRECT identifiers inside text).

    Output: one row per violating combination (k < K_ANON) with its
    size, ordered smallest (riskiest) first, so the result IS the
    suppression work-list. The balance band is an exact integer floor
    on the cent grid -- floor(cents / 100000), i.e. $1000 bands --
    with negative balances landing in negative bands (floor, not
    truncation toward zero, so the band edges agree in both engines).

    Scale shape: ONE map-side-combined groupBy over the scan; the
    violating set is at most (segments x nations x bands) rows --
    dimension-bounded, independent of row count."""
    customer = load_table(spark, sf_dir, "customer")
    band = F.floor(
        F.col("c_acctbal").cast("decimal(12,2)").cast("double") / F.lit(1000.0)
    ).cast("long")
    groups = (
        customer.select(
            "c_mktsegment", "c_nationkey", band.alias("acctbal_band")
        )
        .groupBy("c_mktsegment", "c_nationkey", "acctbal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    return (
        groups.filter(F.col("k") < F.lit(K_ANON))
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "acctbal_band",
            "k",
        )
        .orderBy("k", "mktsegment", "nationkey", "acctbal_band")
    )


CONSTRAINT_QUERIES["q_k_anonymity_audit"] = q_k_anonymity_audit
CONSTRAINT_ORACLES["q_k_anonymity_audit"] = f"""
    WITH groups AS (
      SELECT c_mktsegment AS mktsegment,
             CAST(c_nationkey AS BIGINT) AS nationkey,
             CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE)
                        / 1000.0) AS BIGINT) AS acctbal_band,
             CAST(count(*) AS BIGINT) AS k
      FROM customer GROUP BY 1, 2, 3)
    SELECT mktsegment, nationkey, acctbal_band, k
    FROM groups WHERE k < {K_ANON}
    ORDER BY k, mktsegment, nationkey, acctbal_band
"""


# ---- runtime-filter (bloom semi-join) payoff audit ----

#: The build-side predicate for the audit: urgent orders. Small enough
#: to bloom (a few % of orders), selective enough that the pruning
#: decision is non-trivial.
BLOOM_JOIN_PRIORITY = "1-URGENT"


def q_bloom_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter payoff audit for the lineitem |X| urgent-orders
    semi-join: build an 8 KiB bloom bitmap over the build side's join
    keys (o_orderkey of '1-URGENT' orders -- the
    curation.q_decontaminate_bloom geometry re-used on join keys),
    probe every lineitem row, and report what a bloom runtime filter
    would have done to the shuffle: probe rows, rows passing the
    bloom, true semi-join matches, false passes, the realized
    false-positive rate, and the shuffle-volume reduction factor.
    This is the measurement behind the 100 TB join strategy decision
    Spark automates as runtime row-group filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) -- made
    inspectable, with exact arithmetic, from the data itself.

    Exactness: bit positions are the deterministic md5 slices, so the
    pass/fail of every probe is a pure function of the key -- the
    oracle reproduces the bitmap as position-set membership (false
    positives included, same as the decontamination twin) and every
    output cell is integer or one fixed-shape double.

    Scale shape: the bitmap build aggregates the build side to
    <= 1024 word rows (bounded collect, geometry-sized); the probe is
    a pure map inside whole-stage codegen over the probe-side scan
    (zero shuffle); the true-match count is one broadcast semi-join.
    At 100 TB: one scan of each side, 8 KiB of state per task."""
    from .curation import BLOOM_WORDS, _BIT_MASKS, _bloom_positions

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build_keys = (
        orders.filter(F.col("o_orderpriority") == BLOOM_JOIN_PRIORITY)
        .select(F.col("o_orderkey").cast("string").alias("k"))
    )
    masks_lit = F.expr(
        "array(" + ",".join(f"BIGINT('{m}')" for m in _BIT_MASKS) + ")"
    )
    word_rows = (
        build_keys.select(F.md5(F.col("k")).alias("h"))
        .select(F.explode(F.array(*_bloom_positions(F.col("h")))).alias("p"))
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.element_at(masks_lit, F.col("p").bitwiseAND(F.lit(63)) + 1).alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    wmap = {r["w"]: r["word"] for r in word_rows}
    words_lit = F.expr(
        "array("
        + ",".join(f"BIGINT('{wmap.get(i, 0)}')" for i in range(BLOOM_WORDS))
        + ")"
    )
    probe_src = li.select(
        F.md5(F.col("l_orderkey").cast("string")).alias("h"), "l_orderkey"
    )
    passed = F.lit(True)
    for p in _bloom_positions(F.col("h")):
        word = F.element_at(words_lit, F.floor(p / 64).cast("int") + 1)
        mask = F.element_at(masks_lit, p.bitwiseAND(F.lit(63)) + 1)
        passed = passed & (word.bitwiseAND(mask) != 0)
    bloom_counts = probe_src.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("long").alias("n_pass_bloom"),
    )
    true_match = (
        li.join(
            broadcast(
                orders.filter(
                    F.col("o_orderpriority") == BLOOM_JOIN_PRIORITY
                ).select("o_orderkey")
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_true_match"))
    )
    out = bloom_counts.crossJoin(broadcast(true_match))
    fp = (F.col("n_pass_bloom") - F.col("n_true_match")).cast("long")
    return out.select(
        "n_probe_rows",
        "n_pass_bloom",
        "n_true_match",
        fp.alias("n_false_pass"),
        F.round(
            F.try_divide(
                fp.cast("double"),
                (F.col("n_probe_rows") - F.col("n_true_match")).cast("double"),
            ),
            6,
        ).alias("fp_rate"),
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.col("n_pass_bloom").cast("double"),
                F.col("n_probe_rows").cast("double"),
            ),
            6,
        ).alias("shuffle_reduction"),
    )


def _bloom_join_oracle() -> str:
    from .curation import BLOOM_K, _bloom_pos_sql

    pos = [_bloom_pos_sql(k) for k in range(BLOOM_K)]
    member = " AND ".join(f"{p} IN (SELECT p FROM bpos)" for p in pos)
    return f"""
    WITH bkeys AS (
      SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k
      FROM orders WHERE o_orderpriority = '{BLOOM_JOIN_PRIORITY}'),
    bpos AS (
      SELECT DISTINCT p
      FROM (SELECT unnest([{", ".join(pos)}]) AS p
            FROM (SELECT md5(k) AS h FROM bkeys))),
    probe AS (
      SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h, l_orderkey
      FROM lineitem),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_probe_rows,
             CAST(sum(CASE WHEN {member} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_bloom
      FROM probe),
    tm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true_match
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '{BLOOM_JOIN_PRIORITY}'))
    SELECT n_probe_rows, n_pass_bloom, n_true_match,
           CAST(n_pass_bloom - n_true_match AS BIGINT) AS n_false_pass,
           round(CAST(n_pass_bloom - n_true_match AS DOUBLE)
                 / nullif(CAST(n_probe_rows - n_true_match AS DOUBLE), 0), 6)
             AS fp_rate,
           round(1.0 - CAST(n_pass_bloom AS DOUBLE)
                 / nullif(CAST(n_probe_rows AS DOUBLE), 0), 6)
             AS shuffle_reduction
    FROM counts CROSS JOIN tm
    """


CONSTRAINT_QUERIES["q_bloom_join_audit"] = q_bloom_join_audit
CONSTRAINT_ORACLES["q_bloom_join_audit"] = _bloom_join_oracle()
