"""Advanced relational operators beyond the reference's surface:
multi-level aggregation (ROLLUP), as-of joins (the canonical
time-series operator Spark lacks as a primitive), and approximate
distinct counting.

Scale notes:
- ROLLUP is one pass: Spark expands grouping sets map-side, so the
  fact table is scanned once regardless of the number of levels.
- The as-of join is expressed as union + running ``last`` window
  instead of a join: one shuffle on the partition key, no range-join
  explosion, no per-row probing -- the standard distributed as-of
  pattern (an actual range join would shuffle both sides AND risk
  skew on hot keys).
- approx_count_distinct is HyperLogLog++: mergeable sketches, so the
  distributed plan is partial-sketch -> merge, constant memory per
  group at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.canon import date_str, money, ts_str

DEC = "decimal(18,2)"


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (mktsegment, orderpriority): per-pair totals,
    per-segment subtotals, and a grand total in one scan."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(F.col("o_totalprice").cast(DEC))).alias("total_price"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, orderpriority): all four grouping levels
    (pair, each single key, grand total) in one scan, tagged with the
    grouping-id bitmask so consumers can tell a subtotal NULL from a
    data NULL. Like ROLLUP this is map-side grouping-set expansion --
    the fact table is still scanned once, and the shuffle moves partial
    aggregates for every level, so the cost at 100 TB is one scan plus
    a (levels x group-cardinality)-sized shuffle, not four scans.

    Known edge (documented, not hit by the sf>0 gate): on a ZERO-row
    input the SQL standard emits one grand-total row for the ``()``
    grouping set (DuckDB does); Spark's Expand-then-HashAggregate
    emits zero rows. Identical on any non-empty input."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(F.col("o_totalprice").cast(DEC))).alias("total_price"),
        )
        .orderBy(
            "gid",
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over (mktsegment), (orderpriority), ():
    the two independent marginals plus the grand total WITHOUT the
    pair level -- the reporting shape neither ROLLUP nor CUBE can
    express (ROLLUP is the prefix chain, CUBE is the full lattice;
    this is a hand-picked slice of the lattice). Completes the
    multi-level aggregation family (q_rollup_revenue, q_cube_revenue).

    Same scale shape as the siblings: Spark expands the requested sets
    map-side (one fact scan regardless of set count) and the shuffle
    carries partial aggregates per level, so cost at 100 TB is one
    scan + a (levels x group-cardinality) exchange -- strictly cheaper
    than CUBE here (3 sets vs 4). grouping_id disambiguates a subtotal
    NULL from a data NULL, same contract as q_cube_revenue (whose
    zero-row edge note applies here too)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupingSets(
            [["c_mktsegment"], ["o_orderpriority"], []],
            "c_mktsegment",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(F.col("o_totalprice").cast(DEC))).alias("total_price"),
        )
        .orderBy(
            "gid",
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the timestamp of the same
    user's most recent signup at-or-before the purchase.

    Implemented without a join: union both event kinds, then a running
    ``max(signup ts)`` window per user ordered by time. One shuffle on
    user_id; each partition is a single ordered pass. (DuckDB's native
    ASOF JOIN is the oracle.)
    """
    events = load_table(spark, sf_dir, "events")
    relevant = events.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    # signup sorts before purchase at identical ts so an equal-time
    # signup is visible to the purchase (ASOF's >= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("event_type").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        relevant.withColumn("last_signup_ts", last_signup)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("ts"),
            ts_str("last_signup_ts").alias("last_signup_ts"),
        )
        .orderBy("event_id")
    )


def q_asof_nearest_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for every purchase, the same user's closest
    signup in EITHER direction (ties to the earlier side) — the
    bidirectional variant of q_asof_last_signup, i.e. pandas
    merge_asof(direction='nearest') at Spark scale. Backward-only
    as-of answers "state at event time"; nearest answers alignment
    questions (match a reading to the closest calibration, a label to
    the closest snapshot) where the relevant anchor may come after.

    Same scale shape as the backward form: union both event kinds,
    ONE shuffle on user_id, then two ordered window passes over the
    same sort (running max of signup ts from the left = latest
    at-or-before; running min from the right = earliest at-or-after)
    — no range join, no per-row probing, no skew amplification beyond
    the user key itself. The side/gap decision is exact integer
    microseconds. Determinism under equal timestamps: the window sort
    is the TOTAL order (ts, event_type DESC, event_id) — an equal-time
    signup sorts before the purchase and is therefore its 'before'
    anchor with gap 0 in both engines, never a frame-order coin flip."""
    events = load_table(spark, sf_dir, "events")
    relevant = events.filter(
        F.col("event_type").isin("purchase", "signup")
    ).select("event_id", "user_id", "ts", "event_type")
    order = [F.col("ts"), F.col("event_type").desc(), F.col("event_id")]
    before = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    after = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    signup_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    w = relevant.withColumn("prev_ts", F.max(signup_ts).over(before)).withColumn(
        "next_ts", F.min(signup_ts).over(after)
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    pg = us("ts") - us("prev_ts")
    ng = us("next_ts") - us("ts")
    pick_prev = F.col("next_ts").isNull() | (
        F.col("prev_ts").isNotNull() & (pg <= ng)
    )
    return (
        w.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("ts"),
            ts_str(
                F.when(pick_prev, F.col("prev_ts")).otherwise(F.col("next_ts"))
            ).alias("nearest_signup_ts"),
            F.when(
                F.col("prev_ts").isNull() & F.col("next_ts").isNull(),
                F.lit(None).cast("string"),
            )
            .when(pick_prev, F.lit("before"))
            .otherwise(F.lit("after"))
            .alias("side"),
            F.when(pick_prev, pg).otherwise(ng).cast("long").alias("gap_us"),
        )
        .orderBy("event_id")
    )


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++,
    rsd=0.01). Sketches merge associatively -> partial aggregation
    works; the exact variant is q_distinct_customers_per_segment.
    No SQL oracle: DuckDB's approx_count_distinct uses a different
    sketch; the test suite bounds the error against exact instead."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .orderBy("event_type")
    )


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary per returnflag: count, null count, min,
    max, mean, sample stddev of quantity. Mean/variance are derived
    from exact decimal sums (sum, sum-of-squares) divided as IEEE
    doubles -- deterministic and engine-identical, unlike native
    stddev aggregates whose accumulation order varies."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DEC)
    agged = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
        F.sum(q).alias("sum_qty"),
        F.sum((q * q).cast("decimal(28,4)")).alias("sumsq_qty"),
    )
    mean = F.col("sum_qty").cast("double") / F.col("n")
    var = (
        F.col("sumsq_qty").cast("double")
        - F.col("sum_qty").cast("double") * F.col("sum_qty").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return agged.select(
        "l_returnflag",
        "n",
        "n_null",
        money("min_qty").alias("min_qty"),
        money("max_qty").alias("max_qty"),
        F.round(mean, 6).alias("mean_qty"),
        F.round(F.sqrt(var), 6).alias("std_qty"),
    ).orderBy("l_returnflag")


ADVANCED_ORACLES: dict[str, str] = {
    "q_profile_lineitem": """
        WITH agged AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                 min(CAST(l_quantity AS DECIMAL(18,2))) AS min_qty,
                 max(CAST(l_quantity AS DECIMAL(18,2))) AS max_qty,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                 sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                          CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sumsq_qty
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n, n_null,
               CAST(CAST(min_qty AS DECIMAL(38,2)) AS STRING) AS min_qty,
               CAST(CAST(max_qty AS DECIMAL(38,2)) AS STRING) AS max_qty,
               round(CAST(sum_qty AS DOUBLE) / n, 6) AS mean_qty,
               round(sqrt((CAST(sumsq_qty AS DOUBLE)
                           - CAST(sum_qty AS DOUBLE) * CAST(sum_qty AS DOUBLE) / n)
                          / (n - 1)), 6) AS std_qty
        FROM agged ORDER BY l_returnflag
    """,
    "q_rollup_revenue": """
        SELECT c_mktsegment, o_orderpriority,
               count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
        ORDER BY c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "q_cube_revenue": """
        SELECT c_mktsegment, o_orderpriority,
               CAST(GROUPING(c_mktsegment, o_orderpriority) AS INT) AS gid,
               count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE (c_mktsegment, o_orderpriority)
        ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "q_grouping_sets_revenue": """
        SELECT c_mktsegment, o_orderpriority,
               CAST(GROUPING(c_mktsegment, o_orderpriority) AS INT) AS gid,
               count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "q_asof_nearest_signup": """
        WITH rel AS (
          SELECT event_id, user_id, ts, event_type FROM events
          WHERE event_type IN ('purchase', 'signup')),
        w AS (
          SELECT *,
            max(CASE WHEN event_type = 'signup' THEN ts END) OVER (
              PARTITION BY user_id ORDER BY ts, event_type DESC, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
            min(CASE WHEN event_type = 'signup' THEN ts END) OVER (
              PARTITION BY user_id ORDER BY ts, event_type DESC, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
          FROM rel)
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               strftime(CASE WHEN next_ts IS NULL OR (prev_ts IS NOT NULL
                          AND epoch_us(ts) - epoch_us(prev_ts)
                              <= epoch_us(next_ts) - epoch_us(ts))
                        THEN prev_ts ELSE next_ts END,
                        '%Y-%m-%d %H:%M:%S') AS nearest_signup_ts,
               CASE WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
                    WHEN next_ts IS NULL OR (prev_ts IS NOT NULL
                          AND epoch_us(ts) - epoch_us(prev_ts)
                              <= epoch_us(next_ts) - epoch_us(ts))
                    THEN 'before' ELSE 'after' END AS side,
               CAST(CASE WHEN next_ts IS NULL OR (prev_ts IS NOT NULL
                          AND epoch_us(ts) - epoch_us(prev_ts)
                              <= epoch_us(next_ts) - epoch_us(ts))
                    THEN epoch_us(ts) - epoch_us(prev_ts)
                    ELSE epoch_us(next_ts) - epoch_us(ts) END AS BIGINT)
                 AS gap_us
        FROM w WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "q_asof_last_signup": """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        signups AS (
          SELECT user_id, ts FROM events WHERE event_type = 'signup')
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
               strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS last_signup_ts
        FROM purchases p
        ASOF LEFT JOIN signups s
          ON p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.event_id
    """,
}

def _hypertable_sql(ts_render: str) -> str:
    """Shared hourly+daily GROUPING SETS rollup; ``ts_render`` formats a
    timestamp expression to the canonical string (date_format on Spark,
    strftime on DuckDB)."""
    hour_s = ts_render.format("date_trunc('hour', ts)")
    day_s = ts_render.format("date_trunc('day', ts)")
    return f"""
    SELECT {hour_s} AS bucket_hour,
           {day_s} AS bucket_day,
           CASE WHEN {hour_s} IS NOT NULL
                THEN 'hour' ELSE 'day' END AS granularity,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY GROUPING SETS (
      ({hour_s}),
      ({day_s}))
    ORDER BY granularity, bucket_hour NULLS FIRST, bucket_day NULLS FIRST
"""


_HYPERTABLE_SQL = _hypertable_sql("date_format({}, 'yyyy-MM-dd HH:mm:ss')")


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    purchase aggregates from ONE scan via GROUPING SETS (each output
    row belongs to one granularity; the other bucket column is null).
    Expressed through the SQL entry point -- grouping sets have no
    DataFrame API; Catalyst expands them map-side, so the fact table is
    read once regardless of granularity count."""
    from .serving import run_sql

    return run_sql(spark, sf_dir, _HYPERTABLE_SQL)


ADVANCED_ORACLES["q_hypertable_rollup"] = _hypertable_sql(
    "strftime({}, '%Y-%m-%d %H:%M:%S')")


def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the TimescaleDB ``time_bucket_gapfill``
    analog): a generated hourly spine left-joined to the hourly purchase
    rollup; empty hours are zero-filled, and ``carried_revenue``
    forward-fills the last seen value (last-observation-carried-forward
    via an IGNORE NULLS running window).

    Scale shape: the spine is hours-between-bounds rows (tiny -- 8.8 k
    rows/year), so it broadcasts into the join against the rolled-up
    aggregate (already one row per non-empty hour). The fact table is
    scanned once for the rollup and once (pruned to ``ts``) for the
    bounds; nothing row-level ever joins the spine."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("rev"),
        )
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(hourly, "hour", "left")
        .select(
            ts_str("hour").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            money(F.coalesce(F.col("rev"), F.lit(0).cast(DEC))).alias("revenue"),
            money(F.last("rev", ignorenulls=True).over(w)).alias("carried_revenue"),
        )
        .orderBy(F.col("hour"))
    )


def q_corr_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between per-user purchase revenue and click
    count, computed from EXACT decimal sums (n, Σx, Σy, Σxy, Σx², Σy²)
    combined as doubles at the end. Native ``corr`` accumulates
    float moments in partition order -- nondeterministic across runs
    and engines; the exact-sums formulation is order-insensitive, so
    the distributed result is bit-identical to the oracle. Two
    shuffles: per-user conditional aggregate, then a single global
    moment aggregate (map-side combined)."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value").cast(DEC)).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("x"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("y"),
    )
    moments = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast(DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") - sx * sy / n
    vx = F.col("sxx").cast("double") - sx * sx / n
    vy = F.col("syy").cast("double") - sy * sy / n
    return moments.select(
        "n", F.round(cov / F.sqrt(vx * vy), 6).alias("pearson_r")
    )


ADVANCED_ORACLES["q_corr_purchase_click"] = """
    WITH per_user AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS y
      FROM events GROUP BY user_id),
    m AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(CAST(y AS DECIMAL(18,2))) AS sy,
             sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
             sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
             sum(CAST(y * y AS DECIMAL(18,2))) AS syy
      FROM per_user)
    SELECT n,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
                 sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
                      (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
                 6) AS pearson_r
    FROM m
"""


ADVANCED_ORACLES["q_gapfill_hourly"] = """
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    b AS (SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS mn,
                 CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS mx
          FROM events),
    spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b)
    SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           coalesce(n, 0) AS n_events,
           CAST(CAST(coalesce(rev, CAST(0 AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS revenue,
           CAST(CAST(last_value(rev IGNORE NULLS)
             OVER (ORDER BY s.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(38,2)) AS STRING) AS carried_revenue
    FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
    ORDER BY s.hour
"""

def q_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day RANGE-frame moving average of daily purchase revenue: the
    frame is defined by VALUE distance (6 days preceding by date), not
    row count, so missing days genuinely shrink the window -- the
    semantics rows-frames get wrong on sparse series. Ordering key is
    integer days-since-epoch so the DataFrame API's long-offset
    rangeBetween expresses the interval exactly; the average divides
    an exact decimal range-sum by the range count in double, keeping
    both engines bit-identical. One shuffle for the daily rollup; the
    window then runs on one row per day."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("revenue"))
        .withColumn("day_num", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            date_str("day").alias("day"),
            money("revenue").alias("revenue"),
            (
                F.sum("revenue").over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
            ).alias("avg_7d"),
        )
        .orderBy(F.col("day"))
    )


ADVANCED_ORACLES["q_moving_avg_7d"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(18,2))) AS revenue,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 3)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(CAST(revenue AS DECIMAL(38,2)) AS STRING) AS revenue,
           CAST(sum(revenue) OVER w AS DOUBLE) /
           CAST(count(*) OVER w AS DOUBLE) AS avg_7d
    FROM daily
    WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
"""


def q_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta via LAG: each day's purchase revenue
    against the previous OBSERVED day's, with the relative change in
    double over exact decimal inputs. First day's delta is NULL (no
    COALESCE -- absence and zero-change are different facts)."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("revenue"))
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return (
        daily.select(
            date_str("day").alias("day"),
            money("revenue").alias("revenue"),
            money(prev).alias("prev_revenue"),
            (
                (F.col("revenue").cast("double") - prev.cast("double"))
                / prev.cast("double")
            ).alias("pct_change"),
        )
        .orderBy(F.col("day"))
    )


ADVANCED_ORACLES["q_day_over_day"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(18,2))) AS revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(CAST(revenue AS DECIMAL(38,2)) AS STRING) AS revenue,
           CAST(CAST(lag(revenue) OVER (ORDER BY day) AS DECIMAL(38,2)) AS STRING) AS prev_revenue,
           (CAST(revenue AS DOUBLE) -
            CAST(lag(revenue) OVER (ORDER BY day) AS DOUBLE)) /
           CAST(lag(revenue) OVER (ORDER BY day) AS DOUBLE) AS pct_change
    FROM daily ORDER BY day
"""


def q_division_every_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers who placed at least one order in
    EVERY calendar year the orders table spans. Division becomes a
    per-customer distinct-year count compared against the global
    distinct-year count (a one-row broadcast) -- no universal
    quantifier, no double negation, one shuffle on custkey."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    from pyspark.sql.functions import broadcast

    n_years = orders.select(F.year("o_orderdate").alias("y")).distinct().agg(
        F.count(F.lit(1)).alias("n_years")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct(F.year("o_orderdate")).alias("cust_years")
    )
    return (
        per_cust.join(broadcast(n_years), F.col("cust_years") == F.col("n_years"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_custkey").alias("custkey"), "c_name", "cust_years")
        .orderBy("custkey")
    )


ADVANCED_ORACLES["q_division_every_year"] = """
    WITH yrs AS (SELECT count(DISTINCT year(o_orderdate)) AS n_years FROM orders),
    per_cust AS (
      SELECT o_custkey, count(DISTINCT year(o_orderdate)) AS cust_years
      FROM orders GROUP BY 1)
    SELECT c_custkey AS custkey, c_name, cust_years
    FROM per_cust
    JOIN customer ON o_custkey = c_custkey, yrs
    WHERE cust_years = n_years
    ORDER BY custkey
"""


ADVANCED_QUERIES = {
    "q_corr_purchase_click": q_corr_purchase_click,
    "q_gapfill_hourly": q_gapfill_hourly,
    "q_rollup_revenue": q_rollup_revenue,
    "q_cube_revenue": q_cube_revenue,
    "q_grouping_sets_revenue": q_grouping_sets_revenue,
    "q_asof_nearest_signup": q_asof_nearest_signup,
    "q_asof_last_signup": q_asof_last_signup,
    "q_approx_distinct_users": q_approx_distinct_users,  # rows-only
    "q_profile_lineitem": q_profile_lineitem,
    "q_hypertable_rollup": q_hypertable_rollup,
    "q_moving_avg_7d": q_moving_avg_7d,
    "q_day_over_day": q_day_over_day,
    "q_division_every_year": q_division_every_year,
}


#: OLS time anchor: seconds are measured from this fixed instant so
#: the integer x values are small, deterministic, and identical in
#: both engines (same reasoning as serving.ANCHOR -- no data-dependent
#: two-pass centering).
TREND_ANCHOR = "2024-01-01 00:00:00"


def q_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend: slope and intercept of value over
    time by least squares -- the seasonal-drift screen a metrics
    pipeline runs before alerting on a moving average. Built from
    EXACT integer/decimal moments (n, Σx, Σy, Σxy, Σx²) combined as
    doubles only in the final expression -- the same order-insensitive
    formulation as q_corr_purchase_click; native regr_slope/regr_
    intercept accumulate float moments in partition order and are not
    reproducible across engines.

    Scale shape: ONE map-side-combined aggregate per event_type (the
    moment tuple is 5 numbers per group); no window, no join, no
    second pass. x = whole seconds since a fixed anchor, so Σx² stays
    within decimal(38) headroom for centuries of data."""
    events = load_table(spark, sf_dir, "events")
    x = (
        F.col("ts").cast("timestamp").cast("long")
        - F.lit(TREND_ANCHOR).cast("timestamp").cast("long")
    )
    y = F.col("value").cast(DEC)
    m = (
        events.select(F.col("event_type"), x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sums: exact and overflow-safe at any corpus size
            # (BIGINT sums would wrap at ~1e12 rows of x^2 ~ 1e13);
            # DuckDB's BIGINT sums promote to HUGEINT, same values
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(
                (F.col("x").cast("decimal(20,0)") * F.col("y")).cast("decimal(38,2)")
            ).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        "n",
        # report per-day so the rounded magnitude keeps useful digits
        # at the repo-standard round(6) output convention
        F.round(slope * 86400, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("event_type")


ADVANCED_ORACLES["q_trend_by_type"] = f"""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             sum(x) AS sx,
             sum(y) AS sy,
             sum(CAST(CAST(x AS DECIMAL(20,0)) * y AS DECIMAL(38,2))) AS sxy,
             sum(x * x) AS sxx
      FROM (SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) -
                   CAST(floor(epoch(TIMESTAMP '{TREND_ANCHOR}')) AS BIGINT) AS x,
                   CAST(value AS DECIMAL(18,2)) AS y
            FROM events)
      GROUP BY event_type)
    SELECT event_type, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400, 6)
             AS slope_per_day,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM m ORDER BY event_type
"""

ADVANCED_QUERIES["q_trend_by_type"] = q_trend_by_type


def q_chi2_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    hour-of-day -- the drift/seasonality screen that tells an
    event-pipeline owner whether traffic composition varies by hour
    (and so whether per-hour mixture monitoring is warranted).

    Correctness at scale: observed counts are exact integers from ONE
    map-side-combined aggregate; the contingency spine (|types| x 24
    cells) is rebuilt as a broadcast cross of the two tiny margins so
    EMPTY cells contribute their full expected mass (dropping them
    understates the statistic); per-cell terms are evaluated as one
    identical double expression and folded through the
    round(.,9)-as-DECIMAL(28,9) trick, so the sum is order-independent
    and bit-equal in both engines. Everything after the first
    aggregate is metadata-sized."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.col("event_type"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("o"))
    rowm = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("hr").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    spine = rowm.crossJoin(broadcast(colm))
    full = (
        spine.join(cells, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            "rt",
            "ct",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
        .crossJoin(broadcast(tot))
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast(
        "double"
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    contrib = full.select(
        "n",
        F.round(term, 9).cast("decimal(28,9)").alias("c"),
        F.col("event_type"),
        F.col("hr"),
    )
    return contrib.agg(
        F.max("n").alias("n"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.countDistinct("hr").cast("long").alias("n_hours"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("hr") - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum("c").cast("double"), 6).alias("chi2"),
    )


ADVANCED_ORACLES["q_chi2_type_hour"] = """
    WITH cells AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS o
      FROM events GROUP BY 1, 2),
    rowm AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
    colm AS (SELECT hr, sum(o) AS ct FROM cells GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM cells),
    grid AS (
      SELECT r.event_type, c.hr, r.rt, c.ct, coalesce(cl.o, 0) AS o, n
      FROM rowm r CROSS JOIN colm c
      LEFT JOIN cells cl ON cl.event_type = r.event_type AND cl.hr = c.hr
      CROSS JOIN tot),
    contrib AS (
      SELECT n, event_type, hr,
             CAST(round(
               (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                                    / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                                      / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)),
               9) AS DECIMAL(28,9)) AS c
      FROM grid)
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT hr) AS BIGINT) AS n_hours,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT hr) - 1)
                AS BIGINT) AS dof,
           round(CAST(sum(c) AS DOUBLE), 6) AS chi2
    FROM contrib
"""

ADVANCED_QUERIES["q_chi2_type_hour"] = q_chi2_type_hour


#: Benford expected leading-digit frequencies, precomputed once in
#: Python and inlined as LITERALS into both engines' plans -- log10
#: evaluated by two different libm implementations is not guaranteed
#: bit-identical; a shared literal is.
BENFORD_EXPECTED = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals -- the classic synthetic- or
    tampered-data screen: compare the leading-digit distribution of
    o_totalprice against log10(1 + 1/d). Leading digits extracted from
    the fixed-scale DECIMAL string rendering (portable across engines;
    float log10-based extraction is not), counts exact, one
    map-side-combined aggregate; output is 9 rows.

    TPC-H-generated totals are NOT Benford-distributed (uniform-ish
    component prices), which is exactly what the audit should say --
    the deviation column carries the signal."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("long")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    tot = counts.agg(F.sum("n_orders").alias("n"))
    expected = F.create_map(
        *[F.lit(v) for kv in BENFORD_EXPECTED.items() for v in kv]
    )[F.col("digit")]
    obs = F.col("n_orders").cast("double") / F.col("n").cast("double")
    return (
        counts.crossJoin(broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(obs, 6).alias("obs_freq"),
            expected.alias("exp_freq"),
            F.round(obs - expected, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


def _benford_expected_sql() -> str:
    rows = ", ".join(f"({d}, CAST({v!r} AS DOUBLE))" for d, v in BENFORD_EXPECTED.items())
    return f"(VALUES {rows}) AS exp_t(digit, exp_freq)"


ADVANCED_ORACLES["q_benford_totalprice"] = f"""
    WITH counts AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit,
             count(*) AS n_orders
      FROM orders GROUP BY 1),
    tot AS (SELECT sum(n_orders) AS n FROM counts)
    SELECT digit, n_orders,
           round(CAST(n_orders AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_freq,
           exp_freq,
           round(CAST(n_orders AS DOUBLE) / CAST(n AS DOUBLE) - exp_freq, 6)
             AS deviation
    FROM counts CROSS JOIN tot
    JOIN {_benford_expected_sql()} USING (digit)
    ORDER BY digit
"""

ADVANCED_QUERIES["q_benford_totalprice"] = q_benford_totalprice


#: PSI drift audit: fixed value bins (data-independent, so the bin
#: function is a pure per-row expression in both engines) and a fixed
#: time boundary splitting the fixture's 30-day window in half.
PSI_BOUNDARY = "2024-01-16 00:00:00"
PSI_BINS: list[tuple[float | None, float | None, str]] = [
    (None, 10.0, "lt_10"),
    (10.0, 25.0, "10_25"),
    (25.0, 50.0, "25_50"),
    (50.0, 100.0, "50_100"),
    (100.0, None, "gte_100"),
]


def _psi_bin_spark() -> F.Column:
    c = F.col("value")
    expr = None
    for lo, hi, label in PSI_BINS:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= lo)
        if hi is not None:
            cond = cond & (c < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr


def _psi_bin_sql() -> str:
    parts = []
    for lo, hi, label in PSI_BINS:
        conds = []
        if lo is not None:
            conds.append(f"value >= {lo}")
        if hi is not None:
            conds.append(f"value < {hi}")
        parts.append(f"WHEN {' AND '.join(conds)} THEN '{label}'")
    return "CASE " + " ".join(parts) + " END"


def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the first and second half of the observation window -- the
    standard model-monitoring drift metric (PSI < 0.1 stable, > 0.25
    drifted). Laplace-smoothed bin shares so empty bins are defined;
    per-bin contribution (p - q) * ln(p / q) reported alongside the
    counts, so the total PSI is one trivial sum away and the
    per-bin detail shows WHERE the distribution moved.

    Scale shape: binning is a per-row CASE inside codegen; ONE
    map-side-combined aggregate produces both halves' counts
    (conditional sums -- no second scan, no join for the halves); the
    literal bin spine joins back by broadcast so bins with zero events
    in both halves still emit a row. ln(p/q) evaluates on
    exact-integer-derived doubles with an identical expression in both
    engines (the DSIR-proven pattern)."""
    events = load_table(spark, sf_dir, "events")
    is_first = F.col("ts").cast("timestamp") < F.lit(PSI_BOUNDARY).cast("timestamp")
    counts = (
        events.filter(F.col("value").isNotNull())
        .select(_psi_bin_spark().alias("bin"), is_first.alias("first_half"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("n_first"),
            F.sum(F.when(~F.col("first_half"), 1).otherwise(0)).alias("n_second"),
        )
    )
    return psi_table(counts)


def psi_table(counts: DataFrame) -> DataFrame:
    """The PSI core shared by the batch operator and the streaming
    drift monitor (streaming/drift.py), so the two can never disagree:
    (bin, n_first, n_second) counts -> the full smoothed PSI table.
    Empty-state safe: zero totals still yield uniform smoothed shares."""
    spark = counts.sparkSession
    spine = spark.createDataFrame(
        [(label,) for _, _, label in PSI_BINS], "bin string"
    )
    b = len(PSI_BINS)
    full = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.coalesce("n_second", F.lit(0)).cast("long").alias("n_second"),
        )
        .crossJoin(
            broadcast(
                counts.agg(
                    F.coalesce(F.sum("n_first"), F.lit(0)).alias("t_first"),
                    F.coalesce(F.sum("n_second"), F.lit(0)).alias("t_second"),
                )
            )
        )
    )
    p = (F.col("n_first") + 1).cast("double") / (F.col("t_first") + b).cast("double")
    q = (F.col("n_second") + 1).cast("double") / (F.col("t_second") + b).cast(
        "double"
    )
    return full.select(
        "bin",
        "n_first",
        "n_second",
        F.round(p, 6).alias("p_first"),
        F.round(q, 6).alias("p_second"),
        F.round((p - q) * F.log(p / q), 9).alias("psi_contrib"),
    ).orderBy("bin")


ADVANCED_ORACLES["q_psi_value_drift"] = f"""
    WITH counts AS (
      SELECT {_psi_bin_sql()} AS bin,
             sum(CASE WHEN ts < TIMESTAMP '{PSI_BOUNDARY}' THEN 1 ELSE 0 END)
               AS n_first,
             sum(CASE WHEN ts < TIMESTAMP '{PSI_BOUNDARY}' THEN 0 ELSE 1 END)
               AS n_second
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    tot AS (SELECT sum(n_first) AS t_first, sum(n_second) AS t_second
            FROM counts),
    spine(bin) AS (VALUES {", ".join(f"('{label}')" for _, _, label in PSI_BINS)}),
    grid AS (
      SELECT s.bin,
             CAST(coalesce(c.n_first, 0) AS BIGINT) AS n_first,
             CAST(coalesce(c.n_second, 0) AS BIGINT) AS n_second,
             t_first, t_second
      FROM spine s LEFT JOIN counts c ON s.bin = c.bin CROSS JOIN tot)
    SELECT bin, n_first, n_second,
           round(CAST(n_first + 1 AS DOUBLE)
                 / CAST(t_first + {len(PSI_BINS)} AS DOUBLE), 6) AS p_first,
           round(CAST(n_second + 1 AS DOUBLE)
                 / CAST(t_second + {len(PSI_BINS)} AS DOUBLE), 6) AS p_second,
           round((CAST(n_first + 1 AS DOUBLE)
                  / CAST(t_first + {len(PSI_BINS)} AS DOUBLE)
                  - CAST(n_second + 1 AS DOUBLE)
                    / CAST(t_second + {len(PSI_BINS)} AS DOUBLE))
                 * ln((CAST(n_first + 1 AS DOUBLE)
                       / CAST(t_first + {len(PSI_BINS)} AS DOUBLE))
                      / (CAST(n_second + 1 AS DOUBLE)
                         / CAST(t_second + {len(PSI_BINS)} AS DOUBLE))), 9)
             AS psi_contrib
    FROM grid ORDER BY bin
"""

ADVANCED_QUERIES["q_psi_value_drift"] = q_psi_value_drift


# ---- exponentially-weighted moving average (recursive smoothing) ----

#: EWMA smoothing factor; inlined as an explicit DOUBLE literal in both
#: engines (bare 0.3 parses as DECIMAL in both Spark and DuckDB, which
#: would change the arithmetic).
EWMA_ALPHA = 0.3


def _ewma_folded(ev: DataFrame) -> DataFrame:
    """Per-type sorted hourly series plus its EWMA fold: (event_type,
    xs: array<struct<h,cnt>>, es: array<struct<h,e>>) -- the shared
    core of q_ewma_hourly and q_ewma_backtest, so the smoother and its
    evaluation can never disagree."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    series = hourly.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct(ts_str("hour").alias("h"), "cnt"))
        ).alias("xs")
    )
    return series.select(
        "event_type",
        "xs",
        F.expr(
            f"""
            aggregate(
              xs,
              cast(array() as array<struct<h:string, e:double>>),
              (acc, x) -> array_append(acc, named_struct(
                'h', x.h,
                'e', if(size(acc) = 0,
                        cast(x.cnt as double),
                        cast({EWMA_ALPHA} as double) * x.cnt
                          + cast({1 - EWMA_ALPHA} as double)
                            * element_at(acc, -1).e)))
            )
            """
        ).alias("es"),
    )


def q_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type EWMA of the hourly event count: e_1 = x_1,
    e_i = a*x_i + (1-a)*e_{i-1} — the classic smoothing/alerting
    baseline a monitoring stack keeps per series.

    EWMA is inherently a left-to-right RECURSION, which a window sum
    cannot express exactly (the closed form sum a*(1-a)^(i-j)*x_j is
    order-independent only in exact arithmetic; in doubles its error
    depends on the summation order, and the (1-a)^i factors overflow
    the dynamic range for long series). So: aggregate to hourly counts
    (one shuffle, partial-agg), collect each type's series into a
    sorted array (~720 entries per type here; state is bounded by
    SERIES length, never corpus size), and fold left-to-right with the
    built-in `aggregate` HOF — JVM codegen, no Python. The DuckDB twin
    runs the identical recursion as a recursive CTE over the
    row-numbered series; both engines execute the same two-op double
    sequence per step, so the outputs are bit-identical (rendered
    round-6 at the boundary, same as every double output here).

    Scale: one shuffle to hourly counts, one to per-type arrays. A
    series too long to hold as an array (years of seconds) would chunk
    into segments carrying (carry-in weight, partial fold) pairs --
    the standard segmented-scan decomposition; at the hourly grain even
    a decade is 88k entries, far under array limits."""
    folded = _ewma_folded(load_table(spark, sf_dir, "events"))
    return (
        folded.select("event_type", F.explode("es").alias("p"))
        .select(
            "event_type",
            F.col("p.h").alias("hour"),
            F.round(F.col("p.e"), 6).alias("ewma"),
        )
        .orderBy("event_type", "hour")
    )


ADVANCED_ORACLES["q_ewma_hourly"] = f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    numbered AS MATERIALIZED (
      SELECT event_type, hour, cnt,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
      FROM hourly),
    ewma AS (
      SELECT event_type, hour, cnt, i, CAST(cnt AS DOUBLE) AS e
      FROM numbered WHERE i = 1
      UNION ALL
      SELECT n.event_type, n.hour, n.cnt, n.i,
             CAST({EWMA_ALPHA} AS DOUBLE) * n.cnt
               + CAST({1 - EWMA_ALPHA} AS DOUBLE) * w.e
      FROM numbered n JOIN ewma w
        ON n.event_type = w.event_type AND n.i = w.i + 1)
    SELECT event_type, hour, round(e, 6) AS ewma
    FROM ewma ORDER BY event_type, hour
"""

ADVANCED_QUERIES["q_ewma_hourly"] = q_ewma_hourly

# ---- exact two-sample Kolmogorov-Smirnov drift test ----


def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    event-value distributions of the window's first and second half --
    the nonparametric companion to q_psi_value_drift: PSI depends on a
    chosen binning; KS is binning-free (sup over the ECDF difference)
    and catches shape changes PSI's coarse bins smear out.

    Exactness: D = max over distinct values v of
    |cum1(v)/n1 - cum2(v)/n2| is evaluated as the INTEGER
    |cum1(v)*n2 - cum2(v)*n1| (decimal(38,0) -- products reach n^2),
    so the max and its arg are exact and tie-broken by value; ONE
    double division at the end. The argmax value is carried through
    max(struct(d, v)) -- lexicographic struct comparison, identical in
    both engines -- so the report also says WHERE the distributions
    diverge most.

    Scale shape: one map-side-combined groupBy compacts the corpus to
    DISTINCT DECIMAL(18,2) values (the 2-decimal grid bounds the frame
    by the value RANGE, not the row count); the cumulative window and
    the final max run over that compacted frame. For a genuinely
    unbounded-cardinality measure the same plan runs after a coarser
    fixed-scale cast -- the operator's exactness contract is per-grid."""
    events = load_table(spark, sf_dir, "events")
    is_first = F.col("ts").cast("timestamp") < F.lit(PSI_BOUNDARY).cast("timestamp")
    grid = (
        events.filter(F.col("value").isNotNull())
        .select(F.col("value").cast("decimal(18,2)").alias("v"), is_first.alias("fh"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("fh"), 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(~F.col("fh"), 1).otherwise(0)).cast("long").alias("c2"),
        )
    )
    tot = grid.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "v",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    ).crossJoin(broadcast(tot))
    d = F.abs(
        F.col("cum1").cast("decimal(38,0)") * F.col("n2")
        - F.col("cum2").cast("decimal(38,0)") * F.col("n1")
    ).cast("decimal(38,0)")
    m = cum.select(
        "n1", "n2", F.struct(d.alias("d"), F.col("v")).alias("dv")
    ).agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.max("dv").alias("best"),
    )
    return m.select(
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        "n_values",
        F.round(
            F.col("best.d").cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double")),
            6,
        ).alias("ks_stat"),
        money(F.col("best.v")).alias("ks_at_value"),
    )


ADVANCED_ORACLES["q_ks_value_drift"] = f"""
    WITH grid AS (
      SELECT CAST(value AS DECIMAL(18,2)) AS v,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{PSI_BOUNDARY}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{PSI_BOUNDARY}'
                           THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c2) AS BIGINT) AS n2 FROM grid),
    cum AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             n1, n2
      FROM grid CROSS JOIN tot),
    m AS (
      SELECT max(n1) AS n1, max(n2) AS n2,
             CAST(count(*) AS BIGINT) AS n_values,
             max(struct_pack(
               d := CAST(abs(CAST(cum1 AS DECIMAL(38,0)) * n2
                             - CAST(cum2 AS DECIMAL(38,0)) * n1)
                         AS DECIMAL(38,0)),
               v := v)) AS best
      FROM cum)
    SELECT n1 AS n_first, n2 AS n_second, n_values,
           round(CAST((best).d AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_stat,
           CAST(CAST((best).v AS DECIMAL(38,2)) AS VARCHAR) AS ks_at_value
    FROM m
"""

ADVANCED_QUERIES["q_ks_value_drift"] = q_ks_value_drift


# ---- autocorrelation of the hourly event series ----


def q_autocorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 Pearson autocorrelation of the global hourly
    event-count series -- the seasonality screen (is traffic sticky
    hour-over-hour? does it repeat daily?) a monitoring pipeline runs
    before choosing alerting baselines (EWMA vs day-over-day).

    Exactness: the series values are exact integer COUNTS, so every
    moment (n, Sx, Sy, Sxy, Sxx, Syy per lag) is an exact decimal(38,0)
    sum of integer products; the correlation is assembled in doubles
    only at the end (sqrt is IEEE correctly-rounded, so bit-portable).
    Lags pair only OBSERVED hours in series order (documented: a fully
    dark hour is absent, not zero -- q_gapfill_hourly is the densifier
    if zero-fill semantics are wanted).

    Scale shape: the corpus compacts to the hourly frame in ONE
    map-side-combined aggregate (bounded by the time range: a decade
    is < 90k rows); the lag window and moment aggregate run over that
    metadata-sized series."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.orderBy("hour")
    lagged = hourly.select(
        "x",
        F.lag("x", 1).over(w).alias("y1"),
        F.lag("x", 24).over(w).alias("y24"),
    )

    def _moments(y: str) -> list:
        # products in decimal BEFORE the multiply: hourly counts past
        # ~3e9 would wrap a BIGINT square
        has = F.col(y).isNotNull()
        z = F.lit(0).cast("decimal(19,0)")
        xd = F.col("x").cast("decimal(19,0)")
        yd = F.col(y).cast("decimal(19,0)")
        return [
            F.sum(F.when(has, 1).otherwise(0)).cast("long").alias(f"n_{y}"),
            F.sum(F.when(has, xd).otherwise(z)).cast("decimal(38,0)").alias(f"sx_{y}"),
            F.sum(F.when(has, yd).otherwise(z)).cast("decimal(38,0)").alias(f"sy_{y}"),
            F.sum(F.when(has, xd * yd).otherwise(z * z)).cast("decimal(38,0)").alias(f"sxy_{y}"),
            F.sum(F.when(has, xd * xd).otherwise(z * z)).cast("decimal(38,0)").alias(f"sxx_{y}"),
            F.sum(F.when(has, yd * yd).otherwise(z * z)).cast("decimal(38,0)").alias(f"syy_{y}"),
        ]

    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        *_moments("y1"),
        *_moments("y24"),
    )

    def _corr(y: str):
        n = F.col(f"n_{y}").cast("double")
        sx = F.col(f"sx_{y}").cast("double")
        sy = F.col(f"sy_{y}").cast("double")
        sxy = F.col(f"sxy_{y}").cast("double")
        sxx = F.col(f"sxx_{y}").cast("double")
        syy = F.col(f"syy_{y}").cast("double")
        return F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        )

    return m.select(
        "n_hours",
        F.col("n_y1").alias("n_pairs_lag1"),
        F.col("n_y24").alias("n_pairs_lag24"),
        _corr("y1").alias("autocorr_lag1"),
        _corr("y24").alias("autocorr_lag24"),
    )


def _autocorr_moments_sql(y: str) -> str:
    return f"""
             CAST(sum(CASE WHEN {y} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_{y},
             sum(CASE WHEN {y} IS NOT NULL THEN CAST(x AS DECIMAL(38,0))
                      ELSE 0 END) AS sx_{y},
             sum(CASE WHEN {y} IS NOT NULL THEN CAST({y} AS DECIMAL(38,0))
                      ELSE 0 END) AS sy_{y},
             CAST(sum(CASE WHEN {y} IS NOT NULL
                      THEN CAST(x AS DECIMAL(19,0))
                           * CAST({y} AS DECIMAL(19,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sxy_{y},
             CAST(sum(CASE WHEN {y} IS NOT NULL
                      THEN CAST(x AS DECIMAL(19,0))
                           * CAST(x AS DECIMAL(19,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sxx_{y},
             CAST(sum(CASE WHEN {y} IS NOT NULL
                      THEN CAST({y} AS DECIMAL(19,0))
                           * CAST({y} AS DECIMAL(19,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS syy_{y}"""


def _autocorr_corr_sql(y: str) -> str:
    n = f"CAST(n_{y} AS DOUBLE)"
    return f"""round(
           ({n} * CAST(sxy_{y} AS DOUBLE)
            - CAST(sx_{y} AS DOUBLE) * CAST(sy_{y} AS DOUBLE))
           / sqrt(({n} * CAST(sxx_{y} AS DOUBLE)
                   - CAST(sx_{y} AS DOUBLE) * CAST(sx_{y} AS DOUBLE))
                  * ({n} * CAST(syy_{y} AS DOUBLE)
                     - CAST(sy_{y} AS DOUBLE) * CAST(sy_{y} AS DOUBLE))), 6)"""


ADVANCED_ORACLES["q_autocorr_hourly"] = f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS x
      FROM events GROUP BY 1),
    lagged AS (
      SELECT x,
             lag(x, 1) OVER (ORDER BY hour) AS y1,
             lag(x, 24) OVER (ORDER BY hour) AS y24
      FROM hourly),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             {_autocorr_moments_sql("y1")},
             {_autocorr_moments_sql("y24")}
      FROM lagged)
    SELECT n_hours,
           n_y1 AS n_pairs_lag1,
           n_y24 AS n_pairs_lag24,
           {_autocorr_corr_sql("y1")} AS autocorr_lag1,
           {_autocorr_corr_sql("y24")} AS autocorr_lag24
    FROM m
"""

ADVANCED_QUERIES["q_autocorr_hourly"] = q_autocorr_hourly


# ---- revenue concentration (Gini / Lorenz) ----


def q_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue -- the concentration
    audit ("do 1% of customers carry half the revenue?") that also
    doubles as the source-balance check when run over per-source token
    counts in a training-data mix.

    Exactness: with revenues sorted ascending and ranked 1..n,
    G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n. Tied values make the rank
    sum order-ambiguous ONLY in appearance: a tie block of c equal
    values v occupying ranks R_prev+1 .. R_prev+c contributes exactly
    v*(2*c*R_prev + c*(c+1)) to 2*sum(i*x_i) regardless of intra-tie
    order, so grouping by DISTINCT revenue value both compacts the
    frame and closes the tie question. All sums are exact decimals;
    two double divisions at the end.

    Scale shape: one shuffle to per-customer revenue (map-side
    partials), one map-side-combined groupBy to the distinct-value
    grid (revenue lives on the cent grid, so the frame is bounded by
    the revenue RANGE), then the cumulative window + final fold over
    that compacted frame. At a cardinality where even the distinct
    grid is huge, the same rank algebra runs on a range-partitioned
    sort (df.repartitionByRange) with per-partition offsets -- the
    window here IS that plan's single-partition degenerate case."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("rev")
    )
    grid = rev.groupBy("rev").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("rev").rowsBetween(Window.unboundedPreceding, -1)
    blocks = grid.withColumn("r_prev", F.coalesce(F.sum("c").over(w), F.lit(0)))
    m = blocks.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("rev") * F.col("c")).cast("decimal(38,2)").alias("t"),
        # rank weight computed in decimal BEFORE the multiplies:
        # c * r_prev reaches n^2, past BIGINT near 3e9 customers; the
        # (20,0) weight cast holds to ~7e9 customers (2n^2 < 1e20) --
        # widen it (Spark multiplies up to (38,2) losslessly) past that;
        # the DuckDB twin keeps (20,0) because its multiply is
        # width-limited to 38 and it only ever runs at test scale
        F.sum(
            (
                F.col("rev")
                * (
                    F.lit(2)
                    * F.col("c").cast("decimal(19,0)")
                    * F.col("r_prev").cast("decimal(19,0)")
                    + F.col("c").cast("decimal(19,0)")
                    * (F.col("c") + 1).cast("decimal(19,0)")
                ).cast("decimal(20,0)")
            ).cast("decimal(38,2)")
        ).alias("s2"),
    )
    n = F.col("n").cast("double")
    gini = F.col("s2").cast("double") / (n * F.col("t").cast("double")) - (
        n + F.lit(1.0)
    ) / n
    return m.select(
        F.col("n").alias("n_customers"),
        money(F.col("t")).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    )


ADVANCED_ORACLES["q_gini_customer_revenue"] = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    grid AS (SELECT rev, count(*) AS c FROM rev GROUP BY rev),
    blocks AS (
      SELECT rev, c,
             coalesce(sum(c) OVER (ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r_prev
      FROM grid),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(rev * c) AS DECIMAL(38,2)) AS t,
             CAST(sum(rev * CAST(2 * CAST(c AS DECIMAL(19,0))
                                   * CAST(r_prev AS DECIMAL(19,0))
                                 + CAST(c AS DECIMAL(19,0))
                                   * CAST(c + 1 AS DECIMAL(19,0))
                                 AS DECIMAL(20,0))) AS DECIMAL(38,2)) AS s2
      FROM blocks)
    SELECT n AS n_customers,
           CAST(CAST(t AS DECIMAL(38,2)) AS VARCHAR) AS total_revenue,
           round(CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
    FROM m
"""

ADVANCED_QUERIES["q_gini_customer_revenue"] = q_gini_customer_revenue


def q_ewma_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the EWMA smoother: for every hour
    i >= 2, predict x_i with e_{i-1} (the smoother's state BEFORE
    seeing the hour) and report per-type MAE and mean error (bias) --
    the evaluation a monitoring stack runs before trusting the EWMA as
    its alerting baseline. Shares the fold with q_ewma_hourly
    (_ewma_folded), so the evaluated model IS the deployed model.

    Exactness: predictions come from the same bit-portable sequential
    fold as q_ewma_hourly; each error term is rounded to 9 places and
    summed as DECIMAL(28,9) (the order-independent fold), so both
    engines produce identical aggregates. The per-type series array is
    bounded by the TIME RANGE, not the corpus (module pattern)."""
    folded = _ewma_folded(load_table(spark, sf_dir, "events"))
    pairs = (
        folded.withColumn(
            "prevs",
            F.slice(F.col("es"), 1, F.greatest(F.size("es") - 1, F.lit(0))),
        )
        .withColumn(
            "curs",
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        )
        .select("event_type", F.explode(F.arrays_zip("prevs", "curs")).alias("p"))
        .select(
            "event_type",
            F.col("p.prevs.e").alias("pred"),
            F.col("p.curs.cnt").cast("double").alias("actual"),
        )
    )
    err = F.col("actual") - F.col("pred")
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_preds"),
        F.sum(F.round(F.abs(err), 9).cast("decimal(28,9)")).alias("sae"),
        F.sum(F.round(err, 9).cast("decimal(28,9)")).alias("se"),
    )
    return m.select(
        "event_type",
        "n_preds",
        F.round(F.col("sae").cast("double") / F.col("n_preds"), 6).alias("mae"),
        F.round(F.col("se").cast("double") / F.col("n_preds"), 6).alias("bias"),
    ).orderBy("event_type")


ADVANCED_ORACLES["q_ewma_backtest"] = f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    numbered AS MATERIALIZED (
      SELECT event_type, hour, cnt,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
      FROM hourly),
    ewma AS (
      SELECT event_type, hour, cnt, i, CAST(cnt AS DOUBLE) AS e
      FROM numbered WHERE i = 1
      UNION ALL
      SELECT n.event_type, n.hour, n.cnt, n.i,
             CAST({EWMA_ALPHA} AS DOUBLE) * n.cnt
               + CAST({1 - EWMA_ALPHA} AS DOUBLE) * w.e
      FROM numbered n JOIN ewma w
        ON n.event_type = w.event_type AND n.i = w.i + 1),
    pairs AS MATERIALIZED (
      SELECT n.event_type,
             w.e AS pred,
             CAST(n.cnt AS DOUBLE) AS actual
      FROM numbered n JOIN ewma w
        ON n.event_type = w.event_type AND n.i = w.i + 1),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_preds,
             sum(CAST(round(abs(actual - pred), 9) AS DECIMAL(28,9))) AS sae,
             sum(CAST(round(actual - pred, 9) AS DECIMAL(28,9))) AS se
      FROM pairs GROUP BY 1)
    SELECT event_type, n_preds,
           round(CAST(sae AS DOUBLE) / n_preds, 6) AS mae,
           round(CAST(se AS DOUBLE) / n_preds, 6) AS bias
    FROM m ORDER BY event_type
"""

ADVANCED_QUERIES["q_ewma_backtest"] = q_ewma_backtest


# ---- RFM customer segmentation ----

#: Fixed observation anchor for recency (the r4 ANCHOR convention:
#: relative-time semantics pinned to a literal so both engines and
#: every re-run agree; data spans 1995..2001).
RFM_ANCHOR = "2002-01-01"


def _quintile_bounds(grid: DataFrame, vcol: str):
    """Four quintile boundary values of a (value, c) distinct-value
    grid: t_i = the smallest value whose cumulative count reaches
    ceil(i*n/5). The cumulative window runs over the COMPACTED grid
    (bounded by the value range, not the row count) and the result is
    a 1-row frame to broadcast -- the scalable replacement for a
    global NTILE sort, with deterministic tie semantics (every equal
    value gets the same score, which NTILE cannot promise)."""
    w = Window.orderBy(vcol).rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(F.col(vcol).alias("v"), F.sum("c").over(w).alias("cum"))
    tot = grid.agg(F.sum("c").cast("long").alias("n"))
    g = cum.crossJoin(broadcast(tot))
    return g.agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.floor(
                        (F.lit(i) * F.col("n") + F.lit(4)) / F.lit(5)
                    ).cast("long"),
                    F.col("v"),
                )
            ).alias(f"t{i}")
            for i in (1, 2, 3, 4)
        ]
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since
    last order at the fixed anchor), Frequency (order count), Monetary
    (revenue), each scored 1-5 by exact quintile thresholds, then the
    125-cell segment grid with counts and revenue -- the classic
    CRM/marketing segmentation (ClickHouse-style behavioral
    analytics), and structurally the source-prioritization scoring a
    training-data mix applies to data sources.

    Exactness + scale: quintile thresholds come from the
    distinct-value-compaction rank algebra (_quintile_bounds) -- NOT a
    global NTILE sort: NTILE splits ties across buckets by row order
    (nondeterministic under shuffle), while threshold scoring gives
    every tied value the same score in both engines. Integer/decimal
    metrics, integer threshold ranks (ceil via (i*n+4) div 5), scores
    as exact comparisons against broadcast 1-row threshold frames; the
    output is the <= 125-row segment grid. Corpus-sized work: ONE
    groupBy(custkey) pass; everything after runs on compacted frames.
    Recency scores INVERT (recent = 5)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).cast("long").alias("recency"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("monetary"),
    )
    bounds = {
        m: _quintile_bounds(
            per_cust.groupBy(m).agg(F.count(F.lit(1)).alias("c")), m
        )
        for m in ("recency", "frequency", "monetary")
    }

    def score(m: str):
        t = [F.col(f"{m}_t{i}") for i in (1, 2, 3, 4)]
        up = sum(
            [(F.col(m) > ti).cast("long") for ti in t], F.lit(1).cast("long")
        )
        return (F.lit(6) - up) if m == "recency" else up

    joined = per_cust
    for m, b in bounds.items():
        joined = joined.crossJoin(
            broadcast(b.select(*[F.col(f"t{i}").alias(f"{m}_t{i}") for i in (1, 2, 3, 4)]))
        )
    scored = joined.select(
        score("recency").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"),
        F.col("monetary"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            money(F.sum("monetary")).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def _rfm_bounds_sql(metric: str) -> str:
    return f"""
    {metric}_grid AS (
      SELECT {metric} AS v, count(*) AS c FROM per_cust GROUP BY 1),
    {metric}_cum AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM {metric}_grid),
    {metric}_b AS (
      SELECT {", ".join(
          f"min(CASE WHEN cum >= ({i} * n + 4) // 5 THEN v END) AS t{i}"
          for i in (1, 2, 3, 4))}
      FROM {metric}_cum CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS n
                                    FROM {metric}_grid))"""


def _rfm_score_sql(metric: str, alias: str) -> str:
    up = " + ".join(
        f"CASE WHEN p.{metric} > {alias}.t{i} THEN 1 ELSE 0 END"
        for i in (1, 2, 3, 4)
    )
    expr = f"1 + {up}"
    if metric == "recency":
        expr = f"6 - ({expr})"
    return f"CAST({expr} AS BIGINT)"


ADVANCED_ORACLES["q_rfm_segments"] = f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                           DATE '{RFM_ANCHOR}') AS BIGINT) AS recency,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY 1),
    {_rfm_bounds_sql("recency")},
    {_rfm_bounds_sql("frequency")},
    {_rfm_bounds_sql("monetary")},
    scored AS (
      SELECT {_rfm_score_sql("recency", "b_r")} AS r_score,
             {_rfm_score_sql("frequency", "b_f")} AS f_score,
             {_rfm_score_sql("monetary", "b_m")} AS m_score,
             p.monetary
      FROM per_cust p
      CROSS JOIN recency_b b_r CROSS JOIN frequency_b b_f
      CROSS JOIN monetary_b b_m)
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(monetary) AS DECIMAL(38,2)) AS VARCHAR)
             AS total_monetary
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ADVANCED_QUERIES["q_rfm_segments"] = q_rfm_segments


def q_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report: the revenue share held by the top
    1% / 10% / 20% of customers -- the '80/20' companion to
    q_gini_customer_revenue (Gini summarizes the whole Lorenz curve;
    these are the three points executives actually quote). Run over
    per-source token counts it becomes the training-mix concentration
    check.

    Exactness: customers are ranked by the distinct-revenue-value
    compaction (no global row sort); a top-N cutoff with ties takes
    the part of the boundary VALUE block needed to fill N exactly
    (largest-remainder on the tie block: revenue share counts
    value*min(c, remaining)), so both engines agree even when the
    boundary value ties across many customers. All sums decimal-exact;
    three double divisions at the boundary.

    Scale shape: identical to q_gini_customer_revenue -- one
    groupBy(custkey) pass, then the compacted grid."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("rev")
    )
    grid = rev.groupBy("rev").agg(F.count(F.lit(1)).alias("c"))
    # rank from the TOP: cumulative count of customers with rev
    # strictly greater than this block
    w = Window.orderBy(F.col("rev").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    blocks = grid.select(
        "rev",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("above"),
    )
    tot = grid.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("rev") * F.col("c")).cast("decimal(38,2)").alias("t"),
    )
    g = blocks.crossJoin(broadcast(tot))

    def share(pct: int):
        # top-k customers with k = floor(pct*n/100), tie block clipped
        k = F.floor((F.col("n") * pct) / F.lit(100)).cast("long")
        take = F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("c").cast("long"), k - F.col("above")),
        )
        got = F.sum(
            (F.col("rev") * take.cast("decimal(19,0)")).cast("decimal(38,2)")
        )
        return F.round(
            got.cast("double") / F.max(F.col("t")).cast("double"), 6
        )

    return g.agg(
        F.max("n").alias("n_customers"),
        money(F.max("t")).alias("total_revenue"),
        share(1).alias("top1_pct_share"),
        share(10).alias("top10_pct_share"),
        share(20).alias("top20_pct_share"),
    )


ADVANCED_ORACLES["q_pareto_revenue_share"] = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    grid AS (SELECT rev, count(*) AS c FROM rev GROUP BY rev),
    blocks AS (
      SELECT rev, c,
             coalesce(sum(c) OVER (ORDER BY rev DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS above
      FROM grid),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(rev * c) AS DECIMAL(38,2)) AS t FROM grid),
    g AS (SELECT * FROM blocks CROSS JOIN tot)
    SELECT max(n) AS n_customers,
           CAST(CAST(max(t) AS DECIMAL(38,2)) AS VARCHAR) AS total_revenue,
           round(CAST(sum(CAST(rev * CAST(greatest(0, least(CAST(c AS BIGINT),
                       CAST(floor((n * 1) / 100) AS BIGINT) - above))
                     AS DECIMAL(19,0)) AS DECIMAL(38,2))) AS DOUBLE)
                 / CAST(max(t) AS DOUBLE), 6) AS top1_pct_share,
           round(CAST(sum(CAST(rev * CAST(greatest(0, least(CAST(c AS BIGINT),
                       CAST(floor((n * 10) / 100) AS BIGINT) - above))
                     AS DECIMAL(19,0)) AS DECIMAL(38,2))) AS DOUBLE)
                 / CAST(max(t) AS DOUBLE), 6) AS top10_pct_share,
           round(CAST(sum(CAST(rev * CAST(greatest(0, least(CAST(c AS BIGINT),
                       CAST(floor((n * 20) / 100) AS BIGINT) - above))
                     AS DECIMAL(19,0)) AS DECIMAL(38,2))) AS DOUBLE)
                 / CAST(max(t) AS DOUBLE), 6) AS top20_pct_share
    FROM g
"""

ADVANCED_QUERIES["q_pareto_revenue_share"] = q_pareto_revenue_share


def ks_binned_table(counts: DataFrame) -> DataFrame:
    """Binned Kolmogorov-Smirnov statistic over (bin, n_first,
    n_second) PSI-bin counts -- the KS companion the STREAMING drift
    monitor (streaming/drift.py:current_ks) reads from its persistent
    bin-count state. A binned KS lower-bounds the exact KS (the sup is
    only evaluated at bin edges); the exact-value form is the batch
    operator q_ks_value_drift. Same integer cross-multiplied ECDF
    arithmetic; bins ordered by their PSI_BINS ordinal (labels are not
    lexicographic). Empty-state safe: zero totals report KS 0."""
    spark = counts.sparkSession
    spine = spark.createDataFrame(
        [(label, i) for i, (_, _, label) in enumerate(PSI_BINS)],
        "bin string, ord long",
    )
    full = spine.join(counts, "bin", "left").select(
        "ord",
        "bin",
        F.coalesce("n_first", F.lit(0)).cast("long").alias("c1"),
        F.coalesce("n_second", F.lit(0)).cast("long").alias("c2"),
    )
    w = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)
    tot = full.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    cum = full.select(
        "ord",
        "bin",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    ).crossJoin(broadcast(tot))
    d = F.abs(
        F.col("cum1").cast("decimal(38,0)") * F.col("n2")
        - F.col("cum2").cast("decimal(38,0)") * F.col("n1")
    ).cast("decimal(38,0)")
    m = cum.select(
        "n1", "n2", F.struct(d.alias("d"), F.col("bin")).alias("dv")
    ).agg(
        F.max("n1").alias("n1"), F.max("n2").alias("n2"), F.max("dv").alias("best")
    )
    return m.select(
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(
                F.col("best.d").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("ks_binned"),
        F.col("best.bin").alias("ks_at_bin"),
    )


# ---- generic numeric histogram + A/B conversion test ----

#: Histogram layout over the event-value range: [0, 500) in 20
#: equal-width bins, integer-exact membership on the cent grid.
HIST_BINS = 20
HIST_WIDTH_CENTS = 2500  # 25.00 per bin


def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of the event value -- the profiling
    primitive behind dashboards and data-quality monitors (ClickHouse
    histogram()/bar() territory, but with EXACT counts and bin
    statistics instead of a sampled sketch).

    Exactness: bin membership is integer arithmetic on the cent grid
    (floor(value*100) div width -- no float boundary ambiguity),
    clipped into the edge bins; per-bin count/min/max/sum are exact
    (sum in DECIMAL); the 20-row literal spine emits empty bins.
    Scale: ONE map-side-combined aggregate over the scan."""
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    bin_ = F.least(
        F.greatest(F.floor(cents / HIST_WIDTH_CENTS).cast("long"), F.lit(0)),
        F.lit(HIST_BINS - 1),
    )
    counts = (
        events.filter(F.col("value").isNotNull())
        .select(bin_.alias("bin"), F.col("value").cast(DEC).alias("v"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            money(F.min("v")).alias("min_value"),
            money(F.max("v")).alias("max_value"),
            money(F.sum("v")).alias("sum_value"),
        )
    )
    spine = spark.createDataFrame(
        [
            (b, b * HIST_WIDTH_CENTS / 100.0, (b + 1) * HIST_WIDTH_CENTS / 100.0)
            for b in range(HIST_BINS)
        ],
        "bin long, bin_lo double, bin_hi double",
    )
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            "bin_lo",
            "bin_hi",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "min_value",
            "max_value",
            "sum_value",
        )
        .orderBy("bin")
    )


_HIST_SPINE = ", ".join(
    f"({b}, {b * HIST_WIDTH_CENTS / 100.0}, {(b + 1) * HIST_WIDTH_CENTS / 100.0})"
    for b in range(HIST_BINS)
)

ADVANCED_ORACLES["q_histogram_value"] = f"""
    WITH counts AS (
      SELECT CAST(least(greatest(CAST(floor(CAST(floor(value * 100) AS BIGINT)
                                       / {HIST_WIDTH_CENTS}) AS BIGINT), 0),
                        {HIST_BINS - 1}) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(min(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
                  AS VARCHAR) AS min_value,
             CAST(CAST(max(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
                  AS VARCHAR) AS max_value,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
                  AS VARCHAR) AS sum_value
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    spine(bin, bin_lo, bin_hi) AS (VALUES {_HIST_SPINE})
    SELECT CAST(s.bin AS BIGINT) AS bin,
           CAST(s.bin_lo AS DOUBLE) AS bin_lo,
           CAST(s.bin_hi AS DOUBLE) AS bin_hi,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           c.min_value, c.max_value, c.sum_value
    FROM spine s LEFT JOIN counts c ON c.bin = s.bin
    ORDER BY bin
"""

ADVANCED_QUERIES["q_histogram_value"] = q_histogram_value


def q_ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test on conversion (user has >= 1 purchase
    event), cohorts split by user_id parity -- the experimentation-
    analytics readout (cohort sizes, conversion rates, absolute lift,
    pooled two-proportion z statistic). A real experiment joins an
    assignment table instead of the parity split; the mechanics are
    identical.

    Exactness: per-user conversion flags and cohort counts are exact
    integers from one groupBy(user) + one 1-row conditional aggregate;
    rates/lift/z evaluate as one fixed-shape double expression (sqrt
    correctly rounded). Degenerate pooled variance (everyone or no one
    converts -- true of this corpus, where every user has a purchase)
    yields z = NULL via try_divide, NOT a 0/0: NULL is the same answer
    in ANSI and non-ANSI sessions (the driver runs plain/ANSI sessions,
    where a raw 0/0 double division RAISES DIVIDE_BY_ZERO) and in
    DuckDB via nullif. Scale: one user-keyed shuffle, then
    metadata-sized."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    m = users.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("converted")).otherwise(0))
        .cast("long").alias("conv_a"),
        F.sum(F.when(F.col("user_id") % 2 != 0, 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.sum(F.when(F.col("user_id") % 2 != 0, F.col("converted")).otherwise(0))
        .cast("long").alias("conv_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ca = F.col("conv_a").cast("double")
    cb = F.col("conv_b").cast("double")
    pa = F.try_divide(ca, na)
    pb = F.try_divide(cb, nb)
    pool = F.try_divide(ca + cb, na + nb)
    z = F.try_divide(
        pa - pb,
        F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.try_divide(F.lit(1.0), na) + F.try_divide(F.lit(1.0), nb))
        ),
    )
    return m.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pa - pb, 6).alias("lift_abs"),
        F.round(z, 6).alias("z_stat"),
    )


ADVANCED_ORACLES["q_ab_test_conversion"] = """
    WITH users AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1),
    m AS (
      SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN user_id % 2 <> 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM users)
    SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0),
                 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0),
                 6) AS rate_b,
           round(CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0)
                 - CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0), 6)
             AS lift_abs,
           round((CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0)
                  - CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0))
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE)
                                / nullif(CAST(n_a + n_b AS DOUBLE), 0))
                               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                        / nullif(CAST(n_a + n_b AS DOUBLE), 0))
                               * (1.0 / nullif(CAST(n_a AS DOUBLE), 0)
                                  + 1.0 / nullif(CAST(n_b AS DOUBLE), 0))),
                          0), 6) AS z_stat
    FROM m
"""

ADVANCED_QUERIES["q_ab_test_conversion"] = q_ab_test_conversion


# ---- weekly seasonality profile ----


def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day traffic/value template over the event
    stream -- the 168-cell weekly seasonality profile behind capacity
    planning, anomaly baselines (expected load for "Tuesday 14:00"),
    and the seasonal term a forecast subtracts before trend fitting
    (q_trend_by_type fits the trend; this is its seasonal companion).

    Exactness: day-of-week comes from pure integer epoch arithmetic --
    dow = (epoch_days + 4) % 7, 0 = Sunday (1970-01-01 was a Thursday)
    -- NOT from the engines' dayofweek functions, whose numbering
    conventions differ (Spark 1=Sunday, DuckDB 0=Sunday); counts and
    value sums are exact integers/decimals; mean and share-of-total
    are fixed-shape double divisions through try_divide/nullif. The
    168-row literal spine emits empty cells.

    Scale shape: ONE map-side-combined aggregate over the scan plus a
    broadcast 1-row total; output is always 168 rows."""
    events = load_table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    cells = (
        events.filter(F.col("value").isNotNull())
        .select(
            F.pmod(F.floor(ts_sec / F.lit(86400)).cast("long") + F.lit(4), F.lit(7))
            .cast("long")
            .alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
            F.col("value").cast(DEC).alias("v"),
        )
        .groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("decimal(38,2)").alias("sum_v"),
        )
    )
    total = cells.agg(F.sum("sum_v").cast("decimal(38,2)").alias("tot"))
    spine = spark.createDataFrame(
        [(d, h) for d in range(7) for h in range(24)], "dow long, hr long"
    )
    out = spine.join(cells, ["dow", "hr"], "left").crossJoin(broadcast(total))
    return out.select(
        "dow",
        "hr",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        money("sum_v").alias("sum_value"),
        F.round(
            F.try_divide(F.col("sum_v").cast("double"), F.col("n").cast("double")),
            6,
        ).alias("mean_value"),
        F.round(
            F.try_divide(F.col("sum_v").cast("double"), F.col("tot").cast("double")),
            6,
        ).alias("share_of_total"),
    ).orderBy("dow", "hr")


ADVANCED_ORACLES["q_seasonality_profile"] = """
    WITH cells AS (
      SELECT (CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400)
                   AS BIGINT) + 4) % 7 AS dow,
             CAST(hour(ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS sum_v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    total AS (SELECT CAST(sum(sum_v) AS DECIMAL(38,2)) AS tot FROM cells),
    spine AS (
      SELECT d.dow, h.hr
      FROM (SELECT CAST(unnest(range(7)) AS BIGINT) AS dow) d
      CROSS JOIN (SELECT CAST(unnest(range(24)) AS BIGINT) AS hr) h)
    SELECT s.dow, s.hr,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           CAST(c.sum_v AS VARCHAR) AS sum_value,
           round(CAST(c.sum_v AS DOUBLE)
                 / nullif(CAST(c.n AS DOUBLE), 0), 6) AS mean_value,
           round(CAST(c.sum_v AS DOUBLE)
                 / nullif(CAST(t.tot AS DOUBLE), 0), 6) AS share_of_total
    FROM spine s LEFT JOIN cells c ON c.dow = s.dow AND c.hr = s.hr
    CROSS JOIN total t
    ORDER BY s.dow, s.hr
"""

ADVANCED_QUERIES["q_seasonality_profile"] = q_seasonality_profile


# ---- Welch two-sample t-test ----


def q_welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test comparing the event
    `value` of purchase vs click events -- the continuous-metric
    companion to q_ab_test_conversion's proportion z-test (revenue /
    latency / engagement-value experiments where variances differ
    between arms, so Student's pooled test is wrong).

    Exactness: the sufficient statistics are exact -- counts BIGINT,
    sums of DECIMAL(12,2) values, sums of squares of DECIMAL(25,4)
    products (both well under the 38-digit cap) -- so mean, variance
    (the sum-of-squares form (ssq - sum^2/n)/(n-1)), the t statistic
    and the Welch-Satterthwaite df are each ONE fixed-shape double
    expression over exact inputs, layered CTE-for-CTE with the oracle
    so every intermediate double is bit-equal. All divisions go
    through try_divide/nullif (ANSI-safe); sqrt is guarded with
    greatest(., 0) against a negative rounding residue, which DuckDB's
    sqrt would reject outright.

    Scale shape: ONE map-side-combined aggregate over the scan; 1-row
    output."""
    events = load_table(spark, sf_dir, "events")
    vals = events.filter(
        F.col("event_type").isin("purchase", "click") & F.col("value").isNotNull()
    ).select(
        (F.col("event_type") == "purchase").alias("is_a"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    m = vals.groupBy().agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("v"))).cast("decimal(38,2)").alias("sum_a"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).cast("decimal(38,2)").alias("sum_b"),
        F.sum(F.when(F.col("is_a"), F.col("v") * F.col("v")))
        .cast("decimal(38,4)")
        .alias("ssq_a"),
        F.sum(F.when(~F.col("is_a"), F.col("v") * F.col("v")))
        .cast("decimal(38,4)")
        .alias("ssq_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    v = m.select(
        "n_a",
        "n_b",
        F.try_divide(F.col("sum_a").cast("double"), na).alias("m_a"),
        F.try_divide(F.col("sum_b").cast("double"), nb).alias("m_b"),
        F.try_divide(
            F.col("ssq_a").cast("double")
            - F.try_divide(
                F.col("sum_a").cast("double") * F.col("sum_a").cast("double"), na
            ),
            na - F.lit(1.0),
        ).alias("var_a"),
        F.try_divide(
            F.col("ssq_b").cast("double")
            - F.try_divide(
                F.col("sum_b").cast("double") * F.col("sum_b").cast("double"), nb
            ),
            nb - F.lit(1.0),
        ).alias("var_b"),
    )
    s = v.select(
        "n_a",
        "n_b",
        "m_a",
        "m_b",
        "var_a",
        "var_b",
        F.try_divide(F.col("var_a"), F.col("n_a").cast("double")).alias("se2_a"),
        F.try_divide(F.col("var_b"), F.col("n_b").cast("double")).alias("se2_b"),
    )
    se2 = F.col("se2_a") + F.col("se2_b")
    t = F.try_divide(
        F.col("m_a") - F.col("m_b"), F.sqrt(F.greatest(se2, F.lit(0.0)))
    )
    df_w = F.try_divide(
        se2 * se2,
        F.try_divide(
            F.col("se2_a") * F.col("se2_a"), F.col("n_a").cast("double") - F.lit(1.0)
        )
        + F.try_divide(
            F.col("se2_b") * F.col("se2_b"), F.col("n_b").cast("double") - F.lit(1.0)
        ),
    )
    return s.select(
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round("var_a", 6).alias("var_a"),
        F.round("var_b", 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df_w, 6).alias("df_welch"),
    )


ADVANCED_ORACLES["q_welch_ttest_value"] = """
    WITH vals AS (
      SELECT event_type = 'purchase' AS is_a,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
    m AS (
      SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN is_a THEN v END) AS DECIMAL(38,2)) AS sum_a,
             CAST(sum(CASE WHEN NOT is_a THEN v END) AS DECIMAL(38,2)) AS sum_b,
             CAST(sum(CASE WHEN is_a THEN v * v END) AS DECIMAL(38,4)) AS ssq_a,
             CAST(sum(CASE WHEN NOT is_a THEN v * v END) AS DECIMAL(38,4)) AS ssq_b
      FROM vals),
    v AS (
      SELECT n_a, n_b,
             CAST(sum_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0) AS m_a,
             CAST(sum_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0) AS m_b,
             (CAST(ssq_a AS DOUBLE)
              - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE)
                / nullif(CAST(n_a AS DOUBLE), 0))
               / nullif(CAST(n_a AS DOUBLE) - 1.0, 0) AS var_a,
             (CAST(ssq_b AS DOUBLE)
              - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE)
                / nullif(CAST(n_b AS DOUBLE), 0))
               / nullif(CAST(n_b AS DOUBLE) - 1.0, 0) AS var_b
      FROM m),
    s AS (
      SELECT n_a, n_b, m_a, m_b, var_a, var_b,
             var_a / nullif(CAST(n_a AS DOUBLE), 0) AS se2_a,
             var_b / nullif(CAST(n_b AS DOUBLE), 0) AS se2_b
      FROM v)
    SELECT n_a, n_b,
           round(m_a, 6) AS mean_a,
           round(m_b, 6) AS mean_b,
           round(var_a, 6) AS var_a,
           round(var_b, 6) AS var_b,
           round((m_a - m_b)
                 / nullif(sqrt(greatest(se2_a + se2_b, 0.0)), 0), 6) AS t_stat,
           round((se2_a + se2_b) * (se2_a + se2_b)
                 / nullif(se2_a * se2_a / nullif(CAST(n_a AS DOUBLE) - 1.0, 0)
                          + se2_b * se2_b / nullif(CAST(n_b AS DOUBLE) - 1.0, 0),
                          0), 6) AS df_welch
    FROM s
"""

ADVANCED_QUERIES["q_welch_ttest_value"] = q_welch_ttest_value


# ---- Mann-Whitney U (Wilcoxon rank-sum) test ----


def q_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test comparing the `value` distribution of
    purchase vs click events -- the nonparametric companion to
    q_welch_ttest_value (rank-based, so heavy tails / outliers that
    break a t-test's normality assumption don't break this one; the
    standard test for skewed revenue-per-event metrics).

    Average ranks with ties are kept EXACT by working on the doubled
    rank scale: for each distinct value, 2*avg_rank = 2*rank_start +
    cnt + 1 is an integer, so the doubled rank-sum 2*R_a accumulates
    in DECIMAL(38,0) with zero rounding; the tie-correction sum
    (cnt^3 - cnt) likewise. U, its null mean, the tie-corrected sigma
    and z are then single fixed-shape double expressions over those
    exact integers, layered CTE-for-CTE with the oracle. Products are
    sized DECIMAL(18,0) x DECIMAL(18,0) -> DECIMAL(37,0) (Spark) /
    DECIMAL(36,0) (DuckDB), both under the cap up to ~1e18 doubled
    rank mass -- beyond any real corpus.

    Scale shape: the corpus-sized work is ONE groupBy on the distinct
    value grid (DECIMAL(12,2) cents, map-side combined). The ordered
    cumulative-rank window then runs over DISTINCT values only -- the
    histogram domain, bounded by the value range in cents and
    independent of row count -- so the single-partition window is
    metadata-sized, exactly like q_histogram_value's spine."""
    events = load_table(spark, sf_dir, "events")
    vals = events.filter(
        F.col("event_type").isin("purchase", "click") & F.col("value").isNotNull()
    ).select(
        (F.col("event_type") == "purchase").alias("is_a"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    pv = vals.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("cnt_a"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk = pv.select(
        "v",
        "cnt_a",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).cast("long").alias("rank_start"),
    )
    cnt_d = F.col("cnt").cast("decimal(12,0)")
    agg = rk.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).cast("long").alias("n_b"),
        F.sum(
            F.col("cnt_a").cast("decimal(18,0)")
            * (2 * F.col("rank_start") + F.col("cnt") + 1).cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("r2_a"),
        F.sum(cnt_d * cnt_d * cnt_d - cnt_d).cast("decimal(38,0)").alias("tie_sum"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    stat = agg.select(
        "n_a",
        "n_b",
        (
            F.col("r2_a").cast("double") / F.lit(2.0)
            - na * (na + F.lit(1.0)) / F.lit(2.0)
        ).alias("u_stat"),
        (na * nb / F.lit(2.0)).alias("mu_u"),
        F.sqrt(
            F.greatest(
                na * nb / F.lit(12.0)
                * (
                    (n + F.lit(1.0))
                    - F.try_divide(
                        F.col("tie_sum").cast("double"), n * (n - F.lit(1.0))
                    )
                ),
                F.lit(0.0),
            )
        ).alias("sigma_u"),
    )
    return stat.select(
        "n_a",
        "n_b",
        F.round("u_stat", 1).alias("u_stat"),
        F.round("mu_u", 1).alias("mu_u"),
        F.round("sigma_u", 6).alias("sigma_u"),
        F.round(
            F.try_divide(F.col("u_stat") - F.col("mu_u"), F.col("sigma_u")), 6
        ).alias("z_stat"),
    )


ADVANCED_ORACLES["q_mann_whitney_value"] = """
    WITH vals AS (
      SELECT event_type = 'purchase' AS is_a,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
    pv AS (
      SELECT v,
             CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             CAST(count(*) AS BIGINT) AS cnt
      FROM vals GROUP BY v),
    rk AS (
      SELECT v, cnt_a, cnt,
             CAST(sum(cnt) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cnt AS BIGINT)
               AS rank_start
      FROM pv),
    agg AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt) - sum(cnt_a) AS BIGINT) AS n_b,
             CAST(sum(CAST(cnt_a AS DECIMAL(18,0))
                      * CAST(2 * rank_start + cnt + 1 AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS r2_a,
             CAST(sum(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
                      * CAST(cnt AS DECIMAL(12,0))
                      - CAST(cnt AS DECIMAL(12,0)))
                  AS DECIMAL(38,0)) AS tie_sum
      FROM rk),
    stat AS (
      SELECT n_a, n_b,
             CAST(r2_a AS DOUBLE) / 2.0
               - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0
               AS u_stat,
             CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu_u,
             sqrt(greatest(
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
               * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                  - CAST(tie_sum AS DOUBLE)
                    / nullif((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                             * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                - 1.0), 0)),
               0.0)) AS sigma_u
      FROM agg)
    SELECT n_a, n_b,
           round(u_stat, 1) AS u_stat,
           round(mu_u, 1) AS mu_u,
           round(sigma_u, 6) AS sigma_u,
           round((u_stat - mu_u) / nullif(sigma_u, 0), 6) AS z_stat
    FROM stat
"""

ADVANCED_QUERIES["q_mann_whitney_value"] = q_mann_whitney_value


# ---- CUSUM changepoint detection ----

#: CUSUM reference value (drift allowance, in sigma units) and alarm
#: threshold -- the textbook k=0.5/h=5 tuning (detects a 1-sigma mean
#: shift with ~ARL-370 false-alarm spacing). Literals in both engines.
CUSUM_K = 0.5
CUSUM_H = 5.0


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector over the hourly event-count
    series: standardize each hour against the series mean/sigma, then
    S_t = max(0, S_{t-1} + z_t - k), alarming where S_t > h -- the
    classic sequential drift detector (sustained small upward shifts
    that per-hour z-score alerting misses; the changepoint companion
    to q_psi_value_drift's distribution test and q_seasonality_profile's
    baseline).

    Exactness: hourly counts and their sum/sum-of-squares are exact
    integers, so mu/sigma/z_t are fixed-shape doubles; the recursion
    itself is a FOLD in hour order -- Spark runs it as a higher-order
    ``aggregate`` over the hour-sorted array (seeded with 0.0 so
    element_at stays in-bounds under ANSI), DuckDB as a recursive CTE
    -- the same IEEE add/subtract/max sequence in both engines, so
    every S_t is bit-equal. Rounding happens only at display.

    Scale shape: the corpus-sized work is ONE map-side-combined
    groupBy(hour). The fold then runs on the hourly SERIES, whose
    length is bounded by the time span (8 760 rows/year), not the row
    count -- the same metadata-sized-series argument as
    q_autocorr_hourly; it lives in one task, never on the driver."""
    events = load_table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    hourly = (
        events.select(F.floor(ts_sec / F.lit(3600.0)).cast("long").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    stats = hourly.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    nh = F.col("n_hours").cast("double")
    mu = F.col("s1").cast("double") / nh
    sigma = F.sqrt(
        F.greatest(
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / nh)
            / nh,
            F.lit(0.0),
        )
    )
    series = (
        hourly.crossJoin(broadcast(stats))
        .select(
            "hr",
            "cnt",
            F.try_divide(F.col("cnt").cast("double") - mu, sigma).alias("z"),
        )
    )
    one = series.agg(
        F.array_sort(F.collect_list(F.struct("hr", "cnt", "z"))).alias("a")
    )
    folded = one.select(
        "a",
        F.slice(
            F.aggregate(
                F.col("a"),
                F.array(F.lit(0.0)),
                lambda acc, x: F.array_append(
                    acc,
                    F.greatest(
                        F.lit(0.0),
                        F.element_at(acc, F.size(acc)) + x["z"] - F.lit(CUSUM_K),
                    ),
                ),
            ),
            2,
            F.size(F.col("a")),
        ).alias("s"),
    )
    return (
        folded.select(F.posexplode(F.arrays_zip("a", "s")))
        .select(
            F.col("col.a.hr").alias("epoch_hour"),
            F.col("col.a.cnt").alias("n_events"),
            F.round(F.col("col.a.z"), 6).alias("z"),
            F.round(F.col("col.s"), 6).alias("cusum"),
            (F.col("col.s") > F.lit(CUSUM_H)).alias("alarm"),
        )
        .orderBy("epoch_hour")
    )


ADVANCED_ORACLES["q_cusum_changepoint"] = f"""
    WITH RECURSIVE hourly AS (
      SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600.0) AS BIGINT)
               AS hr,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(cnt) AS BIGINT) AS s1,
             CAST(sum(cnt * cnt) AS BIGINT) AS s2
      FROM hourly),
    series AS (
      SELECT row_number() OVER (ORDER BY hr) AS idx, hr, cnt,
             (CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE))
               / nullif(sqrt(greatest(
                   (CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n_hours AS DOUBLE))
                   / CAST(n_hours AS DOUBLE), 0.0)), 0) AS z
      FROM hourly CROSS JOIN stats),
    c AS (
      SELECT idx, hr, cnt, z, greatest(0.0, 0.0 + z - {CUSUM_K}) AS s
      FROM series WHERE idx = 1
      UNION ALL
      SELECT t.idx, t.hr, t.cnt, t.z, greatest(0.0, c.s + t.z - {CUSUM_K})
      FROM series t JOIN c ON t.idx = c.idx + 1)
    SELECT hr AS epoch_hour, cnt AS n_events,
           round(z, 6) AS z,
           round(s, 6) AS cusum,
           s > {CUSUM_H} AS alarm
    FROM c ORDER BY epoch_hour
"""

ADVANCED_QUERIES["q_cusum_changepoint"] = q_cusum_changepoint


# ---- KMV distinct sketch with an exact oracle ----

#: KMV sketch size. 256 minimum hash values give ~1/sqrt(254) = 6.3%
#: relative standard error -- the textbook KMV bound.
KMV_K = 256


def _kmv_hex32(col: str):
    """First 8 hex digits of md5(col) as a 32-bit unsigned long --
    reshape._hex32's decode, local so the module stays import-light.
    Decoded with one conv(hex, 16, 10) call instead of the historical
    8-nibble ascii ladder: bit-identical (mismatch-checked over 1M
    ids) and ~2.8x faster on the decode, which is the hot expression
    wherever the uniform is drawn per exploded row (the bootstrap's
    B-way replicate grid)."""
    h = F.md5(F.col(col).cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def q_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the KMV (k minimum values /
    bottom-k) sketch: hash every key to (0,1), keep the K smallest
    hashes per group, estimate distinct = (K-1)/u_K -- the mergeable
    distinct sketch whose estimate is a PURE DETERMINISTIC function of
    the key set, so unlike HLL++ (q_approx_distinct_users, rows-only)
    it has an EXACT cross-engine oracle. Groups with fewer than K
    distinct hashes report exactly. The exact count rides along, so
    the row doubles as the sketch's own error audit.

    Portability: the hash is the md5 hex32 decode on the shared grid;
    u = (v + 0.5)/2^32; the estimate is one fixed-shape double
    division. Selection of u_K is integer ranking (hash asc, K-th
    row), tie-free because equal hashes are deduplicated first (KMV
    is a function of the distinct hash SET by definition).

    Scale shape: the corpus-sized work is the distinct (one shuffle,
    map-side combined); the bottom-K is grouped_topk map-side pruning
    (~batches x groups x K rows to the rank shuffle). At 100 TB the
    exact-count column is the expensive half -- drop it and the
    sketch path alone is the production form; it is kept here because
    the operator IS the audit."""
    from .topk import grouped_topk

    events = load_table(spark, sf_dir, "events")
    hashed = events.select(
        "event_type", _kmv_hex32("user_id").alias("hv")
    ).distinct()
    exact = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_hashes")
    )
    kth = (
        grouped_topk(hashed, ["event_type"], [("hv", True)], KMV_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("hv").cast("long").alias("kth_hv"),
        )
    )
    est = (
        F.when(
            F.col("n_kept") < F.lit(KMV_K),
            F.col("n_kept").cast("double"),
        ).otherwise(
            F.lit(float(KMV_K - 1))
            / ((F.col("kth_hv").cast("double") + F.lit(0.5)) / F.lit(4294967296.0))
        )
    )
    return (
        exact.join(kth, "event_type")
        .select(
            "event_type",
            "n_distinct_hashes",
            F.round(est, 2).alias("kmv_estimate"),
            F.round(
                F.try_divide(
                    est - F.col("n_distinct_hashes").cast("double"),
                    F.col("n_distinct_hashes").cast("double"),
                ),
                6,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def _kmv_hex32_sql(expr: str) -> str:
    out = "CAST(0 AS BIGINT)"
    for j in range(1, 9):
        a = f"ascii(substr({expr}, {j}, 1))"
        d = f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"
        out = f"({out} * 16 + {d})"
    return out


ADVANCED_ORACLES["q_distinct_kmv"] = f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             {_kmv_hex32_sql("md5(CAST(user_id AS VARCHAR))")} AS hv
      FROM events),
    exact AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct_hashes
      FROM hashed GROUP BY 1),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rnk
      FROM hashed),
    kth AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(max(hv) AS BIGINT) AS kth_hv
      FROM ranked WHERE rnk <= {KMV_K} GROUP BY 1),
    est AS (
      SELECT e.event_type, e.n_distinct_hashes,
             CASE WHEN k.n_kept < {KMV_K}
                  THEN CAST(k.n_kept AS DOUBLE)
                  ELSE {float(KMV_K - 1)}
                       / ((CAST(k.kth_hv AS DOUBLE) + 0.5) / 4294967296.0)
             END AS kmv
      FROM exact e JOIN kth k ON k.event_type = e.event_type)
    SELECT event_type, n_distinct_hashes,
           round(kmv, 2) AS kmv_estimate,
           round((kmv - CAST(n_distinct_hashes AS DOUBLE))
                 / nullif(CAST(n_distinct_hashes AS DOUBLE), 0), 6)
             AS rel_error
    FROM est ORDER BY event_type
"""

ADVANCED_QUERIES["q_distinct_kmv"] = q_distinct_kmv


# ---- seasonal-residual anomaly detection ----

#: Anomalies reported (largest |z| against the weekly template).
ANOMALY_TOP = 20


def q_anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly traffic anomalies against the weekly seasonal template:
    each HOUR INSTANCE's event count is z-scored against the
    mean/sigma of its own (day-of-week, hour-of-day) cell across the
    corpus -- 'is this Tuesday 14:00 unusual FOR a Tuesday 14:00' --
    and the ANOMALY_TOP largest |z| hours are reported. This is the
    detector q_seasonality_profile's template exists for, and the
    point-anomaly companion to q_cusum_changepoint's sustained-drift
    detector.

    Exactness: hour-instance counts and per-cell sum/sum-of-squares
    are exact integers (dow from the integer-epoch arithmetic both
    engines share); cell mean, population sigma and z are fixed-shape
    doubles; cells with one instance or zero variance are excluded by
    a comparison on those bit-equal doubles. |z| ranks on the round-6
    grid with the hour id breaking ties.

    Scale shape: ONE map-side-combined groupBy(hour) over the scan;
    the cell statistics aggregate the hour SERIES (time-span-bounded)
    into 168 rows broadcast back onto it; the top-|z| pick is
    grouped_topk map-side pruning."""
    from .topk import grouped_topk

    events = load_table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    hourly = (
        events.select(F.floor(ts_sec / F.lit(3600.0)).cast("long").alias("hr_id"))
        .groupBy("hr_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "hr_id",
            "cnt",
            F.pmod(
                F.floor(F.col("hr_id") / F.lit(24.0)).cast("long") + F.lit(4),
                F.lit(7),
            )
            .cast("long")
            .alias("dow"),
            F.pmod(F.col("hr_id"), F.lit(24)).cast("long").alias("hod"),
        )
    )
    cells = hourly.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_inst"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    ni = F.col("n_inst").cast("double")
    mean = F.col("s1").cast("double") / ni
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / ni
    ) / ni
    stats = cells.select(
        "dow", "hod", "n_inst", mean.alias("cell_mean"), var.alias("cell_var")
    ).filter((F.col("n_inst") >= 2) & (F.col("cell_var") > 0))
    scored = hourly.join(broadcast(stats), ["dow", "hod"]).select(
        "hr_id",
        "dow",
        "hod",
        "cnt",
        F.round(
            (F.col("cnt").cast("double") - F.col("cell_mean"))
            / F.sqrt(F.col("cell_var")),
            6,
        ).alias("z"),
    )
    top = grouped_topk(
        scored.withColumn("az", F.abs(F.col("z"))).withColumn("g", F.lit(1)),
        ["g"],
        [("az", False), ("hr_id", True)],
        ANOMALY_TOP,
    )
    return top.select(
        F.col("rank").cast("long").alias("rank"),
        "hr_id",
        "dow",
        "hod",
        "cnt",
        "z",
    ).orderBy("rank")


ADVANCED_ORACLES["q_anomaly_seasonal_residual"] = f"""
    WITH hourly AS (
      SELECT hr_id, cnt,
             (CAST(floor(hr_id / 24.0) AS BIGINT) + 4) % 7 AS dow,
             hr_id % 24 AS hod
      FROM (
        SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600.0)
                    AS BIGINT) AS hr_id,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1)),
    cells AS (
      SELECT dow, hod,
             CAST(count(*) AS BIGINT) AS n_inst,
             CAST(sum(cnt) AS BIGINT) AS s1,
             CAST(sum(cnt * cnt) AS BIGINT) AS s2
      FROM hourly GROUP BY 1, 2),
    stats AS (
      SELECT dow, hod, n_inst,
             CAST(s1 AS DOUBLE) / CAST(n_inst AS DOUBLE) AS cell_mean,
             (CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n_inst AS DOUBLE)) / CAST(n_inst AS DOUBLE) AS cell_var
      FROM cells),
    good AS (SELECT * FROM stats WHERE n_inst >= 2 AND cell_var > 0),
    scored AS (
      SELECT h.hr_id, h.dow, h.hod, h.cnt,
             round((CAST(h.cnt AS DOUBLE) - g.cell_mean)
                   / sqrt(g.cell_var), 6) AS z
      FROM hourly h JOIN good g ON g.dow = h.dow AND g.hod = h.hod),
    ranked AS (
      SELECT hr_id, dow, hod, cnt, z,
             CAST(row_number() OVER (ORDER BY abs(z) DESC, hr_id)
                  AS BIGINT) AS rank
      FROM scored)
    SELECT rank, hr_id, dow, hod, cnt, z
    FROM ranked WHERE rank <= {ANOMALY_TOP}
    ORDER BY rank
"""

ADVANCED_QUERIES["q_anomaly_seasonal_residual"] = q_anomaly_seasonal_residual


# ---- Poissonized bootstrap confidence interval ----

#: Bootstrap replicates. 200 gives a stable 2.5%/97.5% pair by exact
#: order statistics (ranks 5 and 195 of 200 means).
BOOT_B = 200

#: Poisson(1) CDF thresholds for the per-(row, replicate) weight: the
#: Poissonized bootstrap draws each row's multiplicity Poisson(1)
#: instead of multinomial (independence makes it embarrassingly
#: distributable -- no global n coupling); truncated at 6 (tail mass
#: 6e-4). Literal doubles, identical in both engines.
_POIS_CDF = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,   # P(<=1)
    0.9196986029286058,   # P(<=2)
    0.9810118431238462,   # P(<=3)
    0.9963401531726563,   # P(<=4)
    0.9994058151824183,   # P(<=5)
)


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean purchase value
    by the deterministic Poissonized bootstrap: every (event,
    replicate b) pair draws a Poisson(1) multiplicity from the
    portable md5 uniform of (event_id, b), each replicate computes
    its weighted mean, and the CI is the exact 2.5%/97.5% order
    statistics of the BOOT_B replicate means -- distribution-free
    uncertainty for a skewed metric where the normal-theory interval
    (q_welch_ttest_value's machinery) is untrustworthy.

    Determinism/portability: u(i,b) = hex32(md5(event_id * 1000 + b))
    on the shared grid; the weight is a literal-threshold CASE ladder
    over the Poisson(1) CDF; each replicate's weighted sum is exact
    DECIMAL x integer; means are fixed-shape doubles; the CI bounds
    are exact rank-5/rank-195 selections (no interpolation), ranked
    on the round-6 grid with b breaking ties.

    Scale shape: the replication is a flat B-way explode -- one scan,
    one map-side-combined groupBy(b), B rows out; no global coupling
    between replicates (the point of Poissonization). At 100 TB run
    it on a subsample or switch to the bag-of-little-bootstraps
    split; the per-replicate plan is unchanged either way."""
    events = load_table(spark, sf_dir, "events")
    purch = events.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", F.col("value").cast("decimal(12,2)").alias("v"))
    # B-way explode + one md5 per (event, replicate) off a one-row-
    # group parquet scan ran as a single 3.9 s task (r11 profile);
    # spread the purchases first so the replication fans out across
    # the cluster.
    purch = purch.repartition(spark.sparkContext.defaultParallelism)
    pairs = purch.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        "event_id",
    )
    u = (
        _kmv_hex32_expr(F.col("event_id") * F.lit(1000) + F.col("b")).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    wexpr = (
        F.when(u < F.lit(_POIS_CDF[0]), 0)
        .when(u < F.lit(_POIS_CDF[1]), 1)
        .when(u < F.lit(_POIS_CDF[2]), 2)
        .when(u < F.lit(_POIS_CDF[3]), 3)
        .when(u < F.lit(_POIS_CDF[4]), 4)
        .when(u < F.lit(_POIS_CDF[5]), 5)
        .otherwise(6)
    )
    reps = (
        pairs.select("b", "v", wexpr.cast("long").alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("v") * F.col("w").cast("decimal(12,0)"))
            .cast("decimal(38,2)")
            .alias("ws"),
            F.sum("w").cast("long").alias("wn"),
        )
        .select(
            "b",
            F.round(
                F.try_divide(F.col("ws").cast("double"), F.col("wn").cast("double")),
                6,
            ).alias("mean_b"),
        )
    )
    w_rank = Window.orderBy("mean_b", "b")
    ranked = reps.select(
        "mean_b", F.row_number().over(w_rank).cast("long").alias("rnk")
    )
    point = purch.agg(
        F.round(
            F.try_divide(
                F.sum("v").cast("decimal(38,2)").cast("double"),
                F.count(F.lit(1)).cast("double"),
            ),
            6,
        ).alias("mean_value"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    lo = int(round(0.025 * BOOT_B))  # rank 5
    hi = int(round(0.975 * BOOT_B))  # rank 195
    ci = ranked.agg(
        F.max(F.when(F.col("rnk") == lo, F.col("mean_b"))).alias("ci_low"),
        F.max(F.when(F.col("rnk") == hi, F.col("mean_b"))).alias("ci_high"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    return point.crossJoin(broadcast(ci)).select(
        "n_rows", "mean_value", "ci_low", "ci_high", "n_replicates"
    )


def _kmv_hex32_expr(col):
    """_kmv_hex32 over an arbitrary integer Column expression (same
    conv() decode; see _kmv_hex32)."""
    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _pois_case_sql(u: str) -> str:
    whens = "".join(
        f"WHEN {u} < {t} THEN {i} " for i, t in enumerate(_POIS_CDF)
    )
    return f"(CASE {whens}ELSE 6 END)"


ADVANCED_ORACLES["q_bootstrap_ci_mean"] = f"""
    WITH purch AS (
      SELECT event_id, CAST(value AS DECIMAL(12,2)) AS v
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
    pairs AS (
      SELECT v, b.b, event_id,
             ({_kmv_hex32_sql("md5(CAST(event_id * 1000 + b.b AS VARCHAR))")}
              + 0.5) / 4294967296.0 AS u
      FROM purch
      CROSS JOIN (SELECT CAST(unnest(range({BOOT_B})) AS BIGINT) AS b) b),
    reps AS (
      SELECT b,
             round(CAST(CAST(sum(v * CAST(w AS DECIMAL(12,0)))
                             AS DECIMAL(38,2)) AS DOUBLE)
                   / nullif(CAST(sum(w) AS DOUBLE), 0), 6) AS mean_b
      FROM (SELECT b, v, CAST({_pois_case_sql("u")} AS BIGINT) AS w
            FROM pairs)
      GROUP BY b),
    ranked AS (
      SELECT mean_b,
             CAST(row_number() OVER (ORDER BY mean_b, b) AS BIGINT) AS rnk
      FROM reps),
    ci AS (
      SELECT max(CASE WHEN rnk = {int(round(0.025 * BOOT_B))}
                      THEN mean_b END) AS ci_low,
             max(CASE WHEN rnk = {int(round(0.975 * BOOT_B))}
                      THEN mean_b END) AS ci_high,
             CAST(count(*) AS BIGINT) AS n_replicates
      FROM ranked),
    point AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(CAST(CAST(sum(v) AS DECIMAL(38,2)) AS DOUBLE)
                   / nullif(CAST(count(*) AS DOUBLE), 0), 6) AS mean_value
      FROM purch)
    SELECT n_rows, mean_value, ci_low, ci_high, n_replicates
    FROM point CROSS JOIN ci
"""

ADVANCED_QUERIES["q_bootstrap_ci_mean"] = q_bootstrap_ci_mean


# ---- Holt linear-trend smoothing backtest ----

#: Holt double-exponential smoothing coefficients (level / trend).
#: Both literals parse to the same IEEE double in Spark and DuckDB,
#: so the recursion is bit-portable like the EWMA/CUSUM folds.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def q_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of Holt's linear-trend (double
    exponential) smoother over the per-type hourly count series -- the
    trending companion to q_ewma_backtest: EWMA lags any sustained
    ramp by design; Holt carries an explicit trend state
    (l_t = a*y_t + (1-a)*(l_{t-1}+b_{t-1}),
    b_t = B*(l_t-l_{t-1}) + (1-B)*b_{t-1}, forecast l+b), so comparing
    the two MAEs says whether the series has exploitable drift.
    Init l_1 = y_1, b_1 = 0; predictions start at i = 2.

    Exactness: the coupled recursion is inherently sequential -- no
    window closed form exists in floating point -- so Spark runs it as
    a higher-order ``aggregate`` fold carrying (l, b) struct state
    over each type's hour-sorted array, and DuckDB as a recursive CTE
    carrying the same two columns: the identical IEEE op sequence per
    step, bit-equal states. Per-step errors round to 9 dp and sum as
    DECIMAL(28,9) (the order-independent fold); MAE/bias/final level+
    trend are fixed-shape doubles at the end.

    Scale shape: identical to q_ewma_backtest -- one map-side-combined
    groupBy to hourly counts, one shuffle to per-type arrays whose
    length is bounded by the TIME SPAN (8 760/year), folded inside a
    task, never on the driver; a multi-year series would chunk by the
    segmented-scan decomposition documented there.

    No reference analog (extension family: forecasting baselines over
    the reference's sales/events stream)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    series = hourly.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct(ts_str("hour").alias("h"), "cnt"))
        ).alias("xs")
    )
    folded = series.select(
        "event_type",
        "xs",
        F.expr(
            f"""
            aggregate(
              xs,
              cast(array() as array<struct<l:double, b:double, pred:double>>),
              (acc, x) -> array_append(acc, if(size(acc) = 0,
                named_struct('l', cast(x.cnt as double),
                             'b', cast(0.0 as double),
                             'pred', cast(null as double)),
                named_struct(
                  'l', cast({HOLT_ALPHA} as double) * x.cnt
                       + cast({1 - HOLT_ALPHA} as double)
                         * (element_at(acc, -1).l + element_at(acc, -1).b),
                  'b', cast({HOLT_BETA} as double)
                       * (cast({HOLT_ALPHA} as double) * x.cnt
                          + cast({1 - HOLT_ALPHA} as double)
                            * (element_at(acc, -1).l + element_at(acc, -1).b)
                          - element_at(acc, -1).l)
                       + cast({1 - HOLT_BETA} as double) * element_at(acc, -1).b,
                  'pred', element_at(acc, -1).l + element_at(acc, -1).b)))
            )
            """
        ).alias("st"),
    )
    pairs = (
        folded.select(
            "event_type", F.explode(F.arrays_zip("xs", "st")).alias("p")
        )
        .filter(F.col("p.st.pred").isNotNull())
        .select(
            "event_type",
            F.col("p.st.pred").alias("pred"),
            F.col("p.xs.cnt").cast("double").alias("actual"),
        )
    )
    err = F.col("actual") - F.col("pred")
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_preds"),
        F.sum(F.round(F.abs(err), 9).cast("decimal(28,9)")).alias("sae"),
        F.sum(F.round(err, 9).cast("decimal(28,9)")).alias("se"),
    )
    finals = folded.select(
        "event_type",
        F.round(F.element_at("st", -1)["l"], 6).alias("final_level"),
        F.round(F.element_at("st", -1)["b"], 6).alias("final_trend"),
    )
    return (
        m.join(finals, "event_type")
        .select(
            "event_type",
            "n_preds",
            F.round(F.col("sae").cast("double") / F.col("n_preds"), 6).alias("mae"),
            F.round(F.col("se").cast("double") / F.col("n_preds"), 6).alias("bias"),
            "final_level",
            "final_trend",
        )
        .orderBy("event_type")
    )


ADVANCED_ORACLES["q_holt_backtest"] = f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    numbered AS MATERIALIZED (
      SELECT event_type, hour, cnt,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
      FROM hourly),
    holt AS (
      SELECT event_type, i, cnt,
             CAST(cnt AS DOUBLE) AS l,
             CAST(0.0 AS DOUBLE) AS b,
             CAST(NULL AS DOUBLE) AS pred
      FROM numbered WHERE i = 1
      UNION ALL
      SELECT n.event_type, n.i, n.cnt,
             CAST({HOLT_ALPHA} AS DOUBLE) * n.cnt
               + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.l + h.b),
             CAST({HOLT_BETA} AS DOUBLE)
               * (CAST({HOLT_ALPHA} AS DOUBLE) * n.cnt
                  + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.l + h.b) - h.l)
               + CAST({1 - HOLT_BETA} AS DOUBLE) * h.b,
             h.l + h.b
      FROM numbered n JOIN holt h
        ON n.event_type = h.event_type AND n.i = h.i + 1),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_preds,
             sum(CAST(round(abs(CAST(cnt AS DOUBLE) - pred), 9)
                      AS DECIMAL(28,9))) AS sae,
             sum(CAST(round(CAST(cnt AS DOUBLE) - pred, 9)
                      AS DECIMAL(28,9))) AS se
      FROM holt WHERE pred IS NOT NULL GROUP BY 1),
    finals AS (
      SELECT event_type, round(l, 6) AS final_level, round(b, 6) AS final_trend
      FROM holt QUALIFY row_number() OVER (PARTITION BY event_type
                                           ORDER BY i DESC) = 1)
    SELECT m.event_type, n_preds,
           round(CAST(sae AS DOUBLE) / n_preds, 6) AS mae,
           round(CAST(se AS DOUBLE) / n_preds, 6) AS bias,
           final_level, final_trend
    FROM m JOIN finals ON finals.event_type = m.event_type
    ORDER BY m.event_type
"""

ADVANCED_QUERIES["q_holt_backtest"] = q_holt_backtest


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: parts not
    DOMINATED on (minimize p_retailprice, maximize p_size) -- the
    classic skyline operator (Borzsony/Kossmann/Stocker ICDE'01,
    "best hotels: cheap AND close to the beach"). A part is dominated
    iff another part is <= on price and >= on size with at least one
    strict; exact duplicates do not dominate each other and both
    survive.

    Plan -- no self-join: the naive form is a quadratic NOT EXISTS
    (exactly what the DuckDB twin runs); 2-D skylines instead admit a
    prefix-max sweep. Prices are compacted to DISTINCT price groups
    (one max-size per group), a running max over the price-ordered
    group frame gives "best size at any cheaper price", and each part
    then checks two inequalities map-side. The ordered window runs
    over the COMPACTED grid (|distinct prices| << |parts|, the
    repo's distinct-value-compaction discipline from KS/Gini); at
    100 TB the prefix max would go two-phase (range-partition the
    grid, per-partition max, broadcast partial prefixes) -- the
    quadratic pair probe is what must never happen, and doesn't.
    No arithmetic on the measures anywhere: comparisons only, so
    cross-engine parity is trivial."""
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("partkey"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    groups = part.groupBy("price").agg(F.max("size").alias("gmax"))
    w_prev = Window.orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = groups.select(
        "price",
        "gmax",
        F.max("gmax").over(w_prev).alias("prevmax"),
    )
    joined = part.join(frontier, "price")
    dominated = (
        F.col("prevmax").isNotNull() & (F.col("prevmax") >= F.col("size"))
    ) | (F.greatest(F.coalesce("prevmax", F.lit(None)), "gmax") > F.col("size"))
    return (
        joined.filter(~dominated)
        .select("partkey", "price", "size")
        .orderBy("price", "partkey")
    )


ADVANCED_ORACLES["q_skyline_parts"] = """
    SELECT CAST(p.p_partkey AS BIGINT) AS partkey,
           p.p_retailprice AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY price, partkey
"""

ADVANCED_QUERIES["q_skyline_parts"] = q_skyline_parts


def q_theilsen_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise slopes of the hourly count series (plus the matching
    median-residual intercept) -- the standard outlier-immune
    complement to q_trend_by_type's OLS slope (one corrupted hour
    moves OLS arbitrarily; Theil-Sen has a 29% breakdown point).
    Types with fewer than two observed hours are omitted.

    Plan discipline: the pair space is built on the COMPACTED hourly
    grid (the KS/Gini distinct-value-compaction rule) -- at most
    C(hours, 2) rows (~260k for a month of hours), never corpus-sized;
    the events table itself is touched once for the grouped count.
    Median selection is rank-based (lower median, row_number over the
    per-type slope sort), which picks a VALUE from the computed
    multiset -- deterministic regardless of tie order, and each slope
    is a single correctly-rounded double division of exact integers,
    so both engines rank identical bit patterns. Intercept = median
    of (y - slope * x) at the selected slope, same selection rule."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            (F.col("hour").cast("long") / 3600).cast("long").alias("x"),
            F.col("cnt").cast("long").alias("y"),
        )
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.x") < F.col("b.x")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope"),
        )
    )
    # r11 (guide section 4.2): the lower median is a SELECTION, not a
    # ranking -- the previous row_number-over-sort + count-window shape
    # paid a full per-type sort plus a second window pass (3.4 s + 2.2 s
    # CPU at sf0.1) to pick ONE value per type. One Arrow-grouped
    # kernel does it in O(n) with np.partition. Identical output:
    # the window picked the value at rank (n+1) div 2 of the slope
    # sort; np.partition returns exactly the k-th smallest of the same
    # double multiset (no NaN/-0.0 in slopes: numerators are int-cast
    # doubles, denominators strictly positive), and n_pairs is the
    # same group count. Per-group state stays bounded by the compacted
    # grid (C(hours,2) slopes -- time-range-, not corpus-, sized), so
    # holding one group per task is the same memory class as the
    # window sort it replaces.
    import pandas as _pd

    def _lower_median_slope(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        import numpy as _np

        a = pdf["slope"].to_numpy()
        k = (len(a) + 1) // 2
        return _pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [_np.partition(a, k - 1)[k - 1]],
                "n_pairs": [len(a)],
            }
        )

    med_slope = slopes.groupBy("event_type").applyInPandas(
        _lower_median_slope, "event_type string, slope double, n_pairs long"
    )
    resid = hourly.join(med_slope, "event_type").select(
        "event_type",
        "slope",
        "n_pairs",
        (F.col("y").cast("double") - F.col("slope") * F.col("x").cast("double"))
        .alias("r"),
    )
    wr = Window.partitionBy("event_type").orderBy("r")
    ranked_r = resid.select(
        "event_type",
        "slope",
        "n_pairs",
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("np"),
    )
    return (
        ranked_r.filter(F.col("rn") == F.expr("CAST((np + 1) / 2 AS BIGINT)"))
        .select(
            "event_type",
            F.col("np").cast("long").alias("n_points"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_per_hour"),
            F.round("r", 6).alias("intercept"),
        )
        .orderBy("event_type")
    )


ADVANCED_ORACLES["q_theilsen_hourly"] = """
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.x < b.x),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM slopes),
    med AS (
      SELECT event_type, slope, n AS n_pairs FROM ranked
      WHERE rn = CAST((n + 1) / 2 AS BIGINT)),
    resid AS (
      SELECT h.event_type, m.slope, m.n_pairs,
             CAST(h.y AS DOUBLE) - m.slope * CAST(h.x AS DOUBLE) AS r
      FROM hourly h JOIN med m ON h.event_type = m.event_type),
    ranked_r AS (
      SELECT event_type, slope, n_pairs, r,
             row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM resid)
    SELECT event_type,
           CAST(np AS BIGINT) AS n_points,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(slope, 6) AS slope_per_hour,
           round(r, 6) AS intercept
    FROM ranked_r
    WHERE rn = CAST((np + 1) / 2 AS BIGINT)
    ORDER BY event_type
"""

ADVANCED_QUERIES["q_theilsen_hourly"] = q_theilsen_hourly


# ---- Winsorized / trimmed means (round 7) ----

#: Tail fraction clipped on each side (5% -> the 5/95 winsorized
#: mean), expressed as an integer permille denominator so the cut
#: rank k = n * WINSOR_PCT_NUM // WINSOR_PCT_DEN is exact integer
#: arithmetic in both engines.
WINSOR_PCT_NUM = 5
WINSOR_PCT_DEN = 100


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed order-value means per order priority --
    the robust-location summaries used when a raw mean is hostage to
    tail outliers (revenue dashboards, SLA means): clip (winsorize) or
    drop (trim) the k = floor(n * 5%) extreme rows on each side.

    Exactness: the cut points are VALUES AT EXACT RANKS (row_number
    over (o_totalprice, o_orderkey) -- a total order, so both engines
    select identical DECIMAL bit patterns; no percentile
    interpolation, the q_theilsen/_discrete_degree_cap selection
    rule). Clamped/trimmed sums stay DECIMAL(38,2)-exact; the final
    divisions are the only doubles.

    Scale shape: one rangepartition+sort per group for the rank (the
    standard distributed order-statistic cost), one aggregate for the
    bounds (conditional max -- no second sort), one broadcast-sized
    join of per-group bounds back onto the ranked frame, one final
    aggregate. No collects, no crossJoin."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )
    sizes = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    k = (F.col("n") * WINSOR_PCT_NUM / WINSOR_PCT_DEN).cast("long")
    sized = ranked.join(F.broadcast(sizes.select(
        "o_orderpriority", "n", k.alias("k")
    )), "o_orderpriority")
    bounds = sized.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rnk") == F.col("k") + 1, F.col("v"))).alias(
            "lo_val"
        ),
        F.max(F.when(F.col("rnk") == F.col("n") - F.col("k"), F.col("v")))
        .alias("hi_val"),
    )
    clamped = sized.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "k",
        "v",
        "lo_val",
        "hi_val",
        F.greatest(F.least(F.col("v"), F.col("hi_val")), F.col("lo_val"))
        .alias("vw"),
        ((F.col("rnk") > F.col("k")) & (F.col("rnk") <= F.col("n") - F.col("k")))
        .alias("kept"),
    )
    agg = clamped.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k_cut"),
        F.max("lo_val").alias("lo_val"),
        F.max("hi_val").alias("hi_val"),
        F.sum("v").cast("decimal(38,2)").alias("s_raw"),
        F.sum("vw").cast("decimal(38,2)").alias("s_win"),
        F.sum(F.when(F.col("kept"), F.col("v"))).cast("decimal(38,2)").alias(
            "s_trim"
        ),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias(
            "n_trim"
        ),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        "k_cut",
        "lo_val",
        "hi_val",
        F.round(F.col("s_raw").cast("double") / F.col("n").cast("double"), 6)
        .alias("mean_raw"),
        F.round(F.col("s_win").cast("double") / F.col("n").cast("double"), 6)
        .alias("mean_winsorized"),
        F.round(
            F.col("s_trim").cast("double") / F.col("n_trim").cast("double"), 6
        ).alias("mean_trimmed"),
    ).orderBy("o_orderpriority")


ADVANCED_QUERIES["q_winsorized_stats"] = q_winsorized_stats
ADVANCED_ORACLES["q_winsorized_stats"] = f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice AS v,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS rnk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders),
    sized AS (
      SELECT *, CAST(n * {WINSOR_PCT_NUM} // {WINSOR_PCT_DEN} AS BIGINT) AS k
      FROM ranked),
    bounds AS (
      SELECT o_orderpriority,
             max(CASE WHEN rnk = k + 1 THEN v END) AS lo_val,
             max(CASE WHEN rnk = n - k THEN v END) AS hi_val
      FROM sized GROUP BY 1),
    clamped AS (
      SELECT s.o_orderpriority, s.n, s.k, s.v, b.lo_val, b.hi_val,
             greatest(least(s.v, b.hi_val), b.lo_val) AS vw,
             (s.rnk > s.k AND s.rnk <= s.n - s.k) AS kept
      FROM sized s JOIN bounds b USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS k_cut,
           max(lo_val) AS lo_val,
           max(hi_val) AS hi_val,
           round(CAST(CAST(sum(v) AS DECIMAL(38,2)) AS DOUBLE)
                 / CAST(max(n) AS DOUBLE), 6) AS mean_raw,
           round(CAST(CAST(sum(vw) AS DECIMAL(38,2)) AS DOUBLE)
                 / CAST(max(n) AS DOUBLE), 6) AS mean_winsorized,
           round(CAST(CAST(sum(CASE WHEN kept THEN v END) AS DECIMAL(38,2))
                      AS DOUBLE)
                 / CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE), 6)
             AS mean_trimmed
    FROM clamped GROUP BY 1 ORDER BY o_orderpriority
"""


# ---- Burstiness (index of dispersion) per event type (round 7) ----


def q_burstiness_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of each event type's hourly arrival series: the
    index of dispersion (Fano factor) VMR = sample-variance / mean of
    the per-hour counts over the OBSERVED GRID (every hour between the
    type's first and last event, zero-filled -- without the dense
    grid, gaps silently vanish and burstiness is understated). VMR ~ 1
    is Poisson traffic; >> 1 is bursty (retry storms, batch jobs);
    << 1 is over-regular (schedulers). The one-number triage before
    pointing the changepoint/anomaly operators at a series.

    Exactness: counts are integers; with S1 = sum y, S2 = sum y^2 over
    n grid hours, VMR = (n*S2 - S1^2) / ((n-1) * S1) -- every moment
    an exact BIGINT (S2 <= n * max_count^2, far under 2^63 on any
    hourly grid), ONE double division at the end. The dense grid is a
    sequence() explode against the per-type hour span -- no raw-event
    blowup, the grid is hours-sized.

    Scale shape: one groupBy(type, hour) over the log, a per-type span
    aggregate, a grid explode joined back (left join, zero-fill), one
    moment aggregate. All map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    spans = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    dense = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", F.coalesce("y", F.lit(0)).alias("y")
    )
    m = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
    )
    vmr = (
        (F.col("n_hours") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / ((F.col("n_hours") - 1) * F.col("s1")).cast("double")
    )
    return m.select(
        "event_type",
        "n_hours",
        F.col("s1").alias("n_events"),
        F.round(
            F.col("s1").cast("double") / F.col("n_hours").cast("double"), 6
        ).alias("mean_per_hour"),
        F.round(F.when(F.col("n_hours") > 1, vmr), 6).alias("dispersion"),
    ).orderBy("event_type")


ADVANCED_QUERIES["q_burstiness_hourly"] = q_burstiness_hourly
ADVANCED_ORACLES["q_burstiness_hourly"] = """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    spans AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
              FROM hourly GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1,
                                                INTERVAL 1 HOUR)) AS hour
      FROM spans),
    dense AS (
      SELECT g.event_type, COALESCE(h.y, 0) AS y
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hour = g.hour),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(y) AS BIGINT) AS s1,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM dense GROUP BY 1)
    SELECT event_type, n_hours, s1 AS n_events,
           round(CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE), 6)
             AS mean_per_hour,
           round(CASE WHEN n_hours > 1 THEN
             CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
               / CAST((n_hours - 1) * s1 AS DOUBLE)
           END, 6) AS dispersion
    FROM m ORDER BY event_type
"""


# ---- Spearman rank correlation (round 7) ----


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and
    extended price, per return flag -- the monotone-association check
    that is robust where Pearson (q_corr_purchase_click's machinery)
    is distorted by heavy tails. Computed as the Pearson correlation
    OF THE RANKS with average-rank tie handling -- the textbook
    tie-corrected Spearman rho.

    Exactness: average ranks are exact HALF-integers ((2*rank() +
    count - 1) / 2 over a deterministic window); doubling them gives
    exact BIGINTs, so every moment (n, Sx, Sy, Sxy, Sxx, Syy over the
    DOUBLED ranks) is an exact DECIMAL(38,0) sum -- the doubling
    cancels in the correlation -- and rho assembles in one fixed-shape
    double expression (sqrt is correctly rounded). Bit-portable
    without any quantization discipline.

    Scale shape: two window ranks per group (rangepartition+sort,
    the order-statistic cost), one moment aggregate. No joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    # doubled average rank = 2*min_rank + ties - 1 (exact integers)
    ranked = li.select(
        "l_returnflag",
        (
            2 * F.rank().over(wq)
            + F.count(F.lit(1)).over(
                Window.partitionBy("l_returnflag", "l_quantity")
            )
            - 2
        ).cast("decimal(19,0)").alias("rx"),
        (
            2 * F.rank().over(wp)
            + F.count(F.lit(1)).over(
                Window.partitionBy("l_returnflag", "l_extendedprice")
            )
            - 2
        ).cast("decimal(19,0)").alias("ry"),
    )
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("decimal(38,0)").alias("sx"),
        F.sum("ry").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    rho = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag", "n", F.round(rho, 6).alias("spearman_rho")
    ).orderBy("l_returnflag")


ADVANCED_QUERIES["q_spearman_corr"] = q_spearman_corr
ADVANCED_ORACLES["q_spearman_corr"] = """
    WITH ranked AS (
      SELECT l_returnflag,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity)
                  + count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                  - 2 AS DECIMAL(19,0)) AS rx,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice)
                  + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
                  - 2 AS DECIMAL(19,0)) AS ry
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS DECIMAL(38,0)) AS sx,
             CAST(sum(ry) AS DECIMAL(38,0)) AS sy,
             CAST(sum(rx * ry) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(rx * rx) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(ry * ry) AS DECIMAL(38,0)) AS syy
      FROM ranked GROUP BY 1)
    SELECT l_returnflag, n,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS spearman_rho
    FROM m ORDER BY l_returnflag
"""


# ---- Tukey-fence (IQR) outlier screen (round 7, second batch) ----


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen on event values per type: quartiles
    at EXACT DISCRETE RANKS (value at row ceil(n/4) / ceil(3n/4) of
    the (value, event_id) total order -- the winsorized-stats
    selection rule, no interpolation), fences at q +/- 1.5*IQR, and
    the count/extremes of the flagged tails. The third member of the
    outlier-screen family (z-score: mean-based, breaks under heavy
    tails; MAD: median-absolute; IQR: the boxplot rule) -- all three
    registered so a curation pipeline can compare flag rates.

    Exactness: rank selection picks concrete stored doubles; fences
    are one fixed-shape double expression; counts are integers.

    Scale shape: one rangepartition+sort per type for the rank, one
    conditional aggregate for the quartiles, a broadcast-sized fence
    join back, one final aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rnk") == F.ceil(F.col("n") / 4), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rnk") == F.ceil(3 * F.col("n") / 4), F.col("value")
            )
        ).alias("q3"),
    )
    fenced = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    joined = ev.select("event_type", "value").join(
        F.broadcast(fenced), "event_type"
    )
    agg = joined.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("q1").alias("q1"),
        F.max("q3").alias("q3"),
        F.max("iqr").alias("iqr"),
        F.sum(
            F.when(
                (F.col("value") < F.col("lo_fence"))
                | (F.col("value") > F.col("hi_fence")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )
    return agg.select(
        "event_type",
        "n",
        F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"),
        F.round("iqr", 6).alias("iqr"),
        "n_outliers",
        F.round(
            F.col("n_outliers").cast("double") / F.col("n").cast("double"), 6
        ).alias("outlier_rate"),
    ).orderBy("event_type")


ADVANCED_QUERIES["q_iqr_outliers"] = q_iqr_outliers
ADVANCED_ORACLES["q_iqr_outliers"] = """
    WITH ev AS (SELECT event_type, event_id, value FROM events
                WHERE value IS NOT NULL),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM ev),
    q AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rnk = ceil(n / 4.0) THEN value END) AS q1,
             max(CASE WHEN rnk = ceil(3 * n / 4.0) THEN value END) AS q3
      FROM ranked GROUP BY 1),
    fenced AS (
      SELECT event_type, n, q1, q3, q3 - q1 AS iqr,
             q1 - 1.5 * (q3 - q1) AS lo_fence,
             q3 + 1.5 * (q3 - q1) AS hi_fence
      FROM q),
    agg AS (
      SELECT e.event_type, max(f.n) AS n, max(f.q1) AS q1,
             max(f.q3) AS q3, max(f.iqr) AS iqr,
             CAST(sum(CASE WHEN e.value < f.lo_fence
                             OR e.value > f.hi_fence
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM ev e JOIN fenced f ON f.event_type = e.event_type
      GROUP BY 1)
    SELECT event_type, n,
           round(q1, 6) AS q1, round(q3, 6) AS q3, round(iqr, 6) AS iqr,
           n_outliers,
           round(CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS outlier_rate
    FROM agg ORDER BY event_type
"""


# ---- Mutual information: event type x hour-of-day (round 8) ----


def q_mutual_info_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day, reported
    as each event type's additive MI contribution -- the effect-size
    companion to q_chi2_type_hour (chi2 answers "is traffic
    composition hour-dependent AT ALL"; MI answers "by how many nats",
    which is comparable across tables and sample sizes and is the
    quantity feature-selection actually ranks by):

        MI = sum_xy (n_xy / n) * ln(n_xy * n / (n_x * n_y))

    Empty cells contribute exactly 0 (lim p->0 of p ln p terms), so
    unlike the chi2 spine, observed cells suffice -- no margin cross
    join.

    Exactness: all counts are exact integers from ONE
    map-side-combined aggregate; each cell term is one fixed-shape
    double expression folded through round(.,9)-as-DECIMAL(28,9)
    (order-independent sum); final round(6).

    Scale shape: one corpus aggregate; margins and the term fold run
    on the (types x 24)-sized cell frame, margins broadcast."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.col("event_type"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rowm = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("rt")
    )
    colm = cells.groupBy("hr").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    od = F.col("o").cast("double")
    nd = F.col("n").cast("double")
    term = (
        od / nd
        * F.log(
            od * nd / (F.col("rt").cast("double") * F.col("ct").cast("double"))
        )
    )
    terms = (
        cells.join(broadcast(rowm), "event_type")
        .join(broadcast(colm), "hr")
        .crossJoin(broadcast(tot))
        .select(
            "event_type",
            "rt",
            F.round(term, 9).cast("decimal(28,9)").alias("t"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("rt").cast("long").alias("n_events"),
            F.sum("t").alias("mi"),
        )
        .select(
            "event_type",
            "n_events",
            F.round(F.col("mi").cast("double"), 6).alias("mi_part_nats"),
        )
        .orderBy("event_type")
    )


ADVANCED_QUERIES["q_mutual_info_type_hour"] = q_mutual_info_type_hour
ADVANCED_ORACLES["q_mutual_info_type_hour"] = """
    WITH cells AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    rowm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
             FROM cells GROUP BY 1),
    colm AS (SELECT hr, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT cells.event_type, rt,
             CAST(round(
               CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), 9)
               AS DECIMAL(28,9)) AS t
      FROM cells
      JOIN rowm ON rowm.event_type = cells.event_type
      JOIN colm ON colm.hr = cells.hr
      CROSS JOIN tot)
    SELECT event_type,
           CAST(max(rt) AS BIGINT) AS n_events,
           round(CAST(sum(t) AS DOUBLE), 6) AS mi_part_nats
    FROM terms GROUP BY event_type ORDER BY event_type
"""


# ---- SAX motif discovery over the hourly event series (round 8) ----

#: SAX geometry: 4 PAA segments of 6 hours per day-word, 4-letter
#: alphabet at the standard Gaussian quartile breakpoints.
SAX_SEGMENTS = 4
SAX_BREAKPOINTS = (-0.6745, 0.0, 0.6745)


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) motif counts over the
    daily event-volume shape: each day's 24 ZERO-FILLED hourly event
    counts are PAA-compressed into 4 six-hour segment means,
    z-normalized against the global hourly mean/std, discretized at
    the Gaussian-quartile breakpoints into letters a-d, and the
    resulting 4-letter day-words are counted -- the classic
    time-series motif/novelty primitive (recurring words = the
    corpus's daily load shapes; hapax words = anomalous days worth a
    look, the symbolic complement of q_anomaly_seasonal_residual).

    Exactness: hourly counts are exact integers on the dense day x 24
    spine (gaps count 0 -- without the fill, quiet hours vanish and
    every word inflates); segment means and the global mean are exact
    rationals evaluated as one fixed-shape double expression; the
    population std folds exact integer sums (sum c, sum c^2); letter
    boundaries compare identically-computed doubles, so the words are
    bit-equal across engines.

    Scale shape: one corpus aggregate to (day, hour) counts; the
    spine join, PAA regroup, and word count all run on days x 24
    rows."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    days = events.select(F.to_date("ts").alias("day")).distinct()
    hours = spark.range(24).select(F.col("id").cast("long").alias("hr"))
    spine = days.crossJoin(F.broadcast(hours))
    dense = spine.join(hourly, ["day", "hr"], "left").select(
        "day", "hr", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    stats = dense.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    seg = dense.groupBy(
        "day", (F.col("hr") / F.lit(24 // SAX_SEGMENTS)).cast("long").alias("seg")
    ).agg(F.sum("c").cast("long").alias("segsum"))
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = F.col("ss").cast("double") / nd - mean * mean
    z = (
        F.col("segsum").cast("double") / F.lit(float(24 // SAX_SEGMENTS))
        - mean
    ) / F.sqrt(var)
    b1, b2, b3 = SAX_BREAKPOINTS
    letter = (
        F.when(z < F.lit(b1), F.lit("a"))
        .when(z < F.lit(b2), F.lit("b"))
        .when(z < F.lit(b3), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lettered = seg.crossJoin(F.broadcast(stats)).select(
        "day", "seg", letter.alias("l")
    )
    words = (
        lettered.groupBy("day")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "l"))).getField("l")
            ).alias("word")
        )
    )
    total_days = days.count()
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_days"))
        .select(
            "word",
            "n_days",
            F.round(
                F.col("n_days").cast("double") / F.lit(float(max(total_days, 1))),
                6,
            ).alias("day_share"),
        )
        .orderBy(F.col("n_days").desc(), "word")
    )


ADVANCED_QUERIES["q_sax_motifs"] = q_sax_motifs
ADVANCED_ORACLES["q_sax_motifs"] = f"""
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    spine AS (
      SELECT day, CAST(h AS BIGINT) AS hr
      FROM days, unnest(generate_series(0, 23)) AS u(h)),
    dense AS (
      SELECT spine.day, spine.hr,
             CAST(coalesce(hourly.c, 0) AS BIGINT) AS c
      FROM spine LEFT JOIN hourly
        ON hourly.day = spine.day AND hourly.hr = spine.hr),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM dense),
    seg AS (
      SELECT day, hr // {24 // SAX_SEGMENTS} AS seg,
             CAST(sum(c) AS BIGINT) AS segsum
      FROM dense GROUP BY 1, 2),
    lettered AS (
      SELECT day, seg,
             CASE WHEN z < {SAX_BREAKPOINTS[0]} THEN 'a'
                  WHEN z < {SAX_BREAKPOINTS[1]} THEN 'b'
                  WHEN z < {SAX_BREAKPOINTS[2]} THEN 'c'
                  ELSE 'd' END AS l
      FROM (
        SELECT day, seg,
               (CAST(segsum AS DOUBLE) / {float(24 // SAX_SEGMENTS)}
                - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS z
        FROM seg CROSS JOIN stats)),
    words AS (
      SELECT day, string_agg(l, '' ORDER BY seg) AS word
      FROM lettered GROUP BY day)
    SELECT word, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(count(*) AS DOUBLE)
                 / greatest((SELECT count(*) FROM days), 1), 6) AS day_share
    FROM words GROUP BY word
    ORDER BY n_days DESC, word
"""


# ---- Exponential-decay user lifetime value (round 8) ----

#: Recency half-life (days) and the reported head size.
LTV_HALF_LIFE_DAYS = 30.0
LTV_TOP_K = 20

#: Fixed evaluation anchor (the serving-layer convention: relative-
#: time scoring must anchor on a constant both engines see).
LTV_ANCHOR = "2024-01-30 00:00:00"


def q_user_ltv_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted user lifetime value: per user, the sum of
    purchase values decayed exponentially by age,

        ltv = sum_e value_e * exp(-ln(2) * age_days_e / half_life)

    -- the standard churn-robust ranking for retention/LTV audiences
    (a user's year-old spike no longer outranks a steady recent
    buyer). Top-LTV_TOP_K users, deterministic (ltv DESC, user_id).

    Exactness: age is exact integer seconds from the fixed anchor
    (unix-epoch difference -- no timezone arithmetic); each decayed
    term is ONE fixed-shape double expression folded through
    round(.,9)-as-DECIMAL(28,9) so the per-user sum is
    order-independent; final round(6).

    Scale shape: one scan-map + one map-side-combinable
    groupBy(user_id); the head is TakeOrderedAndProject."""
    events = load_table(spark, sf_dir, "events")
    lam = 0.6931471805599453 / LTV_HALF_LIFE_DAYS
    age_days = (
        F.unix_timestamp(F.lit(LTV_ANCHOR).cast("timestamp"))
        - F.unix_timestamp(F.col("ts"))
    ).cast("double") / 86400.0
    term = F.col("value") * F.exp(-F.lit(lam) * age_days)
    purchases = events.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    return (
        purchases.select(
            "user_id",
            F.round(term, 9).cast("decimal(28,9)").alias("t"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("t").alias("ltv"),
        )
        .select(
            "user_id",
            "n_purchases",
            F.round(F.col("ltv").cast("double"), 6).alias("ltv_decayed"),
        )
        .orderBy(F.col("ltv_decayed").desc(), "user_id")
        .limit(LTV_TOP_K)
    )


ADVANCED_QUERIES["q_user_ltv_decay"] = q_user_ltv_decay
ADVANCED_ORACLES["q_user_ltv_decay"] = f"""
    WITH terms AS (
      SELECT user_id,
             CAST(round(value * exp(-{0.6931471805599453 / LTV_HALF_LIFE_DAYS}
                 * (CAST(date_diff('second', ts,
                         TIMESTAMP '{LTV_ANCHOR}') AS DOUBLE) / 86400.0)), 9)
                  AS DECIMAL(28,9)) AS t
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_purchases,
             sum(t) AS ltv
      FROM terms GROUP BY 1)
    SELECT user_id, n_purchases,
           round(CAST(ltv AS DOUBLE), 6) AS ltv_decayed
    FROM agg
    ORDER BY ltv_decayed DESC, user_id
    LIMIT {LTV_TOP_K}
"""
