"""Fuzzed oracle parity: run core aggregation semantics over
hypothesis-generated event tables (not just the driver fixtures) and
compare Spark vs DuckDB on the same parquet bytes."""

from __future__ import annotations

import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

event_strategy = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.datetimes(
        min_value=__import__("datetime").datetime(2024, 1, 1),
        max_value=__import__("datetime").datetime(2024, 1, 30),
    ).map(lambda d: d.replace(microsecond=0)),
    st.sampled_from(["purchase", "view", "click"]),
    st.one_of(
        st.none(),
        st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_strategy, min_size=0, max_size=60))
def test_grouped_decimal_agg_parity_on_random_data(spark, tmp_path_factory, rows):
    tmp = str(tmp_path_factory.mktemp("fuzz"))
    path = os.path.join(tmp, "events.parquet")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)

    sdf = (
        spark.read.parquet(path)
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.max("ts").alias("latest"),
        )
        .orderBy("event_type")
    )
    srows = [(r.event_type, r.n, str(r.total), r.latest) for r in sdf.collect()]

    con = duckdb.connect()
    drows = con.execute(
        f"""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS total,
               max(ts) AS latest
        FROM read_parquet('{path}/*.parquet')
        WHERE value IS NOT NULL
        GROUP BY event_type ORDER BY event_type
        """
    ).fetchall()
    con.close()
    assert [(a, b, c, d) for a, b, c, d in drows] == srows


USER_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

user_event_strategy = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.datetimes(
        min_value=__import__("datetime").datetime(2024, 1, 1),
        max_value=__import__("datetime").datetime(2024, 1, 10),
    ).map(lambda d: d.replace(microsecond=0)),
    st.integers(min_value=0, max_value=5),  # few users -> dense funnels
    st.sampled_from(["purchase", "view", "click"]),
    st.floats(min_value=0, max_value=100, allow_nan=False, allow_infinity=False),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(user_event_strategy, min_size=0, max_size=80))
def test_funnel_and_retention_parity_on_random_data(spark, tmp_path_factory, rows):
    """The ordering-sensitive curation operators (min-ts funnel
    cascade, first-seen cohorts) must agree with DuckDB on arbitrary
    event tables, not just the driver fixtures -- ties (same user, same
    timestamp, different type) are the interesting corner."""
    from kafka_clickhouse_pipeline_spark.operators.curation import (
        funnel_steps,
        retention_cohorts,
    )

    tmp = str(tmp_path_factory.mktemp("fuzz_funnel"))
    path = os.path.join(tmp, "events.parquet")
    spark.createDataFrame(rows, USER_SCHEMA).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")

    srow = funnel_steps(ev).collect()[0]
    drow = con.execute(
        """
        WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t_view
                AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY 1)
        SELECT (SELECT count(*) FROM v), (SELECT count(*) FROM c),
               (SELECT count(*) FROM p)
        """
    ).fetchone()
    assert tuple(srow) == drow

    srows = [(r.cohort_day, r.day_offset, r.n_active) for r in retention_cohorts(ev).collect()]
    drows = con.execute(
        """
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        cohort AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1)
        SELECT cohort_day, date_diff('day', cohort_day, d) AS day_offset,
               count(DISTINCT ev.user_id) AS n_active
        FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    con.close()
    assert srows == [(a, b, c) for a, b, c in drows]


pack_doc_strategy = st.tuples(
    st.integers(min_value=0, max_value=120),  # token counts, incl. oversize
    st.sampled_from(["sA", "sB", "sC"]),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(pack_doc_strategy, min_size=0, max_size=60))
def test_pack_sequences_parity_on_random_data(spark, rows):
    """The sequential packing recurrence (applyInPandas) must agree
    with an independent pure-Python replay on arbitrary corpora --
    oversize docs, empty groups, and shard boundaries included
    (doc_ids are spaced so consecutive docs often land in different
    PACK_SHARD_DOCS shards)."""
    from kafka_clickhouse_pipeline_spark.operators.curation import (
        PACK_SHARD_DOCS,
        pack_sequences,
    )

    capacity = 100
    docs = [
        (i * 60_000, " ".join(["w"] * n) if n else "", src)
        for i, (n, src) in enumerate(rows)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.source, r.shard, r.n_tokens, r.bin_id)
        for r in pack_sequences(df, capacity=capacity).collect()
    }

    # independent replay: group by (source, shard), walk in doc_id order
    expected = {}
    groups: dict[tuple, list] = {}
    for doc_id, text, src in docs:
        n = len(text.strip().split()) if text.strip() else 1  # split('\s+') of '' -> ['']
        groups.setdefault((src, doc_id // PACK_SHARD_DOCS), []).append((doc_id, n))
    for (src, shard), members in groups.items():
        fill, b = capacity + 1, 0
        for doc_id, n in sorted(members):
            if fill + n <= capacity:
                fill += n
            else:
                b += 1
                fill = n
            expected[doc_id] = (src, shard, n, b)
    assert got == expected


upsert_row_strategy = st.tuples(
    st.integers(min_value=0, max_value=6),     # key (forced collisions)
    st.integers(min_value=0, max_value=50),    # version
    st.integers(min_value=0, max_value=9),     # payload disambiguator
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(upsert_row_strategy, min_size=1, max_size=40))
def test_latest_per_key_parity_on_random_data(spark, rows):
    """latest_per_key (the max(struct) compaction core shared by the
    batch operator and the streaming upsert sink) must agree with a
    pure-Python replay on arbitrary inputs, including duplicate
    (key, version) pairs where the payload is the deterministic
    tiebreak."""
    from kafka_clickhouse_pipeline_spark.streaming.upsert import latest_per_key

    data = [(k, v, f"p{p}", p * 1.5) for k, v, p in rows]
    df = spark.createDataFrame(data, "k long, ver long, name string, score double")
    got = {
        r.k: (r.ver, r.name, r.score)
        for r in latest_per_key(df, ["k"], ["ver"]).collect()
    }

    expected: dict[int, tuple] = {}
    for k, ver, name, score in data:
        cur = expected.get(k)
        if cur is None or (ver, name, score) > cur:
            expected[k] = (ver, name, score)
    assert got == expected


doc_text_strategy = st.text(
    alphabet=st.sampled_from("ab cd"), min_size=0, max_size=40
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc_text_strategy, min_size=1, max_size=30))
def test_incremental_dedup_invariants_on_random_data(spark, texts):
    """On arbitrary corpora: survivors of dedup_batch_against_index are
    (a) fingerprint-unique, (b) disjoint from the index, (c) exactly
    the min-doc_id representatives of batch fingerprints not in the
    index."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.streaming.incremental_dedup import (
        dedup_batch_against_index,
        fingerprint,
    )

    rows = [(i, t, "s") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    cut = len(texts) // 2
    hist = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    index = hist.select(fingerprint(F.col("text")).alias("fingerprint")).distinct()

    out = dedup_batch_against_index(batch, index).collect()
    fps = [r["fingerprint"] for r in out]
    assert len(fps) == len(set(fps))
    index_fps = {r["fingerprint"] for r in index.collect()}
    assert not set(fps) & index_fps

    # reference computation in plain Python
    def fp(t):
        import hashlib
        import re

        return hashlib.md5(re.sub(r"\s+", " ", t.strip()).lower().encode()).hexdigest()

    hist_fps = {fp(t) for i, t in enumerate(texts) if i < cut}
    expect = {}
    for i, t in enumerate(texts):
        if i >= cut and fp(t) not in hist_fps and fp(t) not in expect:
            expect[fp(t)] = i
    assert {(r["fingerprint"], r["doc_id"]) for r in out} == {
        (k, v) for k, v in expect.items()
    }
