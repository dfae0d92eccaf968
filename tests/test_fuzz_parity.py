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


word_strategy = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
wordsoup_strategy = st.lists(word_strategy, min_size=0, max_size=24).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(wordsoup_strategy, min_size=1, max_size=16))
def test_substring_windows_parity_on_random_data(spark, tmp_path_factory, texts):
    """q_dedup_substring_windows vs a plain-Python reference on random
    small-vocab corpora (small vocab => shared windows actually occur)."""
    import os

    from kafka_clickhouse_pipeline_spark.operators.dedup import (
        SUBSTRING_WINDOW_N,
        q_dedup_substring_windows,
    )

    tmp = str(tmp_path_factory.mktemp("winfuzz"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    got = {
        r.doc_id: (r.n_windows, r.n_shared_windows)
        for r in q_dedup_substring_windows(spark, tmp).collect()
    }

    def windows(t):
        toks = t.strip().split()
        n = SUBSTRING_WINDOW_N
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    per_doc = {i: windows(t) for i, t in enumerate(texts)}
    counts: dict[str, int] = {}
    for ws in per_doc.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    expect = {
        i: (len(ws), sum(1 for w in ws if counts[w] >= 2))
        for i, ws in per_doc.items()
        if ws
    }
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(wordsoup_strategy, min_size=1, max_size=12))
def test_bigram_perplexity_invariants_on_random_data(spark, tmp_path_factory, texts):
    """Structural invariants of q_perplexity_bigram on random corpora:
    docs with < 2 tokens are absent, perplexities are >= 1, and a
    corpus whose docs are all runs of ONE word has ppl exactly 1
    (every conditional is (c+1)/(c+V) with V=1 => probability 1)."""
    import os

    from kafka_clickhouse_pipeline_spark.operators.text import q_perplexity_bigram

    tmp = str(tmp_path_factory.mktemp("ppl"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    out = {r.doc_id: r for r in q_perplexity_bigram(spark, tmp).collect()}
    expect_ids = {i for i, t in enumerate(texts) if len(t.strip().split()) >= 2}
    assert set(out) == expect_ids
    for r in out.values():
        assert r.ppl >= 1.0
        assert r.n_bigrams >= 1

    # degenerate single-word-vocabulary corpus
    mono = [(i, " ".join(["zz"] * (i + 2)), "en", "s", 1) for i in range(3)]
    tmp2 = str(tmp_path_factory.mktemp("pplmono"))
    spark.createDataFrame(
        mono, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.mode("overwrite").parquet(os.path.join(tmp2, "documents.parquet"))
    for r in q_perplexity_bigram(spark, tmp2).collect():
        assert r.ppl == 1.0 and r.avg_neg_logp == 0.0


fuzz_user_event = st.tuples(
    st.datetimes(
        min_value=__import__("datetime").datetime(2024, 2, 1),
        max_value=__import__("datetime").datetime(2024, 2, 28),
    ).map(lambda d: d.replace(microsecond=0)),
    st.integers(min_value=0, max_value=7),  # few users -> shared lifetimes
    st.sampled_from(["A", "B", "C"]),
)


def _write_events(spark, tmp, rows):
    """Full events schema; event_id = row index so the lag window's
    (ts, event_id) tie-break is a total order in BOTH engines."""
    full = [
        (i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)
    ]
    spark.createDataFrame(
        full,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    return str(tmp)


def _oracle_rows(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _norm(rows):
    normed = []
    for r in rows:
        normed.append(
            tuple(
                f"{v:.6f}" if isinstance(v, float) else v for v in r
            )
        )
    return sorted(normed)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(fuzz_user_event, min_size=0, max_size=80))
def test_kaplan_meier_parity_on_random_data(spark, tmp_path_factory, rows):
    """KM is sensitive to exactly the structure hypothesis varies:
    tied lifetimes, censoring at the cutoff, single-event users, and
    the d == n terminal step -- fuzz the whole operator against its
    registered oracle on the same parquet bytes."""
    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import curation

    d = _write_events(spark, tmp_path_factory.mktemp("kmfuzz"), rows)
    got = _norm([tuple(r) for r in curation.q_kaplan_meier(spark, d).collect()])
    want = _norm(_oracle_rows(d, entrymod.oracle_sql()["q_kaplan_meier"]))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(fuzz_user_event, min_size=0, max_size=80))
def test_markov_stationary_parity_on_random_data(spark, tmp_path_factory, rows):
    """The chain restriction (dangling targets, recurrent core) and
    the integer-floor iteration are where engines could diverge --
    fuzz the operator against its registered oracle."""
    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import analytics

    d = _write_events(spark, tmp_path_factory.mktemp("mkfuzz"), rows)
    got = _norm(
        [tuple(r) for r in analytics.q_markov_stationary(spark, d).collect()]
    )
    want = _norm(_oracle_rows(d, entrymod.oracle_sql()["q_markov_stationary"]))
    assert got == want


doc_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(
        st.sampled_from(["tok", "x", "longword"]), min_size=0, max_size=1500
    ).map(" ".join),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc_text, min_size=0, max_size=40))
def test_padding_waste_parity_on_random_data(spark, tmp_path_factory, texts):
    """Empty and whitespace-only texts are the tokenizer's edge (both
    engines must count them identically) and lengths straddling every
    cap boundary are exactly what hypothesis shrinks onto."""
    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import curation

    tmp = str(tmp_path_factory.mktemp("padfuzz"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = _norm(
        [tuple(r) for r in curation.q_padding_waste(spark, tmp).collect()]
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    want = _norm(
        con.execute(entrymod.oracle_sql()["q_padding_waste"]).fetchall()
    )
    con.close()
    assert got == want


# (orderkey, partkey) pairs over tiny pools so multi-part orders (the
# only edge source) and the single-brand Cauchy-Schwarz degenerate
# case (ADVICE r6) both occur often.
brand_edge = st.tuples(
    st.integers(min_value=1, max_value=8),   # l_orderkey
    st.integers(min_value=1, max_value=10),  # l_partkey
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(brand_edge, min_size=0, max_size=40),
    st.integers(min_value=1, max_value=3),  # brand-pool size; 1 = degenerate
)
def test_brand_assortativity_parity_on_random_data(
    spark, tmp_path_factory, rows, n_brands
):
    """The 0/0 short-circuit (every stub in one brand makes the
    denominator zero: Spark NaN vs DuckDB NULL before the fix) plus
    general mixing-matrix parity on random co-purchase graphs."""
    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import graph

    tmp = str(tmp_path_factory.mktemp("brandfuzz"))
    spark.createDataFrame(
        rows or [(1, 1)], "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    spark.createDataFrame(
        [(p, f"Brand#{p % n_brands}") for p in range(1, 11)],
        "p_partkey bigint, p_brand string",
    ).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    got = _norm(
        [tuple(r) for r in graph.q_brand_assortativity(spark, tmp).collect()]
    )
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp}/{t}.parquet/*.parquet')"
        )
    want = _norm(
        con.execute(entrymod.oracle_sql()["q_brand_assortativity"]).fetchall()
    )
    con.close()
    assert got == want


# ---- round 7: winsorized means + Kneser-Ney fuzz parity ----


def _oracle_rows_orders(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


fuzz_order = st.tuples(
    st.integers(min_value=1, max_value=100_000),
    st.sampled_from(["1-URGENT", "2-HIGH"]),
    st.decimals(
        min_value="0.01", max_value="99999.99", places=2
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(fuzz_order, min_size=1, max_size=80, unique_by=lambda t: t[0]))
def test_winsorized_stats_parity_on_random_data(spark, tmp_path_factory, rows):
    """The winsorized means hit exactly the structures hypothesis
    varies: tied prices at the cut ranks, tiny groups where k = 0
    (no clipping), and n*5/100 landing on the DuckDB
    CAST-rounds-Spark-truncates boundary the build caught -- fuzz the
    operator against its registered oracle on the same parquet."""
    import decimal

    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import advanced
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_orderpriority", StringType()),
        StructField("o_totalprice", DecimalType(12, 2)),
    ])
    tmp = str(tmp_path_factory.mktemp("winsfuzz"))
    spark.createDataFrame(
        [(k, p, decimal.Decimal(v)) for k, p, v in rows], schema
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = _norm(
        [
            tuple(str(v) if isinstance(v, decimal.Decimal) else v for v in r)
            for r in advanced.q_winsorized_stats(spark, tmp).collect()
        ]
    )
    want = _norm(
        [
            tuple(str(v) if isinstance(v, decimal.Decimal) else v for v in r)
            for r in _oracle_rows_orders(
                tmp, entrymod.oracle_sql()["q_winsorized_stats"]
            )
        ]
    )
    assert got == want


def _oracle_rows_docs(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


fuzz_text = st.lists(
    st.sampled_from(["a", "b", "c", "aa", "b9", "Xy"]), min_size=0, max_size=12
).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(fuzz_text, min_size=0, max_size=20))
def test_kneser_ney_parity_on_random_data(spark, tmp_path_factory, texts):
    """KN smoothing's corner cases are structural: singleton bigrams
    (c2 - D < 1), prefixes with one continuation, empty/one-token
    docs contributing nothing, and tie-broken head ordering at equal
    smoothed probability. Fuzz the whole operator vs its oracle."""
    import __spark_entry__ as entrymod
    from kafka_clickhouse_pipeline_spark.operators import text as textops

    tmp = str(tmp_path_factory.mktemp("knfuzz"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = _norm(
        [tuple(r) for r in textops.q_kneser_ney_bigram(spark, tmp).collect()]
    )
    want = _norm(
        _oracle_rows_docs(tmp, entrymod.oracle_sql()["q_kneser_ney_bigram"])
    )
    assert got == want
