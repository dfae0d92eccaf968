"""Training-data curation + behavioral analytics operators.

Operator families a large-scale training-data pipeline needs that
the contract did not yet cover, each over the driver fixtures:

- sequential funnel analysis (``q_funnel_steps``): ordered
  view -> click -> purchase conversion via a min-timestamp cascade;
- cohort retention (``q_retention_cohorts``): first-seen-day cohorts x
  day offset, distinct active users;
- frequency heavy hitters (``q_heavy_hitter_users``): users
  contributing an outsized share of all events (spam/bot screening
  before training on behavioral logs);
- class rebalancing (``q_stratified_rebalance``): deterministic
  per-class modulus downsampling -- the portable analog of
  ``df.sampleBy`` with exact, reproducible membership;
- anomaly screening (``q_zscore_outliers``): per-class mean/std from
  exact decimal moments, counting |z| > 3 rows;
- benchmark decontamination (``q_decontaminate_shingle_overlap``):
  training docs sharing any 8-token shingle with a held-out benchmark
  split -- the standard n-gram-overlap contamination check used when
  preparing LLM training corpora (streaming ingest-guard twin:
  ``decontaminate_stream``);
- repetition screening (``q_quality_gopher``): Gopher-style duplicate
  n-gram / type-token-ratio / top-token-dominance keep rules;
- PII redaction (``q_pii_redact_stats`` + the reusable ``redact_pii``
  column transform): email/phone/number span replacement with an audit
  aggregate;
- sequence packing (``q_pack_sequences``): greedy fill-in-order
  assignment of documents into fixed-token-capacity training bins,
  applyInPandas per shard, recursive-CTE oracle.

The reference has none of these (its whole analytical surface is the
four dashboard queries, web-app/app.py:57-160); all six are extensions
in the spirit of SURVEY.md section 7 step 6.

Scale design: every aggregate is a single hash-shuffle on its group
key; one-row scalars (event totals, funnel-step counts) and the
benchmark shingle set broadcast; nothing collects to the driver.
Determinism contract with the DuckDB oracles: money/value sums go
through DECIMAL before any double division; sampling membership is a
modulus on a stable integer key, never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.canon import date_str
from .dedup import SHINGLE_DF_CAP, _shingle_expr, _shingles

#: Sources treated as the held-out benchmark split for decontamination.
BENCH_SOURCES = ("src0", "src1", "src2", "src3")

#: Heavy-hitter share threshold (fraction of all events).
HH_SHARE = 0.0075

#: Per-class keep rules for stratified rebalancing: event_type ->
#: modulus m (keep rows with event_id % m == 0; m=1 keeps all).
STRATA_MOD = {"view": 10, "click": 5, "error": 2}

#: Gopher-style repetition/diversity keep thresholds (set from the
#: measured sf0.01 distribution so each rule rejects a real slice).
GOPHER_MIN_TOKENS = 25
GOPHER_MIN_TTR = 0.35
GOPHER_MAX_DUP_BIGRAM = 0.05
GOPHER_MAX_TOP_SHARE = 0.12

#: PII redaction patterns -- one regex dialect shared by Spark (Java
#: regex) and the DuckDB oracle (RE2); both are leftmost-greedy on
#: these classes, so match spans agree.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"
PII_NUMBER = r"[0-9]+"

#: Sequence packing: target context length (tokens per packed bin) and
#: docs per packing shard (bins never cross a shard boundary, which is
#: what makes the operator embarrassingly parallel at corpus scale).
PACK_CAPACITY = 256
PACK_SHARD_DOCS = 100_000

#: DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
#: hashed-feature buckets, target distribution = this lang's docs, and
#: how many raw-pool docs the selection keeps. The bucket count is the
#: memory knob -- the n-gram LM is B floats regardless of corpus size.
DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"
DSIR_KEEP = 100


def funnel_steps(ev: DataFrame) -> DataFrame:
    """Funnel cascade over any (user_id, ts, event_type) frame; see
    ``q_funnel_steps``. Split out so property tests can fuzz it on
    generated tables."""
    window = F.expr("INTERVAL 24 HOURS")
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(broadcast(clicks.agg(F.count(F.lit(1)).alias("clicked_after_view"))))
        .crossJoin(
            broadcast(purchases.agg(F.count(F.lit(1)).alias("purchased_after_click")))
        )
    )


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel view -> click -> purchase: users counted at each
    step only if the step's first qualifying event falls within 24
    hours AFTER the previous step's. Three per-user min-timestamp
    aggregates chained by joins (each step's input shrinks), then three
    one-row counts broadcast-crossed into a single result row."""
    return funnel_steps(load_table(spark, sf_dir, "events"))


def retention_cohorts(ev: DataFrame) -> DataFrame:
    """Cohort grid over any (user_id, ts) frame; see
    ``q_retention_cohorts``. Split out so property tests can fuzz it."""
    ev = ev.select("user_id", F.to_date("ts").alias("d"))
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_day", F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; for each
    (cohort_day, days-since-cohort) cell, distinct active users. Two
    shuffles: the per-user min-day, then the cohort-cell distinct
    count (the per-user cohort table joins back keyed on user_id)."""
    grid = retention_cohorts(load_table(spark, sf_dir, "events"))
    return grid.select(
        date_str("cohort_day").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
    ).orderBy("cohort_day", "day_offset")


def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users contributing more than HH_SHARE of all events, with their
    exact share. Per-user hash aggregate + a one-row global total
    broadcast; the share division happens in double on exact integer
    counts, so both engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = per_user.agg(F.sum("n_events").alias("n_total"))
    return (
        per_user.join(
            broadcast(total),
            F.col("n_events").cast("double")
            > F.lit(HH_SHARE) * F.col("n_total").cast("double"),
        )
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
    )


def q_stratified_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-class downsampling summary: keep every row of
    rare classes, 1-in-m of common ones (membership = event_id % m == 0,
    reproducible across engines and re-runs, unlike rand()-based
    sampling). Emits per-class total/kept/rate -- the audit record a
    rebalancing job writes alongside its output."""
    ev = load_table(spark, sf_dir, "events")
    keep = F.lit(False)
    for etype, m in STRATA_MOD.items():
        keep = F.when(F.col("event_type") == etype, F.col("event_id") % m == 0).otherwise(
            keep
        )
    keep = F.when(
        ~F.col("event_type").isin(*STRATA_MOD.keys()), F.lit(True)
    ).otherwise(keep)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        )
        .withColumn(
            "keep_rate",
            F.col("n_kept").cast("double") / F.col("n_total").cast("double"),
        )
        .orderBy("event_type")
    )


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class |z| > 3 outlier counts with mean/std derived from
    EXACT decimal moments (sum and sum-of-squares of the 2-dp value
    column), so the double mean/std -- and therefore every per-row
    comparison -- is bit-identical in Spark and DuckDB. One aggregate
    for the moments (broadcast back), one for the outlier count."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    stats = (
        ev.groupBy(F.col("event_type").alias("s_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("s1"),
            F.sum((v * v).cast("decimal(38,4)")).alias("s2"),
        )
        .select(
            "s_type",
            "n",
            (F.col("s1").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.col("s2").cast("double") / F.col("n")
                - (F.col("s1").cast("double") / F.col("n"))
                * (F.col("s1").cast("double") / F.col("n"))
            ).alias("std"),
        )
    )
    return (
        ev.join(broadcast(stats), F.col("event_type") == F.col("s_type"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > F.lit(3.0) * F.col("std"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.max("mean").alias("mean"),
            F.max("std").alias("std"),
        )
        .orderBy("event_type")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-class outlier screening via median absolute deviation:
    |value - median| > 3 * MAD. Unlike the z-score screen, the median
    and MAD are insensitive to the outliers themselves, so one wild
    value cannot widen its own acceptance band -- the standard robust
    alternative when curating heavy-tailed quality signals.

    Two grouped exact percentiles (each a shuffle on event_type whose
    reduce side holds per-group sorted values -- fine while classes fit
    an executor; a 100 TB deployment swaps ``percentile_approx``, whose
    mergeable sketches restore constant memory, trading exactness) with
    the tiny per-class stats broadcast back for the per-row comparison,
    so the fact table itself never reshuffles."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(broadcast(med), F.col("event_type") == F.col("m_type")).withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy(F.col("event_type").alias("s_type")).agg(
        F.percentile("adev", 0.5).alias("mad"), F.min("med").alias("s_med")
    )
    return (
        dev.join(broadcast(mad), F.col("event_type") == F.col("s_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("adev") > F.lit(3.0) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.min("s_med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


def q_decontaminate_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents (sources outside
    BENCH_SOURCES) that share at least one 8-token shingle with any
    benchmark document, with the number of distinct shared shingles.
    The benchmark shingle set is the small side and broadcasts; the
    training side streams through the join map-side -- at 100 TB this
    is the one-pass n-gram contamination sweep (the benchmark split is
    always tiny relative to the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    bench_sh = (
        _shingles(docs.filter(F.col("source").isin(*BENCH_SOURCES)), n=8)
        .select("shingle")
        .distinct()
    )
    train_sh = _shingles(docs.filter(~F.col("source").isin(*BENCH_SOURCES)), n=8)
    return (
        train_sh.join(broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


def decontaminate_stream(doc_stream: DataFrame, bench_docs: DataFrame) -> DataFrame:
    """Streaming ingestion guard: drop incoming documents that share
    any 8-token shingle with the static benchmark corpus. Stateless per
    micro-batch -- the benchmark shingle set aggregates to ONE row,
    broadcasts, and each streaming document is checked with
    ``arrays_overlap``; no stream state, no watermark, append mode.

    Scale: the benchmark split is tiny by construction, so its shingle
    set fits comfortably in a broadcast even when the stream is
    unbounded; the constant-memory variant at extreme benchmark sizes
    is a bloom filter over the shingle hashes (same plan shape, a
    might-contain probe instead of the exact overlap)."""
    bench_set = _shingles(bench_docs, n=8).agg(
        F.collect_set("shingle").alias("bench_sh")
    )
    return (
        doc_stream.withColumn("sh", _shingle_expr(8))
        .crossJoin(broadcast(bench_set))
        .filter(~F.arrays_overlap(F.col("sh"), F.col("bench_sh")))
        .drop("sh", "bench_sh")
    )


#: Bloom-filter geometry for q_decontaminate_bloom: positions are
#: 16-bit (three disjoint 4-hex-char slices of one md5 digest), so the
#: bitmap is 2^16 bits = 1024 int64 words = 8 KiB. K=3 hashes over the
#: ~5k bench shingles at sf0.01 -> fill ~0.2, false-positive rate
#: ~0.9%. At a larger benchmark, widen the slices (5 hex chars -> 2^20
#: bits) -- same operator, different constants.
BLOOM_K = 3
BLOOM_WORDS = (1 << 16) // 64

#: Single-bit masks indexed by bit position; bit 63 is the sign bit of
#: a signed int64, hence the negative literal.
_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def _bloom_positions(h: F.Column) -> list[F.Column]:
    """K 16-bit bit positions from disjoint 4-hex-char slices of an md5
    hex digest -- one conv(hex, 16, 10) per slice (bit-identical to
    the historical per-nibble ascii ladder the SQL twin keeps; the
    engine-portable uniform is the md5 itself)."""
    return [
        F.conv(F.substring(h, 4 * k + 1, 4), 16, 10).cast("int")
        for k in range(BLOOM_K)
    ]


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination -- the constant-memory
    variant ``decontaminate_stream``'s docstring promises for benchmark
    sets too large to broadcast exactly: the bench shingle set is
    compressed to a 2^16-bit bloom bitmap (1024 int64 words, 8 KiB
    regardless of benchmark size), and every training shingle is probed
    against it with pure bit arithmetic. No join against the benchmark
    relation at probe time; false positives at the documented rate are
    part of the operator's semantics (a decontamination screen
    over-flags safely), false negatives are impossible.

    Scale shape: building the bitmap aggregates the bench positions to
    <= 1024 word rows (the only driver-side collect, bounded by the
    bitmap geometry, not the data); probing is a pure map over the
    training scan -- the bitmap and the 64 bit masks ride the plan as
    folded array literals, variable-shift-free (word AND mask), inside
    whole-stage codegen. At 100 TB: one scan, zero shuffle, 8 KiB of
    state per task.

    Output per training document: distinct-shingle count, bloom-flagged
    shingle count, contaminated flag. Oracle twin replicates the exact
    bitmap semantics as position-set membership (bit set <=> some bench
    shingle produced that position), so flags -- including false
    positives -- are hash-verified bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE expr() per literal array: per-element F.lit() calls are py4j
    # round-trips, and 1024+64 of them measured ~2 s of plan
    # construction per invocation (the similarity._planes_literal
    # lesson)
    # (string-cast form, not <n>L: Long.MIN_VALUE's sign-bit mask can't
    # be written as a SQL long literal -- unary minus parses after the
    # overflowing magnitude; the casts fold to constants)
    masks_lit = F.expr(
        "array(" + ",".join(f"BIGINT('{m}')" for m in _BIT_MASKS) + ")"
    )

    # No distinct() on the bench shingles: bit_or is idempotent, so a
    # duplicate shingle sets the same bits -- dropping the dedup removes
    # a full shuffle from the build. The digest is hoisted into its own
    # projection (expression trees duplicate subtrees, so inlining md5
    # into the K position decodes would compute it 4K times per row).
    word_rows = (
        _shingles(docs.filter(F.col("source").isin(*BENCH_SOURCES)), n=8)
        .select(F.md5(F.col("shingle")).alias("h"))
        .select(F.explode(F.array(*_bloom_positions(F.col("h")))).alias("p"))
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.element_at(
                masks_lit, F.col("p").bitwiseAND(F.lit(63)) + 1
            ).alias("m"),
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

    def probe(h: F.Column) -> F.Column:
        t = F.lit(True)
        for p in _bloom_positions(h):
            word = F.element_at(words_lit, F.floor(p / 64).cast("int") + 1)
            mask = F.element_at(masks_lit, p.bitwiseAND(F.lit(63)) + 1)
            t = t & (word.bitwiseAND(mask) != 0)
        return t

    # Probe via explode + top-level expressions, NOT a higher-order
    # filter lambda: HOF lambda bodies are interpreted, and K element_at
    # probes per shingle per document in the interpreter measured ~10 s
    # at sf0.1 vs ~1 s for the identical expressions inside whole-stage
    # codegen (the winnowing/repetition-filter lesson again). The per-doc
    # count regroup this adds is a map-side-combined shuffle of one row
    # per document -- noise next to the scan. explode_outer keeps
    # shingle-less documents as a null row so they still report 0/0.
    exploded = (
        docs.filter(~F.col("source").isin(*BENCH_SOURCES))
        .select("doc_id", F.explode_outer(_shingle_expr(8)).alias("s"))
        # hoist the digest: probe() references it K*4 times and
        # expression trees duplicate rather than share subtrees
        .select("doc_id", "s", F.md5(F.col("s")).alias("h"))
    )
    flagged = F.when(probe(F.col("h")), 1).otherwise(0)
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.count("s").alias("n_shingles"),
            F.sum(flagged).cast("long").alias("n_flagged"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_flagged",
            (F.col("n_flagged") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/diversity screening (Rae et al. 2021
    family): per document, token count, type-token ratio, fraction of
    duplicate bigram occurrences, and the share of the single most
    frequent token, combined into a keep flag. Complements
    ``q_quality_score`` (text.py), which covers the length/punctuation/
    stopword side of the rule set.

    Plan: one scan computes the array-side metrics in codegen
    (``size``/``array_distinct``); the top-token share needs per-token
    counts, so a second path explodes tokens through two partial-agg
    shuffles keyed on doc_id (never on the raw text) and joins back.
    All ratios are exact-integer divisions in double, so the DuckDB
    oracle agrees bit-for-bit."""
    return gopher_flags(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


def gopher_flags(docs: DataFrame) -> DataFrame:
    """Gopher screening as a reusable transform over any documents
    frame: (doc_id, n_tokens, ttr, dup_bigram_frac, top_token_share,
    keep). See q_quality_gopher for the plan discussion."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    per_doc = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.greatest(n_tokens - 1, F.lit(0)).alias("n_bigrams"),
        F.size(_shingle_expr(2)).alias("n_distinct_bigrams"),
    )
    top = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    ttr = F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
    dup = F.when(
        F.col("n_bigrams") > 0,
        F.lit(1.0)
        - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    tts = F.col("top_c").cast("double") / F.col("n_tokens").cast("double")
    return (
        per_doc.join(top, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            ttr.alias("ttr"),
            dup.alias("dup_bigram_frac"),
            tts.alias("top_token_share"),
            (
                (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
                & (ttr >= GOPHER_MIN_TTR)
                & (dup <= GOPHER_MAX_DUP_BIGRAM)
                & (tts <= GOPHER_MAX_TOP_SHARE)
            ).alias("keep"),
        )
    )


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline -- the stages a user composes for a
    real training-data build, chained and oracle-checked as ONE query:

      1. corpus scoping: benchmark sources (BENCH_SOURCES) are eval
         material, excluded from the training corpus up front;
      2. quality-aware exact dedup: one hash aggregate per content
         fingerprint keeps the most-token member (ties -> lowest id);
      3. Gopher screening (gopher_flags) keeps only passing docs;
      4. benchmark decontamination: any surviving doc sharing an
         8-token shingle with a benchmark doc is dropped (bench shingle
         set broadcasts -- the corpus never shuffles for this stage);
      5. deterministic split assignment (pure expression of doc_id).

    Output: (doc_id, source, n_tokens, split), the manifest of the
    curated corpus. Plan shape at 100 TB: two content shuffles (dedup
    fingerprint, gopher token aggregate), one broadcast join
    (decontamination), everything else map-side; no stage touches more
    than the surviving candidate set."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(~F.col("source").isin(*BENCH_SOURCES))

    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    q = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    canon = (
        train.select(F.md5(norm).alias("fingerprint"), q.alias("q"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.max(F.struct(F.col("q"), (-F.col("doc_id")).alias("negid"))).alias("m"))
        .select((-F.col("m.negid")).alias("doc_id"))
    )
    kept = train.join(canon, "doc_id")

    good = gopher_flags(kept).filter(F.col("keep")).select("doc_id", "n_tokens")
    good_docs = kept.join(good, "doc_id")

    bench_sh = (
        _shingles(docs.filter(F.col("source").isin(*BENCH_SOURCES)), n=8)
        .select("shingle")
        .distinct()
    )
    contaminated = (
        _shingles(good_docs, n=8)
        .join(broadcast(bench_sh), "shingle")
        .select("doc_id")
        .distinct()
    )
    clean = good_docs.join(contaminated, "doc_id", "left_anti")

    return clean.select(
        "doc_id", "source", "n_tokens", _split_label().alias("split")
    ).orderBy("doc_id")


def redact_pii(col: F.Column) -> F.Column:
    """Redact emails, then phone-like digit runs, then remaining bare
    numbers (order matters: each later pattern would otherwise eat
    pieces of the earlier ones). Pure JVM ``regexp_replace`` chain --
    whole-stage codegen, no UDF."""
    red = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return F.regexp_replace(red, PII_NUMBER, "<NUM>")


def q_pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-redaction audit over the events ``props`` payload: per event
    type, how many email / phone / bare-number spans the redaction pass
    replaced and the net length change of the redacted text. Each
    pattern is counted on the output of the previous replacement, i.e.
    exactly what the redactor sees. One scan, one hash aggregate; the
    regex work rides whole-stage codegen (no Python)."""
    ev = load_table(spark, sf_dir, "events")
    p1 = F.regexp_replace(F.col("props"), PII_EMAIL, "<EMAIL>")
    p2 = F.regexp_replace(p1, PII_PHONE, "<PHONE>")
    p3 = F.regexp_replace(p2, PII_NUMBER, "<NUM>")
    return (
        ev.select(
            "event_type",
            F.regexp_count("props", F.lit(PII_EMAIL)).alias("c_email"),
            F.regexp_count(p1, F.lit(PII_PHONE)).alias("c_phone"),
            F.regexp_count(p2, F.lit(PII_NUMBER)).alias("c_num"),
            (F.length(p3) - F.length("props")).alias("delta"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_email").alias("n_email"),
            F.sum("c_phone").alias("n_phone"),
            F.sum("c_num").alias("n_num"),
            F.sum("delta").alias("redacted_len_delta"),
        )
        .orderBy("event_type")
    )


def pack_sequences(docs: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """Greedy sequential sequence packing: within each (source, shard)
    group, walk documents in doc_id order and open a new bin whenever
    the next document no longer fits in ``capacity`` tokens (an
    oversize document gets a bin of its own). This is the deterministic
    fill-in-order packing used when assembling fixed-context training
    batches.

    Scale design: token counts are computed JVM-side first, so the
    shuffle carries only (source, shard, doc_id, n_tokens) ints --
    the text never moves. Packing is sequential within a group by
    definition (the bin layout IS the order), parallel across groups;
    ``PACK_SHARD_DOCS`` bounds group size so one giant source cannot
    serialize the job: bins simply never cross a shard boundary."""
    sized = docs.select(
        "source",
        F.expr(f"doc_id div {PACK_SHARD_DOCS}").alias("shard"),
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        fill, b = capacity + 1, 0  # force a new bin on the first doc
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill + n <= capacity:
                fill += n
            else:
                b += 1
                fill = n
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf

    return sized.groupBy("source", "shard").applyInPandas(
        pack, "source string, shard long, doc_id long, n_tokens long, bin_id long"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the documents corpus (see
    ``pack_sequences``); the DuckDB oracle replays the same greedy
    recurrence as a recursive CTE, so bin assignments -- not just
    counts -- are hash-compared."""
    return pack_sequences(load_table(spark, sf_dir, "documents")).orderBy(
        "source", "doc_id"
    )


#: Split thresholds on the 0..255 hash value: < TRAIN -> train,
#: < VAL -> val, else test (~94/3/3; the 256-value hash makes exact
#: percentages approximate -- documented, deterministic).
SPLIT_TRAIN = 240
SPLIT_VAL = 248


def _split_hash(col: str = "doc_id"):
    """Portable 0..255 pseudo-uniform value from the doc id's md5: the
    ascii codes of the first two hex chars. Both engines compute md5
    and ascii identically, so membership is reproducible anywhere."""
    h = F.md5(F.col(col).cast("string"))
    return (
        F.ascii(F.substring(h, 1, 1)) * 16 + F.ascii(F.substring(h, 2, 1))
    ) % 256


def _split_label(col: str = "doc_id"):
    """train/val/test label as a pure expression of the doc id -- no
    lookup table, so consumers never need a join or broadcast to
    recover a document's split."""
    hv = _split_hash(col)
    return (
        F.when(hv < SPLIT_TRAIN, F.lit("train"))
        .when(hv < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment by content-free
    hash of the stable document id -- the reproducible-split primitive
    every training pipeline needs (re-running on a grown corpus never
    moves an existing document between splits, because membership
    depends only on its own id). Pure map work: no shuffle except the
    presentation sort; at 100 TB this is a free column."""
    docs = load_table(spark, sf_dir, "documents")
    hv = _split_hash()
    split = (
        F.when(hv < SPLIT_TRAIN, F.lit("train"))
        .when(hv < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", "source", hv.alias("hash_value"), split.alias("split")
    ).orderBy("doc_id")


#: Per-source token budget for budget-capped selection.
TOKEN_BUDGET = 3_000

#: Fixed-context chunking geometry: window and stride in tokens
#: (32-token overlap keeps boundary context in both neighbors).
CHUNK_SIZE = 128
CHUNK_STRIDE = 96


def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-capped corpus selection: per source, walk documents
    in deterministic pseudo-random order (md5 of doc_id) and keep them
    while the running token total stays within TOKEN_BUDGET -- the
    fixed-budget uniform subsample used when mixing sources at target
    token proportions.

    The running sum is a per-source window cumsum (one shuffle on
    source). At 100 TB a single source outgrows one partition; the
    production variant pre-aggregates per-shard token totals first
    (same two-level trick as ``pack_sequences``'s shards) -- kept
    single-level here because the semantics, and the oracle, are the
    per-document prefix sum."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    keyed = docs.select(
        "source",
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens")
    )



def q_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing weights: per source, document and token counts,
    the source's share of all tokens, and the resampling weight that
    would equalize token mass across sources (target = uniform 1/k).
    This is the bookkeeping every multi-source pretraining mix starts
    from; swap the uniform target for a config map in production.

    All shares/weights are exact-integer divisions in double --
    bit-identical across engines. One scan, one tiny per-source
    aggregate, a one-row global total broadcast back."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("long")).alias("n_tokens"),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    return (
        per_source.crossJoin(broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            share.alias("token_share"),
            (
                (F.lit(1.0) / F.col("n_sources").cast("double")) / share
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


def q_quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier scoring -- the
    mechanism behind CCNet/RedPajama-class quality filters, where a
    linear model over hashed token features scores every document and
    a threshold keeps the 'wikipedia-like' tail. Here the weight table
    is a deterministic hash (md5 -> [-1, 1)) instead of trained
    parameters: the distributed mechanics -- per-token feature
    hashing, O(1) weight lookup with NO vocabulary join, sequential
    mean, threshold -- are exactly what a trained filter runs at
    corpus scale, and a production build swaps the hash for a
    broadcast weight array without touching the plan.

    Scale shape: pure map over the scan (hash + fold per document), no
    shuffle, no UDF, no vocabulary state -- the reason feature hashing
    beats an embedding-table join for trillion-token filtering. Score
    arithmetic is the shared sequential fold, so the oracle reproduces
    it bit-for-bit; keep-decisions compare the ROUNDED score on both
    engines so the boundary is contract-stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    weights = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        / F.lit(2147483648.0)
        - F.lit(1.0),
    )
    score = F.round(
        F.aggregate(weights, F.lit(0.0), lambda a, x: a + x) / F.size(toks), 6
    )
    return (
        docs.select("doc_id", "source", score.alias("score"))
        .withColumn("keep", F.col("score") > 0)
        .orderBy("doc_id")
    )


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, 'Data Selection for
    Language Models via Importance Resampling'): score every raw-pool
    document by how much it resembles a target distribution, using
    hashed token features -- two unigram LMs over B hash buckets --
    then keep the top-N by importance weight. This is the selection
    mechanism behind targeted pretraining mixes (e.g. 'more
    Wikipedia-like web text'); here target = ``lang = 'en'`` documents
    and raw pool = everything else.

    log w(d) = sum_b count_d(b) * ln( p_target(b) / p_raw(b) ) with
    Laplace +1 smoothing over the B buckets. Feature hashing keeps the
    model state at B floats TOTAL regardless of corpus size -- the
    reason DSIR runs on trillion-token pools where a full-vocabulary
    LM join would not.

    Scale shape: explode -> per-(doc,bucket) counts (shuffle 1, the
    only corpus-sized shuffle) -> B-row bucket LM (shuffle 2, tiny,
    partial-agg friendly) -> broadcast the B-row weight table back
    (AQE turns this join into a broadcast automatically; B = 64 rows)
    -> per-doc decimal fold (shuffle 3, one row per doc) -> global
    top-N via TakeOrderedAndProject (no full sort). Nothing collects.

    Determinism contract: bucket = md5-hex8 % B (integer, portable);
    per-bucket log-ratio args are associativity-pinned doubles; the
    per-doc sum uses the round(.,9)-as-DECIMAL(28,9) trick from
    q_perplexity_unigram, so cross-row addition is order-independent
    and the oracle reproduces every weight bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    db = (
        terms.select("doc_id", "lang", bucket.alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    is_target = F.col("lang") == DSIR_TARGET_LANG
    bstats = db.groupBy("bucket").agg(
        F.sum(F.when(is_target, F.col("cnt")).otherwise(F.lit(0))).alias("t_cnt"),
        F.sum(F.when(~is_target, F.col("cnt")).otherwise(F.lit(0))).alias("r_cnt"),
    )
    tot = bstats.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    weights = bstats.crossJoin(broadcast(tot)).select(
        "bucket",
        F.log(
            ((F.col("t_cnt") + 1).cast("double")
             / (F.col("t_tot") + DSIR_BUCKETS).cast("double"))
            * ((F.col("r_tot") + DSIR_BUCKETS).cast("double")
               / (F.col("r_cnt") + 1).cast("double"))
        ).alias("w"),
    )
    contrib = (
        db.filter(~is_target)
        .join(broadcast(weights), "bucket")
        .select(
            "doc_id",
            "lang",
            F.round(F.col("cnt") * F.col("w"), 9)
            .cast("decimal(28,9)")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id", "lang").agg(
        F.round(F.sum("c").cast("double"), 6).alias("log_weight")
    )
    selected = scored.orderBy(
        F.col("log_weight").desc(), F.col("doc_id")
    ).limit(DSIR_KEEP)
    w = Window.orderBy(F.col("log_weight").desc(), F.col("doc_id"))
    return selected.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).orderBy("rank")


def _hex8_sql(h: str) -> str:
    """DuckDB twin of ``conv(substring(md5(x),1,8),16,10)``: fold the
    first 8 hex chars of ``h`` into an integer."""
    e = "CAST(0 AS BIGINT)"
    for idx in range(1, 9):
        hv = (
            f"(ascii(substr({h}, {idx}, 1)) - CASE WHEN "
            f"ascii(substr({h}, {idx}, 1)) >= 97 THEN 87 ELSE 48 END)"
        )
        e = f"(({e}) * 16 + {hv})"
    return e


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split NEAR-duplicate leakage audit: near-dup pairs
    (exact 3-gram Jaccard >= 0.8) whose two documents land in
    different train/val/test splits under ``q_split_assign``'s hash.
    Hash-splitting by doc_id cannot see content, so near-identical
    documents routinely straddle the split boundary -- exactly the
    leakage that inflates eval numbers. This is the composition check
    a pipeline runs before shipping a split.

    It is an AUDIT, so exactness is the point: pairs come from the
    DF-capped exact inverted-index join (dedup._jaccard_pairs), not the
    probabilistic LSH path -- a banding miss near the threshold would
    silently under-report leakage (and diverge from the exact oracle).
    The split labels are pure expressions of d1/d2 (md5-derived), so
    recovering them needs NO join and NO broadcast of a corpus-sized
    map -- the audit adds zero shuffles beyond the pair join itself."""
    from .dedup import _jaccard_pairs, _shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(_shingles(docs), 0.8).select("d1", "d2", "jaccard")
    return (
        pairs.withColumn("split1", _split_label("d1"))
        .withColumn("split2", _split_label("d2"))
        .filter(F.col("split1") != F.col("split2"))
        .select("d1", "d2", "split1", "split2", "jaccard")
        .orderBy("d1", "d2")
    )



def _shingle8_sql(rel_filter: str) -> str:
    concat = " || ' ' || ".join(f"toks[i+{k}]" for k in range(8))
    return f"""
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(toks) - 7, 0)),
                 i -> {concat}))) AS shingle
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents WHERE {rel_filter})
    """


_BENCH_IN = "('" + "', '".join(BENCH_SOURCES) + "')"


def _curation_pipeline_oracle() -> str:
    """The five pipeline stages as one CTE chain, each reusing the SQL
    fragment of its standalone oracle (so pipeline parity is checked
    against the same definitions as the stage queries)."""
    return f"""
        WITH train AS (
          SELECT * FROM documents WHERE source NOT IN {_BENCH_IN}),
        d AS (
          SELECT doc_id,
                 md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
                 len(string_split_regex(trim(text), '\\s+')) AS q
          FROM train),
        canon AS (
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY fingerprint
                                              ORDER BY q DESC, doc_id ASC) AS rn
            FROM d) WHERE rn = 1),
        t AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM train WHERE doc_id IN (SELECT doc_id FROM canon)),
        m AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 len(list_distinct(toks)) AS n_types,
                 greatest(len(toks) - 1, 0) AS n_bigrams,
                 len(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> toks[i] || ' ' || toks[i+1]))) AS n_distinct_bigrams
          FROM t),
        top AS (
          SELECT doc_id, max(c) AS top_c FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY 1, 2) GROUP BY 1),
        good AS (
          SELECT doc_id, n_tokens
          FROM m JOIN top USING (doc_id)
          WHERE n_tokens >= {GOPHER_MIN_TOKENS}
            AND CAST(n_types AS DOUBLE) / n_tokens >= {GOPHER_MIN_TTR}
            AND (CASE WHEN n_bigrams > 0
                      THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
                      ELSE 0.0 END) <= {GOPHER_MAX_DUP_BIGRAM}
            AND CAST(top_c AS DOUBLE) / n_tokens <= {GOPHER_MAX_TOP_SHARE}),
        bench_sh AS (
          SELECT DISTINCT shingle FROM ({_shingle8_sql(f"source IN {_BENCH_IN}")})),
        good_sh AS (
          {_shingle8_sql(
              f"source NOT IN {_BENCH_IN}"
              " AND doc_id IN (SELECT doc_id FROM good)"
          )}),
        contaminated AS (
          SELECT DISTINCT doc_id FROM good_sh JOIN bench_sh USING (shingle)),
        final AS (
          SELECT g.doc_id, tr.source, g.n_tokens
          FROM good g JOIN train tr USING (doc_id)
          WHERE g.doc_id NOT IN (SELECT doc_id FROM contaminated))
        SELECT doc_id, source, n_tokens,
               CASE WHEN hv < {SPLIT_TRAIN} THEN 'train'
                    WHEN hv < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT *,
                     (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 16
                    + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 256 AS hv
              FROM final)
        ORDER BY doc_id
    """


CURATION_ORACLES: dict[str, str] = {
    "q_curation_pipeline": _curation_pipeline_oracle(),
    "q_split_assign": f"""
        WITH h AS (
          SELECT doc_id, source,
                 (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 16
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 256
                   AS hash_value
          FROM documents)
        SELECT doc_id, source, hash_value,
               CASE WHEN hash_value < {SPLIT_TRAIN} THEN 'train'
                    WHEN hash_value < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM h ORDER BY doc_id
    """,
    "q_token_budget_selection": f"""
        WITH k AS (
          SELECT source, doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        c AS (
          SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM k)
        SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
        ORDER BY source, cum_tokens
    """,
    "q_funnel_steps": """
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
        SELECT (SELECT count(*) FROM v) AS viewed,
               (SELECT count(*) FROM c) AS clicked_after_view,
               (SELECT count(*) FROM p) AS purchased_after_click
    """,
    "q_retention_cohorts": """
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        cohort AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               date_diff('day', cohort_day, d) AS day_offset,
               count(DISTINCT ev.user_id) AS n_active
        FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_heavy_hitter_users": f"""
        WITH per_user AS (SELECT user_id, count(*) AS n_events
                          FROM events GROUP BY 1),
        tot AS (SELECT sum(n_events) AS n_total FROM per_user)
        SELECT user_id, n_events,
               CAST(n_events AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        FROM per_user, tot
        WHERE CAST(n_events AS DOUBLE) > {HH_SHARE} * CAST(n_total AS DOUBLE)
        ORDER BY n_events DESC, user_id
    """,
    "q_stratified_rebalance": """
        SELECT event_type, count(*) AS n_total,
               CAST(sum(CASE WHEN (event_type = 'view' AND event_id % 10 = 0)
                          OR (event_type = 'click' AND event_id % 5 = 0)
                          OR (event_type = 'error' AND event_id % 2 = 0)
                          OR event_type NOT IN ('view', 'click', 'error')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN (event_type = 'view' AND event_id % 10 = 0)
                          OR (event_type = 'click' AND event_id % 5 = 0)
                          OR (event_type = 'error' AND event_id % 2 = 0)
                          OR event_type NOT IN ('view', 'click', 'error')
                        THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS keep_rate
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "q_zscore_outliers": """
        WITH stats AS (
          SELECT event_type AS s_type, count(*) AS n,
                 sum(CAST(value AS DECIMAL(18,2))) AS s1,
                 sum(CAST(CAST(value AS DECIMAL(18,2)) *
                          CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s2
          FROM events GROUP BY 1),
        st AS (
          SELECT s_type, n,
                 CAST(s1 AS DOUBLE) / n AS mean,
                 sqrt(CAST(s2 AS DOUBLE) / n -
                      (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
          FROM stats)
        SELECT event_type, max(n) AS n_events,
               CAST(sum(CASE WHEN abs(value - mean) > 3.0 * std THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_outliers,
               max(mean) AS mean, max(std) AS std
        FROM events JOIN st ON event_type = s_type
        GROUP BY 1 ORDER BY 1
    """,
    "q_mad_outliers": """
        WITH med AS (
          SELECT event_type AS m_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY 1),
        dev AS (
          SELECT event_type, value, med, abs(value - med) AS adev
          FROM events JOIN med ON event_type = m_type),
        mad AS (
          SELECT event_type AS s_type, quantile_cont(adev, 0.5) AS mad,
                 min(med) AS s_med
          FROM dev GROUP BY 1)
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN adev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(min(s_med), 6) AS med, round(min(mad), 6) AS mad
        FROM dev JOIN mad ON event_type = s_type
        GROUP BY 1 ORDER BY 1
    """,
    "q_decontaminate_shingle_overlap": f"""
        WITH bench_sh AS (
          SELECT DISTINCT shingle
          FROM ({_shingle8_sql("source IN " + _BENCH_IN)})),
        train_sh AS ({_shingle8_sql("source NOT IN " + _BENCH_IN)})
        SELECT doc_id, count(*) AS n_shared_shingles
        FROM train_sh JOIN bench_sh USING (shingle)
        GROUP BY doc_id ORDER BY doc_id
    """,
    "q_quality_gopher": f"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
        m AS (SELECT doc_id, len(toks) AS n_tokens,
                     len(list_distinct(toks)) AS n_types,
                     greatest(len(toks) - 1, 0) AS n_bigrams,
                     len(list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i+1]))) AS n_distinct_bigrams
              FROM t),
        top AS (SELECT doc_id, max(c) AS top_c FROM (
                  SELECT doc_id, tok, count(*) AS c
                  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
                  GROUP BY 1, 2)
                GROUP BY 1)
        SELECT doc_id, n_tokens,
               CAST(n_types AS DOUBLE) / n_tokens AS ttr,
               CASE WHEN n_bigrams > 0
                    THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
                    ELSE 0.0 END AS dup_bigram_frac,
               CAST(top_c AS DOUBLE) / n_tokens AS top_token_share,
               (n_tokens >= {GOPHER_MIN_TOKENS}
                AND CAST(n_types AS DOUBLE) / n_tokens >= {GOPHER_MIN_TTR}
                AND (CASE WHEN n_bigrams > 0
                          THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
                          ELSE 0.0 END) <= {GOPHER_MAX_DUP_BIGRAM}
                AND CAST(top_c AS DOUBLE) / n_tokens <= {GOPHER_MAX_TOP_SHARE})
                 AS keep
        FROM m JOIN top USING (doc_id) ORDER BY doc_id
    """,
    "q_pii_redact_stats": f"""
        WITH s1 AS (SELECT event_type, props,
                           regexp_replace(props, '{PII_EMAIL}', '<EMAIL>', 'g') AS p1
                    FROM events),
        s2 AS (SELECT *, regexp_replace(p1, '{PII_PHONE}', '<PHONE>', 'g') AS p2
               FROM s1),
        s3 AS (SELECT *, regexp_replace(p2, '{PII_NUMBER}', '<NUM>', 'g') AS p3
               FROM s2)
        SELECT event_type, count(*) AS n_rows,
               CAST(sum(len(regexp_extract_all(props, '{PII_EMAIL}'))) AS BIGINT) AS n_email,
               CAST(sum(len(regexp_extract_all(p1, '{PII_PHONE}'))) AS BIGINT) AS n_phone,
               CAST(sum(len(regexp_extract_all(p2, '{PII_NUMBER}'))) AS BIGINT) AS n_num,
               CAST(sum(length(p3) - length(props)) AS BIGINT) AS redacted_len_delta
        FROM s3 GROUP BY 1 ORDER BY 1
    """,
    "q_source_mixture_weights": """
        WITH per_source AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                       count(*) AS n_sources
                FROM per_source)
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS token_share,
               (1.0 / CAST(n_sources AS DOUBLE)) /
               (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)) AS mix_weight
        FROM per_source, tot
        ORDER BY source
    """,
    "q_split_leakage_audit": f"""
        WITH sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 0)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                FROM documents)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        kept AS (SELECT doc_id, shingle FROM sh
                 QUALIFY count(*) OVER (PARTITION BY shingle) <= {SHINGLE_DF_CAP}),
        inter AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
          FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT d1, d2,
                 round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) AS jaccard
          FROM inter
          JOIN sizes s1 ON d1 = s1.doc_id
          JOIN sizes s2 ON d2 = s2.doc_id
          WHERE round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) >= 0.8),
        sp AS (
          SELECT doc_id,
                 CASE WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 16
                            + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 256
                           < {SPLIT_TRAIN} THEN 'train'
                      WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 16
                            + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 256
                           < {SPLIT_VAL} THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
        SELECT d1, d2, p1.split AS split1, p2.split AS split2, jaccard
        FROM pairs
        JOIN sp p1 ON d1 = p1.doc_id
        JOIN sp p2 ON d2 = p2.doc_id
        WHERE p1.split <> p2.split
        ORDER BY d1, d2
    """,
    "q_chunk_documents": f"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
        st AS (SELECT doc_id, toks,
                      unnest(generate_series(1, greatest(len(toks), 1),
                                             {CHUNK_STRIDE})) AS start
               FROM t),
        ch AS (SELECT doc_id,
                      CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
                      CAST(start AS BIGINT) AS start,
                      toks[start:least(start + {CHUNK_SIZE} - 1, len(toks))] AS c
               FROM st)
        SELECT doc_id, chunk_id, start,
               CAST(len(c) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(c, ' ')) AS chunk_fp
        FROM ch ORDER BY doc_id, chunk_id
    """,
    "q_paragraph_dedup": f"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
        st AS (SELECT doc_id, toks,
                      unnest(generate_series(1, greatest(len(toks), 1),
                                             {CHUNK_STRIDE})) AS start
               FROM t),
        ch AS (SELECT doc_id,
                      CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
                      md5(array_to_string(
                        toks[start:least(start + {CHUNK_SIZE} - 1, len(toks))],
                        ' ')) AS chunk_fp
               FROM st),
        marked AS (
          SELECT doc_id, chunk_id,
                 row_number() OVER (PARTITION BY chunk_fp
                                    ORDER BY doc_id, chunk_id) AS rn
          FROM ch)
        SELECT doc_id,
               count(*) AS n_chunks,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_chunks,
               round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS dup_chunk_frac
        FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    "q_pack_sequences": f"""
        WITH RECURSIVE t AS (
          SELECT source, doc_id // {PACK_SHARD_DOCS} AS shard, doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                 row_number() OVER (PARTITION BY source, doc_id // {PACK_SHARD_DOCS}
                                    ORDER BY doc_id) AS rn
          FROM documents),
        r AS (
          SELECT source, shard, doc_id, n_tokens, rn,
                 n_tokens AS fill, 1 AS bin_id
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.source, t.shard, t.doc_id, t.n_tokens, t.rn,
                 CASE WHEN r.fill + t.n_tokens <= {PACK_CAPACITY}
                      THEN r.fill + t.n_tokens ELSE t.n_tokens END,
                 CASE WHEN r.fill + t.n_tokens <= {PACK_CAPACITY}
                      THEN r.bin_id ELSE r.bin_id + 1 END
          FROM r JOIN t ON t.source = r.source AND t.shard = r.shard
                       AND t.rn = r.rn + 1)
        SELECT source, shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(bin_id AS BIGINT) AS bin_id
        FROM r ORDER BY source, doc_id
    """,
}


def _bloom_pos_sql(k: int, h: str = "h") -> str:
    """DuckDB twin of _bloom_positions for hash slice ``k``."""
    e = "0"
    for j in range(4):
        idx = 4 * k + j + 1
        hv = (
            f"(ascii(substr({h}, {idx}, 1)) - CASE WHEN "
            f"ascii(substr({h}, {idx}, 1)) >= 97 THEN 87 ELSE 48 END)"
        )
        e = f"(({e}) * 16 + {hv})"
    return e


_BLOOM_P = [_bloom_pos_sql(k) for k in range(BLOOM_K)]

#: Bitmap semantics as position-set membership: a bit is set iff some
#: bench shingle produced that position, so "all K positions set"
#: membership reproduces the bloom probe -- false positives included.
CURATION_ORACLES["q_decontaminate_bloom"] = f"""
    WITH bench_sh AS (
      SELECT DISTINCT shingle
      FROM ({_shingle8_sql("source IN " + _BENCH_IN)})),
    bench_pos AS (
      SELECT DISTINCT p
      FROM (SELECT unnest([{", ".join(_BLOOM_P)}]) AS p
            FROM (SELECT md5(shingle) AS h FROM bench_sh))),
    train AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE source NOT IN {_BENCH_IN}),
    tsh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 7, 0)),
               i -> {" || ' ' || ".join(f"toks[i+{k}]" for k in range(8))}))
               AS shs
      FROM train),
    th AS (
      SELECT doc_id, md5(unnest(shs)) AS h FROM tsh),
    flagged AS (
      SELECT doc_id, count(*) AS n_flagged
      FROM th
      WHERE {_BLOOM_P[0]} IN (SELECT p FROM bench_pos)
        AND {_BLOOM_P[1]} IN (SELECT p FROM bench_pos)
        AND {_BLOOM_P[2]} IN (SELECT p FROM bench_pos)
      GROUP BY doc_id)
    SELECT tsh.doc_id AS doc_id,
           CAST(len(shs) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_flagged, 0) AS BIGINT) AS n_flagged,
           coalesce(n_flagged, 0) > 0 AS contaminated
    FROM tsh LEFT JOIN flagged ON tsh.doc_id = flagged.doc_id
    ORDER BY doc_id
"""


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Stateless chunking transform over any (doc_id, text) frame --
    batch or streaming (no shuffle, no state, so it drops into the
    ingest pipeline unchanged; tests/test_streaming.py streams it)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE))
    chunked = docs.select(
        "doc_id", toks.alias("toks"), F.posexplode(starts).alias("chunk_id", "start")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.slice(F.col("toks"), F.col("start"), F.lit(CHUNK_SIZE)).alias("ch"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        "start",
        F.size("ch").cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("ch"))).alias("chunk_fp"),
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (passage-granularity) deduplication, the
    RefinedWeb-style refinement of whole-document dedup: documents that
    are not global duplicates can still share large repeated passages
    (boilerplate, quoted blocks); those passages are deduplicated at
    chunk granularity. A chunk is a duplicate when the same content
    fingerprint was already claimed by a smaller (doc_id, chunk_id) --
    min-owner wins, the same greedy keeper rule as exact doc dedup.

    Output per document: chunk count, duplicate-chunk count, duplicate
    fraction -- the per-doc signal a curation pass thresholds on.

    Scale shape: chunking is the map-only transform
    (``chunk_documents``); ownership is ONE shuffle keyed by the chunk
    fingerprint using min(struct) aggregation (partial-agg friendly, no
    per-group window sort) + a fingerprint-keyed join back; the per-doc
    rollup re-shuffles only (doc_id, flag) pairs. Fingerprints are md5
    of chunk content, so the whole decision is content-derived and
    portable."""
    ch = chunk_documents(load_table(spark, sf_dir, "documents"))
    owner = ch.groupBy("chunk_fp").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("o")
    )
    dup = (F.col("doc_id") != F.col("o.doc_id")) | (
        F.col("chunk_id") != F.col("o.chunk_id")
    )
    return (
        ch.join(owner, "chunk_fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6
            ).alias("dup_chunk_frac"),
        )
        .orderBy("doc_id")
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split every document into
    CHUNK_SIZE-token windows advancing by CHUNK_STRIDE (the
    tokenize-then-chunk step feeding fixed-context training batches;
    ``q_pack_sequences`` is the sibling that packs whole short docs).
    Emits one row per chunk with its token count and an md5 content
    fingerprint, so the oracle hash checks chunk CONTENT, not just
    geometry.

    Scale shape: pure per-row array work (split once, slice per chunk)
    inside whole-stage codegen -- no shuffle except the presentation
    sort, no UDF, output rows ~= tokens/stride. At 100 TB this is a
    map-only pass whose cost is the text scan itself."""
    return chunk_documents(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id", "chunk_id"
    )


def _hash256(col: str = "doc_id"):
    """UNIFORM 0..255 bucket from the doc id's md5: the first two hex
    chars decoded as a hex number (the _bloom_positions digit decode).
    Distinct from ``_split_hash``, which sums raw ascii codes and is
    deliberately kept as-is for split stability but spans only 48..246
    non-uniformly -- fine for a stable arbitrary partition, wrong for
    any operator whose keep-RATE must be proportional to a threshold."""
    h = F.md5(F.col(col).cast("string"))
    v = F.lit(0)
    for j in range(2):
        a = F.ascii(F.substring(h, j + 1, 1))
        v = v * 16 + (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48)))
    return v


def temperature_thresholds(per_source: DataFrame) -> DataFrame:
    """(source, n_tokens) -> (source, keep_threshold): the T=2
    temperature-scaling math shared by q_temperature_sample and the
    incremental streaming maintainer (streaming/mixture.py) -- keeping
    it in exactly one place is what makes the streaming state a true
    twin of the batch operator. keep_threshold is an integer 1/256
    bucket of sqrt(share)/max sqrt(share)."""
    tot = per_source.agg(F.sum("n_tokens").alias("tot"))
    scaled = per_source.crossJoin(broadcast(tot)).select(
        "source",
        F.sqrt(
            F.col("n_tokens").cast("double") / F.col("tot").cast("double")
        ).alias("r"),
    )
    rmax = scaled.agg(F.max("r").alias("rmax"))
    return scaled.crossJoin(broadcast(rmax)).select(
        "source",
        F.floor(F.col("r") / F.col("rmax") * 256).cast("long").alias(
            "keep_threshold"
        ),
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a temperature-balanced mixture (T=2): per-source
    keep-rates proportional to sqrt(token_share) -- the standard
    multilingual/multi-source rebalancing rule (sample mass follows
    p^(1/T), down-weighting dominant sources) -- applied per document
    with a UNIFORM portable md5 hex bucket (_hash256; q_split_assign's
    ascii-sum hash is non-uniform and would skew the rates), so the
    kept set is a pure deterministic function of (doc_id, corpus
    stats) and the realized keep fraction tracks the threshold.

    T is fixed at 2 so the scale step is a single correctly-rounded
    sqrt (pow is not bit-portable across engines); thresholds are
    floored into integer 1/256 buckets, so the comparison is exact. The
    largest-share source keeps rate 1; all others are down-sampled by
    sqrt(share)/max sqrt(share).

    One scan for the stats, a broadcast of per-source thresholds back
    onto the corpus scan, zero shuffles of document rows."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_source = docs.groupBy("source").agg(
        F.sum(n_tokens.cast("long")).alias("n_tokens")
    )
    thr = temperature_thresholds(per_source)
    return (
        docs.join(broadcast(thr), "source")
        .select(
            "doc_id",
            "source",
            "keep_threshold",
            (_hash256() < F.col("keep_threshold")).alias("keep"),
        )
        .orderBy("doc_id")
    )


CURATION_ORACLES["q_quality_classifier_hashed"] = f"""
    WITH t AS (
      SELECT doc_id, source,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, source,
             round(list_sum(list_transform(
               toks,
               tk -> {_hex8_sql("md5(tk)")} / 2147483648.0 - 1.0))
               / len(toks), 6) AS score
      FROM t)
    SELECT doc_id, source, score, score > 0 AS keep
    FROM s ORDER BY doc_id
"""

CURATION_ORACLES["q_dsir_importance"] = f"""
    WITH terms AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    db AS (
      SELECT doc_id, lang, ({_hex8_sql("md5(term)")}) % {DSIR_BUCKETS} AS bucket,
             count(*) AS cnt
      FROM terms GROUP BY 1, 2, 3),
    bstats AS (
      SELECT bucket,
             sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN cnt ELSE 0 END) AS t_cnt,
             sum(CASE WHEN lang <> '{DSIR_TARGET_LANG}' THEN cnt ELSE 0 END) AS r_cnt
      FROM db GROUP BY 1),
    tot AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM bstats),
    w AS (
      SELECT bucket,
             ln((CAST(t_cnt + 1 AS DOUBLE) / CAST(t_tot + {DSIR_BUCKETS} AS DOUBLE))
                * (CAST(r_tot + {DSIR_BUCKETS} AS DOUBLE)
                   / CAST(r_cnt + 1 AS DOUBLE))) AS w
      FROM bstats, tot),
    contrib AS (
      SELECT doc_id, lang, CAST(round(cnt * w, 9) AS DECIMAL(28,9)) AS c
      FROM db JOIN w USING (bucket)
      WHERE lang <> '{DSIR_TARGET_LANG}'),
    agg AS (
      SELECT doc_id, lang, round(CAST(sum(c) AS DOUBLE), 6) AS log_weight
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT doc_id, lang, log_weight,
             row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rank
      FROM agg)
    SELECT doc_id, lang, log_weight, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {DSIR_KEEP}
    ORDER BY rank
"""

CURATION_ORACLES["q_temperature_sample"] = """
    WITH per_source AS (
      SELECT source,
             sum(len(string_split_regex(trim(text), '\\s+'))) AS n_tokens
      FROM documents GROUP BY 1),
    tot AS (SELECT sum(n_tokens) AS tot FROM per_source),
    scaled AS (
      SELECT source,
             sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) AS r
      FROM per_source, tot),
    rmax AS (SELECT max(r) AS rmax FROM scaled),
    thr AS (
      SELECT source, CAST(floor(r / rmax * 256) AS BIGINT) AS keep_threshold
      FROM scaled, rmax)
    SELECT doc_id, d.source AS source, keep_threshold,
           ((CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) >= 97
                  THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
                  ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48 END) * 16
            + (CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) >= 97
                    THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 87
                    ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 48 END))
             < keep_threshold AS keep
    FROM documents d JOIN thr ON d.source = thr.source
    ORDER BY doc_id
"""


CURATION_QUERIES = {
    "q_temperature_sample": q_temperature_sample,
    "q_curation_pipeline": q_curation_pipeline,
    "q_funnel_steps": q_funnel_steps,
    "q_retention_cohorts": q_retention_cohorts,
    "q_heavy_hitter_users": q_heavy_hitter_users,
    "q_stratified_rebalance": q_stratified_rebalance,
    "q_zscore_outliers": q_zscore_outliers,
    "q_mad_outliers": q_mad_outliers,
    "q_decontaminate_shingle_overlap": q_decontaminate_shingle_overlap,
    "q_decontaminate_bloom": q_decontaminate_bloom,
    "q_quality_gopher": q_quality_gopher,
    "q_pii_redact_stats": q_pii_redact_stats,
    "q_pack_sequences": q_pack_sequences,
    "q_split_assign": q_split_assign,
    "q_token_budget_selection": q_token_budget_selection,
    "q_chunk_documents": q_chunk_documents,
    "q_paragraph_dedup": q_paragraph_dedup,
    "q_source_mixture_weights": q_source_mixture_weights,
    "q_split_leakage_audit": q_split_leakage_audit,
    "q_quality_classifier_hashed": q_quality_classifier_hashed,
    "q_dsir_importance": q_dsir_importance,
}


#: Boilerplate 5-grams: the span length CCNet-style template detection
#: uses -- long enough that chance repetition within one source is
#: meaningful, short enough to catch header/footer fragments that
#: whole-paragraph dedup (q_paragraph_dedup) misses.
BOILERPLATE_NGRAM = 5
#: A gram is boilerplate within its source when it appears in at least
#: max(2, ceil(10% of the source's docs)) DISTINCT documents. The
#: threshold is integer arithmetic ((n + 9) // 10) so both engines
#: compute it identically.
BOILERPLATE_MIN_DOCS = 2


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE boilerplate detection (the CCNet/C4 cleanup step
    between exact dedup and quality filtering): a 5-token shingle that
    occurs in >= max(2, 10% of a source's documents) distinct docs of
    that source is template text (nav bars, footers, licence blurbs);
    report per document how much of it is boilerplate. Differs from
    q_paragraph_dedup (global duplicate passages, min-owner keeps one
    copy) in being FREQUENCY-thresholded and source-scoped: boilerplate
    is dropped from every doc, no canonical owner.

    Output per doc: distinct-gram count, boilerplate-gram count, and
    the boilerplate fraction a filter would threshold on.

    Scale shape: shingling is map-only codegen (split + sequence +
    slice + md5); presence is ONE distinct on (source, gram_fp,
    doc_id); document frequency is a partial-agg count on (source,
    gram_fp); the flag joins back on the same key (co-partitioned --
    Spark reuses the exchange) and the per-doc rollup shuffles (doc_id,
    flag) pairs only. Source doc counts are a tiny dimension joined by
    broadcast. No UDF, no window, nothing driver-side; every stage is
    keyed on content hashes, so skew is bounded by true template
    frequency -- exactly the rows you want to find."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = BOILERPLATE_NGRAM
    grams = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("start"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            "source",
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("start"), n))).alias(
                "gram_fp"
            ),
        )
        .distinct()
    )
    src_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    df_counts = grams.groupBy("source", "gram_fp").agg(
        F.count(F.lit(1)).alias("df")
    )
    flagged = (
        grams.join(df_counts, ["source", "gram_fp"])
        .join(F.broadcast(src_docs), "source")
        .select(
            "doc_id",
            F.when(
                F.col("df")
                >= F.greatest(
                    F.lit(BOILERPLATE_MIN_DOCS).cast("long"),
                    F.expr("(n_docs + 9) div 10"),
                ),
                1,
            )
            .otherwise(0)
            .alias("is_bp"),
        )
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("is_bp").cast("long").alias("n_boilerplate"),
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_boilerplate", F.lit(0)).cast("long").alias("n_boilerplate"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.col("n_boilerplate").cast("double") / F.col("n_grams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("boilerplate_frac"),
        )
        .orderBy("doc_id")
    )


CURATION_ORACLES["q_boilerplate_ngrams"] = f"""
    WITH t AS (SELECT doc_id, source,
                      string_split_regex(trim(text), '\\s+') AS toks
               FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
             md5(array_to_string(
               toks[start:start + {BOILERPLATE_NGRAM - 1}], ' ')) AS gram_fp
      FROM (SELECT doc_id, source, toks,
                   unnest(generate_series(
                     1, len(toks) - {BOILERPLATE_NGRAM - 1})) AS start
            FROM t WHERE len(toks) >= {BOILERPLATE_NGRAM})),
    src_docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    dfc AS (SELECT source, gram_fp, count(*) AS df
            FROM grams GROUP BY 1, 2),
    flagged AS (
      SELECT g.doc_id,
             CASE WHEN dfc.df >= greatest({BOILERPLATE_MIN_DOCS},
                                          (s.n_docs + 9) // 10)
                  THEN 1 ELSE 0 END AS is_bp
      FROM grams g
      JOIN dfc ON g.source = dfc.source AND g.gram_fp = dfc.gram_fp
      JOIN src_docs s ON g.source = s.source),
    per_doc AS (
      SELECT doc_id, count(*) AS n_grams, sum(is_bp) AS n_boilerplate
      FROM flagged GROUP BY 1)
    SELECT d.doc_id, d.source,
           CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(p.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
           CASE WHEN coalesce(p.n_grams, 0) > 0
                THEN round(CAST(p.n_boilerplate AS DOUBLE) / p.n_grams, 6)
                ELSE 0.0 END AS boilerplate_frac
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
"""

CURATION_QUERIES["q_boilerplate_ngrams"] = q_boilerplate_ngrams


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 8-gram novelty (memorization audit): the fraction
    of a document's distinct 8-token shingles that appear in NO other
    document -- the standard pre-training question "how much of this
    document is text the corpus already contains?" (low novelty =
    heavy cross-document repetition = memorization/duplication risk;
    the doc-level complement of q_boilerplate_ngrams' corpus-frequent
    n-grams and of the pairwise dedup family). Docs shorter than 8
    tokens have no shingles and are omitted, matching the oracle's
    inner grouping.

    Plan: one shuffle on the shingle for document frequency, a
    co-partitioned join back (same key, no second exchange under AQE),
    one doc_id aggregate. Novelty is an exact integer ratio; at 100 TB
    the shingle df frame is the only wide state and it is
    key-partitioned -- no collect, no skew beyond natural token skew
    (the df aggregate is a partial-agg map-side combine)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs, n=8)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.round(
                F.lit(1.0)
                - F.col("n_shared").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


CURATION_QUERIES["q_ngram_novelty"] = q_ngram_novelty
CURATION_ORACLES["q_ngram_novelty"] = f"""
    WITH sh AS ({_shingle8_sql("TRUE")}),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           round(1.0 - sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS novelty
    FROM sh s JOIN dfreq USING (shingle)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
"""


#: Sequence-length caps a batching layer chooses between: docs are
#: assigned the smallest cap that fits; longer docs are truncated to
#: the largest cap (padding 0, truncation loss reported separately).
PADDING_CAPS = [64, 128, 256, 512, 1024]


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batching-efficiency audit: if documents are padded to the
    smallest fitting sequence cap (64/128/.../1024 tokens), how much
    of each batch bucket is padding, and how many tokens does the
    overflow bucket truncate? The padding-vs-truncation table is what
    picks the bucket boundaries for a training run (the cost of a bad
    cap layout at 100 TB is literally wasted accelerator-hours
    proportional to waste_frac).

    Per bucket: document count, kept tokens, padding tokens,
    waste_frac = padding / (kept + padding), plus truncated tokens for
    the overflow cap. Exact integer sums off ONE scan (token count is
    a map-side size(split(..)), the same tokenizer every text operator
    uses); a single double division per bucket, round 6.

    Scale shape: one scan -> per-row integer bucket expression ->
    one small groupBy (|caps| groups). No joins, no window."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    cap = F.lit(None).cast("long")
    for c in reversed(PADDING_CAPS):
        cap = F.when(n_tok <= c, F.lit(c).cast("long")).otherwise(cap)
    cap = F.coalesce(cap, F.lit(PADDING_CAPS[-1]).cast("long"))
    kept = F.least(n_tok, F.lit(PADDING_CAPS[-1]).cast("long"))
    per_doc = docs.select(
        cap.alias("cap"),
        kept.alias("kept"),
        (cap - kept).alias("pad"),
        (n_tok - kept).alias("truncated"),
    )
    agg = per_doc.groupBy("cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("kept_tokens"),
        F.sum("pad").cast("long").alias("padding_tokens"),
        F.sum("truncated").cast("long").alias("truncated_tokens"),
    )
    waste = F.round(
        F.col("padding_tokens").cast("double")
        / (F.col("kept_tokens") + F.col("padding_tokens")).cast("double"),
        6,
    )
    return agg.select(
        F.col("cap").alias("seq_cap"),
        "n_docs",
        "kept_tokens",
        "padding_tokens",
        "truncated_tokens",
        waste.alias("waste_frac"),
    ).orderBy("seq_cap")


CURATION_QUERIES["q_padding_waste"] = q_padding_waste


def _padding_case() -> str:
    whens = " ".join(
        f"WHEN n <= {c} THEN CAST({c} AS BIGINT)" for c in PADDING_CAPS
    )
    return f"CASE {whens} ELSE CAST({PADDING_CAPS[-1]} AS BIGINT) END"


CURATION_ORACLES["q_padding_waste"] = f"""
    WITH toks AS (
      SELECT CAST(length(string_split_regex(trim(text), '\\s+'))
                  AS BIGINT) AS n
      FROM documents),
    per_doc AS (
      SELECT {_padding_case()} AS cap,
             least(n, {PADDING_CAPS[-1]}) AS kept,
             {_padding_case()} - least(n, {PADDING_CAPS[-1]}) AS pad,
             n - least(n, {PADDING_CAPS[-1]}) AS truncated
      FROM toks)
    SELECT cap AS seq_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS kept_tokens,
           CAST(sum(pad) AS BIGINT) AS padding_tokens,
           CAST(sum(truncated) AS BIGINT) AS truncated_tokens,
           round(CAST(sum(pad) AS DOUBLE)
                 / CAST(sum(kept) + sum(pad) AS DOUBLE), 6) AS waste_frac
    FROM per_doc
    GROUP BY cap
    ORDER BY seq_cap
"""


#: A user with no activity in the last KM_CENSOR_DAYS before the
#: corpus cutoff is an observed churn; later activity right-censors
#: the lifetime (still active when observation ended).
KM_CENSOR_DAYS = 7


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user retention (Kaplan &
    Meier JASA'58): per churn-day lifetime t, the at-risk count, churn
    count, hazard d/n, and the product-limit survival estimate
    S(t) = prod_{s<=t} (1 - d_s/n_s) -- the right-censoring-aware
    answer to "what fraction of users survive past day t", which naive
    retention curves get wrong by counting still-active users as
    churned. Lifetime = days between a user's first and last event;
    censoring per KM_CENSOR_DAYS.

    Exactness: lifetimes/risk/churn counts are exact integers (risk
    sets come from ONE cumulative window over the compacted lifetime
    histogram, not a per-user self-join); hazard is one double
    division (round 6). The survival product is evaluated in LOG
    space: each factor ln((n-d)/n) is a fixed-shape double rounded to
    DECIMAL(28,9), so the cumulative sum is EXACT and
    order-independent, with one exp + round(6) at the output -- the
    q_perplexity_unigram discipline. d == n (everyone at risk churns,
    only possible at the last time point) short-circuits to exactly
    0.0 instead of ln(0).

    Scale shape: corpus-sized work is one per-user min/max aggregate;
    everything ordered (cumulative risk, cumulative log-survival) runs
    on the DISTINCT-LIFETIME histogram -- bounded by the observation
    window in days, metadata-sized at any corpus scale (the
    q_classifier_auc compaction argument)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    cutoff = ev.agg(F.max("d").alias("cutoff"))
    u = per_user.crossJoin(broadcast(cutoff)).select(
        F.datediff("last_d", "first_d").cast("long").alias("t"),
        F.when(
            F.datediff("cutoff", "last_d") >= KM_CENSOR_DAYS, 1
        ).otherwise(0).alias("churned"),
    )
    hist = u.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("churned").cast("long").alias("n_churned"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_before = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = hist.select(
        "t",
        "n_churned",
        (
            F.sum("c").over(w_all)
            - F.coalesce(F.sum("c").over(w_before), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    term = F.when(
        F.col("n_churned") < F.col("n_risk"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("n_churned")).cast("double")
                / F.col("n_risk").cast("double")
            ),
            9,
        ).cast("decimal(28,9)"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = at_risk.withColumn("logterm", term).withColumn(
        "cumlog", F.sum("logterm").over(w_cum)
    )
    surv = F.when(
        F.col("n_churned") == F.col("n_risk"), F.lit(0.0)
    ).otherwise(F.round(F.exp(F.col("cumlog").cast("double")), 6))
    return (
        stepped.filter(F.col("n_churned") > 0)
        .select(
            F.col("t").alias("t_days"),
            "n_risk",
            "n_churned",
            F.round(
                F.col("n_churned").cast("double")
                / F.col("n_risk").cast("double"),
                6,
            ).alias("hazard"),
            surv.alias("km_survival"),
        )
        .orderBy("t_days")
    )


CURATION_QUERIES["q_kaplan_meier"] = q_kaplan_meier
CURATION_ORACLES["q_kaplan_meier"] = f"""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    per_user AS (
      SELECT user_id, min(d) AS first_d, max(d) AS last_d
      FROM ev GROUP BY 1),
    cutoff AS (SELECT max(d) AS cutoff FROM ev),
    u AS (
      SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS t,
             CASE WHEN date_diff('day', last_d, cutoff)
                       >= {KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS churned
      FROM per_user, cutoff),
    hist AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(churned) AS BIGINT) AS n_churned
      FROM u GROUP BY 1),
    at_risk AS (
      SELECT t, n_churned,
             CAST(sum(c) OVER ()
                  - coalesce(sum(c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM hist),
    stepped AS (
      SELECT t, n_churned, n_risk,
             sum(CASE WHEN n_churned < n_risk THEN
                   CAST(round(ln(CAST(n_risk - n_churned AS DOUBLE)
                              / CAST(n_risk AS DOUBLE)), 9)
                        AS DECIMAL(28,9)) END)
               OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumlog
      FROM at_risk)
    SELECT t AS t_days, n_risk, n_churned,
           round(CAST(n_churned AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)
             AS hazard,
           CASE WHEN n_churned = n_risk THEN 0.0
                ELSE round(exp(CAST(cumlog AS DOUBLE)), 6) END
             AS km_survival
    FROM stepped
    WHERE n_churned > 0
    ORDER BY t_days
"""


# ---- Epoch-shuffle determinism audit (round 7) ----

#: Prefix fraction audited for cross-epoch overlap (the "what does the
#: model see first" window): first 10% of each epoch's order.
EPOCH_SHUFFLE_PREFIX_DEN = 10


def q_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-reshuffle audit: training runs re-order the
    corpus every epoch with a seeded shuffle; this verifies the
    orderings are (a) reproducible and (b) actually DIFFERENT across
    epochs. Position of doc d in epoch e = rank of md5('ep' e ':' d)
    (doc_id tiebreak). Reported: corpus size, the first-decile overlap
    between epoch 0 and epoch 1 (how much of the early-training window
    repeats -- E[overlap] = prefix/10 under independence), and the
    mean/max absolute position drift between the two epochs.

    Exactness: ranks are integers from a total order on (md5, doc_id)
    -- md5 is bit-identical cross-engine, so positions, overlap, and
    drift are exact integers; one final division for the mean.

    Scale shape: two global sorts of (hash, doc_id) -- at production
    scale a global rank is one rangepartition+sort (the zorder
    layout's cost model); everything downstream is a self-join on
    doc_id (co-partitioned) and one aggregate. No collects."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _pos(e: int) -> DataFrame:
        h = F.md5(F.concat(F.lit(f"ep{e}:"), F.col("doc_id").cast("string")))
        w = Window.orderBy(h, "doc_id")
        return docs.select(
            "doc_id", F.row_number().over(w).cast("long").alias(f"pos{e}")
        )

    p0, p1 = _pos(0), _pos(1)
    both = p0.join(p1, "doc_id")
    n = docs.count()
    prefix = n // EPOCH_SHUFFLE_PREFIX_DEN
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.lit(prefix).cast("long").alias("prefix_k"),
        F.sum(
            F.when(
                (F.col("pos0") <= prefix) & (F.col("pos1") <= prefix), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("prefix_overlap"),
        F.sum(F.abs(F.col("pos0") - F.col("pos1"))).cast("long").alias(
            "total_abs_drift"
        ),
        F.max(F.abs(F.col("pos0") - F.col("pos1"))).cast("long").alias(
            "max_abs_drift"
        ),
    ).select(
        "n_docs",
        "prefix_k",
        "prefix_overlap",
        F.round(
            F.col("total_abs_drift").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("mean_abs_drift"),
        "max_abs_drift",
    )


CURATION_QUERIES["q_epoch_shuffle_audit"] = q_epoch_shuffle_audit
CURATION_ORACLES["q_epoch_shuffle_audit"] = f"""
    WITH p0 AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('ep0:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS pos0
      FROM documents),
    p1 AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS pos1
      FROM documents),
    joined AS (SELECT p0.doc_id, pos0, pos1 FROM p0 JOIN p1 USING (doc_id)),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST((SELECT n FROM n) // {EPOCH_SHUFFLE_PREFIX_DEN} AS BIGINT)
             AS prefix_k,
           CAST(sum(CASE WHEN pos0 <= (SELECT n FROM n)
                                        // {EPOCH_SHUFFLE_PREFIX_DEN}
                          AND pos1 <= (SELECT n FROM n)
                                        // {EPOCH_SHUFFLE_PREFIX_DEN}
                         THEN 1 ELSE 0 END) AS BIGINT) AS prefix_overlap,
           round(CAST(sum(abs(pos0 - pos1)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_abs_drift,
           CAST(max(abs(pos0 - pos1)) AS BIGINT) AS max_abs_drift
    FROM joined
"""


# ---- Hellinger distance between source language mixes (round 7) ----


def q_hellinger_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Hellinger distance between the per-source LANGUAGE
    distributions -- the bounded-metric complement to the PSI/KS drift
    audits for comparing corpus slices before mixing them:
    H(P,Q) = sqrt(1 - BC), BC = sum_l sqrt(p_l * q_l). H is a true
    metric on distributions, 0 = identical mix, 1 = disjoint support.

    Exactness: p_l / q_l are exact-integer ratios evaluated as
    doubles; sqrt is IEEE-correctly-rounded, so each Bhattacharyya
    term is a fixed-shape double expression -- folded through
    round(.,9)-as-DECIMAL(28,9) so the SUM is order-independent
    (the q_entropy_by_source discipline); one final sqrt + round(6).

    Scale shape: the corpus touches one groupBy(source, lang); the
    pair join runs on the source x lang frame (sources x langs sized,
    never corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = sl.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pl = sl.join(totals, "source").select(
        "source",
        "lang",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    a = pl.select(
        F.col("source").alias("source_a"),
        "lang",
        F.col("p").alias("pa"),
    )
    b = pl.select(
        F.col("source").alias("source_b"),
        "lang",
        F.col("p").alias("pb"),
    )
    bc_terms = a.join(b, "lang").filter(
        F.col("source_a") < F.col("source_b")
    ).select(
        "source_a",
        "source_b",
        F.round(F.sqrt(F.col("pa") * F.col("pb")), 9)
        .cast("decimal(28,9)")
        .alias("t"),
    )
    bc = bc_terms.groupBy("source_a", "source_b").agg(
        F.sum("t").alias("bc")
    )
    return bc.select(
        "source_a",
        "source_b",
        F.round(F.col("bc").cast("double"), 6).alias("bhattacharyya"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0), F.lit(1.0) - F.col("bc").cast("double")
                )
            ),
            6,
        ).alias("hellinger"),
    ).orderBy("source_a", "source_b")


CURATION_QUERIES["q_hellinger_sources"] = q_hellinger_sources
CURATION_ORACLES["q_hellinger_sources"] = """
    WITH sl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
               FROM sl GROUP BY 1),
    pl AS (
      SELECT sl.source, sl.lang,
             CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
      FROM sl JOIN totals ON totals.source = sl.source),
    terms AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(round(sqrt(a.p * b.p), 9) AS DECIMAL(28,9)) AS t
      FROM pl a JOIN pl b
        ON a.lang = b.lang AND a.source < b.source),
    bc AS (
      SELECT source_a, source_b, sum(t) AS bc
      FROM terms GROUP BY 1, 2)
    SELECT source_a, source_b,
           round(CAST(bc AS DOUBLE), 6) AS bhattacharyya,
           round(sqrt(greatest(0.0, 1.0 - CAST(bc AS DOUBLE))), 6)
             AS hellinger
    FROM bc ORDER BY source_a, source_b
"""


# ---- Dataset card (round 7, second batch) ----


def q_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-source "dataset card": the summary table a corpus
    release ships (docs, tokens, vocabulary, mean/median doc length,
    exact-duplicate rate, dominant language + its share) -- the
    single-query composite of the per-facet audits, so a mix decision
    reads ONE frame instead of six.

    Exactness: every component is an exact integer or an exact-rank
    selection (median at row ceil(n/2) of the (tok_count, doc_id)
    order); the dominant language is argmax by (count, lang)
    lexicographic tiebreak; divisions are the only doubles.

    Scale shape: one scan computes per-doc token counts (scan-map);
    one explode feeds the per-source vocabulary count (map-side
    combinable distinct); everything else aggregates the per-doc
    frame. The output is sources-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    per_doc = docs.select(
        "source",
        "lang",
        "text",
        "doc_id",
        F.size(toks).cast("long").alias("tc"),
    )
    w = Window.partitionBy("source").orderBy("tc", "doc_id")
    ranked = per_doc.select(
        "source",
        "tc",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n"),
    )
    med = ranked.groupBy("source").agg(
        F.max(
            F.when(F.col("rnk") == F.ceil(F.col("n") / 2), F.col("tc"))
        ).alias("p50_doc_tokens")
    )
    base = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tc").cast("long").alias("n_tokens"),
        F.countDistinct("text").cast("long").alias("n_distinct_texts"),
    )
    vocab = (
        docs.select("source", F.explode(toks).alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").cast("long").alias("vocab_size"))
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wl = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang")
    )
    top_lang = (
        lang_counts.select(
            "source", "lang", "c", F.row_number().over(wl).alias("r")
        )
        .filter(F.col("r") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("c").alias("top_lang_docs"),
        )
    )
    return (
        base.join(med, "source")
        .join(vocab, "source")
        .join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "vocab_size",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("mean_doc_tokens"),
            "p50_doc_tokens",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_texts").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("exact_dup_rate"),
            "top_lang",
            F.round(
                F.col("top_lang_docs").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("top_lang_share"),
        )
        .orderBy("source")
    )


CURATION_QUERIES["q_dataset_card_stats"] = q_dataset_card_stats
CURATION_ORACLES["q_dataset_card_stats"] = """
    WITH per_doc AS (
      SELECT source, lang, text, doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS tc
      FROM documents),
    ranked AS (
      SELECT source, tc,
             row_number() OVER (PARTITION BY source
                                ORDER BY tc, doc_id) AS rnk,
             count(*) OVER (PARTITION BY source) AS n
      FROM per_doc),
    med AS (
      SELECT source,
             max(CASE WHEN rnk = ceil(n / 2.0) THEN tc END)
               AS p50_doc_tokens
      FROM ranked GROUP BY 1),
    base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tc) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts
      FROM per_doc GROUP BY 1),
    vocab AS (
      SELECT source, CAST(count(DISTINCT t) AS BIGINT) AS vocab_size
      FROM (SELECT source,
                   unnest(string_split_regex(trim(text), '\\s+')) AS t
            FROM documents)
      GROUP BY 1),
    lang_counts AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    top_lang AS (
      SELECT source, lang AS top_lang, c AS top_lang_docs
      FROM (SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY c DESC, lang) AS r
            FROM lang_counts)
      WHERE r = 1)
    SELECT b.source, b.n_docs, b.n_tokens, v.vocab_size,
           round(CAST(b.n_tokens AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6)
             AS mean_doc_tokens,
           m.p50_doc_tokens,
           round(1.0 - CAST(b.n_distinct_texts AS DOUBLE)
                 / CAST(b.n_docs AS DOUBLE), 6) AS exact_dup_rate,
           t.top_lang,
           round(CAST(t.top_lang_docs AS DOUBLE)
                 / CAST(b.n_docs AS DOUBLE), 6) AS top_lang_share
    FROM base b
    JOIN med m ON m.source = b.source
    JOIN vocab v ON v.source = b.source
    JOIN top_lang t ON t.source = b.source
    ORDER BY b.source
"""


# ---- Jensen-Shannon divergence between source language mixes (round 8) ----


def q_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source LANGUAGE
    distributions -- the symmetric, always-finite KL complement to
    q_hellinger_sources (JSD is the mixing-loss number: how many nats
    a code optimized for the pooled mix loses per sample, which is the
    quantity a data-mixing decision actually trades). JSD(P,Q) =
    sum_l [ p/2 ln(2p/(p+q)) + q/2 ln(2q/(p+q)) ], 0 = identical,
    ln 2 = disjoint support; jsd_norm = JSD/ln2 in [0,1].

    The shared-language join only yields terms where BOTH p and q are
    nonzero; langs private to one source contribute p/2 ln 2, which
    sums to (1 - shared_p)/2 ln 2 -- so private mass needs NO outer
    join, just the shared-p sums. Unlike q_hellinger_sources (which
    emits no row for disjoint pairs, documented there), the pair spine
    is the full sources x sources upper triangle, so disjoint pairs
    emit jsd_norm = 1 explicitly.

    Exactness: p, q are exact-integer ratios as doubles; each ln term
    and each shared-p term is rounded to 9 dp and summed as
    DECIMAL(28,9) (the established order-independent discipline); the
    final expression is fixed-shape double + round(6).

    Scale shape: one corpus groupBy(source, lang); everything after
    runs on the sources x langs frame and the sources x sources
    spine."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = sl.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pl = sl.join(totals, "source").select(
        "source",
        "lang",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    a = pl.select(
        F.col("source").alias("source_a"), "lang", F.col("p").alias("pa")
    )
    b = pl.select(
        F.col("source").alias("source_b"), "lang", F.col("p").alias("pb")
    )
    shared = (
        a.join(b, "lang")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("pa") / 2
                * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
                + F.col("pb") / 2
                * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb"))),
                9,
            ).cast("decimal(28,9)").alias("t"),
            F.round(F.col("pa"), 9).cast("decimal(28,9)").alias("spa"),
            F.round(F.col("pb"), 9).cast("decimal(28,9)").alias("spb"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("t").alias("shared_term"),
            F.sum("spa").alias("shared_pa"),
            F.sum("spb").alias("shared_pb"),
        )
    )
    srcs = totals.select("source")
    spine = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    ln2 = 0.6931471805599453
    jsd = (
        F.coalesce(F.col("shared_term").cast("double"), F.lit(0.0))
        + (F.lit(1.0) - F.coalesce(F.col("shared_pa").cast("double"), F.lit(0.0)))
        / 2 * F.lit(ln2)
        + (F.lit(1.0) - F.coalesce(F.col("shared_pb").cast("double"), F.lit(0.0)))
        / 2 * F.lit(ln2)
    )
    return (
        spine.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.round(jsd, 6).alias("jsd_nats"),
            F.round(jsd / F.lit(ln2), 6).alias("jsd_norm"),
        )
        .orderBy("source_a", "source_b")
    )


CURATION_QUERIES["q_jsd_sources"] = q_jsd_sources
CURATION_ORACLES["q_jsd_sources"] = """
    WITH sl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
               FROM sl GROUP BY 1),
    pl AS (
      SELECT sl.source, sl.lang,
             CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
      FROM sl JOIN totals ON totals.source = sl.source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             sum(CAST(round(
               a.p / 2 * ln(2.0 * a.p / (a.p + b.p))
               + b.p / 2 * ln(2.0 * b.p / (a.p + b.p)), 9)
               AS DECIMAL(28,9))) AS shared_term,
             sum(CAST(round(a.p, 9) AS DECIMAL(28,9))) AS shared_pa,
             sum(CAST(round(b.p, 9) AS DECIMAL(28,9))) AS shared_pb
      FROM pl a JOIN pl b ON a.lang = b.lang AND a.source < b.source
      GROUP BY 1, 2),
    spine AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM totals a JOIN totals b ON a.source < b.source),
    j AS (
      SELECT spine.source_a, spine.source_b,
             coalesce(CAST(shared_term AS DOUBLE), 0.0)
             + (1.0 - coalesce(CAST(shared_pa AS DOUBLE), 0.0))
               / 2 * 0.6931471805599453
             + (1.0 - coalesce(CAST(shared_pb AS DOUBLE), 0.0))
               / 2 * 0.6931471805599453 AS jsd
      FROM spine LEFT JOIN shared
        ON shared.source_a = spine.source_a
       AND shared.source_b = spine.source_b)
    SELECT source_a, source_b,
           round(jsd, 6) AS jsd_nats,
           round(jsd / 0.6931471805599453, 6) AS jsd_norm
    FROM j ORDER BY source_a, source_b
"""
