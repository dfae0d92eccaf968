"""Text-analysis operators over the ``documents`` table -- the
training-data-pipeline extensions (language-ID, quality scoring, token
counting, document fingerprinting).

Computation is JVM-side (``split`` / higher-order array functions /
``regexp_replace`` / ``md5``) wherever expressions are cheap enough to
run inside whole-stage codegen; the one exception is the winnowing
fingerprint, whose per-document sliding-window hashing is
interpreted-HOF-bound as expressions and therefore runs as an
Arrow-batched exact-int64 numpy map (same values, 10x faster). One
scan per operator, no shuffle except final aggregations/sorts.

Tokenization contract shared with the DuckDB oracles: tokens are
``split(trim(text), '\\s+')``; fingerprints are md5 of
lowercased, whitespace-collapsed text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..lineage import cut_lineage

#: Tiny deterministic stopword list used by quality scoring and the
#: language-ID heuristic (must stay in sync with the oracle SQL).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


#: Frozen-vocabulary size for the OOV-coverage audit (small enough that
#: the fixture corpus, ~31 distinct tokens, has a real OOV tail).
OOV_VOCAB_N = 12


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: freeze the top-N corpus
    terms as the vocabulary, then measure each source's out-of-
    vocabulary token rate -- the coverage check run before committing a
    tokenizer vocab (high OOV on a source means the tokenizer will
    shred it into bytes/UNKs and training sees degraded text).

    Scale shape: one explode -> term counts (shuffle, partial-agg
    friendly; the term relation is bounded by distinct vocabulary, not
    corpus size) -> top-N via orderBy+limit = TakeOrderedAndProject
    (no global sort) -> broadcast the N-row vocab as a LEFT join probe
    -> per-source conditional counts (tiny shuffle). Nothing collects;
    the only corpus-sized pass is the explode scan.

    Exact integer counts + a round(6) division -- oracle matches
    bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("source", F.explode(_tokens()).alias("term"))
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        freq.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(OOV_VOCAB_N)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    from pyspark.sql.functions import broadcast

    return (
        terms.join(broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


def _adjacent_pairs(first: str, second: str):
    """Adjacent-token pairs of ``_tokens()`` as an array of structs
    with the given field names: aligned-slice zip (no per-index
    element_at lambdas), empty/one-token docs yield an empty array via
    the greatest(...,0) guard. Shared by the bigram-LM and PMI
    operators so the subtle alignment lives in exactly one place."""
    toks = _tokens()
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias(first), b.alias(second)),
    )


def _ascii_split(text: str | None) -> list[str]:
    """Python twin of ``split(trim(text), '\\s+')`` for the Arrow-batched
    operators: Spark trim strips ASCII spaces, Java ``\\s`` is the ASCII
    whitespace class (plain ``str.split()`` would also split on U+00A0
    and friends and diverge from the JVM/oracle contract), and Spark's
    split uses ``Pattern.split(input, -1)``, which keeps BOTH leading
    and trailing empty fields ('a\\tb\\t' -> ['a','b',''], '\\t' ->
    ['','']) -- DuckDB string_split_regex agrees. NULL is treated as
    empty text (the fixture schema never produces it; the pandas path
    must not crash if a corpus does)."""
    import re

    t = (text or "").strip(" ")
    if t == "":
        return [""]
    return re.split("[ \t\n\x0b\f\r]+", t)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish sub-token count
    (alternating letter/digit boundaries), per document."""
    docs = load_table(spark, sf_dir, "documents")
    bpeish = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"([a-z])([A-Z0-9])", r"$1 $2")), r"\s+"
    )
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.size(bpeish).cast("long").alias("n_subtokens"),
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("doc_id")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword signals combined
    into one [0,1] score (heuristics in the C4/Gopher-rules family).

    Components (all deterministic doubles):
      - len_score: min(1, n_tokens / 50)
      - stopword_ratio: stopword tokens / tokens
      - punct_ratio: punctuation chars / chars
    score = 0.5*len_score + 0.4*stopword_ratio_capped + 0.1*(1-punct_ratio)
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = _tokens()
    n_tokens = F.size(tokens)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[\p{Punct}]", ""))
    len_score = F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(50.0))
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    score = (
        F.lit(0.5) * len_score
        + F.lit(0.4) * F.least(F.lit(1.0), stop_ratio * 3)
        + F.lit(0.1) * (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    ).orderBy("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker hit count -> 'en' if any
    marker token present, else 'und'. (The fixture text is synthetic
    English-ish regardless of its ``lang`` label; the operator's value
    is the deterministic n-gram-marker shape, which generalizes to real
    marker tables per language.)"""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_markers = F.size(F.filter(_tokens(), lambda x: F.array_contains(stop_arr, x)))
    return docs.select(
        "doc_id",
        "lang",
        n_markers.cast("long").alias("n_markers"),
        F.when(n_markers > 0, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    ).orderBy("doc_id")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (lowercase,
    collapsed whitespace) plus a coarse 16-bucket shard id -- the exact
    content-hash used by exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = F.md5(normalized)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        (F.ascii(F.substring(fp, 1, 1)) % 16).alias("shard"),
    ).orderBy("doc_id")


#: Winnowing parameters: k-gram size, window size, polynomial base,
#: modulus. PW holds B^p mod M so per-gram hashes are a dot product
#: against constants -- sum(code * PW) stays < 2^63, exact in BIGINT
#: in both engines.
WINNOW_K = 8
WINNOW_W = 4
WINNOW_B = 257
WINNOW_M = 1_000_000_007
WINNOW_PW = [pow(WINNOW_B, WINNOW_K - 1 - p, WINNOW_M) for p in range(WINNOW_K)]


def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, the MOSS
    scheme): Rabin-Karp polynomial hashes of every character k-gram
    over normalized text, then the minimum hash of each sliding window
    of W consecutive gram hashes; the distinct minima are the
    document's fingerprint set. Near-identical documents share most
    fingerprints, so a groupBy on (fingerprint) finds overlapping
    passages -- the classic plagiarism/near-dup primitive.

    Arrow-batched numpy implementation: the hash is a sliding-window
    dot product against B^p mod M constants -- exact int64 arithmetic,
    so the values equal the sequential rolling-hash values AND the
    DuckDB oracle's, while running vectorized (the pure-expression
    formulation is interpreted-HOF-bound: ~7k lambda evaluations per
    document, measured 10x slower; see NOTES_r1.md on CollapseProject
    for the expression-based variant's pitfalls). Pure map, no shuffle
    except the presentation sort. ASCII fixture text => byte positions
    == char positions, matching the SQL oracle's substr semantics."""
    from numpy.lib.stride_tricks import sliding_window_view

    import numpy as np
    import pandas as pd

    pw = np.array(WINNOW_PW, dtype="int64")

    def winnow(batches):
        for pdf in batches:
            doc_ids: list = []
            fps: list = []
            for doc_id, norm in zip(pdf["doc_id"], pdf["norm"]):
                codes = np.frombuffer(norm.encode("utf-8"), np.uint8).astype("int64")
                if len(codes) < WINNOW_K + WINNOW_W - 1:
                    continue
                g = (sliding_window_view(codes, WINNOW_K) @ pw) % WINNOW_M
                sel = np.unique(sliding_window_view(g, WINNOW_W).min(axis=1))
                doc_ids.extend([doc_id] * len(sel))
                fps.extend(sel.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "fingerprint": pd.Series(fps, dtype="int64"),
                }
            )

    # The documents fixture is one parquet row group -> a 1-task scan,
    # so the per-doc rolling-hash kernel (K*len multiplies per doc)
    # ran serially (r12, VERDICT r11 #5; measured: the winnow map is
    # one task while 31 cores idle). Spread docs across the cluster
    # before the heavy map -- exactly the q_mattr_lexical_diversity
    # fix (guide section 2.5 input skew: repartition right after the
    # read when the source cannot be split).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") >= WINNOW_K + WINNOW_W - 1)
        .mapInPandas(winnow, "doc_id long, fingerprint long")
        .orderBy("doc_id", "fingerprint")
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 highest-scoring terms per document.

    tf = term count in doc; idf = ln(N / df) with df = docs containing
    the term. Plan: one explode -> per-(doc,term) counts (shuffle on
    doc_id+term) -> df counts (shuffle on term) -> join -> rank window.
    All exact integer counts + deterministic ln/multiply, so the oracle
    matches bit-for-bit.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dimension, computed once
    terms = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_counts, "term")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rnk").cast("long").alias("rnk"))
        .orderBy("doc_id", "rnk")
    )


def q_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (the KenLM-filter stand-in used by
    CCNet/RedPajama-style curation): train a unigram model on the corpus
    itself (p(t) = corpus_count(t) / total_tokens), then score each
    document by mean negative log-probability and perplexity.

    Two-pass plan: explode -> per-(doc, term) counts (one shuffle) ->
    term frequencies as a second aggregation over the SAME shuffled data
    (partial-agg friendly) -> join back on term -> per-doc aggregate.
    The 1-row total is broadcast. At 100 TB the vocabulary table is
    millions of rows (bounded by distinct tokens, not corpus size), so
    AQE turns the term join into a broadcast join; nothing collects to
    the driver.

    Determinism contract with the oracle: the per-term contribution
    ``tf * ln(total/cnt)`` is rounded to 9 dp and summed as
    DECIMAL(28,9) -- exact, order-independent addition in both engines
    (the same trick q_corr_purchase_click uses for its moments) -- so
    the cross-row double-sum never depends on partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    freq = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total_tokens"))
    contrib = (
        tf.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("total_tokens").cast("double") / F.col("cnt")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("c"),
        )
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("c").alias("s"), F.sum("tf").alias("n_tokens")
    )
    avg = F.col("s").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(avg, 6).alias("avg_neg_logp"),
        F.round(F.exp(avg), 6).alias("ppl"),
    ).orderBy("doc_id")


def q_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity scoring -- the order-2 upgrade of
    ``q_perplexity_unigram`` (KenLM-filter stand-in): train add-one-
    smoothed bigram conditionals on the corpus itself,
    p(cur|prev) = (c2(prev,cur) + 1) / (c1(prev) + V), then score each
    document by mean negative log-probability over its bigram
    occurrences. Documents shorter than two tokens have no bigrams and
    drop out (mirrored in the oracle).

    Plan: bigrams via aligned array slices zipped into structs (no
    per-index element_at lambdas), ONE explode; per-(doc,prev,cur)
    counts shuffle once; corpus c2/c1 are second-stage aggregations of
    the same shuffled data; V (corpus vocabulary) is a 1-row broadcast.
    The model join is vocabulary-sized, not corpus-sized -- AQE
    broadcasts it at 100 TB. Determinism: contributions rounded to 9 dp
    and summed as DECIMAL(28,9), the unigram contract."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _adjacent_pairs("prev", "cur")
    bigrams = docs.select("doc_id", F.explode(bg).alias("b")).select(
        "doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur")
    )
    tf2 = bigrams.groupBy("doc_id", "prev", "cur").agg(
        F.count(F.lit(1)).alias("tf2")
    )
    c2 = tf2.groupBy("prev", "cur").agg(F.sum("tf2").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab = docs.select(F.explode(_tokens()).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    contrib = (
        tf2.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "tf2",
            F.round(
                F.col("tf2")
                * F.log(
                    (F.col("c1") + F.col("v")).cast("double") / (F.col("c2") + 1)
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("c"),
        )
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("c").alias("s"), F.sum("tf2").alias("n_bigrams")
    )
    avg = F.col("s").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(avg, 6).alias("avg_neg_logp"),
        F.round(F.exp(avg), 6).alias("ppl"),
    ).orderBy("doc_id")


PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation extraction: the
    top-``PMI_TOP_K`` adjacent token pairs by PMI with support >=
    ``PMI_MIN_COUNT`` -- the classic phrase-detection statistic
    (word2vec-era phrase merging, tokenizer multi-word-unit
    candidates). PMI = ln(p(a,b) / (p(a) p(b))) with p(a,b) over the
    corpus's adjacent-pair occurrences and p(t) over token occurrences.

    Scale shape: one explode for unigram counts, one slice-zip explode
    for pair counts (both map-side-combined single shuffles over
    vocabulary-bounded key spaces), two broadcast-size total rows, one
    vocabulary-sized join. Counts are exact integers; the PMI double
    is computed with an expression shape mirrored exactly in the
    oracle, then rounded to 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    uni = (
        docs.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u_tot = uni.agg(F.sum("c").alias("u"))
    bg = _adjacent_pairs("a", "b")
    pair = (
        docs.select(F.explode(bg).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= PMI_MIN_COUNT)
    )
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
    p_tot = docs.select(n_pairs.alias("n")).agg(F.sum("n").alias("p"))
    ca = uni.select(F.col("t").alias("a"), F.col("c").alias("ca"))
    cb = uni.select(F.col("t").alias("b"), F.col("c").alias("cb"))
    pmi = F.log(
        (F.col("c2").cast("double") / F.col("p"))
        / (
            (F.col("ca").cast("double") / F.col("u"))
            * (F.col("cb").cast("double") / F.col("u"))
        )
    )
    scored = (
        pair.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(u_tot))
        .crossJoin(F.broadcast(p_tot))
        .select(
            "a",
            "b",
            "c2",
            "ca",
            "cb",
            F.round(pmi, 6).alias("pmi"),
        )
    )
    from pyspark.sql.window import Window

    top = scored.orderBy(F.col("pmi").desc(), "a", "b").limit(PMI_TOP_K)
    w = Window.orderBy(F.col("pmi").desc(), "a", "b")
    return top.select(
        "a", "b", "c2", "ca", "cb", "pmi",
        F.row_number().over(w).cast("long").alias("rank"),
    ).orderBy("rank")


TEXT_ORACLES_PMI = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    uni AS (
      SELECT tok AS t, count(*) AS c
      FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
    u_tot AS (SELECT sum(c) AS u FROM uni),
    pair AS (
      SELECT a, b, count(*) AS c2 FROM (
        SELECT toks[i] AS a, toks[i + 1] AS b
        FROM t, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS g(i))
      GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}),
    p_tot AS (
      SELECT sum(greatest(len(toks) - 1, 0)) AS p FROM t),
    scored AS (
      SELECT a, b, c2, ua.c AS ca, ub.c AS cb,
             round(ln((CAST(c2 AS DOUBLE) / p) /
                      ((CAST(ua.c AS DOUBLE) / u) *
                       (CAST(ub.c AS DOUBLE) / u))), 6) AS pmi
      FROM pair
      JOIN uni ua ON ua.t = a
      JOIN uni ub ON ub.t = b
      CROSS JOIN u_tot CROSS JOIN p_tot),
    ranked AS (
      SELECT a, b, c2, ca, cb, pmi,
             row_number() OVER (ORDER BY pmi DESC, a, b) AS rank
      FROM scored)
    SELECT a, b, CAST(c2 AS BIGINT) AS c2, CAST(ca AS BIGINT) AS ca,
           CAST(cb AS BIGINT) AS cb, pmi, rank
    FROM ranked WHERE rank <= {PMI_TOP_K} ORDER BY rank
"""


def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap: per-source distinct vocabulary
    sizes and pairwise Jaccard similarity between source vocabularies --
    the corpus-mixing diagnostic that flags near-identical crawls before
    they are weighted as independent sources.

    Plan: explode -> distinct (source, term) -- one shuffle keyed by
    term+source -- then a self-join on term whose fan-out is bounded by
    sources^2 per term (each term appears at most once per source after
    the distinct), never by corpus size. Vocabulary sizes are a tiny
    per-source aggregate, broadcast onto the pair counts. Sources with
    zero shared terms produce no pair row (inner-join contract, same in
    the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select("source", F.explode(_tokens()).alias("term")).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vocab_size"))
    inter = (
        vocab.alias("a")
        .join(vocab.alias("b"), "term")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes_a = sizes.select(
        F.col("source").alias("source_a"), F.col("vocab_size").alias("vocab_a")
    )
    sizes_b = sizes.select(
        F.col("source").alias("source_b"), F.col("vocab_size").alias("vocab_b")
    )
    union = F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
    return (
        inter.join(F.broadcast(sizes_a), "source_a")
        .join(F.broadcast(sizes_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.round(F.col("n_common").cast("double") / union, 6).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def q_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    section A1.1 'repetitious text'): documents dominated by repeated
    tokens / n-grams are low-quality for LM training and are filtered
    before mixing.

    Signals (all deterministic, token-level; tokens are the shared
    ``split(trim(text), '\\s+')`` contract):
      - dup_token_frac:   1 - distinct_tokens / n_tokens
      - top_2gram:        most frequent word 2-gram (ties -> smallest)
      - top_2gram_frac:   its occurrence count / (n_tokens - 1) bigram slots
      - dup_3gram_frac:   fraction of 3-gram slots whose 3-gram occurs
                          more than once in the document
    n-gram columns are NULL when the document is too short to form one.

    Scale shape: the per-document counting runs as an Arrow-batched
    ``mapInPandas`` hash-count (collections.Counter per row) -- a pure
    map over the scan, NO shuffle of the token stream, O(n_tokens) per
    document. The expression-only alternative (nested higher-order
    filters) is interpreted-HOF-bound and quadratic per row (measured
    236 s vs ~1 s at sf0.01 -- the winnowing lesson again); the
    explode+groupBy alternative shuffles ~corpus size. The UDF emits
    only INTEGER counts and the (string) top bigram; every fraction is
    computed JVM-side with the same round(x, 6) the DuckDB oracle uses,
    so no Python float arithmetic touches the output."""
    import pandas as pd

    def signals(batches):
        from collections import Counter

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_tokens": [],
                "nd": [],
                "top_2gram": [],
                "top_c": [],
                "dup3_slots": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # match split(trim(text), '\s+') EXACTLY: Java \s is
                # the ASCII class (str.split() would also split on
                # U+00A0 etc. and diverge from the oracle), Spark trim
                # strips ASCII spaces, NULL flows through as empty,
                # and empty text yields [''] like the JVM split
                toks = _ascii_split(text) or [""]
                n = len(toks)
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["nd"].append(len(set(toks)))
                if n >= 2:
                    bg = Counter(
                        toks[i] + " " + toks[i + 1] for i in range(n - 1)
                    )
                    # (max count, then lexicographically smallest gram)
                    c, g = min((-c, g) for g, c in bg.items())
                    out["top_2gram"].append(g)
                    out["top_c"].append(-c)
                else:
                    out["top_2gram"].append(None)
                    out["top_c"].append(None)
                if n >= 3:
                    tg = Counter(
                        " ".join(toks[i : i + 3]) for i in range(n - 2)
                    )
                    out["dup3_slots"].append(
                        sum(c for c in tg.values() if c > 1)
                    )
                else:
                    out["dup3_slots"].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
                    "nd": pd.Series(out["nd"], dtype="int64"),
                    "top_2gram": pd.Series(out["top_2gram"], dtype="object"),
                    "top_c": pd.Series(out["top_c"], dtype="Int64"),
                    "dup3_slots": pd.Series(out["dup3_slots"], dtype="Int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select("doc_id", "text").mapInPandas(
        signals,
        "doc_id long, n_tokens long, nd long, top_2gram string, "
        "top_c long, dup3_slots long",
    )
    n = F.col("n_tokens")
    return counted.select(
        "doc_id",
        "n_tokens",
        F.round(F.lit(1.0) - F.col("nd").cast("double") / n, 6).alias(
            "dup_token_frac"
        ),
        "top_2gram",
        F.round(F.col("top_c").cast("double") / (n - 1), 6).alias(
            "top_2gram_frac"
        ),
        F.round(F.col("dup3_slots").cast("double") / (n - 2), 6).alias(
            "dup_3gram_frac"
        ),
    ).orderBy("doc_id")


def _stop_in_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)



def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health summary: document/token totals, global
    vocabulary size, exact mean document length, longest document, and
    the short-document fraction (< 50 tokens) -- the first dashboard a
    corpus build publishes.

    Scale shape: one scan computes per-doc token counts map-side; the
    vocabulary size is a two-phase distinct on the exploded token
    (partial dedup before the shuffle); everything else folds into one
    global aggregate of exact integers, divided as double at the end."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens()).cast("long")
    per_doc = docs.select("doc_id", n_tok.alias("n"))
    vocab = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("n_tokens"),
        F.max("n").alias("max_doc_tokens"),
        F.sum(F.when(F.col("n") < 50, 1).otherwise(0)).cast("long").alias("n_short"),
    )
    return agg.crossJoin(vocab).select(
        "n_docs",
        "n_tokens",
        "vocab_size",
        (F.col("n_tokens").cast("double") / F.col("n_docs")).alias("mean_doc_tokens"),
        "max_doc_tokens",
        (F.col("n_short").cast("double") / F.col("n_docs")).alias("short_doc_frac"),
    )



BPE_TOP_K = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training primitive: corpus-wide counts of adjacent
    character pairs within words, top-``BPE_TOP_K`` by frequency -- the
    statistic one round of byte-pair-encoding vocabulary induction
    merges on (Sennrich et al. 2016). A full trainer iterates
    count -> merge; the count step is the distributed-scale part (the
    merge table is vocabulary-sized driver metadata), so it is the
    operator the engine owes.

    Scale shape: explode words map-side, expand each word into its
    length-1 adjacent pairs with a codegen'd ``transform(sequence)``
    expression (no UDF), then ONE map-side-combined shuffle keyed by
    pair. The key space is bounded by alphabet^2 (tiny), so the final
    aggregate is trivially broadcast-sized; top-k plans as
    TakeOrderedAndProject. Exact integer counts -> bit-portable oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    from pyspark.sql.window import Window

    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_occurrences"))
    # TakeOrderedAndProject keeps only the top rows; the single-partition
    # rank window then runs over BPE_TOP_K rows, not the vocabulary
    top = counted.orderBy(F.col("n_occurrences").desc(), "pair").limit(BPE_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), "pair")
    return top.select(
        "pair",
        "n_occurrences",
        F.row_number().over(w).cast("long").alias("rank"),
    ).orderBy("rank")


#: Merge rounds for the iterative BPE trainer (fixed so the oracle can
#: unroll the exact computation, like PAGERANK_ITERS / LPA_ROUNDS).
BPE_MERGES = 4


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE vocabulary induction (Sennrich et al. 2016), the
    full trainer built on the q_bpe_pair_counts primitive: BPE_MERGES
    greedy rounds of count-adjacent-symbol-pairs -> merge the most
    frequent pair corpus-wide (ties -> lexicographically smallest).
    Output is the merge table: (round, left_sym, right_sym, merged,
    n_occurrences) -- exactly what a tokenizer ships.

    Scale shape: training runs over the WORD VOCABULARY with counts
    (one corpus-sized aggregate up front; every round then touches
    vocab-sized data only, the standard fast-BPE formulation). Per
    round: one map-side pair expansion + one map-side-combined count
    shuffle + a LIMIT-1 argmax; the single merged pair (one row) is
    the only thing the driver sees -- model metadata, same bound as
    the k-means centroid collects. The merge itself is a codegen'd
    left-to-right array fold (greedy leftmost non-overlapping, the
    BPE contract); the vocab frame is lineage-cut per round so the
    plan stays flat. Words restricted to ^[a-z]+$ keep the symbol
    alphabet printable for the oracle's wrapped-string encoding
    (DuckDB has no array fold; '<a><b>' -> replace '<a><b>' with
    '<ab>' is non-overlapping-leftmost too, so both engines compute
    the identical merge)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens()).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.split(F.col("w"), "").alias("syms"), "cnt")
        .transform(cut_lineage)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, BPE_MERGES + 1):
        m = F.greatest(F.size("syms") - 1, F.lit(0))
        pair = F.zip_with(
            F.slice("syms", 1, m),
            F.slice("syms", 2, m),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        best = (
            vocab.select(F.explode(pair).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((rnd, a, b, a + b, n))
        la, lb, lm = F.lit(a), F.lit(b), F.lit(a + b)
        vocab = vocab.select(
            F.aggregate(
                F.col("syms"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (x == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(lm)
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
            "cnt",
        ).transform(cut_lineage)
    return spark.createDataFrame(
        merges,
        "round INT, left_sym STRING, right_sym STRING, merged STRING, "
        "n_occurrences BIGINT",
    ).orderBy("round")


def q_tokenize_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION -- the consumer side of
    q_bpe_train_merges: re-train the BPE_MERGES merge table (the
    bounded-metadata step), then apply the merges in rank order to
    every document and report per-document BPE token counts. Closes
    the tokenize loop a data pipeline actually runs: train once,
    encode the whole corpus, budget by token count.

    Encoding uses the wrapped-string representation on BOTH engines:
    each char becomes ``<c>``, each merge is one literal ``replace``
    of ``<a><b>`` with ``<ab>`` -- non-overlapping leftmost, the BPE
    greedy contract, applied in rank order (lower-rank merges first).
    String replace is whole-stage-codegen'd; the array-fold
    formulation measured 30 s vs ~3 s at sf0.001 (interpreted HOF per
    char -- the winnowing lesson again) and was rejected.
    Out-of-alphabet words count 1 symbol per character; whitespace
    tokens delimit words."""
    # the merge table is model metadata (BPE_MERGES rows) -- collected
    # once, folded into the plan as literals, same bound as centroids
    merges = [
        (r["left_sym"], r["right_sym"], r["merged"])
        for r in q_bpe_train_merges(spark, sf_dir).collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens()).alias("w"))
    ws = F.regexp_replace(F.col("w"), "(.)", "<$1>")
    for a, b, _m in merges:
        ws = F.replace(ws, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    n_syms = F.size(F.split(F.substring(ws, 2, F.length(ws) - 2), "><"))
    per_word = words.select("doc_id", n_syms.alias("n_syms"))
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .orderBy("doc_id")
    )


def _bpe_round_sql(i: int) -> str:
    """One unrolled BPE round over the wrapped-string word vocabulary:
    pair counts -> LIMIT-1 argmax -> non-overlapping leftmost
    replace."""
    return f"""
        p{i} AS (
          SELECT pr[1] AS a, pr[2] AS b, sum(cnt) AS n
          FROM (
            SELECT cnt, unnest(list_transform(
                     generate_series(1, len(sy) - 1),
                     j -> [sy[j], sy[j + 1]])) AS pr
            FROM (SELECT cnt,
                         string_split(substr(ws, 2, length(ws) - 2), '><')
                           AS sy
                  FROM w{i - 1}))
          GROUP BY 1, 2),
        m{i} AS (SELECT a, b, n FROM p{i} ORDER BY n DESC, a, b LIMIT 1),
        w{i} AS (
          SELECT replace(ws,
                         '<' || (SELECT a FROM m{i}) || '><'
                             || (SELECT b FROM m{i}) || '>',
                         '<' || (SELECT a FROM m{i})
                             || (SELECT b FROM m{i}) || '>') AS ws,
                 cnt
          FROM w{i - 1})"""


TEXT_ORACLES: dict[str, str] = {
    "q_token_stats": """
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(string_split_regex(trim(regexp_replace(text, '([a-z])([A-Z0-9])', '\\1 \\2', 'g')), '\\s+')) AS n_subtokens,
               length(text) AS text_len
        FROM documents ORDER BY doc_id
    """,
    "q_quality_score": f"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\\s+') AS toks,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct
          FROM documents),
        s AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ({_stop_in_list_sql()}))) AS n_stop,
                 n_chars, n_punct
          FROM t)
        SELECT doc_id, n_tokens,
               round(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
               round(n_punct * 1.0 / n_chars, 6) AS punct_ratio,
               round(0.5 * least(1.0, n_tokens / 50.0)
                   + 0.4 * least(1.0, (n_stop * 1.0 / n_tokens) * 3)
                   + 0.1 * (1.0 - n_punct * 1.0 / n_chars), 6) AS quality_score
        FROM s ORDER BY doc_id
    """,
    "q_lang_id": f"""
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x IN ({_stop_in_list_sql()}))) AS n_markers,
               CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                         x -> x IN ({_stop_in_list_sql()}))) > 0
                    THEN 'en' ELSE 'und' END AS pred_lang
        FROM documents ORDER BY doc_id
    """,
    "q_fingerprint": """
        WITH f AS (
          SELECT doc_id,
                 md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
          FROM documents)
        SELECT doc_id, fingerprint,
               ascii(substr(fingerprint, 1, 1)) % 16 AS shard
        FROM f ORDER BY doc_id
    """,
}

_PW_SQL = "[" + ", ".join(str(p) for p in WINNOW_PW) + "]"

TEXT_ORACLES["q_fingerprint_winnow"] = f"""
    WITH d AS (SELECT doc_id,
                      lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
               FROM documents),
    f AS (SELECT doc_id, norm FROM d
          WHERE length(norm) >= {WINNOW_K + WINNOW_W - 1}),
    c AS (SELECT doc_id,
                 list_transform(string_split(norm, ''), ch -> ascii(ch)) AS codes
          FROM f),
    g AS (SELECT doc_id,
                 list_transform(generate_series(1, len(codes) - {WINNOW_K - 1}), i ->
                   list_sum(list_transform(generate_series(1, {WINNOW_K}),
                     p -> CAST(codes[i + p - 1] AS BIGINT) * ({_PW_SQL})[p])) % {WINNOW_M}) AS gh
          FROM c),
    w AS (SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(gh) - {WINNOW_W - 1}), j ->
                   list_min(gh[j : j + {WINNOW_W - 1}]))) AS fps
          FROM g)
    SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint
    FROM w ORDER BY doc_id, fingerprint
"""

TEXT_ORACLES["q_tfidf_top_terms"] = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term AS term, tf, df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, df, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rnk
"""

TEXT_ORACLES["q_perplexity_unigram"] = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    freq AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
    tot AS (SELECT sum(cnt) AS total_tokens FROM freq),
    contrib AS (
      SELECT doc_id, tf,
             CAST(round(tf * ln(CAST(total_tokens AS DOUBLE) / cnt), 9)
                  AS DECIMAL(28,9)) AS c
      FROM tf JOIN freq USING (term) CROSS JOIN tot),
    agg AS (SELECT doc_id, sum(c) AS s, sum(tf) AS n_tokens
            FROM contrib GROUP BY 1)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(s AS DOUBLE) / n_tokens, 6) AS avg_neg_logp,
           round(exp(CAST(s AS DOUBLE) / n_tokens), 6) AS ppl
    FROM agg ORDER BY doc_id
"""

TEXT_ORACLES["q_perplexity_bigram"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    bigrams AS (
      SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur
      FROM t, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)),
    tf2 AS (SELECT doc_id, prev, cur, count(*) AS tf2
            FROM bigrams GROUP BY 1, 2, 3),
    c2 AS (SELECT prev, cur, sum(tf2) AS c2 FROM tf2 GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT term) AS v
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)),
    contrib AS (
      SELECT doc_id, tf2,
             CAST(round(tf2 * ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)), 9)
                  AS DECIMAL(28,9)) AS c
      FROM tf2 JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
      CROSS JOIN vocab),
    agg AS (SELECT doc_id, sum(c) AS s, sum(tf2) AS n_bigrams
            FROM contrib GROUP BY 1)
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(CAST(s AS DOUBLE) / n_bigrams, 6) AS avg_neg_logp,
           round(exp(CAST(s AS DOUBLE) / n_bigrams), 6) AS ppl
    FROM agg ORDER BY doc_id
"""

TEXT_ORACLES["q_source_vocab_overlap"] = """
    WITH exploded AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    vocab AS (SELECT DISTINCT source, term FROM exploded),
    sizes AS (SELECT source, count(*) AS vocab_size FROM vocab GROUP BY 1),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b,
           sa.vocab_size AS vocab_a, sb.vocab_size AS vocab_b, n_common,
           round(n_common * 1.0 / (sa.vocab_size + sb.vocab_size - n_common), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY source_a, source_b
"""

TEXT_ORACLES["q_corpus_stats"] = """
    WITH per_doc AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
      FROM documents),
    vocab AS (
      SELECT count(DISTINCT tok) AS vocab_size
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents)),
    agg AS (
      SELECT count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             max(n) AS max_doc_tokens,
             CAST(sum(CASE WHEN n < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
      FROM per_doc)
    SELECT n_docs, n_tokens, vocab_size,
           CAST(n_tokens AS DOUBLE) / n_docs AS mean_doc_tokens,
           max_doc_tokens,
           CAST(n_short AS DOUBLE) / n_docs AS short_doc_frac
    FROM agg, vocab
"""

TEXT_ORACLES["q_repetition_filters"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd
      FROM t),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS g
      FROM t WHERE len(toks) >= 2),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, g, c
      FROM (SELECT doc_id, g, c,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, g) AS rn
            FROM bgc)
      WHERE rn = 1),
    tg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
               AS g
      FROM t WHERE len(toks) >= 3),
    tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
    dup3 AS (
      SELECT doc_id,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_slots
      FROM tgc GROUP BY 1)
    SELECT base.doc_id AS doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           round(1.0 - nd * 1.0 / n, 6) AS dup_token_frac,
           top.g AS top_2gram,
           round(top.c * 1.0 / (n - 1), 6) AS top_2gram_frac,
           round(dup3.dup_slots * 1.0 / (n - 2), 6) AS dup_3gram_frac
    FROM base
    LEFT JOIN top ON base.doc_id = top.doc_id
    LEFT JOIN dup3 ON base.doc_id = dup3.doc_id
    ORDER BY doc_id
"""

TEXT_ORACLES["q_bpe_pair_counts"] = f"""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    pairs AS (
      SELECT substr(w, i, 2) AS pair
      FROM (SELECT w FROM words WHERE length(w) >= 2),
           unnest(generate_series(1, length(w) - 1)) AS t(i)),
    agg AS (SELECT pair, count(*) AS n_occurrences FROM pairs GROUP BY 1),
    ranked AS (
      SELECT pair, n_occurrences,
             row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank
      FROM agg)
    SELECT pair, n_occurrences, rank
    FROM ranked WHERE rank <= {BPE_TOP_K} ORDER BY rank
"""

TEXT_ORACLES["q_pmi_collocations"] = TEXT_ORACLES_PMI

def _bpe_apply_round_sql(i: int) -> str:
    """Apply merge ``i`` (from the training CTE m{i}) to the wrapped
    document words."""
    return f"""
        enc{i} AS (
          SELECT doc_id,
                 replace(ws,
                         '<' || (SELECT a FROM m{i}) || '><'
                             || (SELECT b FROM m{i}) || '>',
                         '<' || (SELECT a FROM m{i})
                             || (SELECT b FROM m{i}) || '>') AS ws
          FROM enc{i - 1})"""


TEXT_ORACLES["q_tokenize_bpe_apply"] = f"""
    WITH w0 AS (
      SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS ws, cnt
      FROM (SELECT w, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
                  FROM documents)
            WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
            GROUP BY w)),
    {",".join(_bpe_round_sql(i) for i in range(1, BPE_MERGES + 1))},
    enc0 AS (
      SELECT doc_id, regexp_replace(w, '(.)', '<\\1>', 'g') AS ws
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)),
    {",".join(_bpe_apply_round_sql(i) for i in range(1, BPE_MERGES + 1))}
    SELECT doc_id,
           CAST(sum(len(string_split(substr(ws, 2, length(ws) - 2), '><')))
             AS BIGINT) AS n_bpe_tokens,
           CAST(count(*) AS BIGINT) AS n_words
    FROM enc{BPE_MERGES}
    GROUP BY doc_id ORDER BY doc_id
"""

TEXT_ORACLES["q_bpe_train_merges"] = f"""
    WITH w0 AS (
      SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS ws, cnt
      FROM (SELECT w, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
                  FROM documents)
            WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
            GROUP BY w)),
    {",".join(_bpe_round_sql(i) for i in range(1, BPE_MERGES + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({i} AS INTEGER) AS round, a AS left_sym, "
          f"b AS right_sym, a || b AS merged, "
          f"CAST(n AS BIGINT) AS n_occurrences FROM m{i}"
          for i in range(1, BPE_MERGES + 1)
      )})
    ORDER BY round
"""

TEXT_ORACLES["q_oov_rate"] = f"""
    WITH terms AS (
      SELECT source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    freq AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
    vocab AS (
      SELECT term FROM freq
      ORDER BY cnt DESC, term LIMIT {OOV_VOCAB_N}),
    joined AS (
      SELECT source,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM terms t LEFT JOIN vocab v ON t.term = v.term)
    SELECT source, count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
    FROM joined GROUP BY source
    ORDER BY source
"""

#: Heavy-hitter threshold: a term is a heavy hitter when
#: count * HH_K > N_total (share > 1/HH_K).
HH_K = 64
#: Per-partition Misra-Gries counter budget. Correctness needs only
#: MG_CAPACITY + 1 >= HH_K (see q_heavy_hitters docstring); 4x headroom
#: keeps the candidate list short without growing executor memory.
MG_CAPACITY = 256


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT frequent-terms (share > 1/HH_K) via bounded-memory
    map-side candidate generation + exact rescore — the two-pass
    Misra-Gries pattern for heavy hitters over a key space too large to
    hash-aggregate in full.

    Why not plain groupBy+HAVING: that shuffles one partial count per
    DISTINCT term per mapper. At 100 TB of text the distinct-term
    relation is billions of rows of shuffle for an answer of at most
    HH_K rows. Here stage 1 streams each input partition through a
    Misra-Gries summary of MG_CAPACITY counters (Arrow-batched pandas,
    vectorized value_counts + the summary-merge trim: subtract the
    (CAP+1)-th largest count, drop non-positives). MG guarantees local
    undercount <= n_p/(CAP+1), so any term with local share > 1/HH_K
    survives whenever CAP+1 >= HH_K; every GLOBAL heavy hitter has
    local share > 1/HH_K in at least one partition (averages), hence
    the union of partition summaries is a guaranteed SUPERSET of the
    true heavy hitters — at most CAP rows per partition cross the wire.
    Stage 2 rescores candidates exactly: broadcast the candidate list,
    semi-join the token stream, aggregate real counts, filter with
    integer arithmetic (cnt * HH_K > N). Result is EXACT, which is why
    the brute-force SQL oracle matches it bit-for-bit.

    Reference scope: ClickHouse's topK() returns approximate counts
    (docs/en/sql-reference/aggregate-functions/reference/topk.md); this
    operator upgrades the contract to exact values at the same
    bounded-memory scale shape."""
    import pandas as pd  # noqa: PLC0415 -- executor-side import

    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(_tokens()).alias("term"))

    def mg_candidates(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > MG_CAPACITY:
                s = pd.Series(counters)
                cut = s.nlargest(MG_CAPACITY + 1).iloc[-1]
                s = s - cut
                counters = s[s > 0].to_dict()
        yield pd.DataFrame({"term": list(counters)})

    candidates = terms.mapInPandas(mg_candidates, "term string").distinct()
    total = terms.agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        terms.join(broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(broadcast(total))
        .filter(F.col("cnt") * HH_K > F.col("n_total"))
        .select(
            "term",
            "cnt",
            (F.col("cnt") / F.col("n_total")).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), "term")
    )


TEXT_ORACLES["q_heavy_hitters"] = f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM tok)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt,
           COUNT(*) / (SELECT n_total FROM tot) AS share
    FROM tok GROUP BY term
    HAVING COUNT(*) * {HH_K} > (SELECT n_total FROM tot)
    ORDER BY cnt DESC, term
"""


TEXT_QUERIES = {
    "q_corpus_stats": q_corpus_stats,
    "q_heavy_hitters": q_heavy_hitters,
    "q_oov_rate": q_oov_rate,
    "q_bpe_pair_counts": q_bpe_pair_counts,
    "q_bpe_train_merges": q_bpe_train_merges,
    "q_tokenize_bpe_apply": q_tokenize_bpe_apply,
    "q_pmi_collocations": q_pmi_collocations,
    "q_repetition_filters": q_repetition_filters,
    "q_token_stats": q_token_stats,
    "q_perplexity_unigram": q_perplexity_unigram,
    "q_perplexity_bigram": q_perplexity_bigram,
    "q_source_vocab_overlap": q_source_vocab_overlap,
    "q_quality_score": q_quality_score,
    "q_lang_id": q_lang_id,
    "q_fingerprint": q_fingerprint,
    "q_fingerprint_winnow": q_fingerprint_winnow,
    "q_tfidf_top_terms": q_tfidf_top_terms,
}


def q_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution Shannon entropy (bits) plus the
    normalized form (entropy / log2 of the vocab size) -- the lexical-
    diversity audit of a training mix: a source whose entropy collapses
    is template/boilerplate-heavy, one near 1.0 normalized is
    vocabulary-rich. Complements q_source_vocab_overlap (BETWEEN
    sources) with a WITHIN-source diversity number.

    Exactness: term counts are exact integers from one
    explode+groupBy; each -p*log2(p) contribution evaluates as a
    fixed-shape double expression on exact-integer-derived doubles
    and folds through round(.,9)-as-DECIMAL(28,9), so the sum is
    order-independent and bit-equal in both engines.

    Scale shape: the corpus-sized stage is the (source, term) count
    (ONE shuffle, map-side combined); entropy folds over that
    compacted frame; the output is one row per source."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    tc = terms.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    totals = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    p = F.col("c").cast("double") / F.col("n_tokens").cast("double")
    contrib = tc.join(totals, "source").select(
        "source",
        "n_tokens",
        "n_terms",
        F.round(-p * F.log2(p), 9).cast("decimal(28,9)").alias("h"),
    )
    ent = F.sum("h").cast("double")
    return (
        contrib.groupBy("source")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.max("n_terms").alias("n_terms"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(
                ent / F.log2(F.max("n_terms").cast("double")), 6
            ).alias("entropy_normalized"),
        )
        .orderBy("source")
    )


TEXT_QUERIES["q_entropy_by_source"] = q_entropy_by_source
TEXT_ORACLES["q_entropy_by_source"] = """
    WITH terms AS (
      SELECT source,
             unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents),
    tc AS (SELECT source, t, count(*) AS c FROM terms GROUP BY 1, 2),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_terms
      FROM tc GROUP BY 1),
    contrib AS (
      SELECT tc.source, n_tokens, n_terms,
             CAST(round(-(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                        * log2(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)),
                        9) AS DECIMAL(28,9)) AS h
      FROM tc JOIN totals USING (source))
    SELECT source,
           max(n_tokens) AS n_tokens,
           max(n_terms) AS n_terms,
           round(CAST(sum(h) AS DOUBLE), 6) AS entropy_bits,
           round(CAST(sum(h) AS DOUBLE)
                 / log2(CAST(max(n_terms) AS DOUBLE)), 6)
             AS entropy_normalized
    FROM contrib GROUP BY source ORDER BY source
"""


# ---- Zipf rank-frequency fit ----

#: Number of top-ranked terms the Zipf regression fits over. A fixed
#: head keeps the fit comparable across corpora (the tail of a
#: rank-frequency curve bends below the power law and would bias the
#: slope; fitting the head is the standard convention).
ZIPF_TOP = 100


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of the corpus rank-frequency curve in log-log space --
    ln(count) = intercept + slope * ln(rank) over the ZIPF_TOP most
    frequent terms -- the Zipf's-law diagnostic of corpus health
    (natural language sits near slope -1; template/boilerplate-heavy
    or synthetic corpora bend away, making the slope a cheap
    corpus-quality monitor alongside q_entropy_by_source).

    Exactness: ranks and counts are exact integers (count desc, term
    asc tie-break); each regression term (x, y, x^2, xy, y^2 with
    x = ln(rank), y = ln(cnt)) is rounded to 9 dp and summed as
    DECIMAL(28,9) -- the established order-independent bit-equal
    aggregation -- and slope/intercept/r^2 are fixed-shape double
    expressions over those exact sums, layered CTE-for-CTE.

    Scale shape: term counting is the one corpus-sized pass (map-side
    combined groupBy); the rank step pushes only the grouped_topk
    map-side-pruned head (~batches x ZIPF_TOP rows) into the final
    window; the regression reduces ZIPF_TOP rows to 1."""
    from .topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ranked = grouped_topk(
        counts.withColumn("g", F.lit(1)),
        ["g"],
        [("cnt", False), ("term", True)],
        ZIPF_TOP,
    ).select(F.col("rank").cast("long").alias("rank"), "cnt")
    terms = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("y"),
        F.round(
            F.log(F.col("rank").cast("double")) * F.log(F.col("rank").cast("double")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("xx"),
        F.round(
            F.log(F.col("rank").cast("double")) * F.log(F.col("cnt").cast("double")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("xy"),
        F.round(
            F.log(F.col("cnt").cast("double")) * F.log(F.col("cnt").cast("double")), 9
        )
        .cast("decimal(28,9)")
        .alias("yy"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,9)").alias("sx"),
        F.sum("y").cast("decimal(38,9)").alias("sy"),
        F.sum("xx").cast("decimal(38,9)").alias("sxx"),
        F.sum("xy").cast("decimal(38,9)").alias("sxy"),
        F.sum("yy").cast("decimal(38,9)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    fit = sums.select(
        "n",
        sx.alias("sxd"),
        sy.alias("syd"),
        F.try_divide(nd * sxy - sx * sy, nd * sxx - sx * sx).alias("slope"),
        (nd * sxy - sx * sy).alias("cov_num"),
        (nd * sxx - sx * sx).alias("var_x"),
        (nd * syy - sy * sy).alias("var_y"),
    )
    return fit.select(
        F.col("n").alias("n_terms"),
        F.round("slope", 6).alias("slope"),
        F.round(
            F.try_divide(F.col("syd") - F.col("slope") * F.col("sxd"),
                         F.col("n").cast("double")),
            6,
        ).alias("intercept"),
        F.round(
            F.try_divide(
                F.col("cov_num") * F.col("cov_num"),
                F.col("var_x") * F.col("var_y"),
            ),
            6,
        ).alias("r2"),
    )


TEXT_ORACLES["q_zipf_fit"] = f"""
    WITH counts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)
      WHERE term <> '' GROUP BY term),
    ranked AS (
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT)
               AS rank,
             cnt
      FROM counts
      QUALIFY rank <= {ZIPF_TOP}),
    terms AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
             CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
             CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS xx,
             CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS xy,
             CAST(round(ln(CAST(cnt AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS yy
      FROM ranked),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,9)) AS sx,
             CAST(sum(y) AS DECIMAL(38,9)) AS sy,
             CAST(sum(xx) AS DECIMAL(38,9)) AS sxx,
             CAST(sum(xy) AS DECIMAL(38,9)) AS sxy,
             CAST(sum(yy) AS DECIMAL(38,9)) AS syy
      FROM terms),
    fit AS (
      SELECT n,
             CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_num,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y
      FROM sums)
    SELECT n AS n_terms,
           round(slope, 6) AS slope,
           round((syd - slope * sxd) / nullif(CAST(n AS DOUBLE), 0), 6)
             AS intercept,
           round(cov_num * cov_num / nullif(var_x * var_y, 0), 6) AS r2
    FROM fit
"""

TEXT_QUERIES["q_zipf_fit"] = q_zipf_fit


# ---- Count-Min sketch term counts with an exact oracle ----

#: Count-Min geometry: d independent hash rows x w buckets. With
#: w = 512 the additive overestimate is bounded by e*N/w in
#: expectation per row and the min over d = 4 rows makes the bound
#: hold with probability 1 - e^-4 -- the textbook CMS guarantee. The
#: sketch is d*w = 2048 cells regardless of vocabulary size.
CMS_D = 4
CMS_W = 512

#: Audited head size (the terms whose estimates are reported).
CMS_TOP = 20


def _cms_hex32(h):
    """First 8 hex digits of an md5-hex column as an unsigned 32-bit
    long (the shared cross-engine uniform-hash decode, local copy;
    takes the ALREADY-HASHED hex column -- hashing here too would
    double-md5 and silently diverge from the oracle's single md5).
    conv() decode, bit-identical to the ladder twin in the SQL oracle
    (see reshape._hex32)."""
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _cms_hex32_sql(expr: str) -> str:
    out = "CAST(0 AS BIGINT)"
    for j in range(1, 9):
        a = f"ascii(substr({expr}, {j}, 1))"
        d = f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"
        out = f"({out} * 16 + {d})"
    return out


def _cms_bucket(r: int):
    return _cms_hex32(
        F.md5(F.concat(F.lit(f"cms{r}|"), F.col("term")))
    ) % F.lit(CMS_W)


def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of the corpus term-frequency table, audited
    against the exact counts: build the d x w counter grid (the
    mergeable fixed-size summary a streaming frequency monitor keeps),
    then report, for the CMS_TOP most frequent terms, the exact count,
    the sketch estimate min_r cell[r][h_r(term)], and the overestimate
    (always >= 0 -- CMS errors are one-sided). Like q_distinct_kmv,
    the estimate is a PURE DETERMINISTIC function of the data given
    the fixed md5 row hashes, so this approximate operator has an
    EXACT cross-engine oracle; the exact column rides along as the
    sketch's own error audit.

    Exactness: all arithmetic is integer -- bucket ids are the md5
    hex32 decode mod w, cells are exact BIGINT sums, the estimate is
    an integer min. Nothing floats.

    Scale shape: term counting is the one corpus-sized pass (map-side
    combined groupBy; increment-per-token and sum-per-term produce the
    same grid because CMS cells are sums). The grid itself is d*w =
    2048 rows REGARDLESS of corpus size -- it broadcasts to the probe
    join for free -- and the audited head is grouped_topk map-side
    pruned. At 100 TB the sketch aggregation is the only full pass;
    the per-term exact column restricts to the top-K head, not the
    vocabulary.

    No reference analog (extension family: streaming frequency
    summaries alongside q_heavy_hitters' Misra-Gries, whose estimate
    is a LOWER bound -- the two sketches bracket the truth)."""
    from .topk import grouped_topk

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens()).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("r"),
                _cms_bucket(r).alias("bucket"),
            )
            for r in range(CMS_D)
        ]
    )
    cells = (
        counts.select(F.col("cnt"), F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    head = grouped_topk(
        counts.withColumn("g", F.lit(1)),
        ["g"],
        [("cnt", False), ("term", True)],
        CMS_TOP,
    ).select("term", "cnt")
    probes = head.select("term", "cnt", F.explode(rows).alias("rb")).select(
        "term",
        "cnt",
        F.col("rb.r").alias("r"),
        F.col("rb.bucket").alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("term", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "term",
        F.col("cnt").alias("exact_cnt"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("cnt")).cast("long").alias("overestimate"),
    ).orderBy(F.col("exact_cnt").desc(), "term")


def _cms_oracle() -> str:
    bucket = (
        _cms_hex32_sql("md5('cms' || CAST(r AS VARCHAR) || '|' || term)")
        + f" % {CMS_W}"
    )
    return f"""
    WITH counts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)
      WHERE term <> '' GROUP BY term),
    rows_ AS (SELECT unnest(range({CMS_D})) AS r),
    cells AS (
      SELECT r, {bucket} AS bucket, CAST(sum(cnt) AS BIGINT) AS cell
      FROM counts CROSS JOIN rows_ GROUP BY 1, 2),
    head AS (
      SELECT term, cnt,
             row_number() OVER (ORDER BY cnt DESC, term) AS rnk
      FROM counts QUALIFY rnk <= {CMS_TOP}),
    probes AS (
      SELECT term, cnt, r, {bucket} AS bucket
      FROM head CROSS JOIN rows_),
    est AS (
      SELECT p.term, p.cnt, CAST(min(c.cell) AS BIGINT) AS cms_estimate
      FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY 1, 2)
    SELECT term, cnt AS exact_cnt, cms_estimate,
           CAST(cms_estimate - cnt AS BIGINT) AS overestimate
    FROM est ORDER BY exact_cnt DESC, term
    """


TEXT_ORACLES["q_cms_term_counts"] = _cms_oracle()
TEXT_QUERIES["q_cms_term_counts"] = q_cms_term_counts


# ---- Kneser-Ney bigram LM (round 7) ----

#: Absolute-discount mass for interpolated Kneser-Ney. 0.75 is the
#: textbook default (Chen & Goodman 1999); rational, so every P_KN
#: term below stays a fixed-shape double expression over exact
#: integer counts -- no transcendental anywhere in this operator.
KN_DISCOUNT = 0.75

#: Reported head size (top bigrams by smoothed probability).
KN_TOP_K = 20


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities -- the standard
    n-gram LM smoothing (Chen & Goodman 1999) and the natural upgrade
    of q_perplexity_bigram's add-one model:

        P_KN(cur|prev) = (c2(prev,cur) - D) / c1(prev)
                       + D * N1+(prev, *) / c1(prev) * P_cont(cur)
        P_cont(cur)    = N1+(*, cur) / N1+(*, *)

    where N1+(prev, *) is the distinct-continuation count of the
    prefix, N1+(*, cur) the distinct-history count of the word (the
    novel-context signal that makes KN beat Good-Turing on bursty
    words), and N1+(*, *) the distinct bigram-type total. Reports the
    KN_TOP_K bigrams by smoothed probability.

    Exactness: every input is an exact BIGINT count off one bigram
    shuffle; c2 >= 1 makes max(c2 - D, 0) = c2 - D, so P_KN is one
    fixed-shape double expression (two divisions, one multiply-add)
    evaluated identically by both engines; round(.,6) at the output
    boundary. No logs, no exp -- KN probability is rational.

    Scale shape: bigram counts are ONE corpus-sized shuffle (map-side
    combined); c1 / N1+ / the type total are re-aggregations of the
    already-compacted (prev, cur) frame (vocabulary^2-bounded, in
    practice corpus-sublinear); the two scalar totals broadcast; the
    top-K is TakeOrderedAndProject. The model frame this builds is
    exactly what a KenLM-style filter consumes at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _adjacent_pairs("prev", "cur")
    bigrams = docs.select(F.explode(bg).alias("b")).select(
        F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur")
    )
    c2 = bigrams.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    c2 = cut_lineage(c2)  # three downstream aggregations of one shuffle
    c1 = c2.groupBy("prev").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    n1p_rev = c2.groupBy("cur").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_rev")
    )
    types_total = c2.agg(F.count(F.lit(1)).cast("long").alias("t"))
    d = F.lit(KN_DISCOUNT)
    pkn = (
        (F.col("c2").cast("double") - d) / F.col("c1").cast("double")
        + d
        * F.col("n1p_fwd").cast("double")
        / F.col("c1").cast("double")
        * (F.col("n1p_rev").cast("double") / F.col("t").cast("double"))
    )
    return (
        c2.join(c1, "prev")
        .join(n1p_rev, "cur")
        .crossJoin(F.broadcast(types_total))
        .select(
            "prev",
            "cur",
            "c2",
            "c1",
            "n1p_fwd",
            "n1p_rev",
            F.round(pkn, 6).alias("p_kn"),
        )
        .orderBy(F.col("p_kn").desc(), "prev", "cur")
        .limit(KN_TOP_K)
    )


TEXT_QUERIES["q_kneser_ney_bigram"] = q_kneser_ney_bigram
TEXT_ORACLES["q_kneser_ney_bigram"] = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    bigrams AS (
      SELECT toks[i] AS prev, toks[i + 1] AS cur
      FROM t, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)),
    c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
           FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS n1p_fwd
           FROM c2 GROUP BY 1),
    rev AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1p_rev
            FROM c2 GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c2)
    SELECT c2.prev, c2.cur, c2.c2, c1.c1, c1.n1p_fwd, rev.n1p_rev,
           round(
             (CAST(c2.c2 AS DOUBLE) - {KN_DISCOUNT})
               / CAST(c1.c1 AS DOUBLE)
             + {KN_DISCOUNT} * CAST(c1.n1p_fwd AS DOUBLE)
               / CAST(c1.c1 AS DOUBLE)
               * (CAST(rev.n1p_rev AS DOUBLE) / CAST(tot.t AS DOUBLE)),
             6) AS p_kn
    FROM c2 JOIN c1 USING (prev) JOIN rev USING (cur) CROSS JOIN tot
    ORDER BY p_kn DESC, prev, cur
    LIMIT {KN_TOP_K}
"""


# ---- Character-diversity quality filter (round 7) ----


def q_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level diversity -- the gibberish /
    key-mash / binary-spill detector that complements the token-level
    quality filters (a doc of 2000 'a's passes every length rule but
    has diversity ~0): distinct character count, the UNBIASED
    Gini-Simpson index

        1 - sum_c n_c (n_c - 1) / (n (n - 1))

    (the probability two chars drawn without replacement differ), and
    the top-character fraction max(n_c)/n. Diversity is chosen over
    Shannon entropy deliberately: it is an exact RATIONAL of integer
    counts -- no transcendental, no rounding discipline, bit-portable
    by construction (the same reason the dedup family reports Jaccard
    not cosine).

    Scale shape: characters are exploded via an index sequence +
    substring (bytes-volume map stage, no join), counted with ONE
    map-side-combined shuffle on (doc_id, char); every metric folds
    over the compacted (doc, char) frame (bounded by alphabet size per
    doc). One-char docs yield NULL diversity in both engines (0/0).
    Empty-text docs are filtered BEFORE the index sequence (ADVICE r7):
    Spark's sequence(1, 0) defaults step to -1 and yields [1, 0] --
    two phantom empty-string 'chars' -- where DuckDB's
    generate_series(1, 0) is empty and omits the doc; the explicit
    length guard makes both engines omit empty docs."""
    docs = load_table(spark, sf_dir, "documents")
    chars = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
    )
    cc = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("distinct_chars"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("same2"),
        F.max("c").cast("long").alias("top_c"),
    )
    div = F.lit(1.0) - F.col("same2").cast("double") / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars_obs"),
        "distinct_chars",
        F.round(F.when(F.col("n") > 1, div), 6).alias("gini_simpson"),
        F.round(F.col("top_c").cast("double") / F.col("n").cast("double"), 6)
        .alias("top_char_frac"),
    ).orderBy("doc_id")


TEXT_QUERIES["q_char_diversity"] = q_char_diversity
TEXT_ORACLES["q_char_diversity"] = """
    WITH chars AS (
      SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
      FROM documents,
           unnest(generate_series(1, len(text))) AS u(i)),
    cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
           FROM chars GROUP BY 1, 2),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS distinct_chars,
             CAST(sum(c * (c - 1)) AS BIGINT) AS same2,
             CAST(max(c) AS BIGINT) AS top_c
      FROM cc GROUP BY 1)
    SELECT doc_id, n AS n_chars_obs, distinct_chars,
           round(CASE WHEN n > 1 THEN
             1.0 - CAST(same2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
           END, 6) AS gini_simpson,
           round(CAST(top_c AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS top_char_frac
    FROM agg ORDER BY doc_id
"""


# ---- Tokenizer fertility audit (round 7) ----


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit per language: subword tokens per
    whitespace word (the q_token_stats BPE-ish boundary split over the
    same corpus) and bytes per subword token -- the two numbers that
    decide whether a tokenizer is fair to a language before training
    on it (high fertility = the language pays more sequence length per
    word; see the multilingual-tokenizer-parity literature). Exact
    integer sums, two final divisions, round(.,6).

    Scale shape: pure scan-map (two split+size expressions per doc,
    no explode), one tiny groupBy(lang)."""
    docs = load_table(spark, sf_dir, "documents")
    bpeish = F.split(
        F.trim(
            F.regexp_replace(F.col("text"), r"([a-z])([A-Z0-9])", r"$1 $2")
        ),
        r"\s+",
    )
    per_doc = docs.select(
        "lang",
        F.size(_tokens()).cast("long").alias("ws"),
        F.size(bpeish).cast("long").alias("sub"),
        F.octet_length("text").cast("long").alias("b"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("sub").cast("long").alias("subword_tokens"),
        F.sum("b").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "subword_tokens",
        F.round(
            F.col("subword_tokens").cast("double")
            / F.col("ws_tokens").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_bytes").cast("double")
            / F.col("subword_tokens").cast("double"),
            6,
        ).alias("bytes_per_token"),
    ).orderBy("lang")


TEXT_QUERIES["q_tokenizer_fertility"] = q_tokenizer_fertility
TEXT_ORACLES["q_tokenizer_fertility"] = """
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS ws,
             CAST(len(string_split_regex(trim(
               regexp_replace(text, '([a-z])([A-Z0-9])', '\\1 \\2', 'g')),
               '\\s+')) AS BIGINT) AS sub,
             CAST(strlen(text) AS BIGINT) AS b
      FROM documents),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS ws_tokens,
             CAST(sum(sub) AS BIGINT) AS subword_tokens,
             CAST(sum(b) AS BIGINT) AS n_bytes
      FROM per_doc GROUP BY 1)
    SELECT lang, n_docs, ws_tokens, subword_tokens,
           round(CAST(subword_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE),
                 6) AS fertility,
           round(CAST(n_bytes AS DOUBLE) / CAST(subword_tokens AS DOUBLE),
                 6) AS bytes_per_token
    FROM agg ORDER BY lang
"""


# ---- Corpus coverage curve (round 7, second batch) ----

#: Resolution of the coverage curve (deciles of the scan order).
COVERAGE_BUCKETS = 10


def q_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-coverage curve of the corpus: scan documents in a
    deterministic pseudo-ingestion order (md5 of doc_id) and report,
    per decile of the scan, how many NEW word-3-shingles appear and
    the cumulative fraction of the corpus's distinct shingles seen --
    the saturation diagnostic behind "how much of this crawl is
    marginal novelty" and the data-budget planner's stopping curve
    (diminishing novelty per added decile = dedup/selection should
    bite harder).

    Exactness: positions are integer ranks over (md5, doc_id); each
    distinct shingle is attributed to the MIN decile containing it;
    counts and the cumulative window are exact integers; one final
    division per row.

    Scale shape: ONE corpus-sized explode into (shingle, decile) ->
    min-agg per shingle (map-side combinable; the frame after it is
    vocabulary-sized) -> 10-row aggregate + cumulative window. The
    global rank is one rangepartition+sort of (hash, id) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    n = docs.count()
    positioned = docs.select(
        "text",
        F.ceil(
            F.row_number().over(w) * COVERAGE_BUCKETS / F.lit(n)
        ).cast("long").alias("decile"),
    )
    toks = _tokens()
    m = F.greatest(F.size(toks) - 2, F.lit(0))
    tri = F.zip_with(
        F.slice(toks, 1, m),
        F.zip_with(
            F.slice(toks, 2, m),
            F.slice(toks, 3, m),
            lambda b, c: F.concat_ws(" ", b, c),
        ),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    sh = positioned.select("decile", F.explode(tri).alias("sh"))
    first_seen = sh.groupBy("sh").agg(F.min("decile").alias("d0"))
    per_decile = first_seen.groupBy("d0").agg(
        F.count(F.lit(1)).cast("long").alias("new_shingles")
    )
    wc = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    total = first_seen.count()
    return per_decile.select(
        F.col("d0").alias("decile"),
        "new_shingles",
        F.sum("new_shingles").over(wc).cast("long").alias("cum_shingles"),
    ).select(
        "decile",
        "new_shingles",
        "cum_shingles",
        F.round(
            F.col("cum_shingles").cast("double") / F.lit(float(total)), 6
        ).alias("coverage_frac"),
    ).orderBy("decile")


TEXT_QUERIES["q_coverage_curve"] = q_coverage_curve
TEXT_ORACLES["q_coverage_curve"] = f"""
    WITH pos AS (
      SELECT text,
             CAST(ceil(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               * {COVERAGE_BUCKETS}.0
               / (SELECT count(*) FROM documents)) AS BIGINT) AS decile
      FROM documents),
    t AS (SELECT decile, string_split_regex(trim(text), '\\s+') AS toks
          FROM pos),
    sh AS (
      SELECT decile, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
               AS sh
      FROM t, unnest(generate_series(1, greatest(len(toks) - 2, 0)))
             AS u(i)),
    first_seen AS (SELECT sh, min(decile) AS d0 FROM sh GROUP BY sh),
    per_decile AS (
      SELECT d0 AS decile, CAST(count(*) AS BIGINT) AS new_shingles
      FROM first_seen GROUP BY 1)
    SELECT decile, new_shingles,
           CAST(sum(new_shingles) OVER (ORDER BY decile) AS BIGINT)
             AS cum_shingles,
           round(CAST(sum(new_shingles) OVER (ORDER BY decile) AS DOUBLE)
                 / (SELECT count(*) FROM first_seen), 6) AS coverage_frac
    FROM per_decile ORDER BY decile
"""


# ---- Skip-gram co-occurrence pairs (round 7) ----

#: Context-window radius for skip-gram counting (word2vec's default
#: neighborhood shape, small enough that the per-doc expansion is
#: window * tokens, not tokens^2).
SKIPGRAM_WINDOW = 3

#: Reported head size and the minimum pair count to enter it.
SKIPGRAM_TOP_K = 20
SKIPGRAM_MIN_COUNT = 2


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts: unordered token pairs within a
    +/-SKIPGRAM_WINDOW context, the corpus statistic word2vec/GloVe
    embeddings train on (and the wider-window complement of
    q_pmi_collocations' adjacent-bigram association). Top pairs by
    count with a (w1, w2) tiebreak; pairs below SKIPGRAM_MIN_COUNT
    are cut.

    Plan: for each offset 1..W, one aligned-slice zip pairs position
    i with position i+W -- W zipped arrays, ONE explode over their
    concatenation, so the expansion is W*tokens rows with no per-doc
    self-join (the tokens^2 trap). Pairs are normalized unordered
    with least/greatest. Exact integer counts; TakeOrderedAndProject
    for the head."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    offs = []
    for off in range(1, SKIPGRAM_WINDOW + 1):
        m = F.greatest(F.size(toks) - off, F.lit(0))
        offs.append(
            F.zip_with(
                F.slice(toks, 1, m),
                F.slice(toks, 1 + off, m),
                lambda a, b: F.struct(
                    F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
                ),
            )
        )
    pairs = docs.select(
        F.explode(F.concat(*offs)).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        counts.filter(F.col("cnt") >= SKIPGRAM_MIN_COUNT)
        .orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(SKIPGRAM_TOP_K)
    )


TEXT_QUERIES["q_skipgram_pairs"] = q_skipgram_pairs
TEXT_ORACLES["q_skipgram_pairs"] = f"""
    WITH t AS (
      SELECT string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    pairs AS (
      SELECT least(toks[i], toks[i + off]) AS w1,
             greatest(toks[i], toks[i + off]) AS w2
      FROM t,
           unnest(generate_series(1, {SKIPGRAM_WINDOW})) AS o(off),
           unnest(generate_series(1, greatest(len(toks) - off, 0)))
             AS u(i)),
    counts AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY 1, 2)
    SELECT w1, w2, cnt FROM counts
    WHERE cnt >= {SKIPGRAM_MIN_COUNT}
    ORDER BY cnt DESC, w1, w2
    LIMIT {SKIPGRAM_TOP_K}
"""


# ---- Heaps'-law vocabulary-growth fit (round 8) ----

#: Number of scan checkpoints for the vocabulary-growth curve (same
#: resolution as the coverage curve's deciles).
HEAPS_BUCKETS = 10


def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth -- V(N) = K * N^beta, i.e.
    ln V = ln K + beta * ln N -- over the same deterministic
    pseudo-ingestion order as q_coverage_curve (md5 of doc_id): at
    each scan decile, N = cumulative tokens seen and V = cumulative
    distinct terms seen; OLS in log-log space gives the Heaps exponent
    beta, the standard growth-model complement to q_zipf_fit's static
    rank-frequency slope (natural corpora sit at beta ~ 0.4-0.6;
    template-heavy corpora flatten early; beta near 1 means the
    vocabulary is still exploding and the tokenizer vocab is
    undersized for the crawl).

    Exactness: N and V per decile are exact integers (min-decile
    attribution for V, the q_coverage_curve trick; a cumulative window
    for N); the regression uses the q_zipf_fit discipline -- each
    log-term rounded to 9 dp, summed as DECIMAL(28,9), fixed-shape
    double expressions over the exact sums.

    Scale shape: one corpus explode -> (term, decile) min-agg
    (map-side combinable, vocabulary-sized output); per-doc token
    counts are a scan-map; the regression reduces HEAPS_BUCKETS rows
    to 1. The global rank is one rangepartition+sort of (hash, id)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    n = docs.count()
    positioned = docs.select(
        "text",
        F.ceil(
            F.row_number().over(w) * HEAPS_BUCKETS / F.lit(n)
        ).cast("long").alias("decile"),
    )
    toks = _tokens()
    # cumulative tokens per decile
    per_decile_toks = positioned.groupBy("decile").agg(
        F.sum(F.size(toks)).cast("long").alias("toks")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum_toks = per_decile_toks.select(
        "decile", F.sum("toks").over(wc).cast("long").alias("cum_tokens")
    )
    # cumulative vocabulary per decile: min-decile attribution
    first_seen = (
        positioned.select("decile", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("decile").alias("d0"))
    )
    per_decile_vocab = first_seen.groupBy("d0").agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    # a decile can add zero new terms; keep the token grid as the spine
    cum_vocab = cum_toks.join(
        per_decile_vocab, cum_toks.decile == per_decile_vocab.d0, "left"
    ).select(
        "decile",
        "cum_tokens",
        F.coalesce(F.col("new_terms"), F.lit(0)).alias("new_terms"),
    ).select(
        "decile",
        "cum_tokens",
        F.sum("new_terms").over(wc).cast("long").alias("cum_vocab"),
    )
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("cum_vocab").cast("double"))
    terms = cum_vocab.select(
        F.round(lx, 9).cast("decimal(28,9)").alias("x"),
        F.round(ly, 9).cast("decimal(28,9)").alias("y"),
        F.round(lx * lx, 9).cast("decimal(28,9)").alias("xx"),
        F.round(lx * ly, 9).cast("decimal(28,9)").alias("xy"),
        F.round(ly * ly, 9).cast("decimal(28,9)").alias("yy"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,9)").alias("sx"),
        F.sum("y").cast("decimal(38,9)").alias("sy"),
        F.sum("xx").cast("decimal(38,9)").alias("sxx"),
        F.sum("xy").cast("decimal(38,9)").alias("sxy"),
        F.sum("yy").cast("decimal(38,9)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    fit = sums.select(
        "n",
        sx.alias("sxd"),
        sy.alias("syd"),
        F.try_divide(nd * sxy - sx * sy, nd * sxx - sx * sx).alias("beta"),
        (nd * sxy - sx * sy).alias("cov_num"),
        (nd * sxx - sx * sx).alias("var_x"),
        (nd * syy - sy * sy).alias("var_y"),
    )
    return fit.select(
        F.col("n").alias("n_points"),
        F.round("beta", 6).alias("beta"),
        F.round(
            F.try_divide(F.col("syd") - F.col("beta") * F.col("sxd"),
                         F.col("n").cast("double")),
            6,
        ).alias("ln_k"),
        F.round(
            F.try_divide(
                F.col("cov_num") * F.col("cov_num"),
                F.col("var_x") * F.col("var_y"),
            ),
            6,
        ).alias("r2"),
    )


TEXT_QUERIES["q_heaps_law_fit"] = q_heaps_law_fit
TEXT_ORACLES["q_heaps_law_fit"] = f"""
    WITH pos AS (
      SELECT text,
             CAST(ceil(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               * {HEAPS_BUCKETS}.0
               / (SELECT count(*) FROM documents)) AS BIGINT) AS decile
      FROM documents),
    t AS (SELECT decile, string_split_regex(trim(text), '\\s+') AS toks
          FROM pos),
    cum_toks AS (
      SELECT decile,
             CAST(sum(sum(len(toks))) OVER (ORDER BY decile) AS BIGINT)
               AS cum_tokens
      FROM t GROUP BY decile),
    first_seen AS (
      SELECT term, min(decile) AS d0
      FROM (SELECT decile, unnest(toks) AS term FROM t)
      WHERE term <> '' GROUP BY term),
    per_decile_vocab AS (
      SELECT d0, CAST(count(*) AS BIGINT) AS new_terms
      FROM first_seen GROUP BY d0),
    cum_vocab AS (
      SELECT ct.decile, ct.cum_tokens,
             CAST(sum(coalesce(pv.new_terms, 0)) OVER (ORDER BY ct.decile)
                  AS BIGINT) AS cum_vocab
      FROM cum_toks ct LEFT JOIN per_decile_vocab pv ON pv.d0 = ct.decile),
    terms AS (
      SELECT
        CAST(round(ln(CAST(cum_tokens AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
        CAST(round(ln(CAST(cum_vocab AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
        CAST(round(ln(CAST(cum_tokens AS DOUBLE))
                   * ln(CAST(cum_tokens AS DOUBLE)), 9)
             AS DECIMAL(28,9)) AS xx,
        CAST(round(ln(CAST(cum_tokens AS DOUBLE))
                   * ln(CAST(cum_vocab AS DOUBLE)), 9)
             AS DECIMAL(28,9)) AS xy,
        CAST(round(ln(CAST(cum_vocab AS DOUBLE))
                   * ln(CAST(cum_vocab AS DOUBLE)), 9)
             AS DECIMAL(28,9)) AS yy
      FROM cum_vocab),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,9)) AS sx,
             CAST(sum(y) AS DECIMAL(38,9)) AS sy,
             CAST(sum(xx) AS DECIMAL(38,9)) AS sxx,
             CAST(sum(xy) AS DECIMAL(38,9)) AS sxy,
             CAST(sum(yy) AS DECIMAL(38,9)) AS syy
      FROM terms),
    fit AS (
      SELECT n,
             CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
               AS beta,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_num,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y
      FROM sums)
    SELECT n AS n_points,
           round(beta, 6) AS beta,
           round((syd - beta * sxd) / nullif(CAST(n AS DOUBLE), 0), 6)
             AS ln_k,
           round(cov_num * cov_num / nullif(var_x * var_y, 0), 6) AS r2
    FROM fit
"""


# ---- Vocabulary token-mass coverage at top-K checkpoints (round 8) ----

#: Vocabulary-rank checkpoints at which token-mass coverage is
#: reported (the fixture vocabulary is small, so the last checkpoints
#: deliberately exceed it and clamp -- k_effective shows the clamp).
VOCAB_COVERAGE_KS = (5, 10, 20, 50)


def q_vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass CDF of the vocabulary: what fraction of all corpus
    tokens is covered by the top-K most frequent terms, at each K in
    VOCAB_COVERAGE_KS -- the sizing curve for a tokenizer vocabulary
    or a stopword list (the per-source complement is q_oov_rate; this
    is the corpus-wide budget curve it reads from). K larger than the
    vocabulary clamps to the vocabulary size; k_effective reports the
    clamp.

    Exactness: term counts and the cumulative-mass window are exact
    integers over the (cnt desc, term) total order; one division per
    checkpoint row.

    Scale shape: one corpus explode -> term counts (map-side
    combinable; output is vocabulary-sized) -> ONE window cumsum over
    the vocabulary -> a checkpoints-sized cross-join filter. Nothing
    corpus-sized past the first aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens()).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "term")
    ranked = counts.select(
        "cnt",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).select(
        "rnk",
        F.sum("cnt").over(
            Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum_mass"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("vocab_n"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("total_mass"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in VOCAB_COVERAGE_KS], "k long"
    )
    return (
        ranked.join(
            F.broadcast(ks),
            F.col("rnk") == F.least(F.col("k"), F.col("vocab_n")),
        )
        .select(
            "k",
            F.col("rnk").alias("k_effective"),
            F.col("cum_mass").alias("tokens_covered"),
            "total_mass",
            F.round(
                F.col("cum_mass").cast("double")
                / F.col("total_mass").cast("double"),
                6,
            ).alias("coverage_frac"),
        )
        .orderBy("k")
    )


TEXT_QUERIES["q_vocab_coverage_topk"] = q_vocab_coverage_topk
TEXT_ORACLES["q_vocab_coverage_topk"] = f"""
    WITH counts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents)
      WHERE term <> '' GROUP BY term),
    ranked AS (
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT)
               AS rnk,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, term) AS BIGINT)
               AS cum_mass,
             CAST(count(*) OVER () AS BIGINT) AS vocab_n,
             CAST(sum(cnt) OVER () AS BIGINT) AS total_mass
      FROM counts),
    ks AS (SELECT unnest(ARRAY{list(VOCAB_COVERAGE_KS)}) AS k)
    SELECT CAST(k AS BIGINT) AS k,
           rnk AS k_effective,
           cum_mass AS tokens_covered,
           total_mass,
           round(CAST(cum_mass AS DOUBLE) / CAST(total_mass AS DOUBLE), 6)
             AS coverage_frac
    FROM ranked JOIN ks ON rnk = least(k, vocab_n)
    ORDER BY k
"""


# ---- Per-language document-length quantiles (round 8) ----

#: Percentiles reported by the per-language length profile.
DOCLEN_PCTS = (25, 50, 75, 90)


def q_doclen_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length profile: exact discrete-rank
    quantiles (p25/p50/p75/p90) of n_chars -- the first table a corpus
    mix review reads (a language whose median doc is 10x shorter gets
    shredded by fixed-length packing; see q_pack_sequences). Uses the
    VALUE AT EXACT RANK rule shared with q_winsorized_stats and
    q_iqr_outliers: rank ceil(n*p/100) of the (n_chars, doc_id) order,
    integer arithmetic only (ceil(a/b) = (a+b-1) DIV b), so every
    output is an exact BIGINT and bit-portable with no interpolation
    or float discipline.

    Scale shape: one window rank per language partition (the only
    shuffle), conditional-agg selection of the 4 rank values -- no
    self-join, no percentile_approx sketch on the exact path."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .cast("long")
        .alias("n"),
    )
    def _at(p: int):
        target = (F.col("n") * p + 99) / F.lit(100)
        return F.max(
            F.when(
                F.col("rnk") == F.floor(target).cast("long"), F.col("n_chars")
            )
        ).cast("long")

    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            *[_at(p).alias(f"p{p}_chars") for p in DOCLEN_PCTS],
        )
        .orderBy("lang")
    )


TEXT_QUERIES["q_doclen_quantiles_by_lang"] = q_doclen_quantiles_by_lang
TEXT_ORACLES["q_doclen_quantiles_by_lang"] = f"""
    WITH ranked AS (
      SELECT lang, n_chars,
             CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY n_chars, doc_id) AS BIGINT)
               AS rnk,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM documents)
    SELECT lang,
           max(n) AS n_docs,
           {", ".join(
        f"CAST(max(CASE WHEN rnk = (n * {p} + 99) // 100 THEN n_chars END)"
        f" AS BIGINT) AS p{p}_chars"
        for p in DOCLEN_PCTS
    )}
    FROM ranked GROUP BY lang ORDER BY lang
"""


# ---- Language-ID confusion matrix (round 8) ----


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the q_lang_id heuristic against the
    declared ``lang`` label: per (declared, predicted) cell, the count
    and its share of the declared language's documents -- the accuracy
    audit a language-ID filter needs BEFORE it gates a corpus (a
    heuristic that maps a whole language to 'und' silently deletes it
    from the training mix). Same marker-token predictor as q_lang_id
    (shared STOPWORDS contract), so the two queries stay consistent.

    Exact integer counts + one division; the matrix is
    (langs x predicted-classes)-sized, never corpus-sized, after one
    scan-map + groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_markers = F.size(
        F.filter(_tokens(), lambda x: F.array_contains(stop_arr, x))
    )
    pred = F.when(n_markers > 0, F.lit("en")).otherwise(F.lit("und"))
    cells = (
        docs.select(F.col("lang").alias("declared_lang"), pred.alias("pred_lang"))
        .groupBy("declared_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("declared_lang")
    return cells.select(
        "declared_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double"),
            6,
        ).alias("share_of_declared"),
    ).orderBy("declared_lang", "pred_lang")


TEXT_QUERIES["q_langid_confusion"] = q_langid_confusion
TEXT_ORACLES["q_langid_confusion"] = f"""
    WITH pred AS (
      SELECT lang AS declared_lang,
             CASE WHEN len(list_filter(
                    string_split_regex(trim(text), '\\s+'),
                    t -> list_contains({list(STOPWORDS)!r}, t))) > 0
                  THEN 'en' ELSE 'und' END AS pred_lang
      FROM documents),
    cells AS (
      SELECT declared_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY 1, 2)
    SELECT declared_lang, pred_lang, n_docs,
           round(CAST(n_docs AS DOUBLE)
                 / CAST(sum(n_docs) OVER (PARTITION BY declared_lang)
                        AS DOUBLE), 6) AS share_of_declared
    FROM cells ORDER BY declared_lang, pred_lang
"""


# ---- Per-document OOV-rate gate (round 8) ----

#: Curation threshold: documents whose OOV token share exceeds this
#: are flagged (tokenizer would shred them into bytes/UNKs).
DOC_OOV_MAX_RATE = 0.5


def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOCUMENT out-of-vocabulary rate against the frozen top-N
    corpus vocabulary, with the keep/flag gate a curation pipeline
    applies -- the document-level twin of q_oov_rate (which aggregates
    per source): the source number says WHERE coverage is bad, this
    says WHICH documents to drop or reroute before training. Same
    vocabulary contract (top OOV_VOCAB_N terms by count, term
    tiebreak).

    Exact integer counts, one division, one threshold comparison
    against the exact rational -- bit-portable.

    Scale shape: identical to q_oov_rate -- one explode, the bounded
    vocab broadcast LEFT join, one groupBy(doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        freq.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(OOV_VOCAB_N)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    from pyspark.sql.functions import broadcast

    agg = (
        terms.join(broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_oov"),
        )
    )
    rate = F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round(rate, 6).alias("oov_rate"),
        F.when(rate > DOC_OOV_MAX_RATE, F.lit("flagged"))
        .otherwise(F.lit("kept"))
        .alias("gate"),
    ).orderBy("doc_id")


TEXT_QUERIES["q_doc_oov_rate"] = q_doc_oov_rate
TEXT_ORACLES["q_doc_oov_rate"] = f"""
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    freq AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
    vocab AS (
      SELECT term FROM freq
      ORDER BY cnt DESC, term LIMIT {OOV_VOCAB_N}),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM terms t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_oov,
           round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS oov_rate,
           CASE WHEN CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     > {DOC_OOV_MAX_RATE}
                THEN 'flagged' ELSE 'kept' END AS gate
    FROM agg ORDER BY doc_id
"""


# ---- MATTR lexical diversity (round 8) ----

#: Moving-average type-token-ratio window (the standard MATTR window
#: is 50-500 on real prose; 20 keeps the fixture docs multi-window).
MATTR_WINDOW = 20


def q_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-Average Type-Token Ratio per document: the mean of
    distinct-token counts over every MATTR_WINDOW-token sliding
    window, divided by the window size -- the length-robust lexical-
    diversity score (plain TTR collapses as docs grow, so it cannot
    gate a mixed-length corpus; MATTR is the standard fix) that
    complements q_char_diversity's character-level signal and the
    repetition filters' n-gram view. Docs shorter than the window
    fall back to plain TTR (one full-doc window).

    Exactness: per-window distinct counts are exact integers (one
    array_distinct per slice); the MATTR numerator is their exact
    integer sum; one final division, round(6).

    Scale shape: pure scan-map -- the sliding windows are per-doc
    array slices (W * tokens element touches per doc, no explode, no
    shuffle except the presentation sort)."""
    # The documents fixture is one parquet row group -> a 1-task scan,
    # and the windowed array work below is W * tokens element touches
    # per doc -- measured r11: 4.4 s in a single task while 31 cores
    # idled. Spread docs across the cluster before the heavy map
    # (guide section 2.5 input skew: repartition right after the read
    # when the source cannot be split).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = _tokens()
    n = F.size(toks)
    w = MATTR_WINDOW
    win_distincts = F.transform(
        F.sequence(F.lit(1), n - w + 1),
        lambda i: F.size(F.array_distinct(F.slice(toks, i, F.lit(w)))),
    )
    long_mattr = F.aggregate(
        win_distincts, F.lit(0).cast("long"), lambda a, x: a + x
    ).cast("double") / ((n - w + 1) * w).cast("double")
    short_ttr = F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.greatest(n - w + 1, F.lit(1)).cast("long").alias("n_windows"),
        F.round(F.when(n >= w, long_mattr).otherwise(short_ttr), 6).alias(
            "mattr"
        ),
    ).orderBy("doc_id")


TEXT_QUERIES["q_mattr_lexical_diversity"] = q_mattr_lexical_diversity
TEXT_ORACLES["q_mattr_lexical_diversity"] = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents),
    scored AS (
      SELECT doc_id, n,
             greatest(n - {MATTR_WINDOW} + 1, 1) AS n_windows,
             CASE WHEN n >= {MATTR_WINDOW} THEN
               CAST(list_sum(list_transform(
                 generate_series(1, n - {MATTR_WINDOW} + 1),
                 i -> len(list_distinct(
                   toks[i : i + {MATTR_WINDOW} - 1])))) AS DOUBLE)
               / ((n - {MATTR_WINDOW} + 1) * {MATTR_WINDOW})
             ELSE
               CAST(len(list_distinct(toks)) AS DOUBLE) / n
             END AS mattr
      FROM t)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(n_windows AS BIGINT) AS n_windows,
           round(mattr, 6) AS mattr
    FROM scored ORDER BY doc_id
"""
