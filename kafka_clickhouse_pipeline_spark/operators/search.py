"""Full-text retrieval operators: exact BM25 ranking over the document
corpus -- the search-engine primitive (Okapi BM25, the default scorer
in Lucene/Elasticsearch) expressed as pure relational algebra: an
inverted-index join instead of a per-document scan per query.

Scale shape:
- The corpus-sized work is ONE tokenize+groupBy pass building the
  (doc, term, tf) postings and per-doc lengths -- exactly the
  materialization a search index performs; every query afterwards
  touches only its own terms' postings (the broadcast query-term join
  prunes the postings scan to matching terms -- at 100 TB with the
  postings bucketed by term this is an index probe, not a scan).
- Document-frequency and corpus stats are tiny aggregates; the
  per-(query, doc) score folds term contributions through the
  round(.,9)-as-DECIMAL(28,9) trick (order-independent, bit-equal),
  and the top-K per query is map-side-pruned (grouped_topk), so the
  rank shuffle carries ~queries x K rows.

Determinism contract: tf/df/lengths are exact integers; idf and the
saturation term evaluate as ONE fixed-shape double expression in both
engines (the DSIR/PSI-proven pattern -- ln on exact-integer-derived
doubles); ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from .topk import grouped_topk

#: Okapi BM25 constants, inlined as explicit DOUBLE literals in both
#: engines (bare decimals would parse as DECIMAL and change the math).
BM25_K1 = 1.2
BM25_B = 0.75

#: Fixed benchmark queries (query_id, terms). Literal and synthetic-
#: corpus-aligned so the operator is deterministic and self-contained;
#: a production build binds these from a query table instead.
BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("hash_join", ["hash", "join"]),
    ("stream_window", ["stream", "window", "batch"]),
    ("customer_filter", ["customer", "data", "filter"]),
]

#: Results returned per query.
BM25_TOPK = 10


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 results for each benchmark query over the document
    corpus. score(q, d) = sum over query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avglen)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) -- the Lucene form,
    always positive."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    lens = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("decimal(38,0)").alias("total_len"),
    )
    df_tbl = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id string, term string",
    )
    # broadcast query terms: prunes the postings to matching terms
    matched = (
        postings.join(broadcast(qterms), "term")
        .join(df_tbl, "term")
        .join(lens, "doc_id")
        .crossJoin(broadcast(stats))
    )
    n = F.col("n_docs").cast("double")
    dfv = F.col("df").cast("double")
    tf = F.col("tf").cast("double")
    avglen = F.col("total_len").cast("double") / n
    idf = F.log(F.lit(1.0) + (n - dfv + F.lit(0.5)) / (dfv + F.lit(0.5)))
    denom = tf + F.lit(BM25_K1) * (
        F.lit(1.0)
        - F.lit(BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") / avglen)
    )
    contrib = idf * tf * F.lit(BM25_K1 + 1.0) / denom
    scored = matched.select(
        "query_id",
        "doc_id",
        F.round(contrib, 9).cast("decimal(28,9)").alias("c"),
    ).groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum("c").cast("double"), 6).alias("score"),
    )
    return grouped_topk(
        scored, ["query_id"], [("score", False), ("doc_id", True)], BM25_TOPK
    ).orderBy("query_id", "rank")


def _bm25_oracle() -> str:
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    postings AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2),
    lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             FROM toks GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS DECIMAL(38,0)) AS total_len
              FROM lens),
    dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM postings GROUP BY 1),
    qterms(query_id, term) AS (VALUES {qvals}),
    matched AS (
      SELECT q.query_id, p.doc_id, p.tf, d.df, l.dl, s.n_docs, s.total_len
      FROM postings p
      JOIN qterms q ON q.term = p.term
      JOIN dfs d ON d.term = p.term
      JOIN lens l ON l.doc_id = p.doc_id
      CROSS JOIN stats s),
    contrib AS (
      SELECT query_id, doc_id,
             CAST(round(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
               * CAST(tf AS DOUBLE) * CAST({BM25_K1 + 1.0} AS DOUBLE)
               / (CAST(tf AS DOUBLE)
                  + CAST({BM25_K1} AS DOUBLE) * (1.0 - CAST({BM25_B} AS DOUBLE)
                                 + CAST({BM25_B} AS DOUBLE) * (CAST(dl AS DOUBLE)
                                    / (CAST(total_len AS DOUBLE)
                                       / CAST(n_docs AS DOUBLE))))),
               9) AS DECIMAL(28,9)) AS c
      FROM matched),
    scored AS (
      SELECT query_id, doc_id,
             CAST(count(*) AS BIGINT) AS n_terms_hit,
             round(CAST(sum(c) AS DOUBLE), 6) AS score
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, doc_id, n_terms_hit, score,
             CAST(row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
      FROM scored)
    SELECT * FROM ranked WHERE rank <= {BM25_TOPK}
    ORDER BY query_id, rank
    """


SEARCH_QUERIES = {"q_bm25_search": q_bm25_search}
SEARCH_ORACLES = {"q_bm25_search": _bm25_oracle()}
