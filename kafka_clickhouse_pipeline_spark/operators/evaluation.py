"""Classifier-evaluation operators: exact ROC AUC and calibration
binning over the hashed quality-classifier score.

A curation pipeline that filters with a model (CCNet/RedPajama-style
quality classifiers, fastText language ID) has to AUDIT that model at
corpus scale before trusting its keep-decisions: AUC says whether the
score ranks positives above negatives at all, and the calibration
table says whether "score 0.8" means anything as a probability. Both
run here against the same deterministic hashed linear score that
``q_quality_classifier_hashed`` (curation.py:813) produces, with
``lang = 'en'`` as the reference label, so the evaluation exercises
the real scoring path end-to-end; a production build swaps in trained
weights and true labels without touching either plan.

Exactness strategy (what makes these oracle-matchable):
- AUC is the tie-aware Mann-Whitney statistic computed from INTEGER
  rank sums. Scores are grouped by their round-6 value first, average
  ranks for a tie block of size c starting after R_prev items satisfy
  2*ranksum = sum over blocks of pos_c * (2*R_prev + c + 1), so the
  whole computation stays in exact integers (decimal(38,0) sums --
  BIGINT would wrap near 1e12 rows since ranksum ~ n^2) and performs
  ONE double division at the end. No float accumulation order anywhere.
- Calibration bins come from the score's exact round-6 integer grid
  (score*1e6 as a long), so bin boundaries are integer comparisons --
  no float-boundary ambiguity between engines -- and per-bin mean
  scores are exact integer sums divided once.

Scale shape:
- Scoring is a pure map over the documents scan (hash + fold per row,
  no shuffle, no vocabulary join -- see curation.py:813).
- AUC compacts to DISTINCT round-6 score values before doing any
  ordered work: the grid has at most 2e6 + 1 points in [-1, 1], so the
  cumulative-rank window runs over a bounded, metadata-sized frame no
  matter how many documents were scored (the same distinct-value
  compaction q_value_percentiles uses). The corpus-sized stage is one
  map-side-combined groupBy(score).
- Calibration is ONE aggregate over the scan (bin is a per-row integer
  expression); the 10-row bin spine joins back by broadcast so empty
  bins still emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import load_table
from .curation import _hex8_sql

#: Positive-label definition for the evaluation fixtures: the
#: classifier is audited as a detector of English documents.
POS_LANG = "en"

#: Calibration layout: equal-width bins over the score range [-1, 1],
#: expressed on the exact round-6 integer grid (score * 1e6).
CALIB_BINS = 10
_GRID = 1_000_000  # score*1e6 is an exact integer after round(.,6)
_BIN_W = 2 * _GRID // CALIB_BINS


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label, s6): hashed-classifier score on the exact
    integer grid (score * 1e6 as BIGINT) plus the binary label.

    Same score expression as q_quality_classifier_hashed
    (curation.py:832-841): md5-hashed per-token weights in [-1, 1),
    sequential float fold, round 6."""
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
    return docs.select(
        "doc_id",
        (F.col("lang") == POS_LANG).cast("int").alias("label"),
        F.round(score * _GRID, 0).cast("long").alias("s6"),
    )


_SCORED_SQL = f"""
      SELECT doc_id,
             CAST(lang = '{POS_LANG}' AS INT) AS label,
             CAST(round(round(list_sum(list_transform(
               string_split_regex(trim(text), '\\s+'),
               tk -> {_hex8_sql("md5(tk)")} / 2147483648.0 - 1.0))
               / len(string_split_regex(trim(text), '\\s+')), 6)
               * {_GRID}, 0) AS BIGINT) AS s6
      FROM documents"""


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC AUC of the hashed quality-classifier score
    as a detector of ``lang = 'en'`` -- the ranking-quality audit run
    before trusting a filter's keep-threshold. AUC = P(score_pos >
    score_neg) + 0.5 * P(tie), computed via the Mann-Whitney rank-sum
    identity on integer arithmetic (module docstring).

    The random-hash score SHOULD score ~0.5 here (it carries no signal
    about language) -- the operator's value is the exact machinery;
    tests pin AUC = 1 / 0 / 0.5 on crafted separable fixtures."""
    by_score = (
        _scored(spark, sf_dir)
        .groupBy("s6")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("label").alias("pos"),
        )
    )
    w = Window.orderBy("s6").rowsBetween(Window.unboundedPreceding, -1)
    # R_prev: items with strictly smaller score; bounded frame (<= 2e6+1
    # distinct round-6 values), so the global window is metadata-sized
    blocks = by_score.withColumn(
        "r_prev", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    m = blocks.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        # operands cast to decimal BEFORE the multiply: pos * (2*r_prev
        # + c + 1) reaches ~2*n^2, past BIGINT near 2e9 rows
        F.sum(
            F.col("pos").cast("decimal(19,0)")
            * (F.lit(2) * F.col("r_prev") + F.col("c") + F.lit(1)).cast(
                "decimal(19,0)"
            )
        ).cast("decimal(38,0)").alias("rs2"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = (
        F.col("rs2").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double")
    ) / (F.lit(2.0) * F.col("n_pos").cast("double") * n_neg.cast("double"))
    return m.select(
        "n",
        "n_pos",
        n_neg.cast("long").alias("n_neg"),
        "n_scores",
        F.round(auc, 6).alias("auc"),
    )


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table of the hashed classifier score vs the
    ``lang = 'en'`` label: 10 equal-width score bins over [-1, 1], each
    with its document count, positive count, exact mean score, and
    observed positive rate -- the reliability-diagram input that says
    whether the score is usable as a probability (and where to place a
    keep-threshold). Bin membership and mean are integer-exact on the
    round-6 grid; empty bins emit via the broadcast literal spine."""
    binned = _scored(spark, sf_dir).select(
        F.least(
            F.floor((F.col("s6") + _GRID) / _BIN_W), F.lit(CALIB_BINS - 1)
        )
        .cast("long")
        .alias("bin"),
        "label",
        "s6",
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(F.col("s6").cast("decimal(38,0)")).alias("sum_s6"),
    )
    spine = spark.createDataFrame(
        [
            (b, round(-1 + b * 2 / CALIB_BINS, 1), round(-1 + (b + 1) * 2 / CALIB_BINS, 1))
            for b in range(CALIB_BINS)
        ],
        "bin long, bin_lo double, bin_hi double",
    )
    full = spine.join(counts, "bin", "left").select(
        "bin",
        "bin_lo",
        "bin_hi",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("n_pos", F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce("sum_s6", F.lit(0).cast("decimal(38,0)")).alias("sum_s6"),
    )
    return full.select(
        "bin",
        "bin_lo",
        "bin_hi",
        "n_docs",
        "n_pos",
        F.when(
            F.col("n_docs") > 0,
            F.round(
                F.col("sum_s6").cast("double")
                / (F.col("n_docs").cast("double") * F.lit(float(_GRID))),
                6,
            ),
        ).alias("mean_score"),
        F.when(
            F.col("n_docs") > 0,
            F.round(
                F.col("n_pos").cast("double") / F.col("n_docs").cast("double"), 6
            ),
        ).alias("pos_rate"),
    ).orderBy("bin")


EVALUATION_ORACLES: dict[str, str] = {}

EVALUATION_ORACLES["q_classifier_auc"] = f"""
    WITH scored AS ({_SCORED_SQL}),
    by_score AS (
      SELECT s6, count(*) AS c, sum(label) AS pos
      FROM scored GROUP BY s6),
    blocks AS (
      SELECT s6, c, pos,
             coalesce(sum(c) OVER (ORDER BY s6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r_prev
      FROM by_score),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) AS BIGINT) AS n_scores,
             CAST(sum(CAST(pos AS DECIMAL(19,0))
                      * CAST(2 * r_prev + c + 1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS rs2
      FROM blocks)
    SELECT n, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg, n_scores,
           round((CAST(rs2 AS DOUBLE)
                  - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE))
                 / (2.0 * CAST(n_pos AS DOUBLE)
                    * CAST(n - n_pos AS DOUBLE)), 6) AS auc
    FROM m
"""

_CALIB_SPINE = ", ".join(
    f"({b}, {round(-1 + b * 2 / CALIB_BINS, 1)}, {round(-1 + (b + 1) * 2 / CALIB_BINS, 1)})"
    for b in range(CALIB_BINS)
)

EVALUATION_ORACLES["q_calibration_bins"] = f"""
    WITH scored AS ({_SCORED_SQL}),
    binned AS (
      SELECT CAST(least(floor(CAST(s6 + {_GRID} AS DOUBLE) / {_BIN_W}),
                        {CALIB_BINS - 1}) AS BIGINT) AS bin,
             label, s6
      FROM scored),
    counts AS (
      SELECT bin, count(*) AS n_docs, sum(label) AS n_pos,
             sum(CAST(s6 AS DECIMAL(38,0))) AS sum_s6
      FROM binned GROUP BY bin),
    spine(bin, bin_lo, bin_hi) AS (VALUES {_CALIB_SPINE})
    SELECT CAST(s.bin AS BIGINT) AS bin,
           CAST(s.bin_lo AS DOUBLE) AS bin_lo,
           CAST(s.bin_hi AS DOUBLE) AS bin_hi,
           CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(coalesce(c.n_pos, 0) AS BIGINT) AS n_pos,
           CASE WHEN coalesce(c.n_docs, 0) > 0 THEN
             round(CAST(c.sum_s6 AS DOUBLE)
                   / (CAST(c.n_docs AS DOUBLE) * {float(_GRID)}), 6)
           END AS mean_score,
           CASE WHEN coalesce(c.n_docs, 0) > 0 THEN
             round(CAST(c.n_pos AS DOUBLE) / CAST(c.n_docs AS DOUBLE), 6)
           END AS pos_rate
    FROM spine s LEFT JOIN counts c ON s.bin = c.bin
    ORDER BY bin
"""

EVALUATION_QUERIES = {
    "q_classifier_auc": q_classifier_auc,
    "q_calibration_bins": q_calibration_bins,
}
