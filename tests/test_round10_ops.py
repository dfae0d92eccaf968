"""Round-10 operators: the multi-format F1 attestation query."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.catalog import load_table
from kafka_clickhouse_pipeline_spark.operators.pipeline_queries import (
    q_mv_parse_multiformat,
)

SF = "/root/testdata/sf0.001"


class TestMvParseMultiformat:
    def test_all_four_legs_present_and_correct(self, spark):
        """Every bucket occurs; the three real formats all parse back
        to the ground-truth second-truncated ts; the corrupt leg is
        NULL-not-error (OrNull semantics, SURVEY.md F1)."""
        out = q_mv_parse_multiformat(spark, SF)
        buckets = {
            r["fmt_bucket"]: r["n"]
            for r in out.groupBy("fmt_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert set(buckets) == {0, 1, 2, 3}
        # corrupt leg: every row NULL + flagged, no exceptions anywhere
        corrupt = out.filter(F.col("fmt_bucket") == 3)
        assert corrupt.filter(F.col("event_time").isNotNull()).count() == 0
        assert corrupt.filter(F.col("parsed_ok") != 0).count() == 0
        # real legs: parse(format(ts)) == ts truncated to seconds
        truth = load_table(spark, SF, "events").select(
            "event_id",
            F.date_format(
                F.date_trunc("second", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("want"),
        )
        diverged = (
            out.filter(F.col("fmt_bucket") != 3)
            .join(truth, "event_id")
            .filter(
                (F.col("event_time") != F.col("want"))
                | F.col("event_time").isNull()
                | (F.col("parsed_ok") != 1)
            )
        )
        assert diverged.count() == 0

    def test_wire_formats_are_distinct(self, spark):
        """The three real wire shapes are genuinely different strings
        (i.e. the query exercises three distinct coalesce branches,
        not one format three times)."""
        out = q_mv_parse_multiformat(spark, SF).filter(
            F.col("fmt_bucket") != 3
        )
        seps = {
            r["sep"]
            for r in out.select(
                F.substring("wire", 5, 1).alias("sep")
            ).distinct().collect()
        }
        # bucket 0: '2024-…' -> '-'; bucket 1: '-' too but 'T' at 11;
        # bucket 2: 'dd/MM/yyyy' -> '/' at position 3 -> char 5 is 'M'
        # month digit; cheapest distinctness check: wire prefixes
        prefixes = {
            r["p"]
            for r in out.select(F.substring("wire", 3, 3).alias("p"))
            .distinct()
            .collect()
        }
        assert len(prefixes) >= 2 and seps  # day-first differs from ISO
        t_rows = out.filter(
            (F.col("fmt_bucket") == 1)
            & (F.substring("wire", 11, 1) == "T")
        ).count()
        assert t_rows == out.filter(F.col("fmt_bucket") == 1).count()
