"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the settings below are the ones that
also matter on a real cluster (AQE, skew handling, partition sizing).
Everything scale-sensitive is a config knob, not hard-coded logic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kafka_clickhouse_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting
      replace hand-tuned partition counts at 100 TB.
    - Arrow on: any pandas interchange (extensions only) is batched.
    - Parquet pushdown/pruning left at defaults (on) -- the serving
      queries rely on them (SURVEY.md section 4).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local-mode driver IS the executor: Spark's 1g default heap
        # OOMs shuffle-heavy operators well below this machine's RAM
        # (only effective for the process's first session, as JVM opts)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off: lenient casts/parses match ClickHouse's
        # parseDateTimeBestEffortOrNull / toDecimal32OrNull behavior
        # (null on failure, never an error) -- SURVEY.md F1/F2.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
