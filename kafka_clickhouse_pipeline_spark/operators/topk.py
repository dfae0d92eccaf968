"""Distributed grouped top-k with map-side pruning.

The naive Spark plan for "top k per group" -- row_number() over a
window partitioned by the group -- shuffles EVERY scored row to the
group's reducer before discarding all but k. At 100 TB (e.g. scoring a
full embedding corpus against a query set) that shuffle is the whole
job. ``grouped_topk`` prunes first: an Arrow-batched ``mapInPandas``
pass keeps at most k rows per group per input batch (a provable
superset of the global top-k, since any globally-top-k row is also
top-k within its own batch under the same total order), then the
surviving ~``num_batches x groups x k`` rows take the normal window
rank. Shuffle volume drops from O(rows) to O(batches x groups x k).

This is one of the sanctioned Pandas-UDF cases: Spark has no bounded
top-k aggregate, so the built-in alternatives either shuffle everything
(window) or buffer whole groups (collect_list). Memory stays bounded by
the Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch,
default 10k rows).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(
    df: DataFrame,
    groups: list[str],
    order: list[tuple[str, bool]],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-k rows per group under a deterministic total order.

    ``order`` is a list of (column, ascending) pairs; include a unique
    tiebreak column so the result is well-defined. Output keeps the
    input columns plus an int ``rank_col`` (1-based) and is NOT sorted
    across groups (callers add presentation ordering).
    """
    sort_cols = [c for c, _ in order]
    ascending = [a for _, a in order]

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(sort_cols, ascending=ascending)
                    .groupby(groups, sort=False)
                    .head(k)
                )

    pruned = df.mapInPandas(prune, schema=df.schema)
    w = Window.partitionBy(*groups).orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in order]
    )
    return (
        pruned.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
