"""Z-order (Morton-curve) layout audit: quantify how much a
space-filling-curve sort key improves multi-column data skipping over
a row-major (single-column-first) sort, on the actual data.

Why this is an engine operator and not an offline script: at 100 TB
the dominant lever on scan cost is file/row-group pruning, and pruning
quality is a property of the LAYOUT -- min/max zone maps are only
selective on columns the sort key clusters. Lakehouse table formats
expose Z-ordering as a maintenance command (OPTIMIZE ... ZORDER BY);
this operator is the audit that justifies (or rejects) that rewrite
for a given column pair, by measuring per-block min/max spans under
both layouts from the data itself.

Method: bucket the two key columns to BITS-bit grids (x = partkey mod
2^BITS, y = suppkey mod 2^BITS), derive each row's Morton code by bit
interleaving -- a pure integer expression, whole-stage-codegen'd, no
UDF -- and group rows into blocks of BLOCK_CELLS consecutive curve
positions (a stand-in for "rows that land in the same file after
sorting by the curve key"). For each layout (zorder vs rowmajor) and
block, the x/y min-max spans are exactly what a zone map would store;
the audit reports block count and average per-block span/area. Z-order
blocks bound BOTH dimensions (~2^(BITS/2) each); row-major blocks
bound only the leading dimension. Lower avg area = better two-column
pruning.

Scale shape: one scan; per-layout groupBy on the block id with
map-side partial min/max/count, so the shuffle carries one row per
(block, task) -- metadata-sized regardless of input rows; the final
cross-block rollup is one row per layout. All arithmetic is exact
integer (sums are BIGINT) with a single double division at the output
boundary, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: Grid resolution per dimension (2^BITS cells); 8 bits = the 256-way
#: bucketing a real zone-map audit would use for percentile-bucketed
#: keys.
BITS = 8
#: Curve positions per block: 64 cells = an 8x8 tile under Z-order,
#: a 64x1 strip under row-major -- same block count for both layouts,
#: so the comparison isolates layout, not granularity.
BLOCK_SHIFT = 6


def morton_interleave(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton code: interleave the low `bits` bits of x (even
    positions) and y (odd positions). Pure integer expression; the
    oracle twin (_morton_sql) is generated from the same loop so both
    engines evaluate the identical formula."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _morton_sql(x: str, y: str, bits: int = BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit over lineitem's (l_partkey, l_suppkey): per-block
    zone-map spans under a Z-order sort key vs a row-major sort key.
    Output one row per layout: block count, average/max per-block x
    and y spans, and average block area (the two-column pruning
    cost)."""
    li = load_table(spark, sf_dir, "lineitem")
    mask = (1 << BITS) - 1
    cells = li.select(
        (F.col("l_partkey") % (mask + 1)).alias("x"),
        (F.col("l_suppkey") % (mask + 1)).alias("y"),
    )
    keyed = cells.select(
        "x",
        "y",
        F.shiftright(morton_interleave(F.col("x"), F.col("y")), BLOCK_SHIFT).alias(
            "zblock"
        ),
        F.shiftright(
            F.col("y") * (mask + 1) + F.col("x"), BLOCK_SHIFT
        ).alias("rmblock"),
    )

    def block_stats(df: DataFrame, block_col: str, layout: str) -> DataFrame:
        per_block = df.groupBy(block_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        area = (F.col("sx") + 1) * (F.col("sy") + 1)
        return per_block.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.round(
                F.sum("sx").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_x_span"),
            F.round(
                F.sum("sy").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_y_span"),
            F.max("sx").cast("long").alias("max_x_span"),
            F.max("sy").cast("long").alias("max_y_span"),
            F.round(
                F.sum(area).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_area"),
        )

    return (
        block_stats(keyed, "zblock", "zorder")
        .unionByName(block_stats(keyed, "rmblock", "rowmajor"))
        .orderBy("layout")
    )


_CELLS_SQL = f"""
    SELECT l_partkey % {1 << BITS} AS x, l_suppkey % {1 << BITS} AS y
    FROM lineitem
"""


def _layout_stats_sql(block_expr: str, layout: str) -> str:
    return f"""
      SELECT '{layout}' AS layout,
             count(*) AS n_blocks,
             round(CAST(sum(sx) AS DOUBLE) / count(*), 6) AS avg_x_span,
             round(CAST(sum(sy) AS DOUBLE) / count(*), 6) AS avg_y_span,
             CAST(max(sx) AS BIGINT) AS max_x_span,
             CAST(max(sy) AS BIGINT) AS max_y_span,
             round(CAST(sum((sx + 1) * (sy + 1)) AS DOUBLE) / count(*), 6)
               AS avg_area
      FROM (
        SELECT {block_expr} AS blk,
               max(x) - min(x) AS sx, max(y) - min(y) AS sy
        FROM cells GROUP BY 1)
    """


ZORDER_QUERIES = {"q_zorder_layout": q_zorder_layout}
ZORDER_ORACLES = {
    "q_zorder_layout": f"""
        WITH cells AS ({_CELLS_SQL})
        SELECT * FROM ({_layout_stats_sql(
            f"(({_morton_sql('x', 'y')}) >> {BLOCK_SHIFT})", "zorder")}
        UNION ALL {_layout_stats_sql(
            f"((y * {1 << BITS} + x) >> {BLOCK_SHIFT})", "rowmajor")})
        ORDER BY layout
    """,
}


# ---- compaction (bin-packing) planner ----

#: Target rows per compacted output file. A real OPTIMIZE targets
#: bytes (128 MB-1 GB); rows are the byte proxy available from table
#: statistics alone. Sized so the sf0.01 fixture produces multi-file
#: months (orders span ~80 months x ~190 rows).
COMPACTION_TARGET_ROWS = 128


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan for a month-partitioned orders table
    whose write pattern produced one file per ingest day (the classic
    streaming-sink small-file problem the reference's per-batch sink
    compaction works around, streaming/sink.py): within each month
    partition, pack the per-day files CONTIGUOUSLY in day order into
    output files of ~COMPACTION_TARGET_ROWS rows, and emit one row per
    planned output file with its source-file count, rows, fill factor
    and covered day span. Contiguous packing (not first-fit by size)
    is deliberate: it preserves the date sort order, so zone maps on
    o_orderdate stay tight after the rewrite -- the q_zorder_layout
    companion decision.

    The plan is PURE METADATA ALGEBRA: the per-(month, day) file
    inventory is one map-side-combined groupBy (at 100 TB this frame
    comes straight from the table-format manifest -- months x 31
    rows, no data scan at all), the bucket assignment is an exact
    integer window cumsum within each month (bucket =
    floor(rows_before / target)), and the output is one row per
    planned file. Nothing here touches row data, which is what makes
    the planner runnable before every OPTIMIZE at any scale.

    Exactness: all integers; fill factor is one round-6 double.
    Reference anchor: the per-batch parquet compaction in
    streaming/sink.py:60-94 is the WRITE-time workaround; this is the
    read-side planner for tables that accumulated the debt anyway."""
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    w = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = files.select(
        "month",
        "day",
        "n_rows",
        F.floor(
            F.coalesce(F.sum("n_rows").over(w), F.lit(0))
            / F.lit(COMPACTION_TARGET_ROWS)
        )
        .cast("long")
        .alias("bucket"),
    )
    return (
        assigned.groupBy("month", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_source_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min(F.col("day").cast("string")).alias("first_day"),
            F.max(F.col("day").cast("string")).alias("last_day"),
        )
        .select(
            "month",
            "bucket",
            "n_source_files",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.lit(float(COMPACTION_TARGET_ROWS)),
                6,
            ).alias("fill_factor"),
            "first_day",
            "last_day",
        )
        .orderBy("month", "bucket")
    )


ZORDER_QUERIES["q_compaction_plan"] = q_compaction_plan
ZORDER_ORACLES["q_compaction_plan"] = f"""
    WITH files AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1, 2),
    assigned AS (
      SELECT month, day, n_rows,
             CAST(floor(
               coalesce(sum(n_rows) OVER (
                 PARTITION BY month ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {COMPACTION_TARGET_ROWS}) AS BIGINT) AS bucket
      FROM files)
    SELECT month, bucket,
           CAST(count(*) AS BIGINT) AS n_source_files,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           round(CAST(sum(n_rows) AS DOUBLE) / {float(COMPACTION_TARGET_ROWS)}, 6)
             AS fill_factor,
           CAST(min(day) AS VARCHAR) AS first_day,
           CAST(max(day) AS VARCHAR) AS last_day
    FROM assigned GROUP BY 1, 2 ORDER BY month, bucket
"""
