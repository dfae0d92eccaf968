"""Strict Arrow-level Spark-vs-DuckDB parity sweep.

The driver's correctness gate compares row count + schema + an
order-insensitive value hash whose exact canonicalization we cannot
inspect. This checker is deliberately STRICTER than any plausible
implementation of that gate: it requires

  - identical sorted column-name lists,
  - identical row counts,
  - per-column **exact Arrow type equality** (so decimal(28,2) vs
    decimal(38,2), timestamp_ntz vs timestamp[us], int64 vs decimal128
    all fail loudly here instead of silently in CORRECTNESS_r{N}), and
  - bit-exact cell values after a canonical whole-row sort (floats
    compared by IEEE bit pattern, decimals by exact value+scale).

If a query passes this sweep, any sane row-count/schema/value-hash
comparison also passes.

Usage:
    python tools/strict_check.py [--sf /root/testdata/sf0.01] [names...]

Prints one line per query (ok/FAIL + reason + seconds) and a JSON
summary; exit code 1 if anything failed.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import struct
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon_cell(v):
    """Lossless, hashable, orderable canonical form of one cell."""
    if v is None:
        return ("n",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", struct.pack(">d", v).hex())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon_cell(x)) for k, x in v.items())))
    if isinstance(v, bytes):
        return ("y", v.hex())
    return ("s", str(type(v).__name__), str(v))


def _table_rows(tbl: pa.Table, col_order: list[str]) -> list[tuple]:
    cols = [tbl.column(c).to_pylist() for c in col_order]
    return sorted(
        tuple(_canon_cell(col[i]) for col in cols) for i in range(tbl.num_rows)
    )


def compare_tables(spark_tbl: pa.Table, duck_tbl: pa.Table) -> str | None:
    """Return None if strictly equal, else a human-readable reason."""
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_tbl.column_names)
    if s_cols != d_cols:
        return f"columns: spark={s_cols} duck={d_cols}"
    if spark_tbl.num_rows != duck_tbl.num_rows:
        return f"rows: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}"
    for c in s_cols:
        # _unlarge on BOTH sides: it also rebuilds list types through
        # pa.list_, normalizing the element field name (Spark names it
        # 'element', DuckDB 'item'; Arrow equality compares the name).
        st = _unlarge(spark_tbl.schema.field(c).type)
        dt = _unlarge(duck_tbl.schema.field(c).type)
        if st != dt:
            return f"arrow type[{c}]: spark={st} duck={dt}"
        # Policy: no temporal outputs. The driver's canonicalization
        # path (likely pandas) is unit-sensitive (ns vs us) in ways the
        # Arrow view can't see — every r01 hash-fail with a timestamp
        # column is evidence. Emit strings or epoch integers instead.
        if pa.types.is_timestamp(st) or pa.types.is_date(st):
            return f"policy[{c}]: temporal output ({st}); emit string/epoch instead"
        # Policy: no decimal outputs either. Round 2 proved the driver
        # coerces decimal128 to float asymmetrically (every r02 hash
        # fail carried a decimal column with bit-identical values) —
        # render fixed-scale strings via functions.canon.money instead.
        if pa.types.is_decimal(st):
            return f"policy[{c}]: decimal output ({st}); render money() string instead"
    s_rows = _table_rows(spark_tbl, s_cols)
    d_rows = _table_rows(duck_tbl, s_cols)
    if s_rows != d_rows:
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                return f"values differ at sorted row {i}: spark={a!r} duck={b!r}"
        return "values differ (unreachable)"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    # accept the bare scale factor ("0.01" / "sf0.01") as shorthand
    ap.add_argument(
        "--plain",
        action="store_true",
        help="Use a bare default-conf SparkSession (like the driver does) "
        "instead of session.get_spark — catches queries that silently "
        "depend on our session conf (ANSI off, UTC tz, AQE).",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if "/" not in args.sf:
        args.sf = "/root/testdata/sf" + args.sf.removeprefix("sf")

    import __spark_entry__ as entry
    from kafka_clickhouse_pipeline_spark.catalog import table_path
    from kafka_clickhouse_pipeline_spark.schemas import FIXTURE_TABLES
    from kafka_clickhouse_pipeline_spark.session import get_spark

    if args.plain:
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("strict_check_plain")
            .master(f"local[{cpus}]")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="strict_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = table_path(args.sf, name)
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    report: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf)
            spark_tbl = sdf.toArrow()
            if name in oracles:
                duck_tbl = con.execute(oracles[name]).arrow()
                # DuckDB returns large_string/large_binary; Spark plain —
                # normalize width-only differences before strict compare.
                duck_tbl = duck_tbl.cast(
                    pa.schema(
                        [
                            pa.field(
                                f.name,
                                _unlarge(f.type),
                                f.nullable,
                            )
                            for f in duck_tbl.schema
                        ]
                    )
                )
                reason = compare_tables(spark_tbl, duck_tbl)
            else:
                # rows-only query (no oracle): success = it executes
                reason = None
        except Exception as exc:  # noqa: BLE001
            reason = f"ERROR {type(exc).__name__}: {exc}"[:500]
        dt = round(time.perf_counter() - t0, 2)
        ok = reason is None
        n_fail += 0 if ok else 1
        report[name] = {"ok": ok, "sec": dt, **({} if ok else {"reason": reason})}
        tag = "ok  " if ok else "FAIL"
        extra = "" if ok else f"  {reason}"
        oracle_tag = "" if name in oracles else "  [rows-only]"
        print(f"{tag} {name:42s} {dt:7.2f}s{oracle_tag}{extra}", flush=True)

    print(json.dumps({"failed": n_fail, "total": len(names)}))
    if not args.names:
        # only a FULL sweep may replace the committed report: filtered
        # runs would clobber it with a partial view and break the
        # contract test that diffs it against the driver CORRECTNESS
        with open("STRICT_CHECK.json", "w") as f:
            json.dump(report, f, indent=1)
    divergences = diff_vs_latest_correctness(report)
    for d in divergences:
        print(f"DIVERGENCE {d}", flush=True)
        n_fail += 1
    spark.stop()
    return 1 if n_fail else 0


def latest_correctness_path(repo_root: str | None = None) -> str | None:
    """Highest-numbered CORRECTNESS_r{N}.json in the repo root."""
    import glob as _glob
    import re

    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = _glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not paths:
        return None

    def _round(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=_round)


def diff_vs_latest_correctness(
    strict_report: dict[str, dict], repo_root: str | None = None
) -> list[str]:
    """Divergences between a strict sweep and the latest driver
    CORRECTNESS file, on the queries both covered.

    Strict is by construction stricter than the driver's hash gate, so
    strict-ok + driver-fail means strict is NOT a trustworthy window-
    rotation predictor (the serious direction); driver-green +
    strict-FAIL means strict raises alarms the driver does not (noisy,
    but policy bans are intentional extra strictness, so only
    non-policy reasons count as divergence there). Either direction
    fails the sweep so it gets investigated. (VERDICT r3 #8.)"""
    path = latest_correctness_path(repo_root)
    if path is None:
        return []
    with open(path) as f:
        driver = json.load(f)
    out: list[str] = []
    for name, drec in driver.items():
        srec = strict_report.get(name)
        if srec is None:
            continue  # sweep was filtered to other names
        driver_green = bool(
            drec.get("rows_match")
            and drec.get("schema_match")
            and drec.get("hash_match")
            and not drec.get("err")
        )
        strict_ok = bool(srec.get("ok"))
        if strict_ok and not driver_green:
            out.append(
                f"{name}: strict ok but driver NOT green in "
                f"{os.path.basename(path)} ({drec}) — strict is not a "
                "trustworthy predictor for this query"
            )
        elif driver_green and not strict_ok:
            reason = str(srec.get("reason", ""))
            if not reason.startswith("policy["):
                out.append(
                    f"{name}: driver green in {os.path.basename(path)} but "
                    f"strict FAILs ({reason}) — adjudicate before trusting "
                    "local sweeps"
                )
    return out


def _unlarge(t: pa.DataType) -> pa.DataType:
    """Map large_string/large_binary/large_list to their plain twins
    (width-of-offset only; value semantics identical)."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t):
        return pa.list_(_unlarge(t.value_type))
    if pa.types.is_list(t):
        return pa.list_(_unlarge(t.value_type))
    return t


if __name__ == "__main__":
    sys.exit(main())
