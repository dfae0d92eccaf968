"""Plan-inspection helpers: assert that the physical plan Catalyst
chose is the one we want at scale (filter pushdown reached the scan,
small dims broadcast, top-K compiled to TakeOrderedAndProject, Python
stayed out of the hot path).

The reference delegates all of this to ClickHouse (SURVEY.md section
4); here it is validated explicitly per query in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``df.explain``
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """Simple-mode plan: whole-stage-codegen'd operators are starred
    ``*(n) Op`` (the formatted mode elides codegen annotations)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the executed plan contains WholeStageCodegen subtrees.
    Under AQE, query stages (and their codegen subtrees) exist only
    after execution, and only ``collect`` runs THIS DataFrame's own
    QueryExecution (a write wraps it in a new one) -- test-scale
    frames only."""
    df.collect()
    report = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return "Found 0 WholeStageCodegen subtrees" not in report


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any parquet scan carries pushed-down predicates."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Column names the parquet scan actually reads (column pruning
    check). Returns the ReadSchema field list of the first scan whose
    location contains ``table_hint``."""
    plan = formatted_plan(df)
    lines = plan.splitlines()
    loc_ok = not table_hint
    for i, line in enumerate(lines):
        if "Location:" in line and table_hint and table_hint in line:
            loc_ok = True
        if "ReadSchema" in line and loc_ok:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.index("<") + 1 : schema.rindex(">")]
            cols = []
            depth = 0
            field = ""
            for ch in inner:
                if ch == "," and depth == 0:
                    cols.append(field.split(":", 1)[0])
                    field = ""
                    continue
                if ch in "<(":
                    depth += 1
                if ch in ">)":
                    depth -= 1
                field += ch
            if field:
                cols.append(field.split(":", 1)[0])
            return cols
    return []


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators (shuffles) in the physical plan.
    Counts only the '(n) Exchange' detail headers so the tree summary
    isn't double-counted."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, flags=re.MULTILINE))


def uses_top_k(df: DataFrame) -> bool:
    """True if ORDER BY+LIMIT compiled to TakeOrderedAndProject (true
    top-K) instead of a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def python_free(df: DataFrame) -> bool:
    """True if no Python evaluation (UDF / mapInPandas) appears in the
    plan -- the whole query runs JVM-side."""
    plan = formatted_plan(df)
    return not any(
        marker in plan
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "MapInPandas",
            "MapInArrow",
        )
    )


def rowwise_python_free(df: DataFrame) -> bool:
    """True if no ROW-AT-A-TIME Python UDF appears in the plan.
    Arrow-batched evaluation (pandas UDFs / mapInPandas) is allowed:
    it is the sanctioned vectorized escape hatch for semantics the
    built-ins cannot express efficiently (e.g. bounded grouped top-k);
    BatchEvalPython -- per-row pickling -- never is."""
    return "BatchEvalPython" not in formatted_plan(df)
