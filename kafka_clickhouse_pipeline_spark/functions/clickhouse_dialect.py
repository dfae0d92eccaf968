"""ClickHouse-dialect SQL acceptance layer: run the reference's
analytical SQL **verbatim** on this engine.

The reference's query surface is ClickHouse SQL (web-app/app.py:57-66,
91-101, 126-135, 158-160 and the MV SELECT bodies at
generate_data.py:210-246). A user switching engines should not have to
rewrite those strings, so ``translate()`` maps the ClickHouse-isms the
reference uses onto Spark SQL:

    toStartOfHour(x)                -> date_trunc('hour', x)
    toYYYYMM(x)                     -> CAST(year(x)*100 + month(x) AS INT)
    toDecimal32(x, s)               -> CAST(x AS DECIMAL(9, s))
    parseDateTimeBestEffortOrNull(x)-> coalesce(to_timestamp(x, fmt),
                                                to_timestamp(x))
    now()                           -> current_timestamp()  [or a fixed
                                       anchor literal for reproducible
                                       runs over static data]
    count()                         -> count(*)

Every rewrite mirrors the corresponding engine function in
``kafka_clickhouse_pipeline_spark.functions`` exactly (same format
string, same decimal type, same coalesce order), so a translated query
and the DataFrame pipeline produce identical values. ``if(c, a, b)``,
``INTERVAL n DAY`` arithmetic, alias references in GROUP BY, and
computed alias expressions in ORDER BY are already valid Spark SQL and
pass through untouched.

Translation is purely syntactic (balanced-parenthesis function-call
rewriting, string-literal aware), so the output stays a declarative
SQL string: Catalyst sees the same logical plan it would get from the
hand-written Spark form -- predicate pushdown, partial aggregation,
TakeOrderedAndProject all still apply. No UDFs are registered; the
translated text uses only built-in functions.
"""

from __future__ import annotations

from ..functions import EVENT_TIME_FORMAT


def _find_calls(sql: str, name: str) -> list[tuple[int, int, list[str]]]:
    """Locate every top-level call of ``name(...)`` in ``sql`` outside
    string literals: (start, end_exclusive, top_level_args). Scans
    left-to-right; nested calls of the same name are found on the next
    pass (the rewriter loops until fixpoint)."""
    out = []
    i, n = 0, len(sql)
    lname = name.lower()
    while i < n:
        ch = sql[i]
        if ch == "'":  # skip string literal ('' escapes)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if sql[i : i + len(name)].lower() == lname and (
            i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
        ):
            j = i + len(name)
            while j < n and sql[j].isspace():
                j += 1
            if j < n and sql[j] == "(":
                depth, k, args, last = 0, j, [], j + 1
                in_str = False
                while k < n:
                    c = sql[k]
                    if in_str:
                        if c == "'":
                            in_str = False
                    elif c == "'":
                        in_str = True
                    elif c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                        if depth == 0:
                            args.append(sql[last:k].strip())
                            break
                    elif c == "," and depth == 1:
                        args.append(sql[last:k].strip())
                        last = k + 1
                    k += 1
                if depth == 0 and k < n:
                    if args == [""]:
                        args = []
                    out.append((i, k + 1, args))
                    i = k + 1
                    continue
        i += 1
    return out


def _rewrite(sql: str, name: str, build) -> str:
    """Replace every ``name(...)`` call via ``build(args) -> str``,
    repeating until a fixpoint (handles nested occurrences; stops if a
    pass changes nothing, e.g. a rewrite that re-emits the name)."""
    while True:
        calls = _find_calls(sql, name)
        if not calls:
            return sql
        # rewrite back-to-front so offsets stay valid
        prev = sql
        for start, end, args in reversed(calls):
            sql = sql[:start] + build(args) + sql[end:]
        if sql == prev:
            return sql


def translate(sql: str, anchor: str | None = None) -> str:
    """ClickHouse SQL -> Spark SQL for the reference's query surface.

    ``anchor``: optional 'YYYY-MM-DD HH:MM:SS' literal substituted for
    ``now()`` so relative-time predicates are reproducible over static
    data (the same ANCHOR contract operators/serving.py uses). Default
    keeps live ``current_timestamp()`` semantics.
    """
    sql = _rewrite(
        sql, "toStartOfHour", lambda a: f"date_trunc('hour', {a[0]})"
    )
    sql = _rewrite(
        sql,
        "toYYYYMM",
        lambda a: f"CAST(year({a[0]}) * 100 + month({a[0]}) AS INT)",
    )
    sql = _rewrite(
        sql,
        "toDecimal32",
        lambda a: f"CAST({a[0]} AS DECIMAL(9, {a[1].strip() if len(a) > 1 else 0}))",
    )
    sql = _rewrite(
        sql,
        "parseDateTimeBestEffortOrNull",
        lambda a: (
            f"coalesce(to_timestamp({a[0]}, '{EVENT_TIME_FORMAT}'), "
            f"to_timestamp({a[0]}))"
        ),
    )
    now_expr = (
        f"TIMESTAMP '{anchor}'" if anchor is not None else "current_timestamp()"
    )
    sql = _rewrite(sql, "now", lambda a: now_expr)
    # ClickHouse count() == count(*)
    sql = _rewrite(sql, "count", lambda a: "count(*)" if not a else f"count({', '.join(a)})")
    return sql


def run_clickhouse_sql(spark, sql: str, anchor: str | None = None):
    """Translate and execute a ClickHouse-dialect query against the
    tables registered in the current Spark session (e.g. the ``sales``
    / ``stock_movements`` tables the ingest pipeline materializes)."""
    return spark.sql(translate(sql, anchor=anchor))
