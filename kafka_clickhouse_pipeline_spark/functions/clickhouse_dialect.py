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

Beyond the reference's own six functions, the layer accepts the wider
ClickHouse surface a dashboard user would bring along (each mapped to
the built-in Spark function with the same semantics):

    sumIf(x, c) / countIf(c) /      -> sum(if(c, x, 0)) / sum(if(c,1,0))
    avgIf / minIf / maxIf(x, c)        / agg(CASE WHEN c THEN x END)
    uniqExact(x) , uniq(x)          -> count(DISTINCT x)   [uniq is
                                       approximate in ClickHouse; the
                                       exact count is a strict
                                       refinement of its contract]
    argMax(a, v) / argMin(a, v)     -> max_by(a, v) / min_by(a, v)
    multiIf(c1,v1,...,e)            -> CASE WHEN c1 THEN v1 ... ELSE e END
    quantile(p)(x), quantileExact   -> percentile(x, p)  [parametric
                                       aggregate syntax]
    arrayJoin(x)                    -> explode(x)
    has(arr, v)                     -> array_contains(arr, v)
    splitByChar('c', s)             -> split(s, <regex-escaped c>)
    JSONExtractString/Int/Float     -> get_json_object + CAST
    toDate / toDateTime             -> to_date / to_timestamp
    toStartOfMinute/Day/Month/...   -> date_trunc('<unit>', x)
    toHour/toMinute/toSecond/
      toDayOfMonth/toMonth/toYear   -> hour/minute/second/day/month/year
    toDayOfWeek(x)                  -> Monday=1..Sunday=7 arithmetic on
                                       Spark's dayofweek (Sunday=1)
    toInt*/toUInt*/toFloat*/        -> CAST(... AS <closest Spark type>)
      toString                         (UInt64 maps to BIGINT: Spark has
                                       no unsigned 64-bit type)
    intDiv(a, b) / modulo(a, b)     -> (a DIV b) / (a % b)
    formatDateTime(x, '%F %H:%i')   -> date_format with the %-tokens
                                       transliterated to JVM patterns
    ... PREWHERE c                  -> WHERE c  [ClickHouse PREWHERE is
                                       a storage-pushdown hint; Spark's
                                       Catalyst pushes WHERE predicates
                                       to the scan automatically, so
                                       plain WHERE carries the intent]

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

import re

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
        # rewrite back-to-front so offsets stay valid; a build that
        # returns None declines the span (left byte-identical)
        prev = sql
        for start, end, args in reversed(calls):
            repl = build(args)
            if repl is not None:
                sql = sql[:start] + repl + sql[end:]
        if sql == prev:
            return sql


def _rewrite_parametric(sql: str, name: str, build) -> str:
    """Rewrite ClickHouse parametric-aggregate syntax ``name(params)(args)``
    via ``build(params, args) -> str`` (e.g. ``quantile(0.5)(x)``)."""
    while True:
        calls = _find_calls(sql, name)
        hit = None
        for start, end, params in calls:
            j = end
            while j < len(sql) and sql[j].isspace():
                j += 1
            if j < len(sql) and sql[j] == "(":
                # parse the second argument list with the same scanner
                inner = _find_calls("f" + sql[j:], "f")
                if inner and inner[0][0] == 0:
                    _, iend, args = inner[0]
                    hit = (start, j + iend - 1, params, args)
                    break
        if hit is None:
            return sql
        start, end, params, args = hit
        sql = sql[:start] + build(params, args) + sql[end:]


def _replace_keyword(sql: str, word: str, repl: str) -> str:
    """Whole-word keyword replacement outside string literals."""
    out, i, n = [], 0, len(sql)
    lword = word.lower()
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        if (
            sql[i : i + len(word)].lower() == lword
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            and (
                i + len(word) >= n
                or not (sql[i + len(word)].isalnum() or sql[i + len(word)] == "_")
            )
        ):
            out.append(repl)
            i += len(word)
            continue
        out.append(ch)
        i += 1
    return "".join(out)


#: ClickHouse cast helpers -> closest Spark SQL type. UInt64 maps to
#: BIGINT (Spark has no unsigned 64-bit integer type); the narrower
#: unsigned types map to the next-wider signed type so every value fits.
_CAST_FUNCS = {
    "toInt8": "TINYINT",
    "toInt16": "SMALLINT",
    "toInt32": "INT",
    "toInt64": "BIGINT",
    "toUInt8": "SMALLINT",
    "toUInt16": "INT",
    "toUInt32": "BIGINT",
    "toUInt64": "BIGINT",
    "toFloat32": "FLOAT",
    "toFloat64": "DOUBLE",
    "toString": "STRING",
}

#: toStartOf* -> date_trunc units (week deliberately absent: ClickHouse
#: weeks start Sunday by default, Spark's start Monday -- a silent
#: off-by-one-day is worse than an unsupported-function error).
_TRUNC_FUNCS = {
    "toStartOfMinute": "minute",
    "toStartOfDay": "day",
    "toStartOfMonth": "month",
    "toStartOfQuarter": "quarter",
    "toStartOfYear": "year",
}

#: Date-part extractors with identical semantics in both engines.
_PART_FUNCS = {
    "toHour": "hour",
    "toMinute": "minute",
    "toSecond": "second",
    "toDayOfMonth": "day",
    "toMonth": "month",
    "toYear": "year",
}

#: ClickHouse formatDateTime %-tokens -> JVM DateTimeFormatter patterns.
#: Only tokens with identical rendering are mapped; anything else raises
#: so a silent wrong-format never ships.
_FMT_TOKENS = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%i": "mm",
    "%S": "ss",
    "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss",
    "%%": "%",
}


def _format_pattern(ch_fmt: str) -> str:
    """Transliterate a ClickHouse formatDateTime pattern (single-quoted
    SQL literal, quotes included) to a JVM pattern literal."""
    if not (ch_fmt.startswith("'") and ch_fmt.endswith("'")):
        raise ValueError(
            f"formatDateTime pattern must be a string literal, got {ch_fmt!r}"
        )
    body = ch_fmt[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "%":
            tok = body[i : i + 2]
            if tok not in _FMT_TOKENS:
                raise ValueError(f"unsupported formatDateTime token {tok!r}")
            out.append(_FMT_TOKENS[tok])
            i += 2
        else:
            # literal run: quote it if it contains letters (JVM patterns
            # treat bare letters as pattern chars)
            j = i
            while j < len(body) and body[j] != "%":
                j += 1
            lit = body[i:j]
            out.append(f"'{lit}'" if re.search(r"[A-Za-z]", lit) else lit)
            i = j
    return "'" + "".join(out) + "'"


def _split_regex_literal(sep: str) -> str:
    """splitByChar separator literal -> regex-escaped Spark split literal."""
    if not (sep.startswith("'") and sep.endswith("'")):
        raise ValueError(f"splitByChar separator must be a string literal, got {sep!r}")
    raw = sep[1:-1].replace("''", "'")
    escaped = re.escape(raw).replace("'", "''")
    return f"'{escaped}'"


def _multi_if(args: list[str]) -> str:
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf needs cond,value pairs plus an else branch")
    parts = ["CASE"]
    for c, v in zip(args[:-1:2], args[1:-1:2]):
        parts.append(f"WHEN {c} THEN {v}")
    parts.append(f"ELSE {args[-1]} END")
    return " ".join(parts)


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

    # ---- extended surface (see module docstring) ----
    # parametric aggregates first: quantile(p)(x) would otherwise be
    # seen as a plain call of quantile
    for qname in ("quantileExact", "quantile"):
        sql = _rewrite_parametric(
            sql, qname, lambda p, a: f"percentile({a[0]}, {p[0]})"
        )
    sql = _rewrite(
        sql, "sumIf", lambda a: f"sum(if(({a[1]}), ({a[0]}), 0))"
    )
    sql = _rewrite(sql, "countIf", lambda a: f"sum(if(({a[0]}), 1, 0))")
    for cname, sname in (("avgIf", "avg"), ("minIf", "min"), ("maxIf", "max")):
        sql = _rewrite(
            sql,
            cname,
            lambda a, s=sname: f"{s}(CASE WHEN ({a[1]}) THEN ({a[0]}) END)",
        )
    for uname in ("uniqExact", "uniq"):
        sql = _rewrite(
            sql, uname, lambda a: f"count(DISTINCT {', '.join(a)})"
        )
    sql = _rewrite(sql, "argMax", lambda a: f"max_by({a[0]}, {a[1]})")
    sql = _rewrite(sql, "argMin", lambda a: f"min_by({a[0]}, {a[1]})")
    sql = _rewrite(sql, "multiIf", _multi_if)
    sql = _rewrite(sql, "arrayJoin", lambda a: f"explode({a[0]})")
    sql = _rewrite(sql, "has", lambda a: f"array_contains({a[0]}, {a[1]})")
    sql = _rewrite(
        sql,
        "splitByChar",
        lambda a: f"split({a[1]}, {_split_regex_literal(a[0])})",
    )
    sql = _rewrite(
        sql,
        "JSONExtractString",
        lambda a: f"get_json_object({a[0]}, '$.' || {a[1]})"
        if not (a[1].startswith("'") and a[1].endswith("'"))
        else f"get_json_object({a[0]}, '$.{a[1][1:-1]}')",
    )
    sql = _rewrite(
        sql,
        "JSONExtractInt",
        lambda a: f"CAST(get_json_object({a[0]}, '$.{a[1][1:-1]}') AS BIGINT)",
    )
    sql = _rewrite(
        sql,
        "JSONExtractFloat",
        lambda a: f"CAST(get_json_object({a[0]}, '$.{a[1][1:-1]}') AS DOUBLE)",
    )
    sql = _rewrite(sql, "toDate", lambda a: f"to_date({a[0]})")
    sql = _rewrite(sql, "toDateTime", lambda a: f"to_timestamp({a[0]})")
    for fname, unit in _TRUNC_FUNCS.items():
        sql = _rewrite(sql, fname, lambda a, u=unit: f"date_trunc('{u}', {a[0]})")
    for fname, part in _PART_FUNCS.items():
        sql = _rewrite(sql, fname, lambda a, p=part: f"{p}({a[0]})")
    # ClickHouse: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
    sql = _rewrite(
        sql,
        "toDayOfWeek",
        lambda a: f"(((dayofweek({a[0]}) + 5) % 7) + 1)",
    )
    for fname, stype in _CAST_FUNCS.items():
        sql = _rewrite(sql, fname, lambda a, t=stype: f"CAST({a[0]} AS {t})")
    sql = _rewrite(sql, "intDiv", lambda a: f"(({a[0]}) DIV ({a[1]}))")
    sql = _rewrite(sql, "modulo", lambda a: f"(({a[0]}) % ({a[1]}))")
    sql = _rewrite(
        sql,
        "formatDateTime",
        lambda a: f"date_format({a[0]}, {_format_pattern(a[1])})",
    )
    sql = _rewrite(sql, "groupArray", lambda a: f"collect_list({a[0]})")
    sql = _rewrite(sql, "groupUniqArray", lambda a: f"collect_set({a[0]})")
    # ClickHouse any()/anyLast() contract is 'some value from the
    # group, nondeterministic'; Spark's any_value carries exactly that
    # contract (anyLast's 'last seen' is itself arrival-order-defined,
    # which a distributed read does not fix).
    sql = _rewrite(sql, "anyLast", lambda a: f"any_value({a[0]})")
    # guard: `x > ANY (SELECT ...)` is the SQL quantified comparison,
    # not the ClickHouse aggregate -- re-emitting unchanged terminates
    # the rewriter's fixpoint loop
    sql = _rewrite(
        sql,
        "any",
        lambda a: (
            None
            if len(a) == 1 and a[0].lstrip().lower().startswith("select")
            else f"any_value({a[0]})"
        ),
    )
    sql = _replace_keyword(sql, "PREWHERE", "WHERE")
    sql = _rewrite_limit_by(sql)
    return sql


def _top_level_spans(sql: str):
    """Yield (index, char) for characters at paren depth 0 outside
    string literals -- the scanner the structural rewrites share."""
    depth, i, n = 0, 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            yield i, ch
        i += 1


def _find_top_keyword(sql: str, word: str, start: int = 0) -> int:
    """Offset of the first whole-word top-level occurrence of ``word``
    at or after ``start``, or -1."""
    lword = word.lower()
    flat = {i: c for i, c in _top_level_spans(sql)}
    n, m = len(sql), len(word)
    for i in sorted(flat):
        if i < start or i + m > n:
            continue
        if all(k in flat for k in range(i, i + m)) and sql[i : i + m].lower() == lword:
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            after_ok = i + m == n or not (sql[i + m].isalnum() or sql[i + m] == "_")
            if before_ok and after_ok:
                return i
    return -1


def _rewrite_limit_by(sql: str) -> str:
    """ClickHouse ``... ORDER BY <o> LIMIT <n> BY <cols> [LIMIT <m>]``
    -> a row_number window over the BY columns ordered by <o>. The
    offset variants ``LIMIT <off>, <n> BY`` and ``LIMIT <n> OFFSET
    <off> BY`` keep rows ``BETWEEN off+1 AND off+n`` per group.

    Spark has no LIMIT-BY clause; the standard rewrite wraps the query
    and keeps the first n rows per BY-group under the query's own
    ORDER BY, then re-applies the presentation order (and the plain
    trailing LIMIT, if any). Supported shape: one top-level ORDER BY
    before the LIMIT BY, referencing output columns -- the form every
    dashboard 'top n per group' query takes. A LIMIT BY without an
    ORDER BY is rejected: ClickHouse keeps 'first encountered' rows
    there, which no distributed engine can reproduce deterministically.
    """
    lim = _find_top_keyword(sql, "LIMIT")
    while lim != -1:
        # three ClickHouse forms: LIMIT n BY, LIMIT offset, n BY,
        # LIMIT n OFFSET offset BY (ADVICE r4: the offset variants
        # previously fell through untranslated and died at Spark
        # parse time instead of being handled)
        m = re.match(
            r"LIMIT\s+(\d+)\s*(?:,\s*(\d+)|OFFSET\s+(\d+))?\s+BY\s+",
            sql[lim:],
            re.IGNORECASE,
        )
        if m:
            break
        lim = _find_top_keyword(sql, "LIMIT", lim + 5)
    if lim == -1:
        return sql
    if m.group(2) is not None:  # LIMIT offset, n BY
        offset, n_rows = int(m.group(1)), int(m.group(2))
    elif m.group(3) is not None:  # LIMIT n OFFSET offset BY
        offset, n_rows = int(m.group(3)), int(m.group(1))
    else:
        offset, n_rows = 0, int(m.group(1))
    cols_start = lim + m.end()
    nxt = _find_top_keyword(sql, "LIMIT", cols_start)
    cols = sql[cols_start : nxt if nxt != -1 else len(sql)].strip().rstrip(";")
    tail = sql[nxt:].strip().rstrip(";") if nxt != -1 else ""
    order = _find_top_keyword(sql, "ORDER", 0)
    if order == -1 or order > lim:
        raise ValueError(
            "LIMIT BY without a preceding ORDER BY is nondeterministic; "
            "add an ORDER BY to make the kept rows well-defined"
        )
    om = re.match(r"ORDER\s+BY\s+", sql[order:], re.IGNORECASE)
    o_expr = sql[order + om.end() : lim].strip()
    head = sql[:order].strip()
    keep = (
        f"__lb_rn BETWEEN {offset + 1} AND {offset + n_rows}"
        if offset
        else f"__lb_rn <= {n_rows}"
    )
    out = (
        f"SELECT * EXCEPT (__lb_rn) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {cols} "
        f"ORDER BY {o_expr}) AS __lb_rn FROM ({head}) __lb"
        f") WHERE {keep} ORDER BY {o_expr}"
    )
    if tail:
        out += f" {tail}"
    return out


def run_clickhouse_sql(spark, sql: str, anchor: str | None = None):
    """Translate and execute a ClickHouse-dialect query against the
    tables registered in the current Spark session (e.g. the ``sales``
    / ``stock_movements`` tables the ingest pipeline materializes)."""
    return spark.sql(translate(sql, anchor=anchor))
