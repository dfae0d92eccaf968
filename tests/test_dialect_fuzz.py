"""Property tests for the ClickHouse-dialect translator: structural
invariants that must hold for ANY input, not just the reference's four
queries."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_clickhouse_pipeline_spark.functions.clickhouse_dialect import translate

#: Identifier-ish fragments that must never be rewritten (no dialect
#: function names).
ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower()
    not in {
        "tostartofhour",
        "toyyyymm",
        "todecimal32",
        "parsedatetimebesteffortornull",
        "now",
        "count",
    }
)


@settings(max_examples=200, deadline=None)
@given(
    cols=st.lists(ident, min_size=1, max_size=4),
    table=ident,
)
def test_translate_is_identity_on_plain_sql(cols, table):
    """SQL that uses none of the dialect functions passes through
    byte-identical (the translator must never corrupt ordinary
    identifiers, including ones that merely CONTAIN function names)."""
    sql = f"SELECT {', '.join(cols)}, now_x, xnow, counts FROM {table}"
    assert translate(sql) == sql


@settings(max_examples=200, deadline=None)
@given(lit=st.text(alphabet=st.characters(blacklist_characters="'"), max_size=40))
def test_translate_never_touches_string_literals(lit):
    """Dialect function names INSIDE string literals are data, not
    syntax: the literal survives translation unchanged even when it
    spells now(), toStartOfHour(x), etc."""
    sql = f"SELECT 'now() toStartOfHour({lit})' AS s, now() AS t FROM x"
    out = translate(sql, anchor="2024-01-01 00:00:00")
    assert f"'now() toStartOfHour({lit})'" in out
    assert out.endswith("TIMESTAMP '2024-01-01 00:00:00' AS t FROM x")


@settings(max_examples=100, deadline=None)
@given(depth=st.integers(min_value=1, max_value=6))
def test_translate_handles_nested_calls(depth):
    """Arbitrarily nested dialect calls rewrite inside-out with
    balanced parentheses and no residual dialect names."""
    expr = "e"
    for _ in range(depth):
        expr = f"parseDateTimeBestEffortOrNull({expr})"
    out = translate(f"SELECT toYYYYMM({expr}) FROM t")
    assert "toYYYYMM" not in out and "parseDateTimeBestEffort" not in out
    assert out.count("(") == out.count(")")


@settings(max_examples=100, deadline=None)
@given(scale=st.integers(min_value=0, max_value=9))
def test_todecimal32_scale_passthrough(scale):
    out = translate(f"SELECT toDecimal32(price, {scale}) FROM t")
    assert f"CAST(price AS DECIMAL(9, {scale}))" in out
