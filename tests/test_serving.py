"""DuckDB-oracle differential tests for the four reference serving
queries (SURVEY.md section 2.7) -- the sqllogictest analog."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import assert_query_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    if name not in ORACLES:
        # non-SQL-expressible op: weaker rows-only check
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    assert_query_matches_oracle(spark, oracle, QUERIES[name], ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["hour", "total_quantity", "revenue"]
