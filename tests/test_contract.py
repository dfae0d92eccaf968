"""Meta-tests on the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_rows_only_queries_are_documented():
    """Every rows-only query must state why in its docstring (the judge
    sees which queries lack oracles; the reason must be discoverable)."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name in set(q) - set(o):
        doc = (q[name].__doc__ or "").lower()
        assert "rows-only" in doc or "approximate" in doc or "oracle" in doc, name


def test_all_queries_are_callables_with_two_args():
    import inspect

    for name, fn in entrymod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, name
