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
    """The driver calls fn(spark, sf_dir) positionally: exactly two
    positional parameters, and anything extra (scale knobs like
    q_dedup_embedding_lsh's geometry) must be keyword-only WITH a
    default."""
    import inspect

    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        positional = [
            p
            for p in params
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
        ]
        assert len(positional) == 2, name
        for p in params[2:]:
            assert p.kind == p.KEYWORD_ONLY and p.default is not p.empty, (
                name,
                p.name,
            )
