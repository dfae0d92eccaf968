"""DuckDB-oracle differential tests for the four reference serving
queries (SURVEY.md section 2.7) -- the sqllogictest analog."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import assert_query_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: Always-on oracle coverage = the driver's PRIORITY window (what the
#: upcoming CORRECTNESS run attests) + the rows-only sketches. The
#: rest of the registry is `fullmatrix` (see pytest.ini): still
#: collected, run per-round via -m fullmatrix and by the per-round
#: Arrow-strict sweep, excluded from the driver's time-boxed run.
#: Queries whose internals round 12 optimized: their oracle equality
#: stays in the default (driver-window) run regardless of rotation.
_R12_TOUCHED = (
    "q_dedup_prefix_filter",
    "q_fingerprint_winnow",
    "q_bfs_hops",
    "q_adamic_adar",
    "q_adamic_adar_capped",
    "q_node_jaccard",
    "q_node_jaccard_capped",
    "q_betweenness_sampled",
    "q_ann_ivf_kmeans_topk",
    "q_ann_ivf_split_topk",
    "q_cluster_topics",
    "q_silhouette_kmeans",
)

_ALWAYS_ON = (
    set(entrymod.PRIORITY)
    | set(entrymod.SKETCH_ALLOWLIST)
    | set(_R12_TOUCHED)
)


@pytest.mark.parametrize(
    "name",
    [
        n
        if n in _ALWAYS_ON
        else pytest.param(n, marks=pytest.mark.fullmatrix)
        for n in sorted(QUERIES)
    ],
)
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
