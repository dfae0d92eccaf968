"""Incremental streaming NEAR-dup dedup: signature family agrees with
the batch MinHash operator, within-batch and cross-run near-dups drop,
verbatim-unrelated docs survive, replays are no-ops."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    minhash_lsh_pairs,
)
from kafka_clickhouse_pipeline_spark.streaming.incremental_neardup import (
    MIN_MATCHING_HASHES,
    MINHASH_HASHES,
    incremental_neardup_stream,
    minhash_sig_bands,
    neardup_batch_against_index,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING, source STRING"

#: ~40-token base texts; NEAR is one-word-edited (signature agreement
#: measured 13/16 >= MIN_MATCHING_HASHES), FAR shares no shingles with
#: BASE (0/16), FAR_NEAR is FAR with only the final token changed.
BASE = (
    "the quick brown fox jumps over the lazy dog near the old stone bridge "
    "by the quiet river bank today while morning light settles gently across "
    "the wide green valley and birds begin their usual chorus in the tall trees"
)
NEAR = BASE.replace("quiet", "busy")
FAR = (
    "completely different content about spark structured streaming micro batch "
    "execution and state stores with watermarks checkpoints offsets triggers "
    "and sinks documented across many pages of the programming guide chapters"
)
FAR_NEAR = FAR.replace("chapters", "sections")


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r[0], "text": r[1], "source": r[2]}) + "\n")


def test_signature_family_matches_batch_operator(spark, sf_dir):
    """Any fixture pair the BATCH MinHash operator reports at
    jaccard >= threshold must also sig-collide in the streaming family
    at MIN_MATCHING_HASHES (same hash family => the streaming decision
    is at least as aggressive as verified banding on true near-dups)."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = [
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(docs).collect()
        if r.jaccard >= JACCARD_THRESHOLD
    ]
    assert pairs, "fixture should contain verified near-dup pairs"
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in minhash_sig_bands(docs).select("doc_id", "sig").distinct().collect()
    }
    # Signature agreement is an unbiased Jaccard estimator; at 16
    # hashes a j>=0.8 pair is overwhelmingly likely to clear 13/16 for
    # at least the pairs the banded-and-verified operator emits. Check
    # the aggregate rather than each pair (estimator variance).
    hits = sum(
        1
        for d1, d2 in pairs
        if sum(a == b for a, b in zip(sigs[d1], sigs[d2])) >= MIN_MATCHING_HASHES
    )
    assert hits / len(pairs) >= 0.8, (hits, len(pairs))


def test_neardup_batch_against_index_pure(spark):
    index_rows = minhash_sig_bands(_docs(spark, [(0, BASE, "hist")])).select(
        "bucket", "band", "doc_id", "sig"
    )
    batch = _docs(
        spark,
        [
            (10, NEAR, "a"),  # near-dup of history -> dropped
            (11, FAR, "a"),  # unrelated -> survives
            (12, FAR_NEAR, "b"),  # near-dup of 11 (larger id) -> dropped
            (13, "tiny", "c"),  # < 3 tokens: no signature -> survives
        ],
    )
    out = neardup_batch_against_index(batch, index_rows)
    assert {r.doc_id for r in out.collect()} == {11, 13}


def test_streaming_incremental_neardup_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "docs"
    idx = tmp_path / "index"
    ckpt = tmp_path / "ckpt"

    _write_jsonl(str(src / "f1.jsonl"), [(1, BASE, "s"), (2, NEAR, "s"), (3, FAR, "s")])
    _write_jsonl(str(src / "f2.jsonl"), [(4, BASE.replace("today", "tonight"), "s"), (5, "unique short doc about nothing else at all with plenty of tokens to shingle", "s")])

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = incremental_neardup_stream(
        stream, str(out), str(idx), str(ckpt)
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    kept = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    # 2 is a within-run near-dup of 1; 4 is a cross-batch near-dup of 1
    assert 1 in kept and 3 in kept and 5 in kept
    assert 2 not in kept and 4 not in kept

    # the index holds one exploded band set per survivor
    idx_rows = spark.read.parquet(str(idx))
    per_doc = {
        r["doc_id"]: r["n"]
        for r in idx_rows.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_doc) == kept
    assert all(n == 8 for n in per_doc.values())


def test_writer_replay_is_noop(spark, tmp_path):
    from kafka_clickhouse_pipeline_spark.streaming.incremental_neardup import (
        incremental_neardup_writer,
    )

    out, idx = str(tmp_path / "docs"), str(tmp_path / "index")
    w = incremental_neardup_writer(out, idx)
    batch = _docs(spark, [(1, BASE, "s"), (2, FAR, "s")])
    w(batch, 0)
    n_docs = spark.read.parquet(out).count()
    n_idx = spark.read.parquet(idx).count()
    w(batch, 0)  # replay
    assert spark.read.parquet(out).count() == n_docs == 2
    assert spark.read.parquet(idx).count() == n_idx == 16
