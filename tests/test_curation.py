"""Behavioral tests for the curation operators beyond oracle parity:
redaction output on real PII-shaped strings, packing invariants, and
quality-flag semantics on constructed degenerate documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_pipeline_spark.operators.curation import (
    GOPHER_MAX_DUP_BIGRAM,
    PACK_CAPACITY,
    pack_sequences,
    redact_pii,
)


def test_redact_pii_real_strings(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+spam@example.co.uk for details"),
            (2, "call +1 (415) 555-0199 or 8 800 2000-600 now"),
            (3, "order #12345 shipped 7 units"),
            (4, "nothing sensitive here"),
        ],
        "id long, s string",
    )
    got = {
        r.id: r.red
        for r in df.select("id", redact_pii(F.col("s")).alias("red")).collect()
    }
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == "order #<NUM> shipped <NUM> units"
    assert got[4] == "nothing sensitive here"


def test_pack_sequences_invariants(spark):
    """Every bin fits in capacity unless it holds a single oversize
    doc; bin ids are contiguous from 1 in doc_id order per group."""
    rows = [
        # source a: 100+100 | 200 | 300(oversize alone) | 50
        (0, "a", 100), (1, "a", 100), (2, "a", 200), (3, "a", 300), (4, "a", 50),
        # source b: single tiny doc
        (10, "b", 5),
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), s) for i, s, n in rows],
        "doc_id long, text string, source string",
    )
    out = pack_sequences(docs, capacity=PACK_CAPACITY).collect()
    by_doc = {r.doc_id: r for r in out}
    assert [by_doc[i].bin_id for i in (0, 1, 2, 3, 4)] == [1, 1, 2, 3, 4]
    assert by_doc[10].bin_id == 1
    # per-bin totals respect capacity except the oversize singleton
    fills: dict[tuple, int] = {}
    counts: dict[tuple, int] = {}
    for r in out:
        key = (r.source, r.shard, r.bin_id)
        fills[key] = fills.get(key, 0) + r.n_tokens
        counts[key] = counts.get(key, 0) + 1
    for key, tot in fills.items():
        assert tot <= PACK_CAPACITY or counts[key] == 1


def test_quality_gopher_flags_degenerate_docs(spark, tmp_path):
    """A maximally repetitive doc fails every repetition rule; a
    diverse doc of distinct tokens passes them all."""
    import __spark_entry__ as entrymod

    diverse = " ".join(f"tok{i}" for i in range(40))
    repetitive = " ".join(["spam spam"] * 40)
    d = tmp_path / "sf"
    docs = spark.createDataFrame(
        [(0, diverse, "en", "srcA", len(diverse)),
         (1, repetitive, "en", "srcA", len(repetitive))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in entrymod.queries()["q_quality_gopher"](spark, str(d)).collect()}
    assert got[0].keep and got[0].ttr == 1.0 and got[0].dup_bigram_frac == 0.0
    assert not got[1].keep
    assert got[1].top_token_share == 1.0
    assert got[1].dup_bigram_frac > GOPHER_MAX_DUP_BIGRAM


def test_chunk_documents_geometry(spark, sf_dir):
    """Chunk invariants: stride spacing, full-size interior chunks,
    tail coverage to the document's last token, and chunk_fp from the
    actual tokens."""
    import __spark_entry__ as em
    from kafka_clickhouse_pipeline_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    rows = em.queries()["q_chunk_documents"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.chunk_id)
        n = doc_rows[0].start - 1 + 0  # starts at 1
        for i, r in enumerate(doc_rows):
            assert r.chunk_id == i
            assert r.start == 1 + i * CHUNK_STRIDE
            assert 1 <= r.n_chunk_tokens <= CHUNK_SIZE
            if i < len(doc_rows) - 1 and r.start + CHUNK_SIZE - 1 <= (
                doc_rows[-1].start + doc_rows[-1].n_chunk_tokens - 1
            ):
                # interior chunks are full-size whenever enough tokens remain
                last_token = doc_rows[-1].start + doc_rows[-1].n_chunk_tokens - 1
                assert r.n_chunk_tokens == min(CHUNK_SIZE, last_token - r.start + 1)
        # the final chunk reaches the last token: next stride start
        # would fall past the end
        last = doc_rows[-1]
        assert last.start + CHUNK_STRIDE > last.start + last.n_chunk_tokens - 1 or (
            last.n_chunk_tokens == CHUNK_SIZE
        )


def test_curation_pipeline_consistent_with_stages(spark, sf_dir):
    """The composed pipeline must agree with its standalone stages:
    unique ids, no benchmark sources, every survivor passes Gopher,
    no survivor shares an 8-shingle with the benchmark set, split
    labels match q_split_assign."""
    from kafka_clickhouse_pipeline_spark.operators.curation import (
        BENCH_SOURCES,
        q_curation_pipeline,
        q_decontaminate_shingle_overlap,
        q_quality_gopher,
        q_split_assign,
    )

    out = q_curation_pipeline(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    assert not {r["source"] for r in out} & set(BENCH_SOURCES)

    gopher = {r["doc_id"]: r["keep"] for r in q_quality_gopher(spark, sf_dir).collect()}
    assert all(gopher[i] for i in ids)

    contaminated = {
        r["doc_id"] for r in q_decontaminate_shingle_overlap(spark, sf_dir).collect()
    }
    assert not set(ids) & contaminated

    splits = {r["doc_id"]: r["split"] for r in q_split_assign(spark, sf_dir).collect()}
    assert all(r["split"] == splits[r["doc_id"]] for r in out)
    assert len(out) > 0


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom membership can over-flag (false positives at the
    documented rate) but NEVER under-flag: every document the exact
    shingle-overlap sweep catches must be bloom-contaminated, and the
    false-positive document rate must stay far below certainty."""
    from kafka_clickhouse_pipeline_spark.operators import curation

    exact = {
        r["doc_id"]
        for r in curation.q_decontaminate_shingle_overlap(
            spark, sf_dir
        ).collect()
    }
    bloom_rows = curation.q_decontaminate_bloom(spark, sf_dir).collect()
    flagged = {r["doc_id"] for r in bloom_rows if r["contaminated"]}
    assert exact <= flagged
    clean = [r for r in bloom_rows if r["doc_id"] not in exact]
    if clean:
        fp_rate = sum(1 for r in clean if r["contaminated"]) / len(clean)
        assert fp_rate < 0.5, f"bloom FP document rate implausible: {fp_rate}"


def test_paragraph_dedup_marks_whole_duplicates(spark, sf_dir):
    """A document whose raw text is byte-identical to a smaller-id
    document must have every chunk already owned elsewhere
    (dup_chunk_frac == 1.0); the canonical (smallest-id) copy of each
    text must keep at least one original chunk."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    canon = {
        r["m"]
        for r in docs.groupBy("text").agg(F.min("doc_id").alias("m")).collect()
    }
    rows = {r["doc_id"]: r for r in curation.q_paragraph_dedup(spark, sf_dir).collect()}
    assert rows
    dup_docs = set(rows) - canon
    for d in dup_docs:
        assert rows[d]["dup_chunk_frac"] == 1.0, (d, rows[d])
    # sanity: the signal is not vacuously all-duplicate
    assert any(rows[d]["n_dup_chunks"] < rows[d]["n_chunks"] for d in canon)


def test_hash256_is_uniform(spark):
    """Guards q_temperature_sample's proportionality contract: the
    _hash256 bucket must cover all 256 values ~uniformly so realized
    keep fractions track keep_threshold/256 (the ascii-sum _split_hash
    spans only 48..246 and would silently erase small sources)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.operators.curation import _hash256

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    buckets = df.select(_hash256().alias("b"))
    stats = buckets.agg(
        F.countDistinct("b").alias("nd"),
        F.min("b").alias("lo"),
        F.max("b").alias("hi"),
        F.avg((F.col("b") < 64).cast("double")).alias("frac_q1"),
    ).collect()[0]
    assert stats.nd == 256 and stats.lo == 0 and stats.hi == 255
    assert abs(stats.frac_q1 - 0.25) < 0.02, stats.frac_q1
