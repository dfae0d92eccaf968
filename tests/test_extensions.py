"""Behavioral unit tests for the extension operators beyond oracle
parity: dedup recall relationships, ANN recall, multimodal plumbing."""

from __future__ import annotations

import pytest

from kafka_clickhouse_pipeline_spark.operators import (
    dedup,
    graph,
    multimodal,
    similarity,
)


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH candidates + exact verification must reproduce the exact
    set-similarity join on this data (recall bound (1-j^2)^8)."""
    exact = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh == exact


def test_simhash_separates_near_dups_from_random_pairs(spark, sf_dir):
    """SimHash's defining property: hamming distance between true
    near-dups is systematically lower than between random pairs."""
    import random

    from kafka_clickhouse_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    exact = [(r.d1, r.d2) for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()]
    assert exact, "fixture should contain near-dup pairs"

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [hamming(sigs[a], sigs[b]) for a, b in exact]
    rng = random.Random(42)
    ids = sorted(sigs)
    rand = [hamming(sigs[rng.choice(ids)], sigs[rng.choice(ids)]) for _ in range(500)]
    mean_near = sum(near) / len(near)
    mean_rand = sum(rand) / len(rand)
    assert mean_near < mean_rand / 2, (mean_near, mean_rand)


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf_rows = similarity.q_ann_ivf_topk(spark, sf_dir).collect()
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    # approximate by design; must return full top-k per query and
    # achieve non-trivial recall even on unclustered random vectors
    assert len(ivf_rows) == len(bf)
    assert len(bf & ivf) / len(bf) >= 0.3


def test_triangle_census_matches_python_bruteforce(spark, sf_dir):
    """Independent check of q_triangle_count_copurchase: recount the
    triangles and wedges from the raw edge list with a plain Python
    adjacency-set sweep (no SQL on either side), so a shared
    misconception in the Spark query and its DuckDB oracle (e.g. an
    orientation bug double-counting triangles) cannot hide."""
    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = {
        (r.src, r.dst)
        for r in graph.co_purchase_edges(li).collect()
        if r.src < r.dst
    }
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = sum(
        1
        for s, d in edges
        for c in adj[s] & adj[d]
        if c > d  # s < d < c: each triangle once
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())

    row = graph.q_triangle_count_copurchase(spark, sf_dir).collect()[0]
    assert row.n_triangles == tri
    assert row.n_wedges == wedges
    assert 0.0 <= row.clustering_coefficient <= 1.0


def test_arrow_lsh_twins_bit_identical(spark, sf_dir):
    """The vectorized Arrow twins (lsh_code_arrow, seq_dot_arrow) must
    reproduce the interpreted expression forms BIT-FOR-BIT -- they back
    oracle-checked queries, so any summation-order drift (e.g. numpy
    pairwise sum sneaking in for cumsum) breaks the driver hash."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.catalog import load_table
    from kafka_clickhouse_pipeline_spark.operators.similarity import (
        _dot,
        lsh_code,
        lsh_code_arrow,
        seq_dot_arrow,
    )

    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
    )
    dot = seq_dot_arrow()
    both = vecs.select(
        lsh_code(F.col("v")).alias("c_expr"),
        lsh_code_arrow()(F.col("v")).alias("c_arrow"),
        _dot(F.col("v"), F.col("v")).alias("d_expr"),
        dot(F.col("v"), F.col("v")).alias("d_arrow"),
    )
    diff = both.filter(
        (F.col("c_expr") != F.col("c_arrow"))
        | (F.col("d_expr") != F.col("d_arrow"))  # float equality: bit test
    ).count()
    assert diff == 0


def test_ivf_assignment_margin_dominates_ulp_noise(spark, sf_dir):
    """Guards the q_ann_ivf_topk DuckDB oracle's determinism argument:
    the oracle reproduces the numpy argmax/argsort decisions only if no
    two centroid similarities tie within summation-order ULP noise
    (~1e-12 relative). Assert the minimum top1-top2 margin across all
    assignments stays orders of magnitude above that."""
    import numpy as np

    from kafka_clickhouse_pipeline_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.array([[float(x) for x in r.embedding] for r in rows])
    stride = max(1, len(ids) // similarity.N_CENTROIDS)
    C = M[ids % stride == 0]
    sims = (M @ C.T) / (
        np.linalg.norm(M, axis=1, keepdims=True) * np.linalg.norm(C, axis=1)[None, :]
    )
    top2 = -np.partition(-sims, 1, axis=1)[:, :2]
    margin = float((top2[:, 0] - top2[:, 1]).min())
    assert margin > 1e-9, margin


def test_ivf_kmeans_recall_not_worse_than_stride(spark, sf_dir):
    """Trained centroids must not lose recall vs the stride baseline
    (on random vectors the gain is small; on clustered data it is
    large -- this guards the mechanism, not the magnitude)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    stride = {
        (r.query_id, r.neighbor_id)
        for r in similarity.q_ann_ivf_topk(spark, sf_dir).collect()
    }
    km_rows = similarity.q_ann_ivf_kmeans_topk(spark, sf_dir).collect()
    km = {(r.query_id, r.neighbor_id) for r in km_rows}
    assert len(km_rows) == len(bf)
    assert len(bf & km) >= len(bf & stride) - max(2, len(bf) // 10)


def test_lsh_ann_returns_topk_with_nontrivial_recall(spark, sf_dir):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh_rows = similarity.q_ann_lsh_topk(spark, sf_dir).collect()
    lsh = {(r.query_id, r.neighbor_id) for r in lsh_rows}
    assert len(lsh_rows) == len(bf)  # full top-k per query
    # 16-bit sign-projection codes on unclustered random vectors: the
    # hard case; non-trivial recall is the mechanism guard
    assert len(bf & lsh) / len(bf) >= 0.2


def test_ann_scores_sorted_and_bounded(spark, sf_dir):
    rows = similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for q, rs in by_query.items():
        ranks = [r.rank for r in rs]
        assert ranks == sorted(ranks)
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cosines)


def _golden_png(width: int, height: int) -> bytes:
    """A complete, valid PNG built with stdlib only (zlib/struct)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _golden_gif(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def _golden_jpeg(width: int, height: int) -> bytes:
    import struct

    # SOI, APP0 (JFIF), SOF0 frame header carrying height then width
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_real_decoder_seam_decodes_golden_images():
    """The decoder seam against REAL image bytes (VERDICT r3 #7): a
    valid PNG/GIF/JPEG built with stdlib only must decode to its true
    dimensions through real_decode (PIL if present, pure-stdlib header
    parse otherwise); junk bytes must fail loudly."""
    assert multimodal.real_decode(_golden_png(17, 9)) == ("png", 17, 9)
    assert multimodal.real_decode(_golden_gif(320, 200)) == ("gif", 320, 200)
    assert multimodal.real_decode(_golden_jpeg(64, 48)) == ("jpeg", 64, 48)
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"not an image at all")
    # the header parser alone agrees (it is the no-PIL fallback)
    assert multimodal.decode_image_header(_golden_png(5, 1000)) == ("png", 5, 1000)
    assert multimodal.decode_image_header(b"\x89PNG\r\n\x1a\nXXXXIDAT") is None


def test_extract_features_with_injected_decoder(spark):
    """The injected decoder flows through the Spark plumbing unchanged
    (schema, Arrow batching, executor-side execution): real image
    payloads come back with their true decoded dimensions while
    n_bytes/checksum still describe the raw payload."""
    import hashlib

    payloads = [
        (1, _golden_png(17, 9)),
        (2, _golden_gif(320, 200)),
        (3, _golden_jpeg(64, 48)),
    ]
    media = spark.createDataFrame(
        [(i, p, "image/test", len(p)) for i, p in payloads],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            media, decoder=multimodal.real_decode
        ).collect()
    }
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("png", 17, 9)
    assert (rows[2]["format"], rows[2]["width"], rows[2]["height"]) == ("gif", 320, 200)
    assert (rows[3]["format"], rows[3]["width"], rows[3]["height"]) == ("jpeg", 64, 48)
    for doc_id, payload in payloads:
        assert rows[doc_id]["n_bytes"] == len(payload)
        assert rows[doc_id]["checksum"] == hashlib.md5(payload).hexdigest()


def test_multimodal_frame_explosion(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = multimodal.with_binary_payload(docs)
    frames = multimodal.sample_frames(media, frame_bytes=100).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    meta = {r.doc_id: r.n_bytes for r in media.collect()}
    for doc_id, rs in by_doc.items():
        # contiguous frame ids, all-but-last full, byte total preserved
        assert [r.frame_id for r in sorted(rs, key=lambda r: r.frame_id)] == list(range(len(rs)))
        assert sum(r.frame_bytes for r in rs) == meta[doc_id]
        assert all(r.frame_bytes == 100 for r in rs[:-1])


def test_exact_dedup_groups_cover_all_docs(spark, sf_dir):
    from kafka_clickhouse_pipeline_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    groups = dedup.q_dedup_exact(spark, sf_dir).collect()
    assert sum(g.n_docs for g in groups) == n_docs


def test_multimodal_resize_bounds_and_determinism(spark, sf_dir):
    """Resize must bound every payload to <= RESIZE_TARGET bytes and be
    deterministic (same input -> same checksum across runs)."""
    a = {r.doc_id: (r.resized_bytes, r.resized_checksum)
         for r in multimodal.q_multimodal_resize(spark, sf_dir).collect()}
    assert a and all(n <= multimodal.RESIZE_TARGET for n, _ in a.values())
    b = {r.doc_id: (r.resized_bytes, r.resized_checksum)
         for r in multimodal.q_multimodal_resize(spark, sf_dir).collect()}
    assert a == b


def test_winnow_fingerprints_overlap_for_near_dups(spark, sf_dir):
    """Winnowing's defining property: near-duplicate documents share
    most selected fingerprints; random pairs share almost none."""
    import random

    from kafka_clickhouse_pipeline_spark.operators import text

    fps: dict[int, set] = {}
    for r in text.q_fingerprint_winnow(spark, sf_dir).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    near = [(r.d1, r.d2) for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()]
    assert near, "fixture should contain near-dup pairs"

    def overlap(a, b):
        return len(fps[a] & fps[b]) / max(1, min(len(fps[a]), len(fps[b])))

    near_overlap = sum(overlap(a, b) for a, b in near) / len(near)
    rng = random.Random(7)
    ids = sorted(fps)
    rand_pairs = [(rng.choice(ids), rng.choice(ids)) for _ in range(200)]
    rand_pairs = [(a, b) for a, b in rand_pairs if a != b and (a, b) not in set(near)]
    rand_overlap = sum(overlap(a, b) for a, b in rand_pairs) / len(rand_pairs)
    assert near_overlap > 0.5, near_overlap
    assert near_overlap > 4 * rand_overlap, (near_overlap, rand_overlap)


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    """PQ-ADC + exact re-rank: full top-k shape per query, deterministic
    across runs, non-trivial recall vs brute force even on random
    vectors (PQ's worst case), and exact cosines for survivors (re-rank
    guarantees returned scores are true cosines)."""
    from kafka_clickhouse_pipeline_spark.operators import pq

    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    a = pq.q_ann_pq_topk(spark, sf_dir).collect()
    assert len(a) == len(bf)
    b = pq.q_ann_pq_topk(spark, sf_dir).collect()
    assert [(r.query_id, r.neighbor_id, r.cosine) for r in a] == [
        (r.query_id, r.neighbor_id, r.cosine) for r in b
    ]
    hits = [(r.query_id, r.neighbor_id) for r in a if (r.query_id, r.neighbor_id) in bf]
    assert len(hits) / len(bf) >= 0.2
    # survivors carry the exact cosine, not the PQ approximation
    for r in a:
        key = (r.query_id, r.neighbor_id)
        if key in bf:
            assert r.cosine == bf[key]


def test_choose_geometry_rule():
    """The (1-theta/pi)^bits selection rule (VERDICT r3 #4): high
    thresholds earn wide bands, low thresholds cannot; the returned
    geometry always satisfies lsh_band_keys' divisibility contract and
    the analytic miss bound."""
    import math

    from kafka_clickhouse_pipeline_spark.operators.similarity import (
        choose_geometry,
    )

    hi_planes, hi_bands = choose_geometry(0.9)
    lo_planes, lo_bands = choose_geometry(0.45)
    assert hi_planes % hi_bands == 0 and lo_planes % lo_bands == 0
    hi_bits, lo_bits = hi_planes // hi_bands, lo_planes // lo_bands
    # 0.9 -> 8-bit bands (wide = hard pruning); 0.45 -> narrow bands
    assert hi_bits >= 8, (hi_planes, hi_bands)
    assert hi_bits > lo_bits
    # analytic miss bound holds at the target threshold for both
    for thr, (planes, bands) in ((0.9, (hi_planes, hi_bands)), (0.45, (lo_planes, lo_bands))):
        p = 1.0 - math.acos(thr) / math.pi
        miss = (1.0 - p ** (planes // bands)) ** bands
        assert miss <= 0.01, (thr, planes, bands, miss)
    # invalid inputs fail loudly
    import pytest

    with pytest.raises(ValueError):
        choose_geometry(1.5)
    with pytest.raises(ValueError):
        choose_geometry(0.9, miss_budget=0.0)


def test_threshold_knob_preserves_recall_vs_exact_twin(spark, sf_dir):
    """q_dedup_embedding_lsh(threshold=...) with auto-chosen geometry
    must retain (per the 1% miss budget) the pairs the exact O(n^2)
    twin finds at the same threshold -- the deterministic fixture run
    should therefore find every pair."""
    from kafka_clickhouse_pipeline_spark.operators.dedup import (
        COSINE_THRESHOLD,
        q_dedup_embedding_cosine,
        q_dedup_embedding_lsh,
    )

    exact = {
        (r["v1"], r["v2"])
        for r in q_dedup_embedding_cosine(spark, sf_dir).collect()
    }
    auto = {
        (r["v1"], r["v2"])
        for r in q_dedup_embedding_lsh(
            spark, sf_dir, threshold=COSINE_THRESHOLD
        ).collect()
    }
    assert auto <= exact
    if exact:
        recall = len(auto) / len(exact)
        assert recall >= 0.9, (recall, len(auto), len(exact))


def test_embedding_lsh_pairs_subset_of_exact_with_recall(spark, sf_dir):
    """q_dedup_embedding_lsh verifies candidates with the exact cosine,
    so its pairs must be a strict subset of q_dedup_embedding_cosine's;
    banding (4 bands x 4 bits of a 16-bit sign code) must still recover
    a non-trivial fraction of true near-dup pairs."""
    from kafka_clickhouse_pipeline_spark.operators.dedup import (
        q_dedup_embedding_cosine,
        q_dedup_embedding_lsh,
    )

    exact = {(r["v1"], r["v2"]) for r in q_dedup_embedding_cosine(spark, sf_dir).collect()}
    lsh = {(r["v1"], r["v2"]) for r in q_dedup_embedding_lsh(spark, sf_dir).collect()}
    assert lsh <= exact
    if exact:
        recall = len(lsh) / len(exact)
        # random unclustered fixture vectors are the hard case; the
        # mechanism guard is non-trivial recall, not production recall
        assert recall > 0.2, recall


def test_triangle_doulion_sampling_knob(spark, sf_dir):
    """The DOULION edge-sampling knob: p=1.0 must reproduce the exact
    census bit-for-bit (every edge kept, scale factor 1), p<1 must
    produce a same-schema estimate in a sane range, and p outside
    (0, 1] fails loudly."""
    import pytest

    exact = graph.q_triangle_count_copurchase(spark, sf_dir).collect()[0]
    full = graph.q_triangle_count_copurchase(
        spark, sf_dir, edge_sample=1.0
    ).collect()[0]
    assert (full.n_triangles, full.n_wedges) == (
        exact.n_triangles,
        exact.n_wedges,
    )
    est = graph.q_triangle_count_copurchase(
        spark, sf_dir, edge_sample=0.5
    ).collect()[0]
    assert est.n_wedges > 0
    # unbiased estimator, deterministic hash coin: same call -> same
    # estimate; magnitude within a loose factor of the exact census
    est2 = graph.q_triangle_count_copurchase(
        spark, sf_dir, edge_sample=0.5
    ).collect()[0]
    assert est.n_triangles == est2.n_triangles
    assert 0 <= est.n_triangles <= 10 * max(exact.n_triangles, 1)
    with pytest.raises(ValueError):
        graph.q_triangle_count_copurchase(spark, sf_dir, edge_sample=0.0)


def test_ascii_split_matches_spark_and_duckdb_on_edge_whitespace(spark):
    """The Python split twin must agree token-for-token with Spark's
    ``split(trim(text), '\\s+')`` (Pattern.split limit=-1 keeps
    trailing empties) AND DuckDB's string_split_regex on edge cases:
    trailing tab/newline, lone whitespace, leading whitespace, empty.
    ADVICE r3: the old twin popped trailing empties and diverged on
    any document ending in \\t/\\n/\\r."""
    import duckdb
    from pyspark.sql import functions as F

    from kafka_clickhouse_pipeline_spark.operators.text import _ascii_split

    cases = [
        "a\tb\t",
        "a b\n",
        "\t",
        " \t ",
        "",
        "  a  ",
        "\na b\r\n",
        "x",
        None,
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "text string").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    spark_toks = [r["toks"] for r in sdf.collect()]
    con = duckdb.connect()
    for case, stoks in zip(cases, spark_toks):
        py = _ascii_split(case)
        if case is None:
            # Spark split(NULL) is NULL; the twin's contract is
            # NULL-as-empty-text so the pandas path never crashes
            assert py == [""]
            continue
        assert py == stoks, (case, py, stoks)
        dtoks = con.execute(
            "SELECT string_split_regex(trim(?, ' '), '[ \t\n\x0b\f\r]+')",
            [case],
        ).fetchone()[0]
        assert py == dtoks, (case, py, dtoks)
    con.close()


def test_repetition_filters_parity_and_bounds(spark, oracle, sf_dir):
    """Gopher repetition signals: oracle parity at smoke SF plus the
    definitional bounds (every fraction in [0, 1]; n-gram columns NULL
    exactly when the document is too short)."""
    from tests.parity import assert_query_matches_oracle

    from kafka_clickhouse_pipeline_spark.operators import text

    assert_query_matches_oracle(
        spark,
        oracle,
        text.q_repetition_filters,
        text.TEXT_ORACLES["q_repetition_filters"],
        sf_dir,
    )
    rows = text.q_repetition_filters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        if r["n_tokens"] >= 2:
            assert r["top_2gram"] is not None
            assert 0.0 < r["top_2gram_frac"] <= 1.0
        else:
            assert r["top_2gram"] is None and r["top_2gram_frac"] is None
        if r["n_tokens"] >= 3:
            assert 0.0 <= r["dup_3gram_frac"] <= 1.0
        else:
            assert r["dup_3gram_frac"] is None
    # the synthetic corpus draws from a tiny vocabulary: repetition
    # must actually fire somewhere, or the signal is vacuous
    assert any(r["dup_token_frac"] > 0.5 for r in rows)


def test_semantic_dedup_subset_and_recall_of_exact(spark, sf_dir):
    """SemDeDup discards must be a subset of the exact global near-dup
    set (clustering can only REMOVE pairs, never invent them), every
    vector appears exactly once, and the discard set must re-derive
    from exact-pairs x cluster-assignments. (No recall floor: the
    sf0.001 fixture's 7 exact pairs all sit at marginal cosine
    0.45-0.48, where cross-cluster splits are expected; true
    near-identical pairs co-locate by construction.)"""
    sem = dedup.q_semantic_dedup(spark, sf_dir).collect()
    exact_pairs = dedup.q_dedup_embedding_cosine(spark, sf_dir).collect()

    n_vecs = similarity._vectors(spark, sf_dir).count()
    assert len(sem) == n_vecs
    assert len({r["vec_id"] for r in sem}) == n_vecs

    exact_discards = {r["v2"] for r in exact_pairs}
    sem_discards = {r["vec_id"] for r in sem if not r["kept"]}
    assert sem_discards <= exact_discards

    # cross-derivation: the discard set must equal exactly the v2 side
    # of global near-dup pairs whose endpoints share a cluster --
    # computed here from two INDEPENDENT queries (exact pairs x
    # assignments), so it re-derives the operator's decision rule
    cluster = {r["vec_id"]: r["cluster_id"] for r in sem}
    expected = {
        r["v2"] for r in exact_pairs if cluster[r["v1"]] == cluster[r["v2"]]
    }
    assert sem_discards == expected
