"""Behavioral tests for the round-8 fixes and operators. Oracle
parity is covered by the strict sweep; these pin semantics the oracle
alone can't prove (ADVICE r7 fixes, commit-protocol failure paths,
and per-operator invariants)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def _write_docs(spark, d, texts, langs=None, sources=None):
    rows = [
        (
            i,
            t,
            (langs or ["en"] * len(texts))[i],
            (sources or ["s0"] * len(texts))[i],
            len(t),
        )
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def _oracle_docs(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


class TestCharDiversityEmptyText:
    """ADVICE r7 (medium): Spark's sequence(1, length) with length 0
    yields [1, 0] (step defaults to -1), so an unguarded explode emits
    two phantom empty-string 'chars' and a spurious output row for an
    empty-text doc, while DuckDB's generate_series(1, 0) omits the doc
    entirely. The guard must make both engines omit empty docs."""

    def test_empty_text_doc_omitted(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_char_diversity,
        )

        d = _write_docs(spark, tmp_path, ["abca", "", "xx"])
        rows = {r["doc_id"]: r for r in q_char_diversity(spark, d).collect()}
        assert set(rows) == {0, 2}, rows  # doc 1 (empty) omitted
        assert rows[0]["n_chars_obs"] == 4
        assert rows[2]["n_chars_obs"] == 2
        # two 'x' chars: unbiased Gini-Simpson = 1 - 2*1/(2*1) = 0
        assert rows[2]["gini_simpson"] == 0.0

    def test_empty_text_oracle_parity(self, spark, tmp_path):
        import __spark_entry__ as entrymod
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_char_diversity,
        )

        d = _write_docs(spark, tmp_path, ["", "ab ba", "zzz", ""])
        got = sorted(tuple(r) for r in q_char_diversity(spark, d).collect())
        want = sorted(
            _oracle_docs(d, entrymod.oracle_sql()["q_char_diversity"])
        )
        assert [g[:3] for g in got] == [w[:3] for w in want]
        for g, w in zip(got, want):
            for gv, wv in zip(g[3:], w[3:]):
                assert (gv is None) == (wv is None)
                if gv is not None:
                    assert math.isclose(gv, wv, abs_tol=1e-9)


class TestCommitProtocolFailurePaths:
    """ADVICE r7 (medium): Hadoop FileSystem reports most failures via
    a FALSE return, not an exception. A swallowed rename failure lets
    write_marker commit a batch whose data files never landed."""

    def _fake_backend(self, rename_ok=True, mkdirs_ok=True):
        from kafka_clickhouse_pipeline_spark.streaming.commit import (
            _HadoopBackend,
        )

        class _FakeFs:
            def rename(self, src, dst):
                return rename_ok

            def mkdirs(self, p):
                return mkdirs_ok

            def delete(self, p, recursive):
                return False

            def exists(self, p):
                return True  # delete returned false AND path persists

        be = _HadoopBackend.__new__(_HadoopBackend)
        be._fs = _FakeFs()
        be._jpath = lambda p: p
        return be

    def test_rename_false_raises(self):
        be = self._fake_backend(rename_ok=False)
        with pytest.raises(IOError, match="rename failed"):
            be.move("a/x.parquet", "b/x.parquet")

    def test_mkdirs_false_raises(self):
        be = self._fake_backend(mkdirs_ok=False)
        with pytest.raises(IOError, match="mkdirs failed"):
            be.makedirs("a/b")

    def test_delete_false_with_survivor_raises(self):
        be = self._fake_backend()
        with pytest.raises(IOError, match="delete failed"):
            be.remove("a/stale.parquet")

    def test_rename_true_is_silent(self):
        be = self._fake_backend(rename_ok=True)
        be.move("a/x.parquet", "b/x.parquet")  # must not raise

    def test_publish_staged_rejects_mixed_schemes(self, tmp_path, monkeypatch):
        from kafka_clickhouse_pipeline_spark.streaming import commit

        # ADVICE r7 (low): Hadoop rename cannot cross filesystems and
        # reports it via false -- a mixed-scheme caller must fail
        # loudly instead. POSIX staging vs (fake) remote dest; the
        # backend router is stubbed so no real Hadoop FS is needed --
        # the scheme check must fire BEFORE any filesystem operation.
        fake_remote = self._fake_backend()
        orig = commit._backend

        def routed(path, spark=None):
            if path.startswith("s3a://"):
                return fake_remote, path
            return orig(path, spark)

        monkeypatch.setattr(commit, "_backend", routed)
        with pytest.raises(ValueError, match="different filesystems"):
            commit.publish_staged(
                str(tmp_path / "_staging/0"), "s3a://bkt/dest", 0
            )


class TestRenameAsCopyBackend:
    """VERDICT r7 #6: exercise the staged-commit protocol against an
    object-store stand-in whose rename is a COPY+DELETE (the s3a
    semantics), including a crash between publish and marker. The
    protocol's guarantee is marker-gated visibility; non-atomic rename
    must cost only latency, never consistency."""

    @pytest.fixture()
    def copy_backend(self, monkeypatch):
        import shutil

        from kafka_clickhouse_pipeline_spark.streaming import commit

        moves: list[tuple[str, str]] = []

        class _CopyDeleteBackend(commit._LocalBackend):
            def move(self, src, dst):  # rename-as-copy, like s3a
                shutil.copy2(src, dst)
                import os

                os.remove(src)
                moves.append((src, dst))

        orig = commit._backend

        def routed(path, spark=None):
            fs, p = orig(path, spark)
            if isinstance(fs, commit._LocalBackend):
                return _CopyDeleteBackend(), p
            return fs, p

        monkeypatch.setattr(commit, "_backend", routed)
        return moves

    def test_full_sequence_and_crash_replay(self, tmp_path, copy_backend):
        import os

        from kafka_clickhouse_pipeline_spark.streaming import commit

        dest = str(tmp_path / "state")
        os.makedirs(dest)

        calls = {"n": 0}

        def body(batch_df, batch_id, staging):
            calls["n"] += 1
            os.makedirs(staging[dest], exist_ok=True)
            with open(os.path.join(staging[dest], "part-0.parquet"), "w") as f:
                f.write(f"data-{batch_id}-attempt{calls['n']}")

        writer = commit.staged_foreach_batch(dest, [dest], body)

        # normal batch 0: publish through copy+delete renames
        writer(None, 0)
        assert commit.already_committed(dest, 0)
        assert copy_backend, "copy-delete move path was not exercised"
        files = [f for f in os.listdir(dest) if f.startswith("b0-")]
        assert files == ["b0-part-0.parquet"]

        # crash window: batch 1 publishes but dies BEFORE the marker
        def crashing_writer(batch_df, batch_id):
            if commit.already_committed(dest, batch_id):
                return
            commit.sweep_uncommitted(batch_id, dest)
            staging = {dest: os.path.join(dest, "_staging", str(batch_id))}
            body(batch_df, batch_id, staging)
            commit.publish_staged(staging[dest], dest, batch_id)
            raise RuntimeError("simulated crash before write_marker")

        with pytest.raises(RuntimeError):
            crashing_writer(None, 1)
        assert not commit.already_committed(dest, 1)
        # half-published file is visible but unmarked
        assert any(f.startswith("b1-") for f in os.listdir(dest))

        # replay of batch 1 through the enforced sequence: sweeps the
        # leftover, re-publishes, marks
        writer(None, 1)
        assert commit.already_committed(dest, 1)
        b1 = [f for f in os.listdir(dest) if f.startswith("b1-")]
        assert b1 == ["b1-part-0.parquet"]
        with open(os.path.join(dest, b1[0])) as f:
            # the REPLAYED attempt's bytes, not the crashed attempt's
            assert f.read() == "data-1-attempt3"

        # replayed committed batch is a no-op
        n = calls["n"]
        writer(None, 0)
        writer(None, 1)
        assert calls["n"] == n


class TestHeapsLawFit:
    def test_monotone_corpus_beta_bounds(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_heaps_law_fit,
        )

        # vocabulary grows with every doc: beta should be positive and
        # <= 1 (sublinear-or-linear growth)
        texts = [" ".join(f"w{i}_{j}" for j in range(5)) for i in range(20)]
        d = _write_docs(spark, tmp_path, texts)
        row = q_heaps_law_fit(spark, d).collect()[0]
        assert row["n_points"] == 10
        assert 0.0 < row["beta"] <= 1.000001
        # every token distinct -> V = N exactly -> beta = 1, ln_k = 0
        assert math.isclose(row["beta"], 1.0, abs_tol=1e-6)
        assert math.isclose(row["ln_k"], 0.0, abs_tol=1e-6)
        assert math.isclose(row["r2"], 1.0, abs_tol=1e-6)

    def test_saturating_corpus_flattens(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_heaps_law_fit,
        )

        # one shared word repeated: vocabulary saturates at 1 -> beta 0
        d = _write_docs(spark, tmp_path, ["w w w"] * 20)
        row = q_heaps_law_fit(spark, d).collect()[0]
        assert math.isclose(row["beta"], 0.0, abs_tol=1e-6)


class TestVocabCoverage:
    def test_clamped_checkpoints_and_monotonicity(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            VOCAB_COVERAGE_KS,
            q_vocab_coverage_topk,
        )

        # 3-term vocabulary: every checkpoint clamps to 3, coverage 1
        d = _write_docs(spark, tmp_path, ["a a a b b c"] * 4)
        rows = q_vocab_coverage_topk(spark, d).collect()
        assert [r["k"] for r in rows] == sorted(VOCAB_COVERAGE_KS)
        assert all(r["k_effective"] == 3 for r in rows)
        assert all(r["coverage_frac"] == 1.0 for r in rows)

    def test_fixture_coverage_monotone(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_vocab_coverage_topk,
        )

        rows = q_vocab_coverage_topk(spark, sf_dir).collect()
        fracs = [r["coverage_frac"] for r in rows]
        assert fracs == sorted(fracs)
        assert all(0 < f <= 1 for f in fracs)
        covered = [r["tokens_covered"] for r in rows]
        assert covered == sorted(covered)


class TestDoclenQuantiles:
    def test_exact_rank_rule(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_doclen_quantiles_by_lang,
        )

        # lengths 1..10 for 'en': rank ceil(10*p/100) -> p25=3rd=3,
        # p50=5th=5, p75=8th=8, p90=9th=9
        texts = ["x" * n for n in range(1, 11)]
        d = _write_docs(spark, tmp_path, texts)
        row = q_doclen_quantiles_by_lang(spark, d).collect()[0]
        assert row["n_docs"] == 10
        assert (row["p25_chars"], row["p50_chars"], row["p75_chars"],
                row["p90_chars"]) == (3, 5, 8, 9)

    def test_single_doc_lang(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_doclen_quantiles_by_lang,
        )

        d = _write_docs(spark, tmp_path, ["abcde"], langs=["fr"])
        row = q_doclen_quantiles_by_lang(spark, d).collect()[0]
        # every percentile of a 1-doc language is that doc
        assert (row["p25_chars"], row["p90_chars"]) == (5, 5)


class TestLangidConfusion:
    def test_cells_and_shares(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_langid_confusion,
        )

        # 'the' is a marker -> pred en; 'xyz' has none -> pred und
        d = _write_docs(
            spark,
            tmp_path,
            ["the cat", "xyz", "the dog", "qqq"],
            langs=["en", "en", "de", "de"],
        )
        rows = {(r["declared_lang"], r["pred_lang"]): r
                for r in q_langid_confusion(spark, d).collect()}
        assert rows[("en", "en")]["n_docs"] == 1
        assert rows[("en", "und")]["n_docs"] == 1
        assert rows[("en", "en")]["share_of_declared"] == 0.5
        # shares sum to 1 per declared language
        for lang in ("en", "de"):
            s = sum(r["share_of_declared"] for k, r in rows.items()
                    if k[0] == lang)
            assert math.isclose(s, 1.0, abs_tol=1e-9)

    def test_consistent_with_q_lang_id(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_lang_id,
            q_langid_confusion,
        )

        total = sum(
            r["n_docs"] for r in q_langid_confusion(spark, sf_dir).collect()
        )
        assert total == q_lang_id(spark, sf_dir).count()


class TestJsdSources:
    def test_identical_and_disjoint(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.curation import (
            q_jsd_sources,
        )

        # s0/s1 identical lang mixes -> JSD 0; s2 disjoint -> norm 1
        d = _write_docs(
            spark,
            tmp_path,
            ["t"] * 6,
            langs=["en", "de", "en", "de", "fr", "fr"],
            sources=["s0", "s0", "s1", "s1", "s2", "s2"],
        )
        rows = {(r["source_a"], r["source_b"]): r
                for r in q_jsd_sources(spark, d).collect()}
        assert set(rows) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
        assert rows[("s0", "s1")]["jsd_nats"] == 0.0
        # disjoint support: the spine emits the row (the Hellinger
        # caveat this operator fixes) with jsd_norm exactly 1
        assert rows[("s0", "s2")]["jsd_norm"] == 1.0
        assert rows[("s1", "s2")]["jsd_norm"] == 1.0

    def test_bounds_on_fixture(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.curation import (
            q_jsd_sources,
        )

        for r in q_jsd_sources(spark, sf_dir).collect():
            assert -1e-9 <= r["jsd_norm"] <= 1.0 + 1e-9


class TestMutualInfo:
    def test_independent_is_zero(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_mutual_info_type_hour,
        )
        import datetime

        # perfectly independent 2x2 grid -> MI contribution 0 per type
        rows = []
        i = 0
        for et in ("a", "b"):
            for hr in (1, 2):
                for _ in range(5):
                    rows.append(
                        (i, datetime.datetime(2024, 1, 1, hr), 1, et, 1.0, "{}")
                    )
                    i += 1
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = q_mutual_info_type_hour(spark, str(tmp_path)).collect()
        assert all(r["mi_part_nats"] == 0.0 for r in out)
        assert all(r["n_events"] == 10 for r in out)

    def test_deterministic_is_ln2(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_mutual_info_type_hour,
        )
        import datetime

        # type fully determines hour, uniform 2x2 -> total MI = ln 2,
        # split evenly: each type contributes ln(2)/2
        rows = []
        for i in range(10):
            rows.append((i, datetime.datetime(2024, 1, 1, 1), 1, "a", 1.0, "{}"))
            rows.append(
                (100 + i, datetime.datetime(2024, 1, 1, 2), 1, "b", 1.0, "{}")
            )
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = q_mutual_info_type_hour(spark, str(tmp_path)).collect()
        for r in out:
            assert math.isclose(
                r["mi_part_nats"], math.log(2) / 2, abs_tol=1e-6
            )


class TestDupClusterHist:
    def test_histogram_shape(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.dedup import (
            q_dup_cluster_size_hist,
        )

        # 3 singletons + one pair + one triple = 8 docs
        texts = ["u1", "u2", "u3", "dup a", "dup  a", "t", "t ", " t"]
        d = _write_docs(spark, tmp_path, texts)
        rows = {r["cluster_size"]: r
                for r in q_dup_cluster_size_hist(spark, d).collect()}
        assert rows[1]["n_clusters"] == 3
        assert rows[2]["n_clusters"] == 1
        assert rows[3]["n_clusters"] == 1
        assert sum(r["n_docs"] for r in rows.values()) == 8
        assert math.isclose(
            sum(r["doc_share"] for r in rows.values()), 1.0, abs_tol=1e-5
        )

    def test_consistent_with_dedup_exact(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.dedup import (
            q_dedup_exact,
            q_dup_cluster_size_hist,
        )

        hist = q_dup_cluster_size_hist(spark, sf_dir).collect()
        n_clusters_hist = sum(r["n_clusters"] for r in hist)
        assert n_clusters_hist == q_dedup_exact(spark, sf_dir).count()


class TestEmbeddingNormStats:
    def test_bounds_and_counts(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_embedding_norm_stats,
        )

        rows = q_embedding_norm_stats(spark, sf_dir).collect()
        n_total = load_table(spark, sf_dir, "embeddings").count()
        assert sum(r["n_vectors"] for r in rows) == n_total
        for r in rows:
            assert 0 <= r["norm_min"] <= r["norm_mean"] <= r["norm_max"]

    def test_known_vectors(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_embedding_norm_stats,
        )

        spark.createDataFrame(
            [(0, [3.0, 4.0], 0), (1, [0.0, 1.0], 0), (2, [6.0, 8.0], 1)],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        rows = {r["label"]: r
                for r in q_embedding_norm_stats(spark, str(tmp_path)).collect()}
        assert rows[0]["norm_min"] == 1.0 and rows[0]["norm_max"] == 5.0
        assert rows[0]["norm_mean"] == 3.0
        assert rows[1]["norm_mean"] == 10.0


class TestIvfBucketOccupancy:
    def test_shares_sum_to_one(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_ivf_bucket_occupancy,
        )
        from kafka_clickhouse_pipeline_spark.catalog import load_table

        rows = q_ivf_bucket_occupancy(spark, sf_dir).collect()
        n = load_table(spark, sf_dir, "embeddings").count()
        assert sum(r["n_vectors"] for r in rows) == n
        assert math.isclose(
            sum(r["bucket_share"] for r in rows), 1.0, abs_tol=1e-4
        )
        assert all(r["n_vectors"] > 0 for r in rows)


class TestLabelConfusability:
    def test_identical_labels_cosine_one(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_label_confusability,
        )

        # labels 0/1 share a centroid direction; label 2 is orthogonal
        spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
                (2, [1.0, 0.0], 1),
                (3, [0.0, 1.0], 2), (4, [0.0, 1.0], 2),
            ],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        rows = {(r["label_a"], r["label_b"]): r
                for r in q_label_confusability(spark, str(tmp_path)).collect()}
        assert rows[(0, 1)]["centroid_cosine"] == 1.0
        assert rows[(0, 2)]["centroid_cosine"] == 0.0
        assert rows[(1, 2)]["centroid_cosine"] == 0.0
        assert rows[(0, 1)]["n_a"] == 2 and rows[(0, 1)]["n_b"] == 1

    def test_bounds_on_fixture(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_label_confusability,
        )

        for r in q_label_confusability(spark, sf_dir).collect():
            assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9


class TestMmrDiversifiedTopk:
    def test_rank1_is_relevance_argmax_and_k_rows(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            MMR_K,
            N_QUERIES,
            q_mmr_diversified_topk,
        )

        rows = q_mmr_diversified_topk(spark, sf_dir).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert len(by_q) == N_QUERIES
        for q, rs in by_q.items():
            assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] \
                == list(range(1, MMR_K + 1))
            # rank 1 is the pure-relevance argmax: no pool member has
            # higher relevance
            r1 = next(r for r in rs if r["rank"] == 1)
            assert all(r["rel"] <= r1["rel"] + 1e-12 for r in rs)
            # selections are distinct
            assert len({r["neighbor_id"] for r in rs}) == MMR_K

    def test_diversity_penalty_demotes_near_dup(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_mmr_diversified_topk,
        )

        # query 0; candidates: 100/101 a nearly identical high-rel
        # pair (101's slightly LARGER norm makes it strictly less
        # relevant), 102 slightly less relevant but on the other side
        # of the query (sim(100,102) ~ 0.955 vs sim(100,101) ~ 1.0).
        # Pure relevance ranks (100, 101); MMR must pick 102 second:
        # round-2 scores 7*974383 - 3*954809 > 7*979816 - 3*1000000.
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (100, [0.9799, 0.1994, 0.0], 0),
            (101, [0.9798, 0.1999, 0.0005], 0),
            (102, [0.9744, 0.0, -0.2249], 0),
        ]
        # pad the pool with weak fillers so MMR_K selections exist
        for i in range(103, 110):
            rows.append((i, [0.1, 0.05 * (i - 102), 1.0], 0))
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        out = [
            (r["rank"], r["neighbor_id"])
            for r in q_mmr_diversified_topk(spark, str(tmp_path)).collect()
            if r["query_id"] == 0
        ]
        ranked = [n for _, n in sorted(out)]
        assert ranked[0] == 100  # relevance argmax
        assert ranked[1] == 102  # diversity beats the near-dup 101
        assert 101 in ranked[2:]  # the near-dup is demoted, not lost


class TestSaxMotifs:
    def test_word_shape_and_day_count(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_sax_motifs,
        )
        from pyspark.sql import functions as SF

        rows = q_sax_motifs(spark, sf_dir).collect()
        assert all(len(r["word"]) == 4 for r in rows)
        assert all(set(r["word"]) <= set("abcd") for r in rows)
        n_days = (
            load_table(spark, sf_dir, "events")
            .select(SF.to_date("ts")).distinct().count()
        )
        assert sum(r["n_days"] for r in rows) == n_days
        assert math.isclose(
            sum(r["day_share"] for r in rows), 1.0, abs_tol=1e-4
        )

    def test_flat_series_is_all_b(self, spark, tmp_path):
        import datetime

        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_sax_motifs,
        )

        # identical count every hour of every day -> z = 0 everywhere
        # -> letter 'b' (z < 0 false, z < 0.6745 true after z < -0.6745
        # false... z = 0 -> not < 0 -> 'c'? No: breakpoints are
        # (-0.6745, 0, 0.6745); z = 0 is NOT < 0 so falls to 'c'.
        rows = []
        i = 0
        for day in (1, 2):
            for hr in range(24):
                rows.append(
                    (i, datetime.datetime(2024, 1, day, hr), 1, "view",
                     1.0, "{}")
                )
                i += 1
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = q_sax_motifs(spark, str(tmp_path)).collect()
        # zero variance -> z undefined -> deterministic fallback letter
        assert len(out) == 1 and out[0]["n_days"] == 2
        assert out[0]["word"] in ("cccc", "dddd")  # engine-pinned below
        assert out[0]["word"] == "dddd"  # null z falls through to 'd'


class TestUserLtvDecay:
    def test_recency_outweighs_size_at_long_age(self, spark, tmp_path):
        import datetime

        from kafka_clickhouse_pipeline_spark.operators.advanced import (
            q_user_ltv_decay,
        )

        # user 1: 100.0 bought 300 days before anchor (decay ~ 2^-10);
        # user 2: 1.0 bought the day before anchor -> user 2 ranks first
        rows = [
            (0, datetime.datetime(2023, 4, 5), 1, "purchase", 100.0, "{}"),
            (1, datetime.datetime(2024, 1, 29), 2, "purchase", 1.0, "{}"),
            (2, datetime.datetime(2024, 1, 29), 3, "view", 50.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = q_user_ltv_decay(spark, str(tmp_path)).collect()
        # views excluded entirely
        assert [r["user_id"] for r in out] == [2, 1]
        assert out[0]["ltv_decayed"] > out[1]["ltv_decayed"]
        # one-day-old value decays by 2^(-1/30)
        assert math.isclose(
            out[0]["ltv_decayed"], 2 ** (-1 / 30), abs_tol=1e-4
        )


class TestDocOovRate:
    def test_gate_against_corpus_vocab(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            DOC_OOV_MAX_RATE,
            q_doc_oov_rate,
            q_oov_rate,
        )

        rows = q_doc_oov_rate(spark, sf_dir).collect()
        for r in rows:
            assert 0 <= r["oov_rate"] <= 1
            expected = "flagged" if r["oov_rate"] > DOC_OOV_MAX_RATE else "kept"
            assert r["gate"] == expected
        # doc-level n_oov totals must reconcile with the per-source audit
        per_source = q_oov_rate(spark, sf_dir).collect()
        assert sum(r["n_oov"] for r in rows) == sum(
            r["n_oov"] for r in per_source
        )


class TestEmbeddingAnisotropy:
    def test_histogram_totals_and_mean_bounds(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.catalog import load_table
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_embedding_anisotropy,
        )

        rows = q_embedding_anisotropy(spark, sf_dir).collect()
        n = load_table(spark, sf_dir, "embeddings").count()
        # 1-factor pairing: n - n//2 pairs, every vector in <= 1 pair
        assert sum(r["n_pairs"] for r in rows) == n - n // 2
        means = {r["mean_cosine"] for r in rows}
        assert len(means) == 1  # global mean repeated per bin
        assert -1 <= means.pop() <= 1
        assert all(0 <= r["bin"] <= 19 for r in rows)

    def test_identical_vectors_collapse_to_top_bin(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_embedding_anisotropy,
        )

        spark.createDataFrame(
            [(i, [1.0, 0.0], 0) for i in range(6)],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        rows = q_embedding_anisotropy(spark, str(tmp_path)).collect()
        # all pair cosines are exactly 1 -> clamped into bin 19
        assert [(r["bin"], r["n_pairs"]) for r in rows] == [(19, 3)]
        assert rows[0]["mean_cosine"] == 1.0


class TestRetrievalMapAtK:
    def test_bounds_and_perfect_case(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            N_QUERIES,
            q_retrieval_map_at_k,
        )

        rows = q_retrieval_map_at_k(spark, sf_dir).collect()
        assert len(rows) == N_QUERIES
        for r in rows:
            assert 0 <= r["p_at_k"] <= 1
            assert 0 <= r["ap_at_k"] <= 1 + 1e-9
            # all-relevant prefix implies AP = 1 when class is large
            if r["n_rel"] == 5 and r["p_at_k"] == 1.0:
                assert r["ap_at_k"] == 1.0

    def test_small_class_not_penalized(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            q_retrieval_map_at_k,
        )

        # query 0's class has only 2 members (R = 1 < k): if its one
        # classmate is retrieved first, AP must be 1.0, not 1/k
        rows = [(0, [1.0, 0.0], 7), (1, [0.99, 0.1], 7)]
        rows += [(i, [0.1 * i - 1.0, 1.0], 1) for i in range(2, 30)]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        out = {r["query_id"]: r
               for r in q_retrieval_map_at_k(spark, str(tmp_path)).collect()}
        assert out[0]["n_rel"] == 1
        assert out[0]["ap_at_k"] == 1.0


class TestMinhashEstimateError:
    def test_error_within_binomial_law(self, spark, sf_dir):
        from kafka_clickhouse_pipeline_spark.operators.dedup import (
            MINHASH_AUDIT_H,
            q_minhash_estimate_error,
        )

        row = q_minhash_estimate_error(spark, sf_dir).collect()[0]
        assert row["n_pairs"] > 0
        # estimates live on the k/H grid
        assert abs(row["mean_estimate"] * MINHASH_AUDIT_H
                   * row["n_pairs"]
                   - round(row["mean_estimate"] * MINHASH_AUDIT_H
                           * row["n_pairs"])) < 1e-3
        # j >= 0.8 pairs: sd <= sqrt(0.8*0.2/16) = 0.1; max err within
        # ~5 sd and mean err well under one sd
        assert row["max_abs_err"] <= 0.5
        assert row["mean_abs_err"] <= 0.12
        assert abs(row["mean_estimate"] - row["mean_exact"]) <= 0.1

    def test_identical_docs_estimate_one(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.dedup import (
            q_minhash_estimate_error,
        )

        d = _write_docs(spark, tmp_path, ["a b c d e f", "a b c d e f"])
        row = q_minhash_estimate_error(spark, d).collect()[0]
        assert row["n_pairs"] == 1
        assert row["mean_estimate"] == 1.0
        assert row["mean_exact"] == 1.0
        assert row["max_abs_err"] == 0.0


class TestMattrLexicalDiversity:
    def test_short_doc_falls_back_to_ttr(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            q_mattr_lexical_diversity,
        )

        d = _write_docs(spark, tmp_path, ["a b a b"])
        row = q_mattr_lexical_diversity(spark, d).collect()[0]
        assert row["n_tokens"] == 4 and row["n_windows"] == 1
        assert row["mattr"] == 0.5  # 2 types / 4 tokens

    def test_all_distinct_long_doc_is_one(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            MATTR_WINDOW,
            q_mattr_lexical_diversity,
        )

        n = MATTR_WINDOW * 2
        d = _write_docs(spark, tmp_path, [" ".join(f"w{i}" for i in range(n))])
        row = q_mattr_lexical_diversity(spark, d).collect()[0]
        assert row["n_windows"] == n - MATTR_WINDOW + 1
        assert row["mattr"] == 1.0

    def test_repetitive_long_doc_scores_low(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.operators.text import (
            MATTR_WINDOW,
            q_mattr_lexical_diversity,
        )

        d = _write_docs(spark, tmp_path, ["x " * (MATTR_WINDOW * 3)])
        row = q_mattr_lexical_diversity(spark, d).collect()[0]
        assert row["mattr"] == round(1 / MATTR_WINDOW, 6)


class TestMmrFuzzAgainstReference:
    """Property test: the K unrolled DataFrame rounds must equal an
    INDEPENDENT pure-Python greedy MMR on random inputs -- the oracle
    proves Spark==DuckDB, this proves both equal the algorithm's
    definition (same integer 1e-7 scoring, same tie-breaks)."""

    def _reference_mmr(self, vecs, n_queries, pool_n, k, lam_num=7):
        import math as m

        def cos(u, v):
            dot = nu = nv = 0.0
            for x, y in zip(u, v):
                dot += x * y
                nu += x * x
                nv += y * y
            return round(dot / (m.sqrt(nu) * m.sqrt(nv)), 6)

        out = {}
        ids = sorted(vecs)
        for q in ids:
            if q >= n_queries:
                continue
            rel = {
                d: cos(vecs[q], vecs[d]) for d in ids if d != q
            }
            pool = sorted(rel, key=lambda d: (-rel[d], d))[:pool_n]
            rel6 = {d: round(rel[d] * 1e6) for d in pool}
            sim6 = {
                (a, b): round(cos(vecs[a], vecs[b]) * 1e6)
                for a in pool
                for b in pool
                if a != b
            }
            selected = []
            for t in range(1, k + 1):
                best = None
                for d in pool:
                    if d in selected:
                        continue
                    if not selected:
                        score = rel6[d] * lam_num
                    else:
                        score = rel6[d] * lam_num - (10 - lam_num) * max(
                            sim6[(d, s)] for s in selected
                        )
                    key = (-score, d)
                    if best is None or key < best[0]:
                        best = (key, d, score)
                selected.append(best[1])
                out[(q, t)] = (best[1], best[2])
        return out

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_on_random_vectors(self, spark, tmp_path, seed):
        import random

        from kafka_clickhouse_pipeline_spark.operators.similarity import (
            MMR_K,
            MMR_POOL,
            N_QUERIES,
            q_mmr_diversified_topk,
        )

        rng = random.Random(seed)
        n = 40
        dim = 8
        vecs = {
            i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            for i in range(n)
        }
        # float32 storage: round-trip the values through float32 so the
        # reference sees exactly what Spark reads back from parquet
        import struct

        vecs = {
            i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
            for i, v in vecs.items()
        }
        d = str(tmp_path / f"mmr{seed}")
        spark.createDataFrame(
            [(i, v, 0) for i, v in vecs.items()],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        got = {
            (r["query_id"], r["rank"]): (r["neighbor_id"],
                                         round(r["mmr_score"] * 1e7))
            for r in q_mmr_diversified_topk(spark, d).collect()
        }
        want = self._reference_mmr(vecs, N_QUERIES, MMR_POOL, MMR_K)
        assert got == want
