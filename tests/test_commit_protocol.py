"""Unit tests for the shared staged-commit wrapper
(streaming/commit.py staged_foreach_batch) -- the one place the
sweep-before-body crash-window ordering is enforced (VERDICT r4 #8).
The six writers' end-to-end behavior (including crash-window replays)
is covered by their own test modules; these pin the wrapper contract
itself so a refactor of any single writer can't reorder the protocol.
"""

from __future__ import annotations

import os

import pytest

from kafka_clickhouse_pipeline_spark.streaming import commit


def _touch(path: str, content: str = "x") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def test_marker_dir_must_be_a_destination(tmp_path):
    with pytest.raises(AssertionError):
        commit.staged_foreach_batch(str(tmp_path / "other"), [str(tmp_path / "a")], lambda *a: None)


def test_replayed_batch_is_noop(tmp_path):
    dest = str(tmp_path / "state")
    calls = []
    w = commit.staged_foreach_batch(dest, [dest], lambda df, bid, st: calls.append(bid))
    _touch(commit.marker_path(dest, 7))
    w(None, 7)
    assert calls == []


def test_sweep_runs_before_body_and_publish_after(tmp_path):
    """A crashed attempt's half-published b5-* file must be gone by the
    time the body runs (the replay-reads-own-index data-loss window),
    and the body's staged output must be published under the batch
    prefix with exactly one marker."""
    dest = str(tmp_path / "state")
    leftover = os.path.join(dest, "b5-old.parquet")
    _touch(leftover)
    seen = {}

    def body(df, bid, staging):
        seen["leftover_gone"] = not os.path.exists(leftover)
        _touch(os.path.join(staging[dest], "part-0.parquet"), "data")

    commit.staged_foreach_batch(dest, [dest], body)(None, 5)
    assert seen["leftover_gone"], "sweep must precede the body"
    assert os.path.exists(os.path.join(dest, "b5-part-0.parquet"))
    assert commit.already_committed(dest, 5)
    assert not os.path.exists(os.path.join(dest, "_staging"))


def test_dual_destination_single_marker(tmp_path):
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")

    def body(df, bid, staging):
        _touch(os.path.join(staging[out], "d.parquet"))
        _touch(os.path.join(staging[idx], "i.parquet"))

    commit.staged_foreach_batch(out, [out, idx], body)(None, 3)
    assert os.path.exists(os.path.join(out, "b3-d.parquet"))
    assert os.path.exists(os.path.join(idx, "b3-i.parquet"))
    assert commit.already_committed(out, 3)
    # one marker names the whole batch: the index dir carries none
    assert not os.path.isdir(os.path.join(idx, "_commits"))


def test_body_failure_leaves_no_marker_and_replay_reruns(tmp_path):
    dest = str(tmp_path / "state")
    attempts = []

    def body(df, bid, staging):
        attempts.append(bid)
        if len(attempts) == 1:
            # simulate a crash after a partial staged write
            _touch(os.path.join(staging[dest], "p.parquet"))
            raise RuntimeError("boom")
        _touch(os.path.join(staging[dest], "p.parquet"))

    w = commit.staged_foreach_batch(dest, [dest], body)
    with pytest.raises(RuntimeError):
        w(None, 9)
    assert not commit.already_committed(dest, 9)
    w(None, 9)  # replay succeeds
    assert attempts == [9, 9]
    assert commit.already_committed(dest, 9)
    assert os.path.exists(os.path.join(dest, "b9-p.parquet"))


def test_read_latest_state_empty_before_first_commit(tmp_path, spark):
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("x", LongType(), False)])
    empty = commit.read_latest_state(spark, str(tmp_path / "none"), schema)
    assert empty.collect() == []
    assert commit.latest_committed(str(tmp_path / "none")) is None


# ---- round 7: scheme-routed filesystem backends (VERDICT r6 #8) ----


def test_scheme_routing_picks_backends():
    """Plain paths and file: URIs stay on the POSIX backend; object-
    store schemes route to the Hadoop backend (constructed lazily --
    the factory raises without a session only for REMOTE schemes)."""
    fs, p = commit._backend("/tmp/x")
    assert isinstance(fs, commit._LocalBackend) and p == "/tmp/x"
    fs, p = commit._backend("file:///tmp/x")
    assert isinstance(fs, commit._LocalBackend) and p == "/tmp/x"


def test_hadoop_backend_full_protocol_on_file_uri(tmp_path, spark):
    """The Hadoop backend run end-to-end through the staged-commit
    protocol against file:/ URIs -- the JVM Hadoop LocalFileSystem is
    a real FileSystem implementation, so this exercises the exact
    listStatus/globStatus/rename/create/delete calls an s3a:// or
    hdfs:// deployment would make (no mocks)."""
    uri = f"file://{tmp_path}/state"
    hb = commit._HadoopBackend(uri, spark=spark)
    # protocol primitives against the Hadoop API
    hb.makedirs(f"{uri}/_commits")
    assert hb.isdir(f"{uri}/_commits")
    hb.write_text(f"{uri}/_commits/0", "committed")
    assert hb.exists(f"{uri}/_commits/0")
    assert hb.listdir(f"{uri}/_commits") == ["0"]
    hb.makedirs(f"{uri}/_staging/1")
    hb.write_text(f"{uri}/_staging/1/part-0.parquet", "x")
    staged = hb.glob(f"{uri}/_staging/1/*.parquet")
    assert len(staged) == 1 and staged[0].endswith("part-0.parquet")
    hb.move(staged[0], f"{uri}/b1-part-0.parquet")
    assert hb.exists(f"{uri}/b1-part-0.parquet")
    assert not hb.exists(f"{uri}/_staging/1/part-0.parquet")
    hb.remove(f"{uri}/b1-part-0.parquet")
    assert not hb.exists(f"{uri}/b1-part-0.parquet")
    hb.rmtree(f"{uri}/_staging")
    assert not hb.exists(f"{uri}/_staging")


def test_staged_protocol_via_forced_hadoop_backend(tmp_path, spark, monkeypatch):
    """staged_foreach_batch with EVERY path operation forced through
    the Hadoop backend (file:/ URI localfs): replay no-op, publish,
    marker, and latest-state read must behave exactly as on POSIX."""
    real_backend = commit._backend

    def forced(path, spark_arg=None):
        if path.startswith("/"):
            return commit._HadoopBackend(f"file://{path}", spark=spark), path
        return real_backend(path, spark_arg)

    monkeypatch.setattr(commit, "_backend", forced)
    dest = str(tmp_path / "state")
    os.makedirs(dest, exist_ok=True)
    calls = []

    def body(batch_df, batch_id, staging):
        calls.append(batch_id)
        os.makedirs(staging[dest], exist_ok=True)
        with open(os.path.join(staging[dest], "part-0.parquet"), "w") as fh:
            fh.write("data")

    writer = commit.staged_foreach_batch(dest, [dest], body)
    writer(None, 7)
    assert calls == [7]
    assert commit.already_committed(dest, 7)
    assert commit.latest_committed(dest) == 7
    assert os.path.exists(os.path.join(dest, "b7-part-0.parquet"))
    writer(None, 7)  # replay -> no-op
    assert calls == [7]


@pytest.fixture()
def lag_fs(monkeypatch):
    """Object store whose LIST lags its PUTs (s3a list-after-write
    semantics): files written by move/write_text stay INVISIBLE to
    glob/listdir until the store 'settles' (the returned callable),
    while exists() (a GET) stays consistent, and rename follows Hadoop
    semantics (raises via the false-return contract when dst exists).
    Shared by the staged-commit and compaction protocol tests."""
    import shutil

    hidden: set[str] = set()

    class _ListLagBackend(commit._LocalBackend):
        def move(self, src, dst):
            if os.path.exists(dst):  # Hadoop rename-false contract
                raise IOError(f"Hadoop rename failed: {src!r} -> {dst!r}")
            shutil.move(src, dst)
            hidden.add(dst)

        def write_text(self, path, text):
            super().write_text(path, text)
            hidden.add(path)

        def remove(self, path):  # deletes are GET-consistent
            super().remove(path)
            hidden.discard(path)

        def glob(self, pattern):
            return [
                f for f in super().glob(pattern) if f not in hidden
            ]

        def listdir(self, path):
            return [
                n
                for n in super().listdir(path)
                if os.path.join(path, n) not in hidden
            ]

    orig = commit._backend

    def routed(path, spark=None):
        fs, p = orig(path, spark)
        if isinstance(fs, commit._LocalBackend):
            return _ListLagBackend(), p
        return fs, p

    monkeypatch.setattr(commit, "_backend", routed)

    def settle():
        hidden.clear()

    return settle


class TestListAfterWriteLag:
    """VERDICT r8 #6: the staged-commit protocol against an object
    store whose LIST lags its PUTs (see the lag_fs fixture). The
    protocol must never commit a marker over an unswept
    double-publish; a replay inside the lag window may fail loudly,
    and a replay after the lag clears must converge to exactly-once
    output."""

    def test_crash_replay_converges_under_list_lag(self, tmp_path, lag_fs):
        settle = lag_fs
        dest = str(tmp_path / "state")
        os.makedirs(dest)
        attempts = {"n": 0}

        def body(batch_df, batch_id, staging):
            attempts["n"] += 1
            os.makedirs(staging[dest], exist_ok=True)
            with open(
                os.path.join(staging[dest], "part-0.parquet"), "w"
            ) as f:
                f.write(f"attempt{attempts['n']}")

        # crash between publish and marker, with the published file
        # NOT yet visible to LIST
        def crashing(batch_df, batch_id):
            commit.sweep_uncommitted(batch_id, dest)
            staging = {dest: os.path.join(dest, "_staging", str(batch_id))}
            body(batch_df, batch_id, staging)
            commit.publish_staged(staging[dest], dest, batch_id)
            raise RuntimeError("crash before write_marker")

        with pytest.raises(RuntimeError, match="crash"):
            crashing(None, 0)
        assert not commit.already_committed(dest, 0)

        # replay INSIDE the lag window: the sweep's glob cannot see
        # the leftover, so re-publish hits the existing dst and the
        # Hadoop rename contract fails the batch LOUDLY -- no marker,
        # no silent overwrite, no duplicate
        writer = commit.staged_foreach_batch(dest, [dest], body)
        with pytest.raises(IOError, match="rename failed"):
            writer(None, 0)
        assert not commit.already_committed(dest, 0)

        # lag clears; the next replay sweeps the crashed attempt and
        # commits exactly one file with the replayed attempt's bytes
        settle()
        writer(None, 0)
        assert commit.already_committed(dest, 0)
        files = [f for f in os.listdir(dest) if f.startswith("b0-")]
        assert files == ["b0-part-0.parquet"]
        with open(os.path.join(dest, files[0])) as f:
            assert f.read() == f"attempt{attempts['n']}"

    def test_reader_sees_committed_state_through_manifest(
        self, tmp_path, lag_fs, spark
    ):
        """The marker manifest closes the reader-side window: a batch
        whose files a LIST cannot yet see must still be readable the
        instant its marker is visible (exists/GET consistent)."""
        dest = str(tmp_path / "state")
        os.makedirs(dest)

        def body(batch_df, batch_id, staging):
            spark.createDataFrame(
                [(1, "a")], "id bigint, s string"
            ).coalesce(1).write.mode("overwrite").parquet(staging[dest])

        writer = commit.staged_foreach_batch(dest, [dest], body)
        writer(None, 0)
        # everything this batch wrote is still LIST-hidden (no settle)
        fs, p = commit._backend(dest)
        assert fs.glob(os.path.join(p, "b0-*.parquet")) == []
        # ...yet latest_committed + the manifest resolve the state.
        # NB: listdir on _commits is also lagged, which models a
        # reader polling an eventually-consistent store; the marker
        # becomes listable on settle, the data files may still lag.
        with open(os.path.join(dest, "_commits", "0")) as f:
            assert '"files"' in f.read()

        manifest = commit.read_marker_manifest(dest, 0)
        assert manifest is not None and len(manifest[dest]) == 1

        # settle (markers are tiny and written last; in the hazard the
        # marker is visible first), then prove the reader resolves the
        # data files WITHOUT any LIST at all -- manifest-only
        lag_fs()
        real_glob = commit._LocalBackend.glob

        def no_files_glob(self, pattern):
            if "b0-" in pattern:
                raise AssertionError(
                    "reader used a LIST to resolve committed files"
                )
            return real_glob(self, pattern)

        commit._LocalBackend.glob = no_files_glob
        try:
            out = commit.read_latest_state(
                spark, dest, "id bigint, s string"
            )
            assert [tuple(r) for r in out.collect()] == [(1, "a")]
        finally:
            commit._LocalBackend.glob = real_glob

    def test_legacy_marker_falls_back_to_glob(self, tmp_path, spark):
        dest = str(tmp_path / "state")
        os.makedirs(os.path.join(dest, "_commits"))
        spark.createDataFrame(
            [(2, "b")], "id bigint, s string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stg"))
        part = next(
            f
            for f in os.listdir(tmp_path / "stg")
            if f.endswith(".parquet")
        )
        os.rename(
            tmp_path / "stg" / part, os.path.join(dest, f"b0-{part}")
        )
        with open(os.path.join(dest, "_commits", "0"), "w") as f:
            f.write("committed")  # pre-manifest marker
        out = commit.read_latest_state(spark, dest, "id bigint, s string")
        assert [tuple(r) for r in out.collect()] == [(2, "b")]


class TestCompactionProtocol:
    """VERDICT r9 #3: compact_partitions routed through the scheme
    backend and the staging -> publish -> ONE marker -> GC sequence.
    The contract under test: a reader (streaming.sink.read_table,
    manifest-resolved) sees every partition's rows EXACTLY ONCE at
    every crash point of a compaction, on a store whose LIST lags its
    PUTs -- and a writer-in-flight precondition is checked, not
    documented."""

    def _build_table(self, spark, path):
        from pyspark.sql import functions as F

        from kafka_clickhouse_pipeline_spark.streaming.sink import (
            idempotent_batch_writer,
        )

        writer = idempotent_batch_writer(path, target_files=2)
        for b in range(6):  # 12 files into 202401
            df = spark.createDataFrame(
                [
                    (f"2024-01-{10 + b:02d} 00:00:00", b * 10 + i, 1.0)
                    for i in range(5)
                ],
                "event_time STRING, product_id INT, price DOUBLE",
            ).withColumn("event_time", F.to_timestamp("event_time"))
            writer(df, b)
        feb = spark.createDataFrame(
            [("2024-02-01 00:00:00", 999, 2.0)],
            "event_time STRING, product_id INT, price DOUBLE",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        writer(feb, 100)

    @staticmethod
    def _rows(df):
        return sorted(
            (r["product_id"], str(r["event_time"])) for r in df.collect()
        )

    def test_reader_exact_once_through_crash_and_lag(
        self, spark, tmp_path, lag_fs
    ):
        """Crash between publish and marker -> reader sees the OLD
        files only; replay inside the lag window converges (fresh
        staged names, no rename collision); after the marker the
        reader resolves the NEW files from the manifest even while
        LIST still hides them; a later sweep removes the crashed
        attempt's orphans so even a plain directory read converges."""
        import glob as g

        from kafka_clickhouse_pipeline_spark.streaming import sink

        settle = lag_fs
        path = str(tmp_path / "table")
        self._build_table(spark, path)
        before = self._rows(spark.read.parquet(path))
        assert self._rows(sink.read_table(spark, path)) == before

        # crash the first attempt at the marker write (publish done)
        real_backend = commit._backend

        class _MarkerCrash:
            def __init__(self, fs):
                self._fs = fs

            def __getattr__(self, n):
                return getattr(self._fs, n)

            def write_text(self, p, text):
                if "_compactions" in p:
                    raise RuntimeError("crash before compaction marker")
                return self._fs.write_text(p, text)

        def crashing(p, spark=None):
            fs, pp = real_backend(p, spark)
            return _MarkerCrash(fs), pp

        import pytest as _pytest

        from kafka_clickhouse_pipeline_spark.streaming import (
            commit as commit_mod,
        )

        orig = commit_mod._backend
        commit_mod._backend = crashing
        try:
            with _pytest.raises(RuntimeError, match="crash before"):
                sink.compact_partitions(
                    spark, path, max_files_per_partition=8, target_files=2
                )
        finally:
            commit_mod._backend = orig

        # half-published state exists on disk (raw glob, not the lagged
        # backend)...
        orphans = g.glob(
            os.path.join(path, "event_month=202401", "c0-*.parquet")
        )
        assert orphans, "publish must have landed c0-* files"
        # ...but the reader sees the OLD rows exactly once (no marker)
        assert self._rows(sink.read_table(spark, path)) == before

        # replay INSIDE the lag window (sweep cannot LIST the orphans;
        # fresh staged names mean no rename collision) -> converges
        compacted = sink.compact_partitions(
            spark, path, max_files_per_partition=8, target_files=2
        )
        assert compacted == ["202401"]
        # marker committed; old files GC'd (GET-consistent deletes);
        # the new files are still LIST-hidden -- a listing-based reader
        # would see an EMPTY january here:
        fs, p = commit._backend(path)
        assert [
            f
            for f in fs.glob(
                os.path.join(p, "event_month=202401", "*.parquet")
            )
            if "c0-" not in f
        ] == []
        # ...the manifest-resolved reader sees every row exactly once
        assert self._rows(sink.read_table(spark, path)) == before

        # store settles: reader unchanged; one more maintenance pass
        # sweeps the crashed attempt's orphans, after which even a
        # plain directory read agrees
        settle()
        assert self._rows(sink.read_table(spark, path)) == before
        assert (
            sink.compact_partitions(
                spark, path, max_files_per_partition=8, target_files=2
            )
            == []
        )
        assert self._rows(spark.read.parquet(path)) == before
        jan = g.glob(os.path.join(path, "event_month=202401", "*.parquet"))
        assert len(jan) <= 2, jan

    def test_detach_first_is_a_checked_invariant(self, spark, tmp_path):
        from kafka_clickhouse_pipeline_spark.streaming import sink

        path = str(tmp_path / "table")
        self._build_table(spark, path)
        # a batch writer's staging dir = writer attached or crashed
        os.makedirs(os.path.join(path, "_staging", "7"))
        with pytest.raises(RuntimeError, match="DETACH"):
            sink.compact_partitions(spark, path)

    def test_null_partition_never_compacted(self, spark, tmp_path):
        """Unparseable-event_time rows land in the null partition; the
        compactor must skip it (its rows are a diagnostic stash and
        event_month cannot be re-derived for them)."""
        from pyspark.sql import functions as F

        from kafka_clickhouse_pipeline_spark.streaming.sink import (
            compact_partitions,
            idempotent_batch_writer,
            read_table,
        )

        path = str(tmp_path / "table")
        writer = idempotent_batch_writer(path, target_files=2)
        for b in range(6):
            df = spark.createDataFrame(
                [(None, b * 10 + i, 1.0) for i in range(5)],
                "event_time STRING, product_id INT, price DOUBLE",
            ).withColumn("event_time", F.to_timestamp("event_time"))
            writer(df, b)
        assert compact_partitions(spark, path, max_files_per_partition=2) == []
        assert read_table(spark, path).count() == 30
