"""Staged-commit publish protocol shared by every state-store writer
(incremental dedup exact + near-dup, heavy hitters, KMV distinct,
drift, mixture): write each batch output into a
``_staging/<batch_id>`` directory, atomically publish the parquet
files into the destination under batch-id-prefixed names, then drop a
commit marker. Replayed batch ids are no-ops; half-published files
from a crashed attempt are named by batch id and swept before
re-publish, so the whole sequence is effectively-once on top of
Structured Streaming's at-least-once foreachBatch.

``staged_foreach_batch`` is the one enforced sequence (VERDICT r4 #8):
replay check -> sweep BEFORE the batch body reads any destination ->
body writes stagings -> publish all -> single marker -> clean. The
sweep-before-read ordering is the ADVICE r3 crash-window fix (a crash
between publish and marker must not let the replay read its own
half-published index files); centralizing it here means no writer can
re-introduce the bug by reordering its own copy of the calls.

LOCAL-FILESYSTEM CONTRACT (ADVICE r4): the protocol publishes with
``os.rename``-semantics moves and the readers locate committed state
via ``os.listdir``/``glob``, so state paths must be locally-mounted
POSIX directories (local disk, NFS). Spark's parquet WRITES would
appear to succeed against any Hadoop-supported URI (s3://, hdfs://),
but the marker/reader side would silently see "empty state" there --
do not point state_path at an object store. On a cluster, the state
dirs belong on the driver-visible shared filesystem; the datasets the
engine processes stay wherever Spark reads them from.

(streaming/sink.py's idempotent_batch_writer implements the same idea
for partitioned event sinks with a different staging layout.)
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Callable, Sequence


def marker_path(out_path: str, batch_id: int) -> str:
    return os.path.join(out_path, "_commits", str(batch_id))


def already_committed(out_path: str, batch_id: int) -> bool:
    return os.path.exists(marker_path(out_path, batch_id))


def sweep_uncommitted(batch_id: int, *dest_dirs: str) -> None:
    """Remove ``b{batch_id}-*`` files from every destination directory.

    MUST run at the top of a replayed batch (commit marker absent),
    BEFORE the batch reads any of those directories: a crash between
    ``publish_staged`` and ``write_marker`` leaves the batch's own
    half-published files visible, and an incremental-dedup replay that
    reads its own published index entries would classify every batch
    document as a historical duplicate and silently drop the batch.
    Any ``b{batch_id}-*`` file seen while the marker is absent is by
    definition a leftover of a crashed uncommitted attempt, so sweeping
    is always safe."""
    for dest_dir in dest_dirs:
        for stale in glob.glob(os.path.join(dest_dir, f"b{batch_id}-*")):
            os.remove(stale)


def publish_staged(staging: str, dest_dir: str, batch_id: int) -> None:
    """Move a staging directory's parquet files into ``dest_dir`` under
    batch-id-prefixed names, sweeping any half-published files from a
    previous crashed attempt of the same batch first."""
    for stale in glob.glob(os.path.join(dest_dir, f"b{batch_id}-*")):
        os.remove(stale)
    os.makedirs(dest_dir, exist_ok=True)
    for f in glob.glob(os.path.join(staging, "*.parquet")):
        shutil.move(f, os.path.join(dest_dir, f"b{batch_id}-{os.path.basename(f)}"))


def write_marker(out_path: str, batch_id: int) -> None:
    marker = marker_path(out_path, batch_id)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("committed")


def clean_staging(*staging_dirs: str) -> None:
    for staging in staging_dirs:
        shutil.rmtree(os.path.dirname(staging), ignore_errors=True)


def staged_foreach_batch(
    marker_dir: str,
    dest_dirs: Sequence[str],
    body: Callable,
):
    """The one staged-commit sequence, as a foreachBatch wrapper.

    ``body(batch_df, batch_id, staging)`` receives a dict mapping each
    destination directory to its per-batch staging directory and must
    write every output (plain ``df.write.parquet(staging[dest])``)
    into those; it may freely read the destination directories (the
    crashed-attempt sweep has already run) and read back its own
    staging output (the dual-dir dedup writers derive the index from
    the staged survivors). The wrapper enforces, in order: replayed
    batch -> no-op; sweep ``b{batch_id}-*`` leftovers from every
    destination BEFORE the body runs; publish every staging; ONE
    commit marker on ``marker_dir``; clean staging dirs. ``marker_dir``
    must be one of ``dest_dirs`` (the marker names the whole batch)."""
    dest_dirs = list(dest_dirs)
    assert marker_dir in dest_dirs, (marker_dir, dest_dirs)

    def _write(batch_df, batch_id: int) -> None:
        if already_committed(marker_dir, batch_id):
            return
        sweep_uncommitted(batch_id, *dest_dirs)
        staging = {
            d: os.path.join(d, "_staging", str(batch_id)) for d in dest_dirs
        }
        body(batch_df, batch_id, staging)
        for d in dest_dirs:
            publish_staged(staging[d], d, batch_id)
        write_marker(marker_dir, batch_id)
        clean_staging(*staging.values())

    return _write


def latest_committed(state_path: str) -> int | None:
    """Highest committed batch id under ``state_path``, or None before
    the first commit. Local-filesystem only (module docstring)."""
    commits = os.path.join(state_path, "_commits")
    if not os.path.isdir(commits):
        return None
    ids = [int(n) for n in os.listdir(commits) if n.isdigit()]
    return max(ids) if ids else None


def read_latest_state(spark, state_path: str, schema):
    """REPLACE-style reader: the parquet files of the latest committed
    batch only (each batch republishes the whole summary). Empty frame
    before the first commit or for an empty committed batch. The
    append-delta states (drift, mixture) read ALL committed files
    instead and keep their own readers."""
    latest = latest_committed(state_path)
    if latest is None:
        return spark.createDataFrame([], schema)
    files = sorted(glob.glob(os.path.join(state_path, f"b{latest}-*.parquet")))
    if not files:  # marker without files: empty batch
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)
