"""Staged-commit publish protocol shared by the incremental-dedup
writers (exact and near-dup): write each batch output into a
``_staging/<batch_id>`` directory, atomically publish the parquet
files into the destination under batch-id-prefixed names, then drop a
commit marker. Replayed batch ids are no-ops; half-published files
from a crashed attempt are named by batch id and swept before
re-publish, so the whole sequence is effectively-once on top of
Structured Streaming's at-least-once foreachBatch.

(streaming/sink.py's idempotent_batch_writer implements the same idea
for partitioned event sinks with a different staging layout; the
incremental dedup writers share THIS copy.)
"""

from __future__ import annotations

import glob
import os
import shutil


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
