"""Cross-process single-writer enforcement (VERDICT r8 task 3).

The reference has exactly one writer service per table set
(ref: writer/service/*.go — inserts are funneled through one batching
service); two writer processes never append to the same table. The
Spark analog enforces that deployment contract with an advisory fcntl
lock file per store root: the second writer PROCESS must fail fast
with StoreWriterConflict instead of silently racing on the parquet
FileOutputCommitter `_temporary` staging dir.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from gigapipe_spark.storage import writer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
from gigapipe_spark.storage import writer
try:
    writer.store_write_lock(sys.argv[1])
except writer.StoreWriterConflict as e:
    print("CONFLICT:" + str(e))
    sys.exit(7)
print("ACQUIRED")
"""


def _child_try_lock(root: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", _CHILD, root],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_second_writer_process_fails_fast(tmp_path):
    root = str(tmp_path / "store")
    writer.store_write_lock(root)  # this process becomes THE writer
    try:
        p = _child_try_lock(root)
        assert p.returncode == 7, p.stderr
        assert "CONFLICT" in p.stdout
        assert str(os.getpid()) in p.stdout  # error names the owner pid
    finally:
        writer.release_store_process_lock(root)
    # after release (writer handover) a new process acquires cleanly
    p2 = _child_try_lock(root)
    assert p2.returncode == 0, p2.stderr
    assert "ACQUIRED" in p2.stdout


def test_lock_key_normalization(tmp_path):
    # ADVICE r8: trailing slash / non-normalized paths must converge on
    # ONE lock per physical root (streaming sink keys by dirname, the
    # batch fan-out by Catalog.root)
    root = str(tmp_path / "store")
    a = writer.store_write_lock(root)
    try:
        assert writer.store_write_lock(root + "/") is a
        assert writer.store_write_lock(root + "/sub/..") is a
        assert (
            writer.store_write_lock(os.path.join(root, ".", "")) is a
        )
    finally:
        writer.release_store_process_lock(root)


def test_same_process_reentry_and_distinct_roots(tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    la = writer.store_write_lock(ra)
    lb = writer.store_write_lock(rb)
    try:
        assert la is not lb
        # re-entrant within the process: the fan-out takes it, then
        # patterns_fanout takes it again
        with la:
            with writer.store_write_lock(ra):
                pass
        # flock is per-process: a second THREAD/lookup in this process
        # must not conflict with our own grant
        assert writer.store_write_lock(ra) is la
    finally:
        writer.release_store_process_lock(ra)
        writer.release_store_process_lock(rb)


def test_lockfile_records_owner_pid(tmp_path):
    root = str(tmp_path / "store")
    writer.store_write_lock(root)
    try:
        lockfile = os.path.join(root, ".writer.lock")
        assert os.path.exists(lockfile)
        with open(lockfile) as fh:
            assert fh.read().strip() == str(os.getpid())
    finally:
        writer.release_store_process_lock(root)


def test_release_is_idempotent(tmp_path):
    root = str(tmp_path / "store")
    writer.store_write_lock(root)
    writer.release_store_process_lock(root)
    writer.release_store_process_lock(root)  # no-op, no raise
