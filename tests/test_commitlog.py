"""The manifest commit log (streaming/commitlog.py) — the PUT-only,
rename-free protocol every durable streaming state transition rides on.
No SparkSession needed: this layer is pure filesystem contract."""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

import pytest

from mysql_cdc_redis_spark.streaming.commitlog import (
    LocalFS,
    ManifestConflict,
    ManifestLog,
    PutConflict,
)

from .fs_double import HostileFS, InjectedCrash


@pytest.fixture()
def root():
    p = os.path.join(tempfile.gettempdir(), f"cl_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_commit_then_head_roundtrip(root):
    log = ManifestLog(LocalFS(), root)
    assert log.head() is None
    v1 = log.commit({"runs": [1, 2], "x": "a"})
    v2 = log.commit({"runs": [1, 2, 3], "x": "b"})
    assert v2 > v1
    head = log.head()
    assert head == (v2, {"runs": [1, 2, 3], "x": "b"})


def test_torn_commit_reads_as_previous_state(root):
    """A crash mid-PUT leaves a torn manifest; the checksum invalidates
    it and head() falls back — the transition never happened."""
    fs = HostileFS()
    log = ManifestLog(fs, root)
    v1 = log.commit({"state": "old"})
    fs.arm_tear_write()
    with pytest.raises(InjectedCrash):
        log.commit({"state": "new"})
    fs.disarm()
    assert log.head() == (v1, {"state": "old"})


def test_retry_after_torn_commit_never_overwrites(root):
    """The retry must claim a FRESH version number (overwriting an
    existing object is the one mutation object stores read non-
    atomically), and the torn object must stay inert."""
    fs = HostileFS()
    log = ManifestLog(fs, root)
    log.commit({"state": "old"})
    fs.arm_tear_write()
    with pytest.raises(InjectedCrash):
        log.commit({"state": "new"})
    fs.disarm()
    torn = [f for f in os.listdir(log.dir)]
    v3 = log.commit({"state": "new"})
    assert log.head() == (v3, {"state": "new"})
    # the torn file was not reused as the retry's name
    assert f"v{v3:020d}.json" not in torn


def test_garbage_and_foreign_files_are_skipped(root):
    fs = LocalFS()
    log = ManifestLog(fs, root)
    v = log.commit({"ok": True})
    # hand-plant: valid-JSON-wrong-checksum, non-JSON, foreign names
    fs.write_bytes(
        os.path.join(log.dir, f"v{v + 5:020d}.json"),
        json.dumps({"payload": {"evil": 1}, "sha256": "0" * 64}).encode(),
    )
    fs.write_bytes(os.path.join(log.dir, f"v{v + 6:020d}.json"), b"\x00not json")
    fs.write_bytes(os.path.join(log.dir, "README.txt"), b"hi")
    assert log.head() == (v, {"ok": True})
    # and the next commit goes past ALL existing numbers, valid or not
    v2 = log.commit({"ok": 2})
    assert v2 > v + 6


def test_retention_prunes_old_versions_but_keeps_fallback(root):
    log = ManifestLog(LocalFS(), root, keep=3)
    for i in range(10):
        log.commit({"i": i})
    names = [f for f in os.listdir(log.dir) if f.endswith(".json")]
    assert len(names) <= 3
    assert log.head()[1] == {"i": 9}


class _StaleListFS(LocalFS):
    """A zombie writer's view of the log: directory listings frozen at
    ``freeze()`` time (the driver stalled; the world moved on), while
    writes still hit the real store — the exact interleaving that used
    to silently lose a commit."""

    def __init__(self):
        self._snap: list[str] | None = None

    def freeze(self, path: str) -> None:
        self._snap = super().list(path)

    def list(self, path: str) -> list[str]:
        return list(self._snap) if self._snap is not None else super().list(path)


def test_conditional_put_contract(root):
    """write_bytes_if_absent: wins on a fresh name, raises PutConflict
    on an existing object and leaves its bytes untouched."""
    fs = LocalFS()
    p = os.path.join(root, "obj")
    fs.write_bytes_if_absent(p, b"first")
    with pytest.raises(PutConflict):
        fs.write_bytes_if_absent(p, b"second")
    assert fs.read_bytes(p) == b"first"


def test_zombie_writer_commit_is_detected_not_lost(root):
    """Round-8 verdict #1: a zombie driver and its replacement both
    compute max(existing)+1; the fenced PUT must turn the second
    committer of that version into a DETECTED ManifestConflict — never
    a silent last-writer-wins overwrite of the first."""
    zombie_fs = _StaleListFS()
    zombie = ManifestLog(zombie_fs, root)
    replacement = ManifestLog(LocalFS(), root)
    replacement.commit({"writer": "init"})
    zombie_fs.freeze(zombie.dir)  # the zombie stalls holding this view
    vb = replacement.commit({"writer": "replacement"})
    with pytest.raises(ManifestConflict):
        zombie.commit({"writer": "zombie"})  # computes the same version
    # the replacement's commit is intact and still the head
    assert replacement.head() == (vb, {"writer": "replacement"})


def test_own_torn_retry_never_conflicts(root):
    """Fencing must not break single-writer crash recovery: a writer's
    own torn commit claims its version number (the object exists,
    torn), and the retry allocates the NEXT version — no conflict."""
    fs = HostileFS()
    log = ManifestLog(fs, root)
    log.commit({"state": "old"})
    fs.arm_tear_write()
    with pytest.raises(InjectedCrash):
        log.commit({"state": "new"})
    fs.disarm()
    v = log.commit({"state": "new"})  # must succeed, not conflict
    assert log.head() == (v, {"state": "new"})


def test_hostile_conditional_put_rejects_existing_cleanly(root):
    """The double models the store contract: a conditional PUT against
    an existing object fails the precondition BEFORE any body bytes
    land — even with a tear armed, the existing object is untouched."""
    fs = HostileFS()
    p = os.path.join(root, "obj")
    fs.write_bytes_if_absent(p, b"first")
    fs.arm_tear_write()
    with pytest.raises(PutConflict):
        fs.write_bytes_if_absent(p, b"second")
    assert fs.read_bytes(p) == b"first"


def test_crash_mid_retention_delete_is_harmless(root):
    fs = HostileFS()
    log = ManifestLog(fs, root, keep=2)
    log.commit({"i": 0})
    log.commit({"i": 1})
    fs.arm_crash_delete()  # the commit below prunes v1 — die during it
    with pytest.raises(InjectedCrash):
        log.commit({"i": 2})
    fs.disarm()
    # the new head was already durable before retention ran
    assert log.head()[1] == {"i": 2}
    log.commit({"i": 3})
    assert log.head()[1] == {"i": 3}
