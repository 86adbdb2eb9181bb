"""Hostile filesystem double for the state commit layer
(mysql_cdc_redis_spark/streaming/commitlog.py): models what an object
store actually guarantees — and nothing more.

* There is NO rename operation.  Not "rename raises": the StateFS
  interface itself has none, so the double proves by construction
  that no state-layer code path depends on one (S3 has no rename;
  GCS directory renames are O(n) copies).
* Writes can TEAR: a scheduled crash writes only a prefix of the
  object and raises, the way a died PUT leaves a torn part or an
  incomplete multipart upload.
* Deletes can die HALFWAY through a recursive removal, the way a
  batched object-store DELETE can fail mid-listing.

Tests schedule a crash, run the engine until it raises InjectedCrash,
then re-run with the crash disarmed and assert full recovery — the
same discipline as the POSIX crash-window tests this replaces, minus
the rename the old protocol leaned on."""

from __future__ import annotations

import os

from mysql_cdc_redis_spark.streaming.commitlog import LocalFS, PutConflict


class InjectedCrash(Exception):
    """Simulated process death inside a state-layer FS operation."""


class HostileFS(LocalFS):
    def __init__(self):
        self.writes = 0
        self.deletes = 0
        self.tear_write_at: int | None = None  # 1-based write index to tear
        self.crash_delete_at: int | None = None  # 1-based delete index

    def arm_tear_write(self, nth_from_now: int = 1) -> None:
        self.tear_write_at = self.writes + nth_from_now

    def arm_crash_delete(self, nth_from_now: int = 1) -> None:
        self.crash_delete_at = self.deletes + nth_from_now

    def disarm(self) -> None:
        self.tear_write_at = None
        self.crash_delete_at = None

    def write_bytes(self, path: str, data: bytes) -> None:
        self.writes += 1
        if self.tear_write_at is not None and self.writes == self.tear_write_at:
            super().write_bytes(path, data[: max(1, len(data) // 2)])
            raise InjectedCrash(f"torn write: {path}")
        super().write_bytes(path, data)

    def write_bytes_if_absent(self, path: str, data: bytes) -> None:
        """Models the conditional-PUT contract (S3 If-None-Match:* /
        GCS generation-0): an existing object fails the precondition
        CLEANLY (PutConflict, no tear — the store rejects before any
        body bytes land), while a PUT that wins the condition can still
        die mid-body, leaving a torn object that CLAIMS the name."""
        self.writes += 1
        if self.tear_write_at is not None and self.writes == self.tear_write_at:
            if os.path.exists(path):
                raise PutConflict(path)
            super(HostileFS, self).write_bytes(path, data[: max(1, len(data) // 2)])
            raise InjectedCrash(f"torn write: {path}")
        super().write_bytes_if_absent(path, data)

    def delete(self, path: str) -> None:
        self.deletes += 1
        if self.crash_delete_at is not None and self.deletes == self.crash_delete_at:
            if os.path.isdir(path):
                kids = sorted(os.listdir(path))
                for k in kids[: len(kids) // 2]:
                    super().delete(os.path.join(path, k))
            raise InjectedCrash(f"partial delete: {path}")
        super().delete(path)
