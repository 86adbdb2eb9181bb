"""Object-store-safe commit layer for durable streaming state.

The engine's exactly-once machinery previously rested on POSIX atomic
rename (``os.replace`` meta commits, ``root -> root.old`` compaction
swaps) and ``os.listdir`` walks defining what state exists.  That is
correct on a local filesystem and WRONG on the substrates a 100-TB
deployment actually uses: S3 has no rename at all (copy+delete,
non-atomic, crash windows between the two), and GCS directory
"renames" are O(n) object copies.  The reference solved the same
problem with manifest files and anti-joins (upload.info / bqload.info,
dump2csv.py:199-230 — cataloged here as J3); this module makes that
pattern the engine's own commit protocol.

Design — a **versioned, self-validating manifest log**:

* State is defined by MANIFESTS, never by directory listings.  A
  manifest is an immutable JSON object ``_log/v{N:020}.json`` whose
  payload lists the live artifacts (run directories, slot ids, batch
  watermarks).  The current state is the HIGHEST-numbered manifest
  whose embedded checksum validates.
* Commits are PUT-only.  A commit writes ONE new object under a name
  no other writer uses (single logical writer — the same T5 stance as
  the rest of the engine: foreachBatch is sequential).  No rename, no
  overwrite, no delete is on the commit path, so the protocol needs
  nothing from the store beyond "a finished PUT is readable" — which
  S3/GCS/local all guarantee.  A crash mid-PUT leaves a torn object;
  the checksum makes torn manifests self-invalidating, and the reader
  falls back to the previous version (the state transition simply
  never happened — exactly the semantics ``os.replace`` provided,
  without the rename).
* Data files are written FIRST, the manifest LAST.  Artifacts not yet
  referenced by a committed manifest are invisible (readers build
  their file lists from the manifest, never from listings), so partial
  data from a crashed attempt can never be read; the retry overwrites
  it and commits a manifest that references the complete version.
* Deletes are garbage collection, OFF the correctness path: after a
  commit, directories no manifest references are removed best-effort.
  A crash mid-GC leaves unreferenced garbage, never corruption.

``StateFS`` is the narrow filesystem contract all of this needs —
write (possibly torn), read, list, delete, stat.  ``LocalFS`` is the
POSIX backend; an object-store backend implements the same five
operations with PUT/GET/LIST/DELETE/HEAD.  Tests run the whole state
layer against a hostile double (tests/fs_double.py) whose writes can
be truncated mid-object and whose deletes can die halfway — the modes
an eventually-consistent store exhibits — proving no code path needs
an atomic rename.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


class LocalFS:
    """POSIX backend of the minimal state-filesystem contract.

    The contract is five operations, chosen so an S3/GCS client maps
    1:1 (PUT / GET / LIST / DELETE / HEAD+LIST for sizes).  There is
    deliberately NO rename/move operation: the commit protocol above
    never needs one, and omitting it from the interface makes a
    rename-dependence regression a type error, not a latent bug."""

    def write_bytes(self, path: str, data: bytes) -> None:
        """PUT an object.  May tear on crash — callers must make torn
        objects self-invalidating (ManifestLog does, via checksum)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list(self, path: str) -> list[str]:
        """Immediate child names (objects and prefixes); [] if absent."""
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        """Recursive best-effort delete; absent paths are a no-op."""
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass

    def du(self, path: str) -> int:
        """Total bytes under a prefix (object-store LIST returns sizes
        for free; locally it is a walk).  Used only for sizing
        decisions (auto_bucket_count), never correctness."""
        total = 0
        for dirpath, _dirnames, filenames in os.walk(path):
            for f in filenames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total


class ManifestLog:
    """Versioned commit log under ``{root}/_log``: PUT-only, checksum-
    validated, rename-free.

    ``head()`` returns (version, payload) of the newest VALID manifest
    — torn or garbage objects are skipped, so a crash mid-commit reads
    as "the commit never happened".  ``commit(payload)`` writes version
    ``max(existing)+1`` (existing counts invalid versions too: a torn
    ``v7`` must not be overwritten by the retry, which becomes ``v8``
    — overwriting an existing object is the one mutation object stores
    make non-atomic reads of).  Old valid manifests are retained as
    fallback and pruned beyond ``keep`` generations, off the commit
    path."""

    _PREFIX = "v"
    _SUFFIX = ".json"

    def __init__(self, fs, root: str, keep: int = 16):
        self.fs = fs
        self.dir = os.path.join(root, "_log")
        self.keep = keep

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, f"{self._PREFIX}{version:020d}{self._SUFFIX}")

    def _versions(self) -> list[int]:
        out = []
        for name in self.fs.list(self.dir):
            if name.startswith(self._PREFIX) and name.endswith(self._SUFFIX):
                body = name[len(self._PREFIX) : -len(self._SUFFIX)]
                if body.isdigit():
                    out.append(int(body))
        return sorted(out)

    def _load(self, version: int) -> dict | None:
        """Payload of one manifest, or None if torn/garbage."""
        try:
            raw = self.fs.read_bytes(self._path(version))
            doc = json.loads(raw.decode("utf-8"))
            body = json.dumps(doc["payload"], sort_keys=True).encode("utf-8")
            if hashlib.sha256(body).hexdigest() != doc["sha256"]:
                return None
            return doc["payload"]
        except (OSError, ValueError, KeyError, UnicodeDecodeError):
            return None

    def head(self) -> tuple[int, dict] | None:
        """(version, payload) of the newest valid manifest, else None.
        Falling back past an invalid newest version is the crash-
        recovery path: the torn commit's state transition is simply
        not observed."""
        for v in reversed(self._versions()):
            payload = self._load(v)
            if payload is not None:
                return v, payload
        return None

    def commit(self, payload: dict) -> int:
        """Publish a new state version.  The write is a single PUT of
        a self-validating object; there is no window in which a reader
        can observe a half-applied transition (it either validates or
        is skipped)."""
        versions = self._versions()
        v = (versions[-1] if versions else 0) + 1
        body = json.dumps(payload, sort_keys=True)
        doc = {
            "payload": payload,
            "sha256": hashlib.sha256(body.encode("utf-8")).hexdigest(),
        }
        self.fs.write_bytes(self._path(v), json.dumps(doc).encode("utf-8"))
        # retention: prune far-behind versions, best-effort, AFTER the
        # new head is durable (a crash here leaves extra history only)
        for old in versions[: max(0, len(versions) + 1 - self.keep)]:
            self.fs.delete(self._path(old))
        return v
