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
* Commits are PUT-only and FENCED.  A commit writes ONE new object
  whose name it claims with a conditional PUT (local ``O_EXCL``; S3
  ``If-None-Match: *``; GCS generation-0 precondition): under the
  normal single-logical-writer regime (foreachBatch is sequential, the
  same T5 stance as the rest of the engine) the condition never fires,
  and when the regime is violated — a zombie driver revives and races
  its replacement for the same version number — exactly one writer's
  manifest lands and the other gets a loud ManifestConflict instead of
  a silent last-writer-wins overwrite (the window the reference closed
  with its Redis NX/EX lock, rcache.py:36-54).  No rename, no
  overwrite, no delete is on the commit path, so the protocol needs
  nothing more from the store.  A crash mid-PUT leaves a torn object;
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
write (possibly torn), conditional write, read, list, delete, stat.
``LocalFS`` is the POSIX backend; an object-store backend implements
the same six operations with PUT/GET/LIST/DELETE/HEAD.  Tests run the whole state
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


class PutConflict(Exception):
    """A conditional PUT lost its race: an object already exists at the
    target name.  Raised by ``StateFS.write_bytes_if_absent`` — the
    local analog of S3's ``If-None-Match: *`` 412 and GCS's
    ``ifGenerationMatch=0`` precondition failure."""


class ManifestConflict(Exception):
    """Two writers raced ``ManifestLog.commit`` for the same version.

    The fenced PUT turned what used to be a silent last-writer-wins
    overwrite into a detected conflict: the loser's payload — computed
    from a now-stale head — was NEVER published.  The right response is
    to re-read ``head()`` and recompute (or, for a zombie writer that
    was superseded, to stop): blindly re-committing the same payload at
    the next version would re-lose the other writer's update at the
    payload level even though the log itself stayed consistent."""


class LocalFS:
    """POSIX backend of the minimal state-filesystem contract.

    The contract is six operations, chosen so an S3/GCS client maps
    1:1 (PUT / conditional PUT / GET / LIST / DELETE / HEAD+LIST for
    sizes).  There is
    deliberately NO rename/move operation: the commit protocol above
    never needs one, and omitting it from the interface makes a
    rename-dependence regression a type error, not a latent bug."""

    def write_bytes(self, path: str, data: bytes) -> None:
        """PUT an object.  May tear on crash — callers must make torn
        objects self-invalidating (ManifestLog does, via checksum)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def write_bytes_if_absent(self, path: str, data: bytes) -> None:
        """Conditional PUT: write iff no object exists at ``path``,
        else raise PutConflict — the write-fencing primitive.  Locally
        this is ``O_EXCL``; on S3 it is ``If-None-Match: *``, on GCS a
        generation-0 precondition — every target substrate offers it,
        and it is the ONLY extra capability fencing needs.  May still
        tear on crash (the object then EXISTS, torn, and claims its
        name — callers allocate a fresh name on retry, which ManifestLog
        already does for torn versions)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            f = open(path, "xb")
        except FileExistsError:
            raise PutConflict(path) from None
        with f:
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
    make non-atomic reads of).  The version PUT is CONDITIONAL
    (``write_bytes_if_absent``), so a concurrent writer racing for the
    same version gets a loud ManifestConflict instead of silently
    shadowing the other's commit.  Old valid manifests are retained as
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

    def recent(self, k: int) -> list[tuple[int, dict]]:
        """Up to ``k`` newest VALID (version, payload) pairs, newest
        first — the reader-snapshot window retention-lagged GC keys off
        (data referenced by any of these manifests must stay on disk)."""
        out: list[tuple[int, dict]] = []
        for v in reversed(self._versions()):
            payload = self._load(v)
            if payload is not None:
                out.append((v, payload))
                if len(out) == k:
                    break
        return out

    def commit(self, payload: dict) -> int:
        """Publish a new state version.  The write is a single
        CONDITIONAL PUT of a self-validating object; there is no window
        in which a reader can observe a half-applied transition (it
        either validates or is skipped).

        WRITE FENCING (round-8 verdict #1): the version number is
        claimed with ``write_bytes_if_absent``, so two writers that
        both computed ``max(existing)+1`` — the zombie-driver window
        the reference closed with its Redis NX/EX lock (rcache.py:
        36-54, T5) — produce ONE committed manifest and ONE
        ManifestConflict, never a silent last-writer-wins overwrite.
        The conflict is raised, not retried: the loser's payload was
        derived from a stale head, so the only sound continuation is
        to re-read state and recompute (see ManifestConflict).  A
        retry after the SAME writer's own torn write never conflicts:
        the torn object keeps its version number and the retry
        allocates the next one."""
        versions = self._versions()
        v = (versions[-1] if versions else 0) + 1
        body = json.dumps(payload, sort_keys=True)
        doc = {
            "payload": payload,
            "sha256": hashlib.sha256(body.encode("utf-8")).hexdigest(),
        }
        try:
            self.fs.write_bytes_if_absent(
                self._path(v), json.dumps(doc).encode("utf-8")
            )
        except PutConflict:
            raise ManifestConflict(
                f"manifest version {v} at {self.dir} was claimed by a "
                f"concurrent writer; re-read head() and recompute"
            ) from None
        # retention: prune far-behind versions, best-effort, AFTER the
        # new head is durable (a crash here leaves extra history only)
        for old in versions[: max(0, len(versions) + 1 - self.keep)]:
            self.fs.delete(self._path(old))
        return v
