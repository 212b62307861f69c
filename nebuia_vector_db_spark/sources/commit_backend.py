"""Commit backends for the SnapshotTable transaction log.

The snapshot protocol (sources/snapshot.py) needs exactly one
primitive from storage: an ATOMIC "create this log object iff it does
not exist" (the compare-and-swap that serializes writers). Everything
else — reads, listings, checkpoint pointers — is plain object I/O.
This module isolates that surface behind :class:`CommitBackend` so the
log can sit on:

- a POSIX filesystem (:class:`LocalFSCommitBackend`, the default):
  publish is write-temp + fsync + ``os.link`` — the *link* is the CAS
  (fails with EEXIST if the version landed) and, unlike the previous
  ``open(target, 'x')`` protocol, the version file APPEARS fully
  written or not at all: a reader can never observe a truncated
  snapshot, and a writer crash leaves only an orphan temp file that
  can never be mistaken for a committed version;
- an object store with conditional PUT (S3 ``If-None-Match: *``, GCS
  ``x-goods-if-generation-match: 0``, ADLS ETag create) — modeled
  faithfully by :class:`InMemoryCommitBackend`, which implements the
  same try-put-wins-once semantics under a lock and is what the
  racing-writers protocol test runs against;
- HDFS via ``FileSystem.create(path, overwrite=false)`` (an adapter
  would wrap the JVM call; same three methods).

The DATA plane (parquet files) is not the backend's business: data
files are immutable and written before the snapshot referencing them
exists, so they need no atomicity from storage.
"""

from __future__ import annotations

import os
import threading
import uuid


class CommitBackend:
    """Storage adapter for the snapshot log. All paths are version
    numbers or well-known names; payloads are opaque strings/bytes."""

    # ---- the CAS ----------------------------------------------------
    def try_commit(self, version: int, payload: str) -> bool:
        """Atomically publish ``payload`` as snapshot ``version``.
        Returns False (changing nothing) if that version already
        exists — the lost-race signal. The published object must be
        complete: readers may fetch it the instant this returns."""
        raise NotImplementedError

    # ---- reads ------------------------------------------------------
    def read_version(self, version: int) -> str:
        """Raises FileNotFoundError if absent."""
        raise NotImplementedError

    def version_exists(self, version: int) -> bool:
        raise NotImplementedError

    def list_versions(self) -> list[int]:
        """All committed versions, ascending (full listing — the slow
        path; hot readers resolve via the checkpoint pointer)."""
        raise NotImplementedError

    def delete_version(self, version: int) -> None:
        raise NotImplementedError

    # ---- checkpoints -------------------------------------------------
    def write_checkpoint(self, version: int, data: bytes) -> None:
        raise NotImplementedError

    def read_checkpoint(self, version: int) -> bytes:
        raise NotImplementedError

    def checkpoint_exists(self, version: int) -> bool:
        raise NotImplementedError

    def list_checkpoints(self) -> list[int]:
        raise NotImplementedError

    def delete_checkpoint(self, version: int) -> None:
        raise NotImplementedError

    def write_pointer(self, payload: str) -> None:
        """Atomically overwrite the ``_last_checkpoint`` pointer.
        Last-writer-wins is safe: the pointer is a HINT (any committed
        checkpoint ≤ current works); correctness never depends on it."""
        raise NotImplementedError

    def read_pointer(self) -> str | None:
        raise NotImplementedError


def _vname(version: int) -> str:
    return f"v{version:08d}.json"


def _ckpt_name(version: int) -> str:
    return f"ckpt-v{version:08d}.parquet"


class LocalFSCommitBackend(CommitBackend):
    """POSIX log directory. The CAS is ``os.link(tmp, target)``:
    hard-linking an already-fsynced temp file either creates the
    target with its full content in one atomic metadata operation or
    fails with EEXIST — no window where a partial version file is
    visible (the defect the previous ``open(target, 'x')`` + write
    protocol had)."""

    POINTER = "_last_checkpoint"

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def _ensure(self) -> None:
        os.makedirs(self.log_dir, exist_ok=True)

    def _fsync_dir(self) -> None:
        try:
            fd = os.open(self.log_dir, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        except OSError:
            pass  # durability best-effort on exotic filesystems

    def try_commit(self, version: int, payload: str) -> bool:
        self._ensure()
        target = os.path.join(self.log_dir, _vname(version))
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)  # the atomic publish + CAS
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        self._fsync_dir()
        return True

    def read_version(self, version: int) -> str:
        with open(os.path.join(self.log_dir, _vname(version))) as f:
            return f.read()

    def version_exists(self, version: int) -> bool:
        return os.path.exists(os.path.join(self.log_dir, _vname(version)))

    def list_versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def delete_version(self, version: int) -> None:
        os.remove(os.path.join(self.log_dir, _vname(version)))

    def write_checkpoint(self, version: int, data: bytes) -> None:
        self._ensure()
        target = os.path.join(self.log_dir, _ckpt_name(version))
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            pass  # same immutable content; first writer won
        finally:
            os.unlink(tmp)

    def read_checkpoint(self, version: int) -> bytes:
        with open(os.path.join(self.log_dir, _ckpt_name(version)), "rb") as f:
            return f.read()

    def checkpoint_exists(self, version: int) -> bool:
        return os.path.exists(os.path.join(self.log_dir, _ckpt_name(version)))

    def list_checkpoints(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("ckpt-v") and name.endswith(".parquet"):
                try:
                    out.append(int(name[6:-8]))
                except ValueError:
                    pass
        return sorted(out)

    def delete_checkpoint(self, version: int) -> None:
        os.remove(os.path.join(self.log_dir, _ckpt_name(version)))

    def write_pointer(self, payload: str) -> None:
        self._ensure()
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.log_dir, self.POINTER))

    def read_pointer(self) -> str | None:
        try:
            with open(os.path.join(self.log_dir, self.POINTER)) as f:
                return f.read()
        except FileNotFoundError:
            return None


class InMemoryCommitBackend(CommitBackend):
    """Conditional-PUT object-store fake (S3 ``If-None-Match`` /
    GCS generation-0 semantics): ``try_commit`` atomically succeeds
    for exactly one caller per version. Used by the protocol tests to
    prove the commit logic is backend-agnostic — including the
    lost-race path — without a real object store. ``race_hook``, when
    set, runs inside ``try_commit`` *before* the conditional put (with
    the lock released) so tests can interleave a rival commit at the
    worst possible moment."""

    def __init__(self):
        self._lock = threading.Lock()
        self._versions: dict[int, str] = {}
        self._checkpoints: dict[int, bytes] = {}
        self._pointer: str | None = None
        self.race_hook = None
        self.put_attempts = 0

    def try_commit(self, version: int, payload: str) -> bool:
        hook = self.race_hook
        if hook is not None:
            self.race_hook = None  # fire once
            hook()
        with self._lock:
            self.put_attempts += 1
            if version in self._versions:
                return False
            self._versions[version] = payload
            return True

    def read_version(self, version: int) -> str:
        with self._lock:
            if version not in self._versions:
                raise FileNotFoundError(f"version {version}")
            return self._versions[version]

    def version_exists(self, version: int) -> bool:
        with self._lock:
            return version in self._versions

    def list_versions(self) -> list[int]:
        with self._lock:
            return sorted(self._versions)

    def delete_version(self, version: int) -> None:
        with self._lock:
            del self._versions[version]

    def write_checkpoint(self, version: int, data: bytes) -> None:
        with self._lock:
            self._checkpoints.setdefault(version, data)

    def read_checkpoint(self, version: int) -> bytes:
        with self._lock:
            if version not in self._checkpoints:
                raise FileNotFoundError(f"checkpoint {version}")
            return self._checkpoints[version]

    def checkpoint_exists(self, version: int) -> bool:
        with self._lock:
            return version in self._checkpoints

    def list_checkpoints(self) -> list[int]:
        with self._lock:
            return sorted(self._checkpoints)

    def delete_checkpoint(self, version: int) -> None:
        with self._lock:
            self._checkpoints.pop(version, None)

    def write_pointer(self, payload: str) -> None:
        with self._lock:
            self._pointer = payload

    def read_pointer(self) -> str | None:
        with self._lock:
            return self._pointer
