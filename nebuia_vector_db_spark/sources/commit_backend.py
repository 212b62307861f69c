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


def _http_status(exc: Exception) -> int | None:
    """Duck-typed botocore ClientError status extraction — the adapter
    must not import boto3 (the client is INJECTED), so error shape is
    probed structurally: ``exc.response["ResponseMetadata"]
    ["HTTPStatusCode"]`` and ``exc.response["Error"]["Code"]``."""
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return None
    meta = resp.get("ResponseMetadata") or {}
    code = meta.get("HTTPStatusCode")
    if isinstance(code, int):
        return code
    err = (resp.get("Error") or {}).get("Code")
    if err in ("PreconditionFailed", "412"):
        return 412
    if err in ("ConditionalRequestConflict", "OperationAborted", "409"):
        return 409
    if err in ("NoSuchKey", "NotFound", "404"):
        return 404
    return None


class ObjectStoreCommitBackend(CommitBackend):
    """S3-shaped object-store log (round 6, VERDICT r5 task #5).

    The client is INJECTED and boto3-shaped — any object with
    ``put_object / get_object / head_object / list_objects_v2 /
    delete_object`` accepting the standard kwargs works (a real
    ``boto3.client("s3")``, an S3-compatible store's SDK, or a test
    fake). No AWS SDK import happens here; errors are recognized
    structurally (see :func:`_http_status`), so the module stays
    importable in this container.

    The CAS is S3 conditional write: ``PutObject`` with
    ``IfNoneMatch="*"`` (generally available on S3 since 2024; the
    same header works on GCS's XML API and most S3-compatibles).
    Outcomes:

    - 2xx → we won the race;
    - 412 PreconditionFailed → the version exists: lost race, False;
    - 409 ConditionalRequestConflict → a RIVAL conditional write to
      the same key is in flight; retried a bounded number of times
      (the rival either lands → our retry sees 412 → False, or aborts
      → our retry wins). After the retry budget, False is returned —
      safe either way: the caller's optimistic-retry loop re-resolves
      the head version with read-after-write point reads
      (``version_exists``), so a spurious False only costs one extra
      round trip, never a lost or duplicated commit.

    LIST staleness: S3 proper is strongly consistent, but many
    S3-compatibles (and GCS's list) lag writes. The snapshot protocol
    only uses listings to SEED the head probe (SnapshotTable.
    current_version probes forward with point reads past both the
    checkpoint pointer and any listing), so a lagging
    ``list_objects_v2`` affects nothing but audit/vacuum breadth —
    pinned by the lagging-list fake in tests/test_snapshot_log.py.
    """

    def __init__(
        self,
        client,
        bucket: str,
        prefix: str = "",
        conflict_retries: int = 8,
        sleep=None,
    ):
        self.client = client
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.conflict_retries = conflict_retries
        import time as _time

        self._sleep = sleep if sleep is not None else _time.sleep

    def _key(self, name: str) -> str:
        return f"{self.prefix}/{name}" if self.prefix else name

    # ---- the CAS ----------------------------------------------------
    def _conditional_put(self, key: str, body: bytes) -> bool:
        for attempt in range(self.conflict_retries + 1):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=key,
                    Body=body,
                    IfNoneMatch="*",
                )
                return True
            except Exception as e:  # noqa: BLE001 — shape-probed below
                status = _http_status(e)
                if status == 412:
                    # An object exists — but it may be OURS: transport-
                    # level retries (boto3 "standard" mode replays PUTs
                    # on connection loss / 5xx) can re-send a PUT whose
                    # first attempt landed, and the replay 412s against
                    # our own object. Payloads are writer-distinguishing
                    # (commit manifests embed uuid4 data-file paths), so
                    # read back and compare: identical body → we won.
                    # Without this, a False here would send the snapshot
                    # layer's optimistic retry to re-append the same
                    # rows on top of our own commit (duplicated data).
                    try:
                        return self._get(key) == body
                    except FileNotFoundError:
                        # landed object vanished between PUT and GET
                        # (concurrent vacuum); treat as lost
                        return False
                if status == 409 and attempt < self.conflict_retries:
                    self._sleep(min(0.05 * (2**attempt), 1.0))
                    continue
                if status == 409:
                    return False  # budget exhausted; caller re-resolves
                raise
        return False  # unreachable; loop always returns

    def try_commit(self, version: int, payload: str) -> bool:
        return self._conditional_put(
            self._key(_vname(version)), payload.encode("utf-8")
        )

    # ---- reads ------------------------------------------------------
    def _get(self, key: str) -> bytes:
        try:
            obj = self.client.get_object(Bucket=self.bucket, Key=key)
        except Exception as e:  # noqa: BLE001
            if _http_status(e) == 404:
                raise FileNotFoundError(key) from e
            raise
        body = obj["Body"]
        return body.read() if hasattr(body, "read") else bytes(body)

    def _exists(self, key: str) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket, Key=key)
            return True
        except Exception as e:  # noqa: BLE001
            if _http_status(e) == 404:
                return False
            raise

    def _list(self, name_prefix: str) -> list[str]:
        keys: list[str] = []
        token = None
        prefix = self._key(name_prefix)
        while True:
            kw = {"Bucket": self.bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            page = self.client.list_objects_v2(**kw)
            for item in page.get("Contents") or []:
                keys.append(item["Key"].rsplit("/", 1)[-1])
            if not page.get("IsTruncated"):
                return keys
            token = page.get("NextContinuationToken")

    def read_version(self, version: int) -> str:
        return self._get(self._key(_vname(version))).decode("utf-8")

    def version_exists(self, version: int) -> bool:
        return self._exists(self._key(_vname(version)))

    def list_versions(self) -> list[int]:
        out = []
        for name in self._list("v"):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def delete_version(self, version: int) -> None:
        self.client.delete_object(
            Bucket=self.bucket, Key=self._key(_vname(version))
        )

    # ---- checkpoints -------------------------------------------------
    def write_checkpoint(self, version: int, data: bytes) -> None:
        # checkpoints are immutable + content-deterministic: first
        # writer wins, a lost conditional race is a no-op like the
        # LocalFS EEXIST path. But a False can ALSO mean the 409 retry
        # budget ran out with NO object written — and vacuum deletes
        # all snapshots below the checkpoint it just wrote, so a
        # silently dropped checkpoint would leave that version
        # unreconstructible. Verify one actually exists before
        # treating False as benign.
        key = self._key(_ckpt_name(version))
        if not self._conditional_put(key, data) and not self._exists(key):
            raise RuntimeError(
                f"checkpoint v{version} could not be written and none "
                f"exists at {key} (conditional-put retry budget "
                f"exhausted); retry before any vacuum of older versions"
            )

    def read_checkpoint(self, version: int) -> bytes:
        return self._get(self._key(_ckpt_name(version)))

    def checkpoint_exists(self, version: int) -> bool:
        return self._exists(self._key(_ckpt_name(version)))

    def list_checkpoints(self) -> list[int]:
        out = []
        for name in self._list("ckpt-v"):
            if name.startswith("ckpt-v") and name.endswith(".parquet"):
                try:
                    out.append(int(name[6:-8]))
                except ValueError:
                    pass
        return sorted(out)

    def delete_checkpoint(self, version: int) -> None:
        self.client.delete_object(
            Bucket=self.bucket, Key=self._key(_ckpt_name(version))
        )

    def write_pointer(self, payload: str) -> None:
        # last-writer-wins overwrite (the pointer is a hint): a plain
        # unconditional PUT, atomic per object
        self.client.put_object(
            Bucket=self.bucket,
            Key=self._key("_last_checkpoint"),
            Body=payload.encode("utf-8"),
        )

    def read_pointer(self) -> str | None:
        try:
            return self._get(self._key("_last_checkpoint")).decode("utf-8")
        except FileNotFoundError:
            return None
