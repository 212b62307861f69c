"""Snapshot-log scalability + commit-backend protocol (round 4).

Covers the two storage-layer items from VERDICT r3:
- #1 checkpointed log: delta commits, parquet manifest checkpoints,
  ``_last_checkpoint`` pointer — ``current_version()``/``read()``
  touch only the checkpoint + the delta tail even after 500+ commits;
- #4 pluggable commit backend: the same optimistic-concurrency
  protocol runs against an in-memory conditional-PUT fake (the S3 /
  GCS shape), including the lost-race path.
"""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.sources.commit_backend import (
    InMemoryCommitBackend,
    LocalFSCommitBackend,
)
from nebuia_vector_db_spark.sources.snapshot import (
    CommitConflictError,
    SnapshotTable,
)


class CountingFSBackend(LocalFSCommitBackend):
    """LocalFS backend instrumented with per-operation counters so
    tests can assert how much log I/O a read actually performs."""

    def __init__(self, log_dir):
        super().__init__(log_dir)
        self.reads = 0
        self.listings = 0
        self.exist_probes = 0

    def read_version(self, version):
        self.reads += 1
        return super().read_version(version)

    def list_versions(self):
        self.listings += 1
        return super().list_versions()

    def version_exists(self, version):
        self.exist_probes += 1
        return super().version_exists(version)


def _entry(i: int) -> dict:
    return {
        "path": f"data/c{i:06d}/part-0.parquet",
        "rows": 10,
        "bytes": 1000,
        "stats": {"k": [i, i + 9]},
    }


def _schema_json(spark):
    return json.loads(
        spark.range(1).selectExpr("id k").schema.json()
    )


def test_500_commits_read_touches_only_checkpoint_plus_tail(
    spark, tmp_path
):
    """The VERDICT r3 #1 'done' criterion: after 500+ delta commits,
    version resolution does no listing and manifest reconstruction
    reads at most checkpoint_interval log entries."""
    root = str(tmp_path / "t")
    tbl = SnapshotTable(spark, root, checkpoint_interval=10)
    schema = _schema_json(spark)
    files: list[dict] = []
    parent = None
    for i in range(503):
        files = files + [_entry(i)]
        if i % 37 == 36:  # sprinkle removals so deltas carry both kinds
            files = files[1:]
        parent = tbl._commit(
            {
                "op": "create" if parent is None else "append",
                "schema": schema,
                "files": list(files),
                "n_files": len(files),
                "n_rows": 10 * len(files),
            },
            expected_parent=parent,
        )
    assert parent == 503

    # a FRESH handle (cold cache) resolves + reconstructs cheaply
    counting = CountingFSBackend(str(tmp_path / "t" / "_snapshots"))
    cold = SnapshotTable(spark, root, backend=counting)
    assert cold.current_version() == 503
    assert counting.listings == 0, "pointer probe must replace listing"
    snap = cold._snapshot()
    assert len(snap["files"]) == len(files)
    assert [f["path"] for f in snap["files"]] == [
        f["path"] for f in files
    ]
    # tail above the v500 checkpoint is 3 commits; +1 for the target's
    # own metadata read
    assert counting.reads <= 10 + 2, f"too many log reads: {counting.reads}"
    assert counting.exist_probes <= 10, "probe window must stay bounded"

    # a mid-history version also reconstructs (checkpoint below + tail)
    counting2 = CountingFSBackend(str(tmp_path / "t" / "_snapshots"))
    cold2 = SnapshotTable(spark, root, backend=counting2)
    old = cold2._snapshot(455)
    assert old["version"] == 455
    assert counting2.reads <= 10 + 2


def test_delta_payloads_are_small_and_reconstruct(spark, tmp_path):
    """On-disk commits after create carry add/remove, not the full
    manifest; reads still see the complete file list."""
    df = spark.range(0, 100).selectExpr("id k")
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df, checkpoint_interval=5
    )
    for i in range(6):
        tbl.append(spark.range(100 * (i + 1), 100 * (i + 2)).selectExpr("id k"))
    raw_v3 = json.loads(tbl.backend.read_version(3))
    assert "files" not in raw_v3, "append commits must be deltas"
    assert raw_v3["add"], "delta must list the new files"
    assert tbl.backend.checkpoint_exists(5), "interval checkpoint missing"
    assert tbl.read().count() == 700
    assert tbl.read(version=3).count() == 300  # time travel via replay
    # delete produces remove entries in the delta
    tbl.delete_where("k < 100")
    raw_v8 = json.loads(tbl.backend.read_version(8))
    assert raw_v8.get("remove"), "COW delete must record removed paths"
    assert tbl.read().count() == 600


def test_vacuum_checkpoints_oldest_retained(spark, tmp_path):
    """Vacuum must leave every retained version reconstructible even
    though the delta commits below them are gone."""
    df = spark.range(0, 50).selectExpr("id k")
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df, checkpoint_interval=100
    )  # interval high: NO periodic checkpoint before vacuum
    for i in range(7):
        tbl.append(spark.range(50 * (i + 1), 50 * (i + 2)).selectExpr("id k"))
    res = tbl.vacuum(keep_last=3)
    assert res["removed_snapshots"] == 5
    assert tbl.versions() == [6, 7, 8]
    assert tbl.backend.checkpoint_exists(6), "oldest retained needs a base"
    for v, n in [(6, 300), (7, 350), (8, 400)]:
        assert tbl.read(version=v).count() == n
    assert tbl.current_version() == 8
    # a later append + vacuum cycle keeps working
    tbl.append(spark.range(400, 450).selectExpr("id k"))
    assert tbl.read().count() == 450


def test_inmemory_backend_full_stack(spark, tmp_path):
    """The whole table protocol (create/append/delete/read/meta) over
    the conditional-PUT fake — proves no code path secretly assumes a
    POSIX log directory."""
    be = InMemoryCommitBackend()
    df = spark.range(0, 200).selectExpr("id k", "id % 4 bucket")
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df, backend=be,
        extra_meta={"stream_watermarks": {"a": 1}},
    )
    tbl.append(spark.range(200, 300).selectExpr("id k", "id % 4 bucket"))
    tbl.delete_where("bucket = 3")
    got = tbl.read()
    assert got.count() == 225
    assert got.where(F.col("bucket") == 3).count() == 0
    assert tbl.meta("stream_watermarks") == {"a": 1}
    assert tbl.read(version=1).count() == 200  # time travel
    assert be.list_versions() == [1, 2, 3]


def test_inmemory_conditional_put_single_winner():
    be = InMemoryCommitBackend()
    wins = []

    def _try(tag):
        if be.try_commit(7, tag):
            wins.append(tag)

    ts = [threading.Thread(target=_try, args=(f"w{i}",)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    assert be.read_version(7) == wins[0]
    assert be.put_attempts == 8


def test_lost_race_retries_through_fake_backend(spark, tmp_path):
    """The worst-case interleaving: a rival lands the version AFTER we
    read the parent but BEFORE our conditional PUT. The loser must see
    CommitConflictError and with_retry must converge with both
    writers' rows present."""
    be = InMemoryCommitBackend()
    base = spark.range(0, 10).selectExpr("id k")
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base, backend=be)

    rival_rows = spark.range(1000, 1010).selectExpr("id k")

    def _rival():
        # same backend, separate handle — commits v2 first
        rv = SnapshotTable(spark, str(tmp_path / "t"), backend=be)
        rv.append(rival_rows)

    be.race_hook = _rival  # fires inside OUR try_commit, pre-PUT
    with pytest.raises(CommitConflictError):
        tbl.append(spark.range(2000, 2010).selectExpr("id k"))
    # the optimistic retry path recovers on the new parent
    tbl.with_retry("append", spark.range(2000, 2010).selectExpr("id k"))
    got = tbl.read()
    assert got.count() == 30
    assert got.where(F.col("k") >= 1000).where(F.col("k") < 1010).count() == 10
    assert got.where(F.col("k") >= 2000).count() == 10


def test_localfs_commit_leaves_no_temp_or_partial(tmp_path):
    be = LocalFSCommitBackend(str(tmp_path / "log"))
    assert be.try_commit(1, '{"op": "create"}')
    assert not be.try_commit(1, '{"op": "rival"}')  # lost race
    import os

    names = os.listdir(str(tmp_path / "log"))
    assert names == ["v00000001.json"], names
    assert be.read_version(1) == '{"op": "create"}'


def test_append_expected_parent_detects_interleaved_commit(
    spark, tmp_path
):
    """The streaming-sink TOCTOU fix: an append pinned to a parent
    snapshot fails if any commit interleaved, so watermark metadata
    can never be derived from a snapshot other than the CAS parent."""
    df = spark.range(0, 20).selectExpr("id k")
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df,
        extra_meta={"stream_watermarks": {"a": 1}},
    )
    parent = tbl.current_version()
    # rival app advances its own lane
    tbl.append(
        df.limit(1),
        extra_meta={"stream_watermarks": {"a": 1, "b": 7}},
    )
    with pytest.raises(CommitConflictError):
        tbl.append(
            df.limit(1),
            extra_meta={"stream_watermarks": {"a": 2}},
            expected_parent=parent,
        )
    # the rival's watermark survived (no wholesale overwrite)
    assert tbl.meta("stream_watermarks") == {"a": 1, "b": 7}


# ---------------------------------------------------------------------------
# ObjectStoreCommitBackend (round 6, VERDICT r5 task #5)
# ---------------------------------------------------------------------------
import io

from nebuia_vector_db_spark.sources.commit_backend import (
    ObjectStoreCommitBackend,
)


class FakeClientError(Exception):
    """botocore.ClientError-shaped error (duck-typed: .response)."""

    def __init__(self, status: int, code: str):
        super().__init__(code)
        self.response = {
            "ResponseMetadata": {"HTTPStatusCode": status},
            "Error": {"Code": code},
        }


class FakeS3Client:
    """boto3-shaped in-memory S3: conditional writes (`IfNoneMatch`)
    with exactly-one-winner semantics under a lock, STRONG point reads
    (get/head), a LIST view that can LAG writes by ``list_lag``
    commits (the S3-compatible/GCS behavior the protocol must
    tolerate), paginated list_objects_v2 (MaxKeys=2, so pagination is
    always exercised), and optional injected 409
    ConditionalRequestConflict responses."""

    def __init__(self, list_lag: int = 0, conflict_409s: int = 0):
        self._lock = threading.Lock()
        self._objects: dict[str, bytes] = {}
        self._put_seq: dict[str, int] = {}
        self._seq = 0
        self.list_lag = list_lag
        self.conflict_409s = conflict_409s
        self.race_hook = None
        self.put_attempts = 0

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch is not None:
            hook = self.race_hook
            if hook is not None:
                self.race_hook = None  # fire once, pre-PUT
                hook()
            if self.conflict_409s > 0:
                self.conflict_409s -= 1
                raise FakeClientError(409, "ConditionalRequestConflict")
        with self._lock:
            if IfNoneMatch is not None:
                self.put_attempts += 1
                if Key in self._objects:
                    raise FakeClientError(412, "PreconditionFailed")
            self._seq += 1
            self._objects[Key] = bytes(Body)
            self._put_seq[Key] = self._seq
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket, Key):
        with self._lock:
            if Key not in self._objects:
                raise FakeClientError(404, "NoSuchKey")
            return {"Body": io.BytesIO(self._objects[Key])}

    def head_object(self, Bucket, Key):
        with self._lock:
            if Key not in self._objects:
                raise FakeClientError(404, "NotFound")
            return {"ContentLength": len(self._objects[Key])}

    def delete_object(self, Bucket, Key):
        with self._lock:
            self._objects.pop(Key, None)
            self._put_seq.pop(Key, None)
        return {}

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        with self._lock:
            horizon = self._seq - self.list_lag
            keys = sorted(
                k
                for k, s in self._put_seq.items()
                if k.startswith(Prefix) and s <= horizon
            )
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + 2]  # MaxKeys=2: force pagination
        out = {"Contents": [{"Key": k} for k in page]}
        if start + 2 < len(keys):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = str(start + 2)
        else:
            out["IsTruncated"] = False
        return out


def _objectstore_backend(tmp_path, **kw):
    return ObjectStoreCommitBackend(
        FakeS3Client(**kw), bucket="b", prefix="tables/t/_snapshots",
        sleep=lambda _s: None,
    )


class _HookableFSBackend(LocalFSCommitBackend):
    """LocalFS with the InMemory backend's race_hook so the racing-
    writers interleaving can be driven identically on all backends."""

    race_hook = None

    def try_commit(self, version, payload):
        hook = self.race_hook
        if hook is not None:
            self.race_hook = None
            hook()
        return super().try_commit(version, payload)


def _set_race_hook(backend, hook):
    if isinstance(backend, ObjectStoreCommitBackend):
        backend.client.race_hook = hook
    else:
        backend.race_hook = hook


@pytest.mark.parametrize(
    "make_backend",
    [
        lambda p: _HookableFSBackend(str(p / "log")),
        lambda p: InMemoryCommitBackend(),
        lambda p: _objectstore_backend(p),
    ],
    ids=["localfs", "inmemory", "objectstore"],
)
def test_racing_writers_protocol_all_backends(spark, tmp_path, make_backend):
    """The worst-case interleaving (rival lands the version AFTER we
    read the parent, BEFORE our conditional PUT) on every backend:
    POSIX link-CAS, conditional-PUT fake, and the S3-shaped adapter.
    The loser sees CommitConflictError; with_retry converges with both
    writers' rows present; no version is lost or duplicated."""
    be = make_backend(tmp_path)
    base = spark.range(0, 10).selectExpr("id k")
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base, backend=be)

    rival_rows = spark.range(1000, 1010).selectExpr("id k")

    def _rival():
        rv = SnapshotTable(spark, str(tmp_path / "t"), backend=be)
        rv.append(rival_rows)

    _set_race_hook(be, _rival)
    with pytest.raises(CommitConflictError):
        tbl.append(spark.range(2000, 2010).selectExpr("id k"))
    tbl.with_retry("append", spark.range(2000, 2010).selectExpr("id k"))
    got = tbl.read()
    assert got.count() == 30
    assert got.where((F.col("k") >= 1000) & (F.col("k") < 1010)).count() == 10
    assert got.where(F.col("k") >= 2000).count() == 10
    assert be.list_versions() == [1, 2, 3]


def test_objectstore_conditional_put_single_winner():
    be = _objectstore_backend(__import__("pathlib").Path("/tmp"))
    wins = []

    def _try(tag):
        if be.try_commit(7, tag):
            wins.append(tag)

    ts = [threading.Thread(target=_try, args=(f"w{i}",)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    assert be.read_version(7) == wins[0]
    assert be.client.put_attempts == 8


def test_objectstore_409_conflict_retries_then_wins(tmp_path):
    """409 ConditionalRequestConflict (a rival conditional write in
    flight) is retried; when the rival aborts, the retry wins."""
    be = _objectstore_backend(tmp_path, conflict_409s=2)
    assert be.try_commit(1, "payload") is True
    assert be.read_version(1) == "payload"


def test_objectstore_409_budget_exhausted_returns_false(tmp_path):
    """A 409 storm past the retry budget returns False (lost race);
    the outer optimistic retry re-resolves the head with point reads,
    so liveness is the caller's loop, safety is never at risk."""
    be = _objectstore_backend(tmp_path, conflict_409s=10**9)
    be.conflict_retries = 3
    assert be.try_commit(1, "payload") is False
    assert not be.version_exists(1)


def test_objectstore_full_stack_with_lagging_list(spark, tmp_path):
    """The whole table protocol over the S3-shaped adapter whose LIST
    lags writes by 2 commits: version resolution must come from the
    pointer + point-read probe (and probe PAST a stale listing), so
    reads always see the latest committed snapshot."""
    be = _objectstore_backend(tmp_path, list_lag=2)
    df = spark.range(0, 200).selectExpr("id k", "id % 4 bucket")
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), df, backend=be)
    tbl.append(spark.range(200, 300).selectExpr("id k", "id % 4 bucket"))
    tbl.delete_where("bucket = 3")
    assert tbl.current_version() == 3  # NOT the lagging listing's head
    got = tbl.read()
    assert got.count() == 225
    assert got.where(F.col("bucket") == 3).count() == 0
    assert tbl.read(version=1).count() == 200  # time travel
    # the strong view catches up once the lag horizon passes
    be.client.list_lag = 0
    assert be.list_versions() == [1, 2, 3]  # paginated (MaxKeys=2) list


class ReplayingS3Client(FakeS3Client):
    """Models boto3's transport-level retry: the FIRST conditional PUT
    to each key LANDS server-side but the response is 'lost', so the
    client's internal retry layer replays the PUT — which now 412s
    against the caller's OWN object. The backend must not report a
    lost race for a commit that actually succeeded."""

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch is not None and Key not in self._objects:
            super().put_object(Bucket, Key, Body)  # first attempt lands
            # ...response lost; internal retry replays conditionally:
        return super().put_object(Bucket, Key, Body, IfNoneMatch=IfNoneMatch)


def test_objectstore_412_from_own_replayed_put_is_a_win(tmp_path):
    """ADVICE r6: on 412, read back and compare — identical body means
    the PUT that 412'd was our own transport-retried write, so the
    commit SUCCEEDED; returning False would make the snapshot layer's
    optimistic retry duplicate the append on top of its own commit."""
    from nebuia_vector_db_spark.sources.commit_backend import (
        ObjectStoreCommitBackend,
    )

    be = ObjectStoreCommitBackend(
        ReplayingS3Client(), bucket="b", prefix="t/_snapshots",
        sleep=lambda _s: None,
    )
    assert be.try_commit(1, '{"writer": "me"}') is True
    assert be.read_version(1) == '{"writer": "me"}'
    # a GENUINE rival object still reads as a lost race
    assert be.try_commit(1, '{"writer": "rival"}') is False
    assert be.read_version(1) == '{"writer": "me"}'


def test_objectstore_write_checkpoint_raises_when_dropped(tmp_path):
    """ADVICE r6: write_checkpoint must not swallow a False that left
    NO object behind — vacuum deletes the delta chain below the
    checkpoint it believes it just wrote, so a silently dropped
    checkpoint makes that version unreconstructible."""
    be = _objectstore_backend(tmp_path, conflict_409s=10**9)
    be.conflict_retries = 2
    with pytest.raises(RuntimeError, match="checkpoint v5"):
        be.write_checkpoint(5, b"manifest-bytes")
    # ...but a rival's already-landed checkpoint IS a benign no-op,
    # even when our own conditional put cannot get through
    be.client.conflict_409s = 0
    be.write_checkpoint(6, b"rival-manifest")
    be.client.conflict_409s = 10**9
    be.write_checkpoint(6, b"other-bytes-same-version")  # no raise
    assert be.read_checkpoint(6) == b"rival-manifest"


class VersionListLagS3Client(FakeS3Client):
    """LIST staleness is per-prefix in real stores (listing shards are
    keyed by prefix): model a version listing that lags to EMPTY while
    the checkpoint listing stays fresh. Point reads remain strong."""

    lag_versions = False  # flipped on post-vacuum by the test

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        if self.lag_versions and Prefix.rsplit("/", 1)[-1] == "v":
            return {"Contents": [], "IsTruncated": False}
        return super().list_objects_v2(Bucket, Prefix, ContinuationToken)


def test_current_version_after_vacuum_with_stale_pointer_and_empty_list(
    spark, tmp_path
):
    """ADVICE r6: after vacuum the log starts at the oldest retained
    checkpoint, not v1 — a missing pointer plus a lagging (empty)
    version listing must re-seed the head probe from the surviving
    checkpoints instead of raising 'no snapshots'."""
    be = ObjectStoreCommitBackend(
        VersionListLagS3Client(), bucket="b",
        prefix="tables/t/_snapshots", sleep=lambda _s: None,
    )
    df = spark.range(0, 40).selectExpr("id k", "id % 4 bucket")
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df, backend=be, checkpoint_interval=2
    )
    for lo in range(40, 100, 20):
        tbl.append(
            spark.range(lo, lo + 20).selectExpr("id k", "id % 4 bucket")
        )
    head = tbl.current_version()
    tbl.vacuum(keep_last=2)
    # stale/missing pointer + a version listing lagged to empty
    be.client.lag_versions = True
    be.client.delete_object(
        Bucket="b", Key=be._key("_last_checkpoint")
    )
    assert be.read_pointer() is None  # the fallback path is live
    assert be.list_versions() == []  # ...and the listing really lags
    assert be.list_checkpoints() != []  # ...but checkpoints survive
    tbl._cache.clear()
    assert tbl.current_version() == head
    assert tbl.read().count() == 100


def test_bench_driver_memory_sizing_helpers():
    """Round 7 (VERDICT r6 #2): bench.py must size its driver JVM to
    the box and parse memory specs robustly — the 8g default OOM'd
    the 38.4M-row sweep point and cost round 6 its entire bench
    artifact."""
    import bench

    assert bench._parse_mem_gb("8g") == 8.0
    assert bench._parse_mem_gb("64G") == 64.0
    assert bench._parse_mem_gb("8192m") == 8.0
    assert bench._parse_mem_gb("1048576k") == 1.0
    assert bench._parse_mem_gb("1t") == 1024.0
    assert bench._parse_mem_gb("junk") == 8.0
    gb = bench._default_driver_memory_gb()
    assert 8 <= gb <= 64


def test_bench_gate_line_sheds_queries_never_crashes():
    """Round 9 (VERDICT r8 #7 + ADVICE): gate_line must keep its
    <1,000-char stdout-tail contract by dropping query entries, not by
    assert-crashing a completed bench run (the assert was stripped
    under -O and, when it fired, left the 7,800-char full-payload line
    as the stdout tail). Also: a zero b2 denominator emits an explicit
    null ratio instead of silently omitting the key."""
    import json

    import bench

    # 200 metrics, every one matching the recorded-query prefix sets
    timings = {k: 1.2345678 for k in bench.GATE_QUERY_KEYS}
    timings.update({f"b99_extra_metric_{i}_sec": 0.123 for i in range(200)})
    timings["b2_spark_batched_per_query"] = 0.01
    timings["b2_numpy_loop_per_query"] = 0.0  # very fast machine
    line = bench.gate_line(timings, total=9.9, sf=0.1, cpus=32)
    assert len(line) < 1000
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["gates"]["b2_ratio"] is None  # explicit, not omitted
    assert parsed["n_metrics"] == len(timings)

    # normal machine: ratio computed
    timings["b2_numpy_loop_per_query"] = 0.32
    parsed = json.loads(bench.gate_line(timings, 9.9, 0.1, 32))
    assert parsed["gates"]["b2_ratio"] == round(0.01 / 0.32, 4)


def test_bench_gate_line_sheds_gates_after_queries():
    """ADVICE r9: GATE_RATIO_KEYS grows every round, so the <1,000-char
    stdout-tail budget must hold even once every query entry is shed —
    the loop now sheds gate entries too, keeping b2_ratio (inserted
    first) as the last gate standing."""
    import json

    import bench

    timings = {k: 1.2345678 for k in bench.GATE_QUERY_KEYS}
    timings["b2_spark_batched_per_query"] = 0.01
    timings["b2_numpy_loop_per_query"] = 0.32
    # simulate many rounds of gate growth: swell the gate dict itself
    for k in list(bench.GATE_RATIO_KEYS):
        timings[k] = 1.0
    extra = tuple(f"b{90 + i}_future_round_gate_ratio_{i}" for i in range(60))
    old = bench.GATE_RATIO_KEYS
    bench.GATE_RATIO_KEYS = old + extra
    try:
        for k in extra:
            timings[k] = 0.123456
        line = bench.gate_line(timings, total=9.9, sf=0.1, cpus=32)
    finally:
        bench.GATE_RATIO_KEYS = old
    assert len(line) < 1000
    parsed = json.loads(line)
    # headline gate survives every shed round
    assert parsed["gates"]["b2_ratio"] == round(0.01 / 0.32, 4)


def test_posix_scratch_dir_rejects_object_store_roots(spark, monkeypatch):
    """ADVICE r9: SnapshotTable's commit backend is POSIX fsync+link;
    with NVDB_SCRATCH_DIR pointing at hdfs://s3:// the snapshot
    queries must fail fast at path resolution with an actionable
    message, not deep inside a commit — and NVDB_POSIX_SCRATCH_DIR
    routes snapshot roots to a POSIX mount independently."""
    import pytest

    from nebuia_vector_db_spark.session import posix_scratch_dir

    monkeypatch.setenv("NVDB_SCRATCH_DIR", "s3://bucket/scratch")
    with pytest.raises(ValueError, match="POSIX"):
        posix_scratch_dir(spark, "snap")
    monkeypatch.setenv("NVDB_POSIX_SCRATCH_DIR", "/mnt/shared_nfs")
    p = posix_scratch_dir(spark, "snap")
    assert p.startswith("/mnt/shared_nfs/_scratch/snap_")
    monkeypatch.delenv("NVDB_SCRATCH_DIR")
    monkeypatch.delenv("NVDB_POSIX_SCRATCH_DIR")
    assert posix_scratch_dir(spark, "snap").startswith("/")


def test_bench_compare_skips_derived_throughput_rows():
    """VERDICT r9 task #5: *_per_sec / *_fps rows are the inverse of a
    timed sibling — flagging both double-reports one mover. Only the
    _sec row flags; pinned counts still hard-flag."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import bench_compare as bc

    d = bc.diff(
        {"a_sec": 2.0, "a_frames_per_sec": 50.0, "a_frames_total": 100},
        {"a_sec": 1.0, "a_frames_per_sec": 100.0, "a_frames_total": 100},
    )
    assert "a_sec" in d["timed_moved"]
    assert "a_frames_per_sec" not in d["timed_moved"]
    d2 = bc.diff({"n_total": 4}, {"n_total": 5})
    assert d2["pinned_moved"] == {"n_total": [5, 4]}
