"""Streaming change-data-capture source over SnapshotTable (round 10)
— the Delta-changeFeed seam between the transactional storage tier and
Structured Streaming: downstream consumers (index maintainers,
materialized aggregates, replicas) subscribe to the TABLE and receive
exactly the row-level deltas each commit produced, instead of
re-scanning it.

Exposed as a Spark 4 Python Data Source stream::

    spark.dataSource.register(SnapshotChangesDataSource)
    feed = (spark.readStream.format("nebuia_snapshot_changes")
            .option("path", root).option("startVersion", 0).load())

Offsets ARE commit versions — the natural total order the snapshot
log already provides, so exactly-once delivery falls out of Spark's
checkpointed offset tracking with a no-op source commit: a restarted
query resumes from the last committed version, never re-emitting or
skipping a commit (pinned by tests/test_snapshot_changes.py).

Per micro-batch, ``partitions(start, end)`` emits ONE input partition
per commit in the range, carrying just the file lists that commit
touched (from the manifest delta — the same bounded-churn property as
SnapshotTable.changes). ``read`` runs executor-side without a
SparkSession: it loads only those parquet files through pyarrow and
recovers the row-level delta with two multiset differences
(inserts = added∖removed, deletes = removed∖added — copy-on-write
rewrites carry surviving rows, so carried rows cancel). Array cells
are frozen to tuples for the multiset keys and emitted unchanged.

Schema = the table schema (from the snapshot log, no session needed)
plus ``_change`` / ``_commit_version`` — identical to the batch
``SnapshotTable.changes`` relation, and the AvailableNow run of this
source is asserted row-identical to it.

Scale note: a commit's delta is proportional to the churn it caused,
so a busy 100 TB table streams at the write rate, not the table size;
the per-commit partition fans out across executors, and a pathological
single commit that rewrote the whole table simply becomes one large
(correct) micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

CHANGE_FIELDS = [
    T.StructField("_change", T.StringType()),
    T.StructField("_commit_version", T.IntegerType()),
]


def _manifest_table(path: str):
    """SnapshotTable handle for MANIFEST-ONLY operations (versions,
    snapshots, step deltas) — none of which touch the SparkSession,
    so it is constructed with spark=None. Planning for this source
    runs inside the Python data-source worker, where no session
    exists; the actual row reads go through pyarrow."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    return SnapshotTable(None, path)


class ChangeStepPartition(InputPartition):
    def __init__(
        self,
        root: str,
        version: int,
        added: list[str],
        removed: list[str],
        fields: list[str],
    ):
        self.root = root
        self.version = version
        self.added = added
        self.removed = removed
        self.fields = fields


class SnapshotChangesDataSource(DataSource):
    """``spark.readStream.format("nebuia_snapshot_changes")`` —
    options: ``path`` (snapshot table root, required),
    ``startVersion`` (first EXCLUDED version, default 0 = from table
    creation)."""

    @classmethod
    def name(cls) -> str:
        return "nebuia_snapshot_changes"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "nebuia_snapshot_changes requires .option('path', root)"
            )
        tbl = _manifest_table(root)
        base = T.StructType.fromJson(
            tbl._snapshot(tbl.current_version())["schema"]
        )
        return T.StructType(list(base.fields) + CHANGE_FIELDS)

    def streamReader(self, schema) -> "SnapshotChangesStreamReader":
        return SnapshotChangesStreamReader(
            self.options.get("path"),
            int(self.options.get("startVersion", 0)),
            [f.name for f in schema.fields[: -len(CHANGE_FIELDS)]],
        )


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(
        self, root: str, start_version: int, fields: list[str]
    ):
        self.root = root
        self.start_version = start_version
        self.fields = fields

    # ------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": _manifest_table(self.root).current_version()}

    def partitions(self, start: dict, end: dict):
        tbl = _manifest_table(self.root)
        out = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            added, removed = tbl._step_delta(v)
            out.append(
                ChangeStepPartition(
                    tbl.path,
                    v,
                    [f["path"] for f in added],
                    [f["path"] for f in removed],
                    self.fields,
                )
            )
        return out

    def commit(self, end: dict) -> None:
        # offsets are committed snapshot versions; nothing to release
        pass

    # ----------------------------------------------------- execution
    def read(self, partition: ChangeStepPartition):
        """Row-level diff of one commit, keyed on row DIGESTS.

        Memory bound (r10 ADVICE): the diff multiset is keyed by a
        20-byte sha1 of each row's canonical repr, never the row
        itself, so a commit that rewrote many large files costs
        O(distinct rows x ~60 B) heap in this task — a 100M-row
        compaction commit is ~6 GB of counters at worst, and in the
        common case (COW delete/upsert) added and removed share most
        digests so the residual is churn-sized. Row CONTENT is never
        buffered: a second streaming pass over the same files emits
        each surviving row as it is re-read. Rows are emitted in
        file order within the commit; downstream consumers must not
        rely on intra-commit order (the batch twin, sorted tests,
        and any keyed sink are order-free)."""
        import hashlib
        from collections import Counter

        import pyarrow.parquet as pq

        def _freeze(v):
            if isinstance(v, (list, tuple)):
                return tuple(_freeze(x) for x in v)
            if isinstance(v, dict):
                return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
            return v

        def _digest(row) -> bytes:
            return hashlib.sha1(repr(_freeze(row)).encode()).digest()

        def _scan(paths: list[str]):
            for rel in paths:
                tab = pq.read_table(
                    os.path.join(partition.root, rel),
                    columns=list(partition.fields),
                )
                cols = [
                    tab.column(name).to_pylist()
                    for name in partition.fields
                ]
                yield from (zip(*cols) if cols else [])

        # pass 1: digest multisets (20 B/key — never full rows)
        added: Counter = Counter()
        removed: Counter = Counter()
        for row in _scan(partition.added):
            added[_digest(row)] += 1
        for row in _scan(partition.removed):
            removed[_digest(row)] += 1
        ins = added - removed
        dels = removed - added
        # pass 2: re-stream the files, emitting surviving rows as read
        for row in _scan(partition.added):
            d = _digest(row)
            if ins.get(d, 0) > 0:
                ins[d] -= 1
                yield (*row, "insert", partition.version)
        for row in _scan(partition.removed):
            d = _digest(row)
            if dels.get(d, 0) > 0:
                dels[d] -= 1
                yield (*row, "delete", partition.version)
