"""SnapshotTable — ACID-lite parquet table with atomic snapshot commits.

The reference's write surface is append + prefix delete with NO
isolation (main.go:294-348 store, main.go:407-458 delete — a
concurrent reader can observe a half-deleted collection). At 100 TB
that is untenable: every production lakehouse (Delta/Iceberg/Hudi)
layers a transaction log over immutable data files. This module is
that layer, minimal but real, with no dependency beyond the stdlib +
Spark:

Layout::

    table_root/
      data/<commit-uuid>/part-*.parquet   immutable data files
      _snapshots/v00000001.json           snapshot: file list + schema
      _snapshots/v00000002.json           + per-file column min/max stats

Commit protocol — the versioned snapshot object is published through
a :class:`~..sources.commit_backend.CommitBackend`, whose
``try_commit(version, payload)`` is an atomic "create iff absent":
two writers racing to commit version N+1 cannot both succeed; the
loser gets :class:`CommitConflictError` and retries on the new
snapshot (optimistic concurrency, same contract as Delta's
``_delta_log`` protocol). On the default local-filesystem backend the
publish is write-temp + fsync + ``os.link`` — the link is the CAS and
the version file appears fully written or not at all, so a reader can
NEVER observe a truncated snapshot and a writer crash leaves only an
orphan temp file (never a corrupt committed version). Other backends
(S3 conditional PUT, HDFS create-no-overwrite) plug in behind the
same three-method surface; the in-memory conditional-PUT fake in
commit_backend.py proves the protocol backend-agnostic in tests.

Log scalability (the Delta checkpoint shape): commit N's payload
stores only the file-manifest DELTA (``add`` + ``remove``) against
commit N-1 — O(changed files), not O(table files) — and every
``checkpoint_interval`` commits the full manifest is also written as
a parquet checkpoint (``ckpt-vNNNNNNNN.parquet``) with a
``_last_checkpoint`` pointer. Readers resolve the current version in
O(tail) by probing forward from the pointer (no directory listing)
and reconstruct a manifest from the nearest checkpoint plus the delta
tail — at one commit per 5 minutes for a year (~100k versions over
~1M data files), version resolution and manifest reads stay
bounded by the checkpoint interval instead of growing with history.

Scale properties:
- **Copy-on-write delete** rewrites ONLY the files that contain
  matching rows (found distributedly via ``input_file_name``); the
  untouched 99.9% of a 100 TB table is carried forward by reference.
- **File-level data skipping**: each snapshot stores per-file min/max
  for leaf columns (harvested from parquet footers, no data read);
  ``read(where=...)`` prunes the file list BEFORE Spark ever plans
  the scan — the same planning-time skipping Delta/Iceberg do, which
  row-group pruning inside Spark cannot match because it still pays
  task scheduling + footer reads for every file.
- **Time travel**: ``read(version=N)``; old snapshots stay valid
  until ``vacuum`` because deletes never remove data files.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nebuia_vector_db_spark.sources.commit_backend import (
    CommitBackend,
    LocalFSCommitBackend,
)


class CommitConflictError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


class SnapshotTable:
    """Handle on a snapshot-versioned parquet table rooted at ``path``.

    ``backend`` overrides the transaction-log storage (default: the
    local filesystem under ``path/_snapshots``); ``checkpoint_interval``
    is how often the full manifest is checkpointed to parquet (the
    Delta-style log-compaction knob — smaller = shorter delta tails on
    read, more checkpoint writes)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend: CommitBackend | None = None,
        checkpoint_interval: int = 10,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._snap_dir = os.path.join(self.path, "_snapshots")
        self._data_dir = os.path.join(self.path, "data")
        self.backend = backend or LocalFSCommitBackend(self._snap_dir)
        self.checkpoint_interval = int(checkpoint_interval)
        self._cache: dict[int, dict] = {}  # version -> full snapshot state

    # ------------------------------------------------------------ snapshots
    def versions(self) -> list[int]:
        """Full log listing (audit/history path — hot readers use
        :meth:`current_version`, which never lists)."""
        return self.backend.list_versions()

    def current_version(self) -> int:
        """O(tail) version resolution: start at the ``_last_checkpoint``
        pointer and probe forward until the next version is absent.
        Falls back to a listing only when the table has never been
        checkpointed (short logs, where listing is cheap anyway)."""
        ptr = self._read_pointer()
        if ptr is not None and self.backend.version_exists(ptr):
            v = ptr
        else:
            # probe past the listing too (round 6): object-store
            # listings may lag writes (GCS/S3-compatible stores with
            # eventual LIST), while point reads are read-after-write —
            # so the listing only SEEDS the probe (and an empty lagging
            # listing on a fresh table seeds it at 0: versions start
            # at 1 and the log is gapless, so forward probing finds
            # every committed head)
            vs = self.versions()
            v = vs[-1] if vs else 0
        while self.backend.version_exists(v + 1):
            v += 1
        if v == 0:
            # vacuum deletes versions below the oldest retained
            # checkpoint, so after vacuum the log no longer starts at
            # v1 — a missing/stale pointer plus a lagging (empty)
            # listing would seed the probe at 0 and find nothing even
            # though newer committed versions exist. Before concluding
            # the table is empty, re-seed from the oldest surviving
            # checkpoint (checkpointed versions are always retained).
            for c in sorted(self.backend.list_checkpoints()):
                if self.backend.version_exists(c):
                    v = c
                    while self.backend.version_exists(v + 1):
                        v += 1
                    break
        if v == 0:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        return v

    def _read_pointer(self) -> int | None:
        raw = self.backend.read_pointer()
        if raw is None:
            return None
        try:
            return int(json.loads(raw)["version"])
        except (ValueError, KeyError, json.JSONDecodeError):
            return None  # pointer is a hint; fall back to listing

    def _load_version_json(self, version: int) -> dict:
        try:
            return json.loads(self.backend.read_version(version))
        except json.JSONDecodeError as e:
            raise OSError(
                f"corrupt snapshot v{version} at {self.path}: {e}"
            ) from e

    def _snapshot(self, version: int | None = None) -> dict:
        """Reconstruct the FULL snapshot state (metadata + complete
        file manifest) at ``version``: nearest checkpoint or full
        commit at/below it, plus the delta tail replayed forward.
        Committed snapshots are immutable, so states cache safely."""
        v = self.current_version() if version is None else version
        if v in self._cache:
            return dict(self._cache[v])
        j_v = self._load_version_json(v)
        if "files" in j_v:  # full commit (create / legacy format)
            files = j_v["files"]
        elif self.backend.checkpoint_exists(v):
            files = self._read_checkpoint_files(v)
        else:
            deltas = [j_v]
            cur = v - 1
            while True:
                if cur < 1:
                    raise FileNotFoundError(
                        f"no manifest base below v{v} at {self.path}"
                    )
                if self.backend.checkpoint_exists(cur):
                    files = self._read_checkpoint_files(cur)
                    break
                j = self._load_version_json(cur)
                if "files" in j:
                    files = j["files"]
                    break
                deltas.append(j)
                cur -= 1
            for d in reversed(deltas):
                removed = set(d.get("remove", []))
                files = [
                    f for f in files if f["path"] not in removed
                ] + d.get("add", [])
        snap = {
            k: val for k, val in j_v.items() if k not in ("add", "remove")
        }
        snap["files"] = files
        snap["version"] = v
        if len(self._cache) >= 8:
            self._cache.pop(next(iter(self._cache)))
        self._cache[v] = snap
        return dict(snap)

    def history(self) -> list[dict]:
        """Commit log, oldest first: version, op, file/row deltas."""
        out = []
        for v in self.versions():
            s = self._load_version_json(v)
            out.append(
                {
                    "version": v,
                    **{
                        k: s.get(k)
                        for k in ("op", "n_files", "n_rows", "parent")
                    },
                }
            )
        return out

    # -------------------------------------------------------------- commit
    def _commit(self, snap: dict, expected_parent: int | None) -> int:
        """Publish the next snapshot through the backend CAS. The
        payload stores the manifest as a DELTA against the parent
        (``add``/``remove``) so commit size is O(changed files); the
        full state is checkpointed every ``checkpoint_interval``
        commits."""
        new_version = (0 if expected_parent is None else expected_parent) + 1
        snap["parent"] = expected_parent
        payload = {k: v for k, v in snap.items() if k != "files"}
        files = snap.get("files")
        parent_files = None
        if expected_parent is not None and files is not None:
            try:
                parent_files = self._snapshot(expected_parent)["files"]
            except (FileNotFoundError, OSError):
                parent_files = None
        if parent_files is None:
            if files is not None:
                payload["files"] = files  # full commit (create / fallback)
        else:
            parent_by_path = {f["path"]: f for f in parent_files}
            new_paths = {f["path"] for f in files}
            payload["add"] = [
                f for f in files if f["path"] not in parent_by_path
            ]
            payload["remove"] = sorted(
                p for p in parent_by_path if p not in new_paths
            )
        if not self.backend.try_commit(
            new_version, json.dumps(payload, sort_keys=True)
        ):
            raise CommitConflictError(
                f"version {new_version} already committed at {self.path}"
            )
        if files is not None:
            state = dict(snap)
            state["files"] = files
            state["version"] = new_version
            if len(self._cache) >= 8:
                self._cache.pop(next(iter(self._cache)))
            self._cache[new_version] = state
            if (
                self.checkpoint_interval > 0
                and new_version % self.checkpoint_interval == 0
            ):
                self._write_checkpoint(new_version, files)
        return new_version

    # --------------------------------------------------------- checkpoints
    def _write_checkpoint(self, version: int, files: list[dict]) -> None:
        """Materialize the full manifest as a parquet checkpoint and
        advance the ``_last_checkpoint`` pointer. Losing the race on
        either write is harmless: checkpoints are immutable functions
        of the version, and the pointer is only a hint."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {"entry": pa.array([json.dumps(f, sort_keys=True) for f in files])}
        )
        buf = io.BytesIO()
        pq.write_table(table, buf)
        self.backend.write_checkpoint(version, buf.getvalue())
        self.backend.write_pointer(json.dumps({"version": version}))

    def _read_checkpoint_files(self, version: int) -> list[dict]:
        import io

        import pyarrow.parquet as pq

        data = self.backend.read_checkpoint(version)
        table = pq.read_table(io.BytesIO(data))
        return [json.loads(s) for s in table.column("entry").to_pylist()]

    def _write_files(
        self,
        df: DataFrame,
        stats_cols: list[str],
        bloom_cols: list[str] | None = None,
    ) -> list[dict]:
        """Write df as a new immutable commit dir; return file entries
        (relative path, row count, byte size, per-column min/max from
        the parquet FOOTERS — no data pages are read — and, for
        ``bloom_cols``, a per-file Bloom filter over the column's
        distinct values for point-lookup skipping where min/max can't
        prune)."""
        commit_id = uuid.uuid4().hex
        out_dir = os.path.join(self._data_dir, commit_id)
        df.write.mode("error").parquet(out_dir)
        import pyarrow.parquet as pq

        entries = []
        for name in sorted(os.listdir(out_dir)):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(out_dir, name)
            pf = pq.ParquetFile(full)
            md = pf.metadata
            stats: dict[str, list] = {}
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            for ci, col in enumerate(schema_names):
                if col not in stats_cols:
                    continue
                lo = hi = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if ok and lo is not None:
                    stats[col] = [_json_safe(lo), _json_safe(hi)]
            blooms = {}
            for col in bloom_cols or []:
                if col not in schema_names:
                    continue
                import pyarrow as pa

                arr = pf.read(columns=[col]).column(col)
                at = arr.type
                if not (
                    pa.types.is_integer(at)
                    or pa.types.is_floating(at)
                    or pa.types.is_decimal(at)
                    or pa.types.is_boolean(at)
                    or pa.types.is_string(at)
                    or pa.types.is_large_string(at)
                ):
                    # temporal/binary values don't canonicalize the
                    # same way predicate literals do — a mismatch
                    # would FALSE-NEGATIVE the bloom and silently
                    # drop matching files, so refuse loudly instead
                    raise ValueError(
                        f"bloom_cols[{col!r}] has type {at}; bloom "
                        "skipping supports only string/numeric columns"
                    )
                blooms[col] = _bloom_build(arr.to_pylist())
            entries.append(
                {
                    "path": os.path.join("data", commit_id, name),
                    "rows": md.num_rows,
                    "bytes": os.path.getsize(full),
                    "stats": stats,
                    **({"blooms": blooms} if blooms else {}),
                }
            )
        return entries

    @staticmethod
    def _default_stats_cols(df: DataFrame) -> list[str]:
        return [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (
                    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                    T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
                    T.DateType, T.TimestampType,
                ),
            )
        ]

    # ----------------------------------------------------------- operations
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        extra_meta: dict | None = None,
        bloom_cols: list[str] | None = None,
        backend: CommitBackend | None = None,
        checkpoint_interval: int = 10,
    ) -> "SnapshotTable":
        tbl = cls(
            spark, path, backend=backend,
            checkpoint_interval=checkpoint_interval,
        )
        if tbl.versions():
            raise FileExistsError(f"snapshot table already exists at {path}")
        files = tbl._write_files(
            df, stats_cols or cls._default_stats_cols(df), bloom_cols
        )
        tbl._commit(
            {
                **(extra_meta or {}),
                "op": "create",
                "schema": json.loads(df.schema.json()),
                "files": files,
                "n_files": len(files),
                "n_rows": sum(f["rows"] for f in files),
            },
            expected_parent=None,
        )
        return tbl

    def meta(self, key: str, version: int | None = None):
        """Read an application metadata key from a snapshot (e.g. the
        streaming sink's transaction watermark)."""
        return self._snapshot(version).get(key)

    # snapshot keys owned by the table protocol; everything else is
    # APPLICATION metadata (stream watermarks, index centroids, ...)
    # and must survive every commit, including maintenance rewrites
    _RESERVED_KEYS = frozenset(
        {
            "op", "schema", "files", "n_files", "n_rows", "parent",
            "version", "rewrote_files", "carried_files",
            "compacted_files", "zorder_cols",
        }
    )

    @classmethod
    def _app_meta(cls, snap: dict) -> dict:
        """The parent snapshot's application keys, carried forward by
        every commit (a compaction must not lose the streaming sink's
        watermarks or a snapshot index's centroid matrix)."""
        return {
            k: v for k, v in snap.items() if k not in cls._RESERVED_KEYS
        }

    def _schema(self, snap: dict) -> T.StructType:
        return T.StructType.fromJson(snap["schema"])

    def read(
        self,
        version: int | None = None,
        where: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Read a snapshot. ``where`` is an optional list of simple
        predicates ``(col, op, literal)`` with op in ``= < <= > >=``
        used for FILE-LEVEL pruning against the snapshot's min/max
        stats (planning-time data skipping). Pruning is advisory only
        — the predicates are ALSO applied to the rows, so a stats-less
        file degrades to a normal scan, never a wrong answer."""
        snap = self._snapshot(version)
        files = snap["files"]
        if where:
            files = [f for f in files if _file_may_match(f, where)]
        schema = self._schema(snap)
        if not files:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f["path"]) for f in files]
        )
        for col, op, lit in where or []:
            df = df.where(_predicate(col, op, lit))
        return df

    def n_files(self, version: int | None = None) -> int:
        return len(self._snapshot(version)["files"])

    def pruned_file_count(
        self, where: list[tuple[str, str, object]]
    ) -> int:
        """How many files a ``read(where=...)`` would actually scan."""
        return sum(
            1 for f in self._snapshot()["files"] if _file_may_match(f, where)
        )

    # ----------------------------------------------------- change feed
    def _step_delta(self, v: int) -> tuple[list[dict], list[dict]]:
        """(added_files, removed_files) manifest entries for commit
        ``v`` — straight out of the delta commit payload; a full
        commit (create) diffs against the parent's file set."""
        j = self._load_version_json(v)
        if "files" not in j:  # delta commit: add/remove recorded
            added = j.get("add", [])
            removed_paths = set(j.get("remove", []))
            if not removed_paths:
                return added, []
            prev = self._snapshot(v - 1)["files"]
            return added, [f for f in prev if f["path"] in removed_paths]
        files = j["files"]
        if v <= 1:
            return files, []
        prev = self._snapshot(v - 1)["files"]
        prev_paths = {f["path"] for f in prev}
        cur_paths = {f["path"] for f in files}
        return (
            [f for f in files if f["path"] not in prev_paths],
            [f for f in prev if f["path"] not in cur_paths],
        )

    def changes(
        self, v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Row-level change feed over the commit range
        ``(v_from, v_to]`` — the Delta/Iceberg changeFeed shape on
        this log: every row carries ``_change`` ('insert'/'delete')
        and ``_commit_version``. An in-place update (upsert) appears
        as a delete+insert pair at the same version, the CDF
        convention for tables without a declared key.

        Per commit, the manifest names the files it added and
        removed; copy-on-write rewrites carry surviving rows from a
        removed file into its replacement, so the row-level delta is
        recovered with two multiset differences over the TOUCHED
        files only: inserts = added∖removed, deletes = removed∖added
        (``exceptAll``). Cost is therefore proportional to the
        churn the commits caused — never a full-table scan, which is
        the whole point of a CDC feed at 100 TB (downstream
        incremental consumers read the delta, not the table). Each
        exceptAll is one hash aggregation over the touched rows;
        steps are independent and union into one plan."""
        v_hi = self.current_version() if v_to is None else int(v_to)
        v_lo = int(v_from)
        if not 0 <= v_lo <= v_hi:
            raise ValueError(
                f"bad change range ({v_lo}, {v_hi}] at {self.path}"
            )
        meta = (
            lambda df, v: df.withColumn(
                "_change", F.lit("insert")
            ).withColumn("_commit_version", F.lit(v))
        )
        frames: list[DataFrame] = []
        for v in range(v_lo + 1, v_hi + 1):
            added, removed = self._step_delta(v)
            schema = self._schema(self._snapshot(v))

            def _read(fl: list[dict]) -> DataFrame:
                if not fl:
                    return self.spark.createDataFrame([], schema)
                return self.spark.read.schema(schema).parquet(
                    *[os.path.join(self.path, f["path"]) for f in fl]
                )

            a_df, r_df = _read(added), _read(removed)
            # short-circuit the one-sided cases (round 12): a pure
            # append has no removed files and a pure delete-all no
            # added ones — exceptAll against an empty side is a
            # full-row hash aggregation (it hashes every column,
            # TEXT included) that changes nothing; skipping it turns
            # the append-commit change feed into a plain scan of the
            # added files (measured ~2.5 s → ~0.4 s on the b20 5k-doc
            # delta)
            ins_rows = a_df if not removed else a_df.exceptAll(r_df)
            del_rows = r_df if not added else r_df.exceptAll(a_df)
            ins = meta(ins_rows, v)
            dels = del_rows.withColumn(
                "_change", F.lit("delete")
            ).withColumn("_commit_version", F.lit(v))
            frames.append(ins.unionByName(dels))
        if not frames:
            schema = self._schema(self._snapshot(v_hi))
            empty = self.spark.createDataFrame([], schema)
            return meta(empty, 0).where(F.lit(False))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def append(
        self,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        extra_meta: dict | None = None,
        merge_schema: bool = False,
        bloom_cols: list[str] | None = None,
        expected_parent: int | None = None,
    ) -> int:
        """Append ``df`` as new immutable files. With ``merge_schema``,
        columns present in ``df`` but not the table are ADDED to the
        table schema (additive evolution, the lakehouse
        ``mergeSchema`` contract): existing files are untouched — the
        parquet reader fills the new column with NULL for them —
        while shared columns keep the table's original types.

        ``expected_parent`` pins the snapshot this append derives from
        (metadata read + CAS parent as one atomic unit): if any other
        commit lands in between, the append raises
        :class:`CommitConflictError` instead of silently basing its
        ``extra_meta`` on a stale snapshot. The exactly-once streaming
        sink uses this to make its read-watermarks/commit pair atomic
        across apps (a TOCTOU fix — without it, a racing app's freshly
        advanced watermark could be wholesale-overwritten by our stale
        copy, un-deduplicating its replays)."""
        parent = (
            self.current_version() if expected_parent is None
            else expected_parent
        )
        snap = self._snapshot(parent)
        schema = self._schema(snap)
        if merge_schema:
            known = {f.name for f in schema.fields}
            schema = T.StructType(
                schema.fields
                + [f for f in df.schema.fields if f.name not in known]
            )
        df = _align(df, schema)
        new_files = snap["files"] + self._write_files(
            df, stats_cols or self._default_stats_cols(df), bloom_cols
        )
        return self._commit(
            {
                **self._app_meta(snap),
                **(extra_meta or {}),
                "op": "append",
                "schema": json.loads(schema.json()),
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
            },
            expected_parent=parent,
        )

    def overwrite(self, df: DataFrame) -> int:
        """Atomic full replace (the Delta ``mode=overwrite`` shape):
        ONE commit whose file set is entirely new — readers flip from
        the old content to ``df`` at a single version boundary, never
        observing an intermediate (the reason ledger fold-compaction
        must not be delete-then-append: between those two commits the
        table would read EMPTY). Old snapshots stay time-travelable
        until vacuum. Change-feed note: ``changes()`` across an
        overwrite version replays it as full-table delete+insert
        multiset deltas — correct, but O(table); overwrite is for
        derived/state tables (ledger folds, rebuilt artifacts), not
        for corpora with incremental CDC subscribers."""
        parent = self.current_version()
        snap = self._snapshot(parent)
        schema = self._schema(snap)
        df = _align(df, schema)
        new_files = self._write_files(df, self._default_stats_cols(df))
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "overwrite",
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
            },
            expected_parent=parent,
        )

    def compact(
        self,
        small_file_bytes: int = 32 * 1024 * 1024,
        target_partitions: int | None = None,
    ) -> int:
        """Bin-pack the snapshot's SMALL files (< ``small_file_bytes``)
        into fewer, larger ones; files already at target size carry
        forward by reference. The small-file problem is what an
        exactly-once streaming sink (one file per micro-batch) or a
        trickle of COW deletes inevitably creates, and at 100 TB it
        turns scans into a file-open benchmark — compaction restores
        I/O-bound scanning without touching big files. Committed as a
        normal snapshot: readers flip atomically, old versions stay
        time-travelable until vacuum."""
        parent = self.current_version()
        snap = self._snapshot(parent)
        small = [f for f in snap["files"] if f["bytes"] < small_file_bytes]
        big = [f for f in snap["files"] if f["bytes"] >= small_file_bytes]
        if len(small) <= 1:
            return parent  # nothing to pack
        schema = self._schema(snap)
        total = sum(f["bytes"] for f in small)
        n_out = target_partitions or max(1, total // small_file_bytes + 1)
        packed = self.spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f["path"]) for f in small]
        ).coalesce(int(n_out))
        new_files = big + self._write_files(
            packed, self._default_stats_cols(packed)
        )
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "compact",
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
                "compacted_files": len(small),
                "carried_files": len(big),
            },
            expected_parent=parent,
        )

    def delete_where(self, condition: Column | str) -> int:
        """Copy-on-write delete. Three phases, Delta-style:

        1. find the files that contain ≥1 matching row — one
           distributed scan projecting only ``input_file_name()``
           (Catalyst pushes the predicate to the parquet readers);
           the collected result is a FILE list, never rows;
        2. rewrite ONLY those files with the predicate inverted;
        3. commit: carried-forward files + rewritten files.

        Unaffected files move by reference — at 100 TB a delete that
        touches one day's partition rewrites that day, not the table.
        Old snapshots remain readable (time travel) until vacuum."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        parent = self.current_version()
        snap = self._snapshot(parent)
        current = self.read(parent)
        hit = (
            current.where(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        )
        hit_paths = {_strip_scheme(r["f"]) for r in hit}
        kept, rewrite = [], []
        for f in snap["files"]:
            full = os.path.abspath(os.path.join(self.path, f["path"]))
            (rewrite if full in hit_paths else kept).append(f)
        new_files = list(kept)
        if rewrite:
            schema = self._schema(snap)
            survivors = self.spark.read.schema(schema).parquet(
                *[os.path.join(self.path, f["path"]) for f in rewrite]
            ).where(~cond)
            new_files += self._write_files(
                survivors, self._default_stats_cols(survivors)
            )
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "delete",
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
                "rewrote_files": len(rewrite),
                "carried_files": len(kept),
            },
            expected_parent=parent,
        )

    def delete_matching(self, keys: DataFrame) -> int:
        """Copy-on-write delete of every row whose values on
        ``keys``' columns match some row of ``keys`` — the
        RELATIONAL form of :meth:`delete_where` (round 15, ADVICE/
        VERDICT r14): a large-churn retraction as an ``isin`` literal
        list inflates the plan (and the driver) with the id list,
        while this form keeps the ids distributed end to end — the
        hit-file probe is a LEFT SEMI join and the rewrite a LEFT
        ANTI join, so no id literal ever enters a plan or crosses the
        driver. Same three COW phases and commit shape as
        delete_where; unaffected files move by reference.

        ``keys``' column names must all exist in the table schema
        (the join is on that column set). Join strategy is left to
        Catalyst/AQE — a churn-sized key relation broadcasts itself
        at runtime."""
        cols = list(keys.columns)
        parent = self.current_version()
        snap = self._snapshot(parent)
        missing = [
            c for c in cols if c not in self.read(parent).columns
        ]
        if not cols or missing:
            raise ValueError(
                f"delete_matching: key columns {missing or cols} not "
                "usable against the table schema"
            )
        keys = keys.select(*cols).distinct()
        current = self.read(parent)
        # capture the file name AT SCAN TIME: input_file_name() is
        # empty for rows that crossed a shuffle, and the semi-join may
        # shuffle — projecting it first pins it to the scan stage
        hit = (
            current.withColumn("_f", F.input_file_name())
            .join(keys, cols, "left_semi")
            .select(F.col("_f").alias("f"))
            .distinct()
            .collect()
        )
        hit_paths = {_strip_scheme(r["f"]) for r in hit}
        kept, rewrite = [], []
        for f in snap["files"]:
            full = os.path.abspath(os.path.join(self.path, f["path"]))
            (rewrite if full in hit_paths else kept).append(f)
        new_files = list(kept)
        if rewrite:
            schema = self._schema(snap)
            survivors = self.spark.read.schema(schema).parquet(
                *[os.path.join(self.path, f["path"]) for f in rewrite]
            ).join(keys, cols, "left_anti")
            new_files += self._write_files(
                survivors, self._default_stats_cols(survivors)
            )
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "delete",
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
                "rewrote_files": len(rewrite),
                "carried_files": len(kept),
            },
            expected_parent=parent,
        )

    def upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        version_col: str,
    ) -> int:
        """Latest-wins MERGE: rows in ``updates`` replace same-key rows
        iff their ``version_col`` is newer. Copy-on-write on the files
        that contain matching keys (found via a broadcast semi-join of
        the update keys against the scan), everything else carried by
        reference. Resolution reuses
        :func:`operators.maintenance.upsert_latest` (max_by aggregate,
        one shuffle over only the affected files + updates)."""
        from nebuia_vector_db_spark.operators.maintenance import upsert_latest

        parent = self.current_version()
        snap = self._snapshot(parent)
        schema = self._schema(snap)
        updates = _align(updates, schema)
        current = self.read(parent)
        keys = updates.select(*key_cols).distinct()
        # input_file_name() must bind to the snapshot scan BEFORE the
        # join: evaluated after a semi-join whose other side is itself
        # a file source (updates derived from parquet), it is
        # ambiguous and Spark rejects the plan (round 15)
        hit = (
            current.withColumn("f", F.input_file_name())
            .join(F.broadcast(keys), key_cols, "left_semi")
            .select("f")
            .distinct()
            .collect()
        )
        hit_paths = {_strip_scheme(r["f"]) for r in hit}
        kept, rewrite = [], []
        for f in snap["files"]:
            full = os.path.abspath(os.path.join(self.path, f["path"]))
            (rewrite if full in hit_paths else kept).append(f)
        if rewrite:
            affected = self.spark.read.schema(schema).parquet(
                *[os.path.join(self.path, f["path"]) for f in rewrite]
            )
        else:
            affected = self.spark.createDataFrame([], schema)
        merged = upsert_latest(affected, updates, key_cols, version_col)
        merged = _align(merged, schema)
        new_files = kept + self._write_files(
            merged, self._default_stats_cols(merged)
        )
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "upsert",
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
                "rewrote_files": len(rewrite),
                "carried_files": len(kept),
            },
            expected_parent=parent,
        )

    def optimize_zorder(
        self,
        cols: list[str],
        n_partitions: int | None = None,
        bits: int = 8,
    ) -> int:
        """``OPTIMIZE ... ZORDER BY (cols)``: rewrite the whole
        snapshot Morton-clustered on ``cols`` (operators/zorder.py) so
        every data file covers a compact hyper-rectangle and the
        snapshot's min/max stats prune on ALL clustered dimensions.
        One range exchange + local sort — the price any re-layout
        pays; committed atomically like every other op, so readers
        flip to the clustered layout in one step and prior snapshots
        stay time-travelable until vacuum."""
        from nebuia_vector_db_spark.operators.zorder import cluster_by_zorder

        parent = self.current_version()
        snap = self._snapshot(parent)
        if n_partitions is None:
            n_partitions = max(4, len(snap["files"]))
        clustered = cluster_by_zorder(
            self.read(parent), cols, n_partitions, bits
        )
        new_files = self._write_files(
            clustered, self._default_stats_cols(clustered)
        )
        return self._commit(
            {
                **self._app_meta(snap),
                "op": "optimize_zorder",
                "zorder_cols": cols,
                "schema": snap["schema"],
                "files": new_files,
                "n_files": len(new_files),
                "n_rows": sum(f["rows"] for f in new_files),
            },
            expected_parent=parent,
        )

    def with_retry(self, op: str, *args, retries: int = 5, **kwargs):
        """Optimistic-concurrency loop: run a mutating table op
        (``"append"``, ``"delete_where"``, ``"upsert"``, ``"compact"``,
        ``"optimize_zorder"``) and, on :class:`CommitConflictError`
        (another writer landed the version first), re-read the new
        snapshot and reapply — the standard lakehouse retry contract.
        Safe because every op derives its input from the CURRENT
        snapshot at call time; a retry sees the winner's commit."""
        last: CommitConflictError | None = None
        fn = getattr(self, op)
        for _ in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except CommitConflictError as e:
                last = e
        raise last

    def vacuum(
        self, keep_last: int = 1, min_file_age_seconds: float = 0.0
    ) -> dict:
        """Physically delete data files unreferenced by the retained
        ``keep_last`` snapshots, and drop the older snapshot files.
        This is the ONLY operation that removes data; until it runs,
        every historical snapshot is readable and in-flight readers of
        any retained snapshot are safe.

        ``min_file_age_seconds`` is the concurrent-WRITER guard (the
        Delta vacuum-retention contract): a racing writer's data files
        exist on disk BEFORE the snapshot that references them, so an
        unguarded vacuum could delete an in-flight commit's files.
        Files younger than the threshold are never removed; set it
        above the longest plausible write duration when writers may
        race the vacuum (0 is safe only for a quiesced table)."""
        import time as _time

        vs = self.versions()
        retained = vs[-keep_last:] if keep_last > 0 else vs[-1:]
        # Checkpoint the OLDEST retained version before dropping older
        # log entries: every retained version must stay reconstructible
        # from a base at-or-below it, and the dropped entries may have
        # been that base (delta commits). The pointer then moves to the
        # newest surviving checkpoint so probe-forward resolution stays
        # O(tail).
        oldest = retained[0]
        if not self.backend.checkpoint_exists(oldest):
            self._write_checkpoint(oldest, self._snapshot(oldest)["files"])
        live = set()
        for v in retained:
            for f in self._snapshot(v)["files"]:
                live.add(os.path.abspath(os.path.join(self.path, f["path"])))
        removed_files = 0
        now = _time.time()
        for commit_id in list(os.listdir(self._data_dir)):
            cdir = os.path.join(self._data_dir, commit_id)
            for name in list(os.listdir(cdir)):
                full = os.path.abspath(os.path.join(cdir, name))
                if (
                    name.endswith(".parquet")
                    and full not in live
                    and now - os.path.getmtime(full) >= min_file_age_seconds
                ):
                    os.remove(full)
                    removed_files += 1
            if not any(n.endswith(".parquet") for n in os.listdir(cdir)):
                import shutil

                shutil.rmtree(cdir)
        removed_snaps = 0
        for v in vs:
            if v not in retained:
                self.backend.delete_version(v)
                self._cache.pop(v, None)
                removed_snaps += 1
        for cv in self.backend.list_checkpoints():
            if cv < oldest:
                self.backend.delete_checkpoint(cv)
        remaining_ckpts = self.backend.list_checkpoints()
        if remaining_ckpts:
            self.backend.write_pointer(
                json.dumps({"version": remaining_ckpts[-1]})
            )
        return {
            "removed_data_files": removed_files,
            "removed_snapshots": removed_snaps,
            "retained_versions": retained,
        }


# ------------------------------------------------------------------ helpers
_BLOOM_BITS_PER_KEY = 10  # ~1% false-positive at k=7
_BLOOM_HASHES = 7


def _bloom_hashes(value) -> list[int]:
    import decimal
    import hashlib

    out = []
    # canonicalize numerics so a predicate literal `5` matches a
    # stored `5.0` or Decimal('5') (both sides — build reads values
    # via pyarrow to_pylist, which yields Decimal for decimal columns,
    # while read(where=...) literals are plain int/float; divergent
    # canon forms would FALSE-NEGATIVE the bloom and wrongly prune a
    # file that holds the value). bool checked first (int subclass);
    # types outside {bool,int,float,Decimal,str} are rejected at
    # _write_files time so no other form can reach a bloom probe.
    if isinstance(value, bool):
        canon = repr(value).encode()
    elif isinstance(value, (int, float, decimal.Decimal)):
        canon = repr(float(value)).encode()
    else:
        canon = repr(value).encode()
    for i in range(_BLOOM_HASHES):
        h = hashlib.blake2b(canon, digest_size=8, salt=bytes([i])).digest()
        out.append(int.from_bytes(h, "big"))
    return out


def _bloom_build(values) -> dict:
    """Serialize a Bloom filter over the distinct values (base64 bit
    array + bit count). ~10 bits/key, 7 hashes → ~1% FP."""
    import base64

    distinct = {v for v in values if v is not None}
    m = max(64, len(distinct) * _BLOOM_BITS_PER_KEY)
    bits = bytearray((m + 7) // 8)
    for v in distinct:
        for h in _bloom_hashes(v):
            pos = h % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "b64": base64.b64encode(bytes(bits)).decode()}


def _bloom_may_contain(bloom: dict, value) -> bool:
    import base64

    m = bloom["m"]
    bits = base64.b64decode(bloom["b64"])
    for h in _bloom_hashes(value):
        pos = h % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def _json_safe(v):
    if isinstance(v, bytes):
        return None  # binary stats are not comparable via JSON; skip
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def _strip_scheme(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return os.path.abspath(p)


def _predicate(col: str, op: str, lit) -> Column:
    c = F.col(col)
    return {
        "=": c == lit, "<": c < lit, "<=": c <= lit,
        ">": c > lit, ">=": c >= lit,
    }[op]


def _file_may_match(f: dict, where: list[tuple[str, str, object]]) -> bool:
    """Conservative stats check: False only when the file PROVABLY has
    no matching rows (all predicates are ANDed). Equality predicates
    additionally consult the file's Bloom filter when one was built —
    the point-lookup case min/max can't prune on a high-cardinality
    unsorted column (a needle `k = ?` hits every file's [min, max]
    range but ~1% of Blooms)."""
    for col, op, lit in where:
        st = f.get("stats", {}).get(col)
        if st and st[0] is not None:
            lo, hi = st
            try:
                if op == "=" and not (lo <= lit <= hi):
                    return False
                if op in ("<", "<=") and not (lo < lit or (op == "<=" and lo <= lit)):
                    return False
                if op in (">", ">=") and not (hi > lit or (op == ">=" and hi >= lit)):
                    return False
            except TypeError:
                pass  # mixed types -> range can't prune
        if op == "=":
            bloom = f.get("blooms", {}).get(col)
            if bloom and not _bloom_may_contain(bloom, lit):
                return False
    return True


def _align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast df to the table schema (column order + types)."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
