"""Python Data Source (Spark 4 API) for the reference's JSON layout.

``sources/json_docs.py`` reads the ``{collection}/{uuid}_doc.json``
bucket layout (main.go:334-342) through ``spark.read.json`` + glob.
This module exposes the SAME layout as a first-class pluggable source
via the PySpark 4 Python Data Source API::

    spark.dataSource.register(NebuiaDocsDataSource)
    df = spark.read.format("nebuia_docs").option("path", root).load()
    df.where(col("collection") == "papers")   # pruned at PLANNING time

Why a custom source instead of the glob reader:

- **Partition planning mirrors the storage layout**: one input
  partition per collection directory (≙ MinIO prefix), so Spark's
  scheduler parallelizes exactly the way the reference's goroutine
  fan-out does (main.go:197-208) — but with partition PRUNING:
- **Filter pushdown**: ``pushFilters`` accepts ``collection = ?`` /
  ``collection IN (...)`` and drops dead collections before a single
  file is listed or opened — the prefix-listing shortcut
  (main.go:186-189) expressed as Catalyst planning metadata.
- **Suffix filter in planning**: only ``*_doc.json`` keys are ever
  opened (≙ main.go:203), enforced when the partition lists its dir.

Each partition's ``read`` decodes its documents with the stdlib json
parser and yields DOCUMENT_SCHEMA-shaped tuples; Spark handles the
arrow/pickle transport. At 100 TB the same class points at an object
store listing (swap ``os.listdir`` for the store SDK's paginated
prefix list) — partitions stream, nothing is materialized on the
driver but the collection names.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)

from nebuia_vector_db_spark.schemas import DOCUMENT_SCHEMA


class CollectionPartition(InputPartition):
    def __init__(self, root: str, collection: str):
        self.root = root
        self.collection = collection


class NebuiaDocsDataSource(DataSource):
    """``spark.read.format("nebuia_docs")`` — options: ``path`` (root
    of the bucket tree, required)."""

    @classmethod
    def name(cls) -> str:
        return "nebuia_docs"

    def schema(self):
        return DOCUMENT_SCHEMA

    def reader(self, schema) -> "NebuiaDocsReader":
        root = self.options.get("path")
        if not root:
            raise ValueError("nebuia_docs requires .option('path', root)")
        return NebuiaDocsReader(root)

    def writer(self, schema, overwrite: bool) -> "NebuiaDocsWriter":
        root = self.options.get("path")
        if not root:
            raise ValueError("nebuia_docs requires .option('path', root)")
        return NebuiaDocsWriter(root, overwrite)


class NebuiaDocsReader(DataSourceReader):
    def __init__(self, root: str):
        self.root = root
        self._keep: set[str] | None = None  # None = all collections

    # ------------------------------------------------------- planning
    def pushFilters(self, filters: list[Filter]):
        """Accept collection equality/IN filters (partition pruning ≙
        the reference's prefix listing); everything else is returned
        for Spark to re-apply after the scan."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("collection",):
                self._intersect({f.value})
            elif isinstance(f, In) and f.attribute == ("collection",):
                self._intersect(set(f.value))
            else:
                unsupported.append(f)
        return unsupported

    def _intersect(self, keep: set[str]) -> None:
        # multiple pushed collection filters AND together — replacing
        # the keep-set would enforce only the LAST filter while
        # claiming all of them (Spark won't re-apply claimed filters)
        self._keep = keep if self._keep is None else self._keep & keep

    def partitions(self) -> list[CollectionPartition]:
        cols = sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith("_")  # _staging from an aborted write
        )
        if self._keep is not None:
            cols = [c for c in cols if c in self._keep]
        return [CollectionPartition(self.root, c) for c in cols]

    # ------------------------------------------------------ execution
    def read(self, partition: CollectionPartition):
        d = os.path.join(partition.root, partition.collection)
        for name in sorted(os.listdir(d)):
            if not name.endswith("_doc.json"):  # ≙ main.go:203
                continue
            with open(os.path.join(d, name)) as fh:
                doc = json.load(fh)
            md = doc.get("metadata") or {}
            chunks = []
            for ch in doc.get("chunks") or []:
                emb = ch.get("embedding")
                if isinstance(emb, dict):  # wire shape {vector: [...]}
                    emb = emb.get("vector")
                cmd = ch.get("metadata") or {}
                chunks.append(
                    (
                        ch.get("text"),
                        [float(x) for x in (emb or [])],
                        (_json_str(cmd.get("source")), cmd.get("name")),
                        float(ch.get("semantic_score") or 0.0),
                    )
                )
            yield (
                partition.collection,
                name[: -len("_doc.json")],
                doc.get("text"),
                (_json_str(md.get("source")), md.get("name")),
                chunks,
            )


def _json_str(v):
    if v is None or isinstance(v, str):
        return v
    return json.dumps(v, sort_keys=True)


# ---------------------------------------------------------------- writer
class DocsCommitMessage(WriterCommitMessage):
    """Per-task manifest: the staging directory this task wrote into
    and the relative `{collection}/{doc_id}_doc.json` paths it holds."""

    def __init__(self, staging: str, files: list[str]):
        self.staging = staging
        self.files = files


class NebuiaDocsWriter(DataSourceWriter):
    """``df.write.format("nebuia_docs").option("path", root)`` — the
    append-sink half of the layout (≙ the reference's per-object
    PutObject, main.go:340-342) as a REAL two-phase commit, strictly
    stronger than the reference's fire-and-forget store:

    - **write** (task side): each task serializes its documents to the
      reference wire shape (embeddings re-wrapped as ``{vector:
      [...]}``; ``json.dumps`` prints shortest-round-trip doubles, so
      embeddings survive bit-for-bit) into a PRIVATE staging
      directory ``root/_staging/<task-uuid>/`` — a retried or
      speculated task stages a fresh directory, so duplicate attempts
      can never half-publish.
    - **commit** (driver side): only the staging directories named in
      the winning tasks' commit messages are renamed into place
      (``os.replace`` per file — atomic on POSIX); with
      ``mode("overwrite")`` the existing ``*_doc.json`` tree is
      cleared first. Nothing is visible to readers until commit.
    - **abort**: losing staging directories are deleted wholesale.

    At 100 TB the same class points at an object store: staging
    becomes a key prefix and the commit loop a server-side copy batch
    (S3 has no rename — the manifest commit of snapshot.py is the
    stronger alternative there, and this writer documents that line).
    Rows missing ``doc_id`` are minted a UUID, matching
    VectorEngine.store (O-11)."""

    # Concurrent-writer guard for the orphan-staging sweep (below):
    # another job's in-flight task staging dirs live under the same
    # root/_staging, so commit() may only reclaim directories old
    # enough that no live write can still own them — the same
    # retention contract as SnapshotTable.vacuum's
    # min_file_age_seconds. One day comfortably exceeds any task.
    STALE_STAGING_SECONDS = 24 * 3600.0

    def __init__(self, root: str, overwrite: bool):
        self.root = root
        self.overwrite = overwrite

    # ------------------------------------------------------ task side
    def write(self, iterator) -> DocsCommitMessage:
        import uuid

        staging = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        files: list[str] = []
        for row in iterator:
            doc_id = row["doc_id"] or str(uuid.uuid4())
            md = row["metadata"]
            payload = {
                "text": row["text"],
                "metadata": {
                    "source": md["source"] if md else None,
                    "name": md["name"] if md else None,
                },
                "chunks": [
                    {
                        "text": ch["text"],
                        "embedding": {
                            "vector": list(ch["embedding"] or [])
                        },
                        "metadata": {
                            "source": ch["metadata"]["source"]
                            if ch["metadata"]
                            else None,
                            "name": ch["metadata"]["name"]
                            if ch["metadata"]
                            else None,
                        },
                        "semantic_score": ch["semantic_score"],
                    }
                    for ch in (row["chunks"] or [])
                ],
            }
            rel = os.path.join(
                row["collection"], f"{doc_id}_doc.json"
            )
            dst = os.path.join(staging, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "w") as fh:
                json.dump(payload, fh)
            files.append(rel)
        return DocsCommitMessage(staging, files)

    # ---------------------------------------------------- driver side
    def commit(self, messages) -> None:
        """Publish the winning tasks' staging files.

        Atomicity note (r10 ADVICE): each ``os.replace`` is atomic
        PER FILE, not per job — a driver crash mid-loop leaves a
        prefix of the file set published.  That matches HDFS/S3
        FileOutputCommitter v2 semantics; the job-atomic alternative
        in this repo is the snapshot format's manifest commit
        (sources/snapshot.py), which this docstring is the pointer
        to.  Orphan staging directories from failed/speculated task
        attempts whose messages reached neither commit() nor abort()
        are swept here so ``root/_staging`` cannot leak disk."""
        import shutil

        # Writing an empty DataFrame runs zero tasks, so no staging
        # dir (and possibly no root) was ever created — guard both
        # the overwrite listdir and the final sweep.
        os.makedirs(self.root, exist_ok=True)
        if self.overwrite:
            for d in list(os.listdir(self.root)):
                full = os.path.join(self.root, d)
                if d != "_staging" and os.path.isdir(full):
                    for name in os.listdir(full):
                        if name.endswith("_doc.json"):
                            os.remove(os.path.join(full, name))
        winners = set()
        for m in messages:
            if m is None:
                continue
            winners.add(os.path.basename(m.staging.rstrip(os.sep)))
            for rel in m.files:
                dst = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(os.path.join(m.staging, rel), dst)
            shutil.rmtree(m.staging, ignore_errors=True)
        staging_root = os.path.join(self.root, "_staging")
        if os.path.isdir(staging_root):
            # Sweep orphans: directories written by task attempts that
            # lost speculation races or died between write() and the
            # commit/abort fan-in. Readers never see _staging, but the
            # disk would otherwise accumulate forever. ONLY stale
            # directories are reclaimed: a non-winner dir younger than
            # STALE_STAGING_SECONDS may belong to a CONCURRENT job
            # appending to the same root (staging is shared), and
            # deleting it would unpublish that job's finished tasks.
            import time as _time

            now = _time.time()
            for d in list(os.listdir(staging_root)):
                full = os.path.join(staging_root, d)
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue  # already gone (racing cleaner)
                if d not in winners and age >= self.STALE_STAGING_SECONDS:
                    shutil.rmtree(full, ignore_errors=True)
            if not os.listdir(staging_root):
                try:
                    os.rmdir(staging_root)
                except OSError:
                    pass  # a concurrent job staged between check & rmdir

    def abort(self, messages) -> None:
        import shutil

        for m in messages:
            if m is not None:
                shutil.rmtree(m.staging, ignore_errors=True)
