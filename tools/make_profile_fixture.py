"""Build a PROFILING-ONLY scaled fixture from sf0.1 (VERDICT r15 task
#7): the sf0.1 tables are single-row-group single-file parquet, so
every headline query is dispatch-floor-bound and 8 cores beat 32 —
the wrong regime to rank 100 TB optimizations in. This tool writes a
deterministic REPLICA×10 fixture (facts only; dims untouched) as
multi-file tables so scans actually parallelize:

- lineitem + orders: orderkey-offset replicas (joins preserved,
  custkey/partkey/suppkey stay in the base dim ranges)
- events: user_id/event_id-offset replicas, ts shifted +i seconds
  (per-user session structure preserved)
- documents: doc_id-offset replicas; replicas i>0 append 8
  replica-unique tokens so cross-replica 3-gram Jaccard lands ~0.57,
  far below the 0.8 dedup threshold — per-replica dup structure is
  preserved, no cross-replica pair explosion; n_chars recomputed
- embeddings: replica 0 verbatim (query parameters _qvec fetches stay
  identical); replicas i>0 are fresh seeded Gaussians with copied
  labels (cloned vectors would multiply near-dup pairs 100×)

NOT part of the driver contract; nothing reads this unless
$SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python tools/make_profile_fixture.py [src_dir] [dst_dir] [k]
Defaults: /root/testdata/sf0.1 /tmp/sfprof1 10
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq

DIMS = ["region", "nation", "customer", "supplier", "part"]


def _write_sharded(table: pa.Table, out_dir: str, n_files: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        sl = table.slice(i * per, per)
        if sl.num_rows == 0:
            break
        papq.write_table(
            sl, os.path.join(out_dir, f"part-{i:04d}.parquet")
        )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprof1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    for t in DIMS:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )

    orders = papq.read_table(os.path.join(src, "orders.parquet"))
    lineitem = papq.read_table(os.path.join(src, "lineitem.parquet"))
    okey_span = int(pc.max(orders.column("o_orderkey")).as_py()) + 1
    reps = []
    for i in range(k):
        reps.append(
            orders.set_column(
                orders.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                pc.add(orders.column("o_orderkey"), i * okey_span),
            )
        )
    _write_sharded(pa.concat_tables(reps), os.path.join(dst, "orders.parquet"), 8)
    reps = []
    for i in range(k):
        reps.append(
            lineitem.set_column(
                lineitem.schema.get_field_index("l_orderkey"),
                "l_orderkey",
                pc.add(lineitem.column("l_orderkey"), i * okey_span),
            )
        )
    _write_sharded(
        pa.concat_tables(reps), os.path.join(dst, "lineitem.parquet"), 32
    )

    events = papq.read_table(os.path.join(src, "events.parquet"))
    uid_span = int(pc.max(events.column("user_id")).as_py()) + 1
    eid_span = int(pc.max(events.column("event_id")).as_py()) + 1
    reps = []
    for i in range(k):
        r = events.set_column(
            events.schema.get_field_index("user_id"),
            "user_id",
            pc.add(events.column("user_id"), i * uid_span),
        )
        r = r.set_column(
            r.schema.get_field_index("event_id"),
            "event_id",
            pc.add(r.column("event_id"), i * eid_span),
        )
        ts = r.column("ts").cast(pa.int64())
        ts = pc.add(ts, i * 1_000_000).cast(pa.timestamp("us"))
        r = r.set_column(r.schema.get_field_index("ts"), "ts", ts)
        reps.append(r)
    _write_sharded(
        pa.concat_tables(reps), os.path.join(dst, "events.parquet"), 16
    )

    docs = papq.read_table(os.path.join(src, "documents.parquet"))
    did_span = int(pc.max(docs.column("doc_id")).as_py()) + 1
    reps = []
    for i in range(k):
        r = docs.set_column(
            docs.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(docs.column("doc_id"), i * did_span),
        )
        if i > 0:
            suffix = "".join(f" zz{i}{c}" for c in "abcdefgh")
            text = pc.binary_join_element_wise(
                r.column("text").cast(pa.string()), pa.scalar(suffix), ""
            )
            r = r.set_column(
                r.schema.get_field_index("text"), "text", text
            )
        r = r.set_column(
            r.schema.get_field_index("n_chars"),
            "n_chars",
            pc.utf8_length(r.column("text")).cast(pa.int64()),
        )
        reps.append(r)
    _write_sharded(
        pa.concat_tables(reps), os.path.join(dst, "documents.parquet"), 8
    )

    emb = papq.read_table(os.path.join(src, "embeddings.parquet"))
    vid_span = int(pc.max(emb.column("vec_id")).as_py()) + 1
    d = len(emb.column("embedding")[0])
    reps = [emb]
    for i in range(1, k):
        rng = np.random.default_rng(7000 + i)
        mat = rng.normal(size=(emb.num_rows, d)).astype(np.float32)
        reps.append(
            pa.table(
                {
                    "vec_id": pc.add(emb.column("vec_id"), i * vid_span),
                    "embedding": pa.array(
                        list(mat), type=pa.list_(pa.float32())
                    ),
                    "label": emb.column("label"),
                }
            )
        )
    _write_sharded(
        pa.concat_tables(reps), os.path.join(dst, "embeddings.parquet"), 8
    )
    print(f"profiling fixture written to {dst} (x{k} facts)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
