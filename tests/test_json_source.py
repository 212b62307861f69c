"""JSON wire-format interop (sources/json_docs.py): a MinIO-shaped
directory of {collection}/{uuid}_doc.json objects reads into the
canonical schema, suffix-filtered, ready for store_dataframe."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.engine import VectorEngine
from nebuia_vector_db_spark.sources.json_docs import read_json_documents


@pytest.fixture(scope="module")
def bucket(tmp_path_factory):
    root = tmp_path_factory.mktemp("minio_bucket")
    docs = {
        ("alpha", "id-1"): {
            "text": "first",
            "metadata": {"source": None, "name": "d1"},
            "chunks": [
                {
                    "text": "c11",
                    "embedding": {"vector": [1.0, 0.0]},
                    "metadata": {"source": None, "name": "d1c1"},
                    "semantic_score": 0.5,
                },
                {
                    "text": "c12",
                    "embedding": {"vector": [0.0, 1.0]},
                    "metadata": {"source": None, "name": "d1c2"},
                    "semantic_score": 0.0,
                },
            ],
        },
        ("alpha", "id-2"): {
            "text": "second",
            "metadata": {"source": "s2", "name": "d2"},
            "chunks": [
                {
                    "text": "c21",
                    "embedding": {"vector": [0.6, 0.8]},
                    "metadata": {"source": None, "name": "d2c1"},
                    "semantic_score": 0.0,
                }
            ],
        },
        ("beta", "id-3"): {
            "text": "third",
            "metadata": {"source": None, "name": "d3"},
            "chunks": [
                {
                    "text": "c31",
                    "embedding": {"vector": [1.0, 1.0]},
                    "metadata": {"source": None, "name": "d3c1"},
                    "semantic_score": 0.0,
                }
            ],
        },
    }
    for (coll, did), doc in docs.items():
        d = root / coll
        d.mkdir(exist_ok=True)
        (d / f"{did}_doc.json").write_text(json.dumps(doc))
    # non-document keys must be skipped (≙ main.go:203)
    (root / "alpha" / "manifest.json").write_text("{}")
    (root / "alpha" / "noise.txt").write_text("junk")
    return str(root)


def test_reads_layout_and_identity(spark, bucket):
    df = read_json_documents(spark, bucket)
    rows = {(r["collection"], r["doc_id"]): r for r in df.collect()}
    assert set(rows) == {("alpha", "id-1"), ("alpha", "id-2"), ("beta", "id-3")}
    r = rows[("alpha", "id-1")]
    assert r["metadata"]["name"] == "d1"
    assert [c["text"] for c in r["chunks"]] == ["c11", "c12"]
    assert r["chunks"][0]["embedding"] == [1.0, 0.0]  # {vector:[..]} unwrapped
    assert r["chunks"][0]["semantic_score"] == 0.5


def test_single_collection_prefix(spark, bucket):
    df = read_json_documents(spark, bucket, collection="beta")
    assert [r["doc_id"] for r in df.collect()] == ["id-3"]


def test_migration_into_engine(spark, bucket, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_migrated"))
    eng = VectorEngine(spark, wh, dim=2)
    eng.store_dataframe(read_json_documents(spark, bucket))
    assert eng.list_collections() == ["alpha", "beta"]
    top = eng.search("alpha", [0.6, 0.8], 1).head()
    assert top["embedding_id"] == "d2"  # cos-nearest chunk's doc name
    assert top["collection_name"] == "alpha"


def test_json_export_round_trips(spark, tmp_path_factory):
    """warehouse → reference wire layout → back: the exported
    {collection}/{uuid}_doc.json tree must re-read into the identical
    canonical rows (embeddings bit-for-bit, metadata and
    semantic_score preserved)."""
    from nebuia_vector_db_spark.engine import VectorEngine
    from nebuia_vector_db_spark.sources.json_docs import (
        read_json_documents,
        write_json_documents,
    )

    wh = str(tmp_path_factory.mktemp("wh_export"))
    out = str(tmp_path_factory.mktemp("json_export"))
    eng = VectorEngine(spark, wh, dim=3)
    for coll in ("x", "y"):
        eng.store(
            coll,
            [
                {
                    "text": f"{coll} doc {i}",
                    "metadata": {"source": '{"o": 1}', "name": f"{coll}{i}"},
                    "chunks": [
                        {
                            "text": f"c{i}.{j}",
                            "embedding": [0.1 * i, 1.0 / 3.0, float(j)],
                            "metadata": {"source": None, "name": f"{coll}{i}c{j}"},
                            "semantic_score": 0.25 * j,
                        }
                        for j in range(2)
                    ],
                }
                for i in range(3)
            ],
        )
    src = eng.documents()
    n = write_json_documents(src, out)
    assert n == 6

    back = read_json_documents(spark, out)

    def canon(df):
        return sorted(
            (
                r["collection"],
                r["text"],
                r["metadata"]["name"],
                tuple(
                    (c["text"], tuple(c["embedding"]), c["semantic_score"])
                    for c in r["chunks"]
                ),
            )
            for r in df.collect()
        )

    assert canon(back) == canon(src)


def test_registered_views_serve_full_sql(spark, sf_smoke):
    """SURVEY §2.2: the engine exposes a full SQL surface via
    register_views + spark.sql — a join + aggregate + window statement
    must run and agree with the DataFrame-API equivalent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.sources.registry import (
        load_table,
        register_views,
    )

    register_views(spark, sf_smoke)
    got = spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               rank() OVER (ORDER BY count(*) DESC, c_mktsegment) AS rk
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY rk
        """
    ).collect()
    cust = load_table(spark, sf_smoke, "customer")
    orders = load_table(spark, sf_smoke, "orders")
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .withColumn(
            "rk",
            F.rank().over(
                Window.orderBy(F.desc("n_orders"), "c_mktsegment")
            ),
        )
        .orderBy("rk")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_python_datasource_reads_layout(spark, tmp_path):
    """The Spark 4 Python Data Source over the same bucket layout:
    format('nebuia_docs') ≡ the glob reader, row for row."""
    from nebuia_vector_db_spark.engine import VectorEngine
    from nebuia_vector_db_spark.sources.datasource import NebuiaDocsDataSource
    from nebuia_vector_db_spark.sources.json_docs import (
        read_json_documents,
        write_json_documents,
    )

    wh = str(tmp_path / "wh")
    eng = VectorEngine(spark, wh, dim=4)
    for coll in ("pa", "pb"):
        eng.store(
            coll,
            [
                {
                    "text": f"{coll} doc {i}",
                    "metadata": {"source": {"k": i}, "name": f"{coll}{i}"},
                    "chunks": [
                        {
                            "text": f"c{i}",
                            "embedding": [float(i), 0.0, 1.0, 0.5],
                            "metadata": {"source": None, "name": f"{coll}{i}c"},
                            "semantic_score": 0.25,
                        }
                    ],
                }
                for i in range(3)
            ],
        )
    root = str(tmp_path / "bucket")
    assert write_json_documents(eng.documents(), root) == 6

    spark.dataSource.register(NebuiaDocsDataSource)
    via_ds = spark.read.format("nebuia_docs").option("path", root).load()
    via_glob = read_json_documents(spark, root)
    a = {tuple(map(str, r)) for r in via_ds.collect()}
    b = {tuple(map(str, r)) for r in via_glob.collect()}
    assert a == b and len(a) == 6

    got = via_ds.where(F.col("collection") == "pa")
    assert got.count() == 3
    assert {r["collection"] for r in got.collect()} == {"pa"}


def test_python_datasource_pushdown_prunes_partitions(tmp_path):
    """Planner-level check without Spark: collection filters reach
    pushFilters and drop dead prefixes before any listing."""
    import os

    from pyspark.sql.datasource import EqualTo, In
    from nebuia_vector_db_spark.sources.datasource import NebuiaDocsReader

    root = str(tmp_path)
    for c in ("a", "b", "c"):
        os.makedirs(os.path.join(root, c))

    r = NebuiaDocsReader(root)
    assert [p.collection for p in r.partitions()] == ["a", "b", "c"]

    r = NebuiaDocsReader(root)
    assert r.pushFilters([EqualTo(("collection",), "b")]) == []
    assert [p.collection for p in r.partitions()] == ["b"]

    r = NebuiaDocsReader(root)
    leftover = r.pushFilters(
        [In(("collection",), ("a", "c")), EqualTo(("text",), "x")]
    )
    assert len(leftover) == 1  # non-collection filter handed back
    assert [p.collection for p in r.partitions()] == ["a", "c"]


def test_datasource_writer_round_trip_and_two_phase_commit(
    spark, tmp_path
):
    """Round 10: the write half of the Python Data Source — a real
    two-phase commit (task-private staging, driver-side atomic
    publish). Write → read back through the same format: documents,
    metadata and embeddings (bit-for-bit doubles) survive; append
    adds, overwrite replaces; no staging residue after commit."""
    import os

    from nebuia_vector_db_spark.schemas import DOCUMENT_SCHEMA
    from nebuia_vector_db_spark.sources.datasource import (
        NebuiaDocsDataSource,
    )

    spark.dataSource.register(NebuiaDocsDataSource)
    root = str(tmp_path / "bucket")
    os.makedirs(root)

    def mkrows(prefix, n, coll):
        return [
            {
                "collection": coll,
                "doc_id": f"{prefix}{i}",
                "text": f"text {i}",
                "metadata": {"source": '{"origin":"t"}', "name": f"n{i}"},
                "chunks": [
                    {
                        "text": f"c{i}",
                        "embedding": [0.1 + i, 1e-17, -3.25],
                        "metadata": {"source": None, "name": f"c{i}"},
                        "semantic_score": 0.5,
                    }
                ],
            }
            for i in range(n)
        ]

    df = spark.createDataFrame(mkrows("a", 3, "alpha"), DOCUMENT_SCHEMA)
    df.write.format("nebuia_docs").option("path", root).mode(
        "append"
    ).save()
    assert sorted(os.listdir(os.path.join(root, "alpha"))) == [
        f"a{i}_doc.json" for i in range(3)
    ]
    assert not os.path.exists(os.path.join(root, "_staging"))

    back = (
        spark.read.format("nebuia_docs").option("path", root).load()
    ).collect()
    assert len(back) == 3
    by_id = {r["doc_id"]: r for r in back}
    assert by_id["a1"]["text"] == "text 1"
    assert by_id["a1"]["metadata"]["source"] == '{"origin":"t"}'
    # doubles survive the JSON trip bit-for-bit
    assert by_id["a2"]["chunks"][0]["embedding"] == [2.1, 1e-17, -3.25]

    # append: second write adds a second collection without touching
    # the first
    spark.createDataFrame(mkrows("b", 2, "beta"), DOCUMENT_SCHEMA).write.format(
        "nebuia_docs"
    ).option("path", root).mode("append").save()
    got = (
        spark.read.format("nebuia_docs").option("path", root).load()
    )
    assert got.count() == 5

    # overwrite: replaces every existing *_doc.json
    spark.createDataFrame(mkrows("c", 1, "gamma"), DOCUMENT_SCHEMA).write.format(
        "nebuia_docs"
    ).option("path", root).mode("overwrite").save()
    left = (
        spark.read.format("nebuia_docs").option("path", root).load()
    ).collect()
    assert [r["doc_id"] for r in left] == ["c0"]

    # missing doc_id → minted UUID (O-11 parity)
    rows = mkrows("d", 1, "delta")
    rows[0]["doc_id"] = None
    spark.createDataFrame(rows, DOCUMENT_SCHEMA).write.format(
        "nebuia_docs"
    ).option("path", root).mode("append").save()
    minted = [
        f for f in os.listdir(os.path.join(root, "delta"))
        if f.endswith("_doc.json")
    ]
    assert len(minted) == 1 and len(minted[0]) > len("_doc.json") + 10


def test_datasource_writer_advice_edges(spark, tmp_path):
    """r10 ADVICE closures: (a) overwrite-writing into a root that
    does not exist yet (zero tasks → no staging, no root) must not
    raise; (b) orphan staging directories left by task attempts whose
    messages never reached commit()/abort() are swept by the next
    successful commit."""
    import os

    from nebuia_vector_db_spark.schemas import DOCUMENT_SCHEMA
    from nebuia_vector_db_spark.sources.datasource import (
        NebuiaDocsDataSource,
    )

    spark.dataSource.register(NebuiaDocsDataSource)
    root = str(tmp_path / "fresh")  # never created
    empty = spark.createDataFrame([], DOCUMENT_SCHEMA).repartition(1)
    empty.where("1=0").write.format("nebuia_docs").option(
        "path", root
    ).mode("overwrite").save()
    assert os.path.isdir(root)

    # plant a STALE orphan (a dead speculated attempt's staging dir,
    # backdated past the concurrent-writer guard) and a FRESH one
    # (simulating a concurrent job's in-flight staging — must survive)
    import time

    orphan = os.path.join(root, "_staging", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("x")
    old = time.time() - 2 * 24 * 3600
    os.utime(orphan, (old, old))
    fresh = os.path.join(root, "_staging", "cafebabe")
    os.makedirs(fresh)
    with open(os.path.join(fresh, "inflight"), "w") as fh:
        fh.write("y")
    row = {
        "collection": "alpha",
        "doc_id": "a0",
        "text": "t",
        "metadata": {"source": None, "name": "n"},
        "chunks": [],
    }
    spark.createDataFrame([row], DOCUMENT_SCHEMA).write.format(
        "nebuia_docs"
    ).option("path", root).mode("append").save()
    # stale orphan swept, fresh (concurrent-job) dir untouched, the
    # real doc published
    assert not os.path.exists(orphan)
    assert os.path.exists(os.path.join(fresh, "inflight"))
    assert os.path.exists(
        os.path.join(root, "alpha", "a0_doc.json")
    )
