"""Streaming vector scoring (streaming/vectors.py): AvailableNow
replays must match the batch engine exactly."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import dot, normalize_query
from nebuia_vector_db_spark.streaming.vectors import (
    semantic_filter_stream,
    topk_stream_foreach_batch,
)


def _write_vectors(spark, path, n=60, d=8, seed=9):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(r) for r in mat]}
    )
    df = spark.createDataFrame(pdf)
    df.write.mode("overwrite").parquet(path)
    return df.schema, mat


def test_semantic_filter_stream_matches_batch(spark, tmp_path):
    path = str(tmp_path / "vecs")
    schema, mat = _write_vectors(spark, path)
    queries = {"qa": mat[3].tolist(), "qb": mat[17].tolist()}

    stream = spark.readStream.schema(schema).parquet(path)
    out = semantic_filter_stream(stream, queries, threshold=0.6)
    q = (
        out.writeStream.format("memory")
        .queryName("sem_matches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["vec_id"], r["query_name"])
        for r in spark.table("sem_matches").collect()
    }

    batch = spark.read.parquet(path)
    want = set()
    for name, qv in queries.items():
        sims = mat @ (np.asarray(qv) / np.linalg.norm(qv))
        want |= {(int(i), name) for i in np.where(sims >= 0.6)[0]}
    assert got == want
    assert (3, "qa") in got and (17, "qb") in got  # self-matches


def test_topk_foreach_batch_compacts_to_exact_topk(spark, tmp_path):
    path = str(tmp_path / "vecs2")
    schema, mat = _write_vectors(spark, path, seed=11)
    qv = mat[5].tolist()

    batches = []
    q = topk_stream_foreach_batch(
        spark.readStream.schema(schema).parquet(path),
        qv,
        5,
        sink=lambda df, bid: batches.append(df.collect()),
        tie_cols=["vec_id"],
    )
    q.awaitTermination()

    # compact: global top-5 over the per-batch top-5s == batch top-5
    rows = [r for b in batches for r in b]
    got = sorted(rows, key=lambda r: (-r["similarity"], r["vec_id"]))[:5]
    batch_df = spark.read.parquet(path)
    want = (
        batch_df.withColumn("similarity", dot(F.col("embedding"), normalize_query(qv)))
        .orderBy(F.desc("similarity"), "vec_id")
        .limit(5)
        .collect()
    )
    assert [(r["vec_id"], round(r["similarity"], 9)) for r in got] == [
        (r["vec_id"], round(r["similarity"], 9)) for r in want
    ]


def test_ivf_ingest_stream_matches_batch_append(spark, tmp_path):
    """Streamed vector ingest (2 micro-batches) into the snapshot
    index ≡ one batch append through the same centroids; replaying
    the whole stream appends nothing (exactly-once)."""
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.operators.ann import (
        assign_to_cells,
        build_ivf_index,
        load_ivf_index_snapshot,
        save_ivf_index_snapshot,
    )
    from nebuia_vector_db_spark.sources.registry import load_table
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable
    from nebuia_vector_db_spark.streaming.vectors import ivf_ingest_stream

    import os

    emb = load_table(
        spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"),
        "embeddings",
    ).cache()
    part_a = emb.where(F.col("vec_id") % 4 != 0)
    part_b = emb.where(F.col("vec_id") % 4 == 0)

    base = build_ivf_index(part_a, n_cells=4)
    path = str(tmp_path / "idx")
    save_ivf_index_snapshot(base, path)

    src = str(tmp_path / "stream_src")
    part_b.repartition(2).write.parquet(src)
    for i in range(2):  # second pass = full at-least-once replay
        stream = (
            spark.readStream.schema(part_b.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = ivf_ingest_stream(stream, path, str(tmp_path / f"ck{i}"), app_id="ivf-w1")
        q.awaitTermination()

    idx = load_ivf_index_snapshot(spark, path)
    assert idx.assigned.count() == emb.count(), "replay must not re-append"
    want = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in assign_to_cells(emb, base.centroids)
        .select("vec_id", "ivf_cell")
        .collect()
    )
    got = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in idx.assigned.select("vec_id", "ivf_cell").collect()
    )
    assert got == want
    # centroid matrix survived every commit
    tbl = SnapshotTable(spark, path)
    assert (idx.centroids == base.centroids).all()
    assert tbl.meta("stream_watermarks")["ivf-w1"] is not None
