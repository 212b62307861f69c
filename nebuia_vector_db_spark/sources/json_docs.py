"""Reference wire-format JSON interop (SURVEY.md §2.1 O-2/O-3/O-4).

The reference stores one JSON object per document at the MinIO key
``{collection}/{uuid}_doc.json`` (main.go:334-342) and reads them back
with a prefix list + suffix filter + per-object GET/decode
(main.go:186-229, 277-292). This module reads that exact layout into
the canonical DOCUMENT_SCHEMA:

- prefix list        ≙ directory scan of ``root/{collection}/``
- ``*_doc.json`` cut ≙ ``pathGlobFilter`` (pushed to the file index —
  non-document keys are never opened, same as main.go:203)
- GET + JSON decode  ≙ schema'd ``spark.read.json`` (explicit schema,
  no inference — zero-value semantics stay deterministic, SURVEY §1.3)
- key → identity     ≙ collection/doc_id parsed from the file path

Use this to migrate a live deployment's bucket into the Parquet
warehouse: ``engine.store_dataframe(read_json_documents(spark, root))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nebuia_vector_db_spark.schemas import DOCUMENT_JSON_SCHEMA


def write_json_documents(df: DataFrame, root: str) -> int:
    """Export canonical DOCUMENT_SCHEMA rows back to the reference's
    ``{collection}/{uuid}_doc.json`` layout (main.go:334-342),
    re-wrapping embeddings as ``{vector: [...]}`` — the inverse of
    :func:`read_json_documents`, so a migration can round-trip and a
    reference deployment can be rehydrated from the warehouse.

    The JSON payload is built JVM-side (``to_json``); executors write
    one file per document from ``foreachPartition``-style imperative IO
    (the custom-sink escape hatch — ≙ the reference's per-object
    PutObject, main.go:340-342; against object storage substitute the
    store's SDK in ``_write``). Jackson prints shortest-round-trip
    doubles, so embeddings survive the trip bit-for-bit. Returns the
    number of documents written."""
    payload = F.to_json(
        F.struct(
            F.col("text"),
            F.col("metadata"),
            F.transform(
                "chunks",
                lambda c: F.struct(
                    c["text"].alias("text"),
                    F.struct(c["embedding"].alias("vector")).alias(
                        "embedding"
                    ),
                    c["metadata"].alias("metadata"),
                    c["semantic_score"].alias("semantic_score"),
                ),
            ).alias("chunks"),
        )
    )
    rows = df.select("collection", "doc_id", payload.alias("js"))

    def _write(it):
        import os

        n = 0
        for r in it:
            d = os.path.join(root, r["collection"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r['doc_id']}_doc.json"), "w") as fh:
                fh.write(r["js"])
            n += 1
        yield n

    return sum(rows.rdd.mapPartitions(_write).collect())


def read_json_documents(
    spark: SparkSession, root: str, collection: str | None = None
) -> DataFrame:
    """Read a ``{root}/{collection}/{uuid}_doc.json`` tree into
    DOCUMENT_SCHEMA shape. ``collection=None`` reads every collection
    (the multi-prefix case); the reference's ``{vector: [...]}``
    embedding wrapper is unwrapped to a plain array."""
    path = f"{root}/{collection}" if collection is not None else f"{root}/*"
    raw = (
        spark.read.schema(DOCUMENT_JSON_SCHEMA)
        .option("pathGlobFilter", "*_doc.json")  # ≙ main.go:203
        .json(path)
        .withColumn("_path", F.input_file_name())
    )
    # key {collection}/{uuid}_doc.json → (collection, doc_id), main.go:334
    key = F.regexp_extract("_path", r"([^/]+)/([^/]+)_doc\.json$", 0)
    return raw.select(
        F.regexp_extract(key, r"^([^/]+)/", 1).alias("collection"),
        F.regexp_extract(key, r"/([^/]+)_doc\.json$", 1).alias("doc_id"),
        "text",
        "metadata",
        F.transform(
            "chunks",
            lambda c: F.struct(
                c["text"].alias("text"),
                c["embedding"]["vector"].alias("embedding"),
                c["metadata"].alias("metadata"),
                c["semantic_score"].alias("semantic_score"),
            ),
        ).alias("chunks"),
    )
