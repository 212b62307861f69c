"""Training-data pipeline operators: chunking, PII scrubbing, dataset
splitting, sequence packing — the preprocessing stages between a raw
corpus and a tokenized training set (extension surface; the reference
stores pre-chunked documents, main.go:30-35, so chunking is the
missing upstream step).

Everything is codegen'd columnar expressions — at 100 TB these run
map-side with zero shuffles except packing's one ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.text import with_tokens


def chunk_documents(
    docs: DataFrame,
    size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token chunks of ``size`` with
    ``overlap`` tokens shared between neighbors (stride = size −
    overlap) — the standard context-window chunking ahead of embedding
    (the reference's per-chunk model starts AFTER this step).

    One row per (doc, chunk): ``chunk_id`` 0-based, ``chunk_text``,
    ``n_chunk_tokens`` (< size only for the final chunk).
    """
    stride = size - overlap
    toked = with_tokens(docs, text_col)
    n = F.size("_toks")
    # chunk starts: 1, 1+stride, ... — last chunk begins at the final
    # stride boundary strictly below n (ceil((n-overlap)/stride) chunks,
    # minimum 1), so every token lands in ≥1 chunk and no empty chunks
    n_chunks = F.greatest(
        F.lit(1), F.floor((n - overlap + stride - 1) / stride).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_toks"), i * stride + 1, size),
    )
    return (
        toked.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "_chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


# regexes shared with the SQL oracle — plain ASCII classes so the Java
# and RE2 dialects agree
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^ ]+"
PHONE_RE = "\\+[0-9][0-9-]{6,}[0-9]"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails, URLs, and phone-shaped tokens with typed
    placeholders — order matters (URLs may contain @)."""
    scrubbed = F.regexp_replace(F.col(text_col), URL_RE, "[URL]")
    scrubbed = F.regexp_replace(scrubbed, EMAIL_RE, "[EMAIL]")
    scrubbed = F.regexp_replace(scrubbed, PHONE_RE, "[PHONE]")
    return df.withColumn(out_col, scrubbed)


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic hash split: bucket = md5(id) mod 100 → train/val/
    test. Stable across runs, engines, and cluster sizes (no sampling
    RNG) — the property that keeps a 100 TB split reproducible and
    lets new data route consistently."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contiguous sequence packing (concat-then-chunk): documents in
    ``id_col`` order are laid end-to-end and cut into ``capacity``-token
    bins — ``bin_id = floor(start_offset / capacity)``, the standard
    packing for causal-LM training data. One ordered window (cumsum of
    token counts); integer arithmetic throughout, so deterministic.
    A doc spanning a boundary is assigned to the bin its first token
    lands in."""
    toked = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toked.withColumn("start_offset", start).withColumn(
        "bin_id", F.floor(F.col("start_offset") / capacity)
    )
