"""sources/webdataset.py — tar-shard sink/source.

The oracle row (pipe_webdataset_roundtrip) hash-certifies the export →
re-read loop against the source table; these tests pin the byte-level
guarantees that hash can't see from one run: determinism across runs,
stdlib-tar interoperability, atomic staging, NULL members, duplicate
keys, and validation.
"""

import hashlib
import io
import os
import tarfile

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors.exceptions.captured import PythonException
from pyspark.sql import functions as F

from nebuia_vector_db_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def _docs(spark, sf_smoke):
    return (
        spark.read.parquet(os.path.join(sf_smoke, "documents.parquet"))
        .withColumn("_json", F.to_json(F.struct("lang", "source")))
    )


def test_roundtrip_and_grouping(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    out = str(tmp_path / "wds")
    man = write_webdataset(
        docs, out, key_col="doc_id",
        members={"txt": "text", "json": "_json"}, num_shards=4,
    ).collect()
    n = docs.count()
    assert sum(r.n_samples for r in man) == n
    assert sum(r.n_members for r in man) == 2 * n
    back = read_webdataset(spark, out)
    got = {
        r.key: r.m
        for r in back.where(F.col("ext") == "txt")
        .select("key", F.md5("content").alias("m"))
        .collect()
    }
    want = {
        str(r.doc_id): r.m
        for r in docs.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("m")
        ).collect()
    }
    assert got == want


def test_shards_byte_deterministic(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    sums = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        write_webdataset(
            docs, out, key_col="doc_id",
            members={"txt": "text", "json": "_json"}, num_shards=3,
        ).collect()
        sums.append(
            {
                f: hashlib.md5(
                    open(os.path.join(out, f), "rb").read()
                ).hexdigest()
                for f in sorted(os.listdir(out))
            }
        )
    assert sums[0] == sums[1]
    assert all(f.startswith("shard-") and f.endswith(".tar") for f in sums[0])


def test_plain_stdlib_tar_interop(spark, sf_smoke, tmp_path):
    """A vanilla tarfile consumer (≙ any WebDataset loader) must see
    sorted member names and correct sizes — no PAX records."""
    docs = _docs(spark, sf_smoke).limit(20)
    out = str(tmp_path / "wds")
    write_webdataset(
        docs, out, key_col="doc_id",
        members={"txt": "text", "json": "_json"}, num_shards=1,
    ).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = tar.getnames()
        assert names == sorted(names)
        keys = {n.rsplit(".", 1)[0] for n in names}
        assert all(
            {f"{k}.txt", f"{k}.json"} <= set(names) for k in keys
        )
        info = tar.getmember(names[0])
        assert info.mtime == 0 and info.uid == 0 and info.mode == 0o644
        data = tar.extractfile(names[0]).read()
        assert len(data) == info.size


def test_null_members_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "hello", b"\x01"), ("k2", None, b"\x02"), ("k3", "x", None)],
        "k string, t string, b binary",
    )
    out = str(tmp_path / "wds")
    man = write_webdataset(
        df, out, key_col="k", members={"txt": "t", "bin": "b"}, num_shards=1
    ).collect()
    assert man[0].n_samples == 3 and man[0].n_members == 4
    back = read_webdataset(spark, out)
    rows = {(r.key, r.ext) for r in back.collect()}
    assert rows == {("k1", "txt"), ("k1", "bin"), ("k2", "bin"), ("k3", "txt")}
    # binary member round-trips raw bytes
    blob = {
        r.key: bytes(r.content)
        for r in back.where(F.col("ext") == "bin").collect()
    }
    assert blob == {"k1": b"\x01", "k2": b"\x02"}


def test_duplicate_keys_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [("k", "a"), ("k", "b")], "k string, t string"
    )
    with pytest.raises(
        (PythonException, Py4JJavaError), match="duplicate sample key"
    ):
        write_webdataset(
            df, str(tmp_path / "wds"), key_col="k",
            members={"txt": "t"}, num_shards=1,
        ).collect()


def test_validation(spark, tmp_path):
    df = spark.createDataFrame([("k", "a")], "k string, t string")
    with pytest.raises(ValueError, match="at least one"):
        write_webdataset(df, str(tmp_path / "w1"), "k", {}, 1)
    with pytest.raises(ValueError, match="num_shards"):
        write_webdataset(df, str(tmp_path / "w2"), "k", {"txt": "t"}, 0)
    with pytest.raises(ValueError, match="bare suffix"):
        write_webdataset(df, str(tmp_path / "w3"), "k", {"a.b": "t"}, 1)


def test_no_tmp_staging_left_behind(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke).limit(10)
    out = str(tmp_path / "wds")
    write_webdataset(
        docs, out, key_col="doc_id", members={"txt": "text"}, num_shards=2
    ).collect()
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
