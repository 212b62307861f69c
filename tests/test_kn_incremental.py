"""Incrementally-maintained Kneser-Ney training state
(operators/incremental.py::NgramCountIndex, round 15 — the sixth
incremental artifact): ledger fold ≡ from-scratch train_kn_lm across
insert/delete/update commits, per-lane replay idempotence (including
the half-committed-version heal), atomic fold-compaction via
SnapshotTable.overwrite, and the param guard. The
`text_lm_kn_incremental[_stream]` registry rows additionally
hash-certify ingest → fold → score against a DuckDB replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.incremental import (
    NgramCountIndex,
    release_cached_relations,
    stream_kn_ingest,
)
from nebuia_vector_db_spark.operators.lm import train_kn_lm
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t, 1) for i, t in rows], "doc_id long, text string, ver long"
    )


_ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a quick brown fox jumps over the lazy dog"),
    (4, "the cat and the dog sat together"),
    (5, "brown fox brown fox brown fox"),
    (6, "one two three four five"),
    (7, "the mat was sat on by the cat"),
    (8, "lazy dog sleeps on the mat"),
]


def _model_sig(lm):
    """Everything a KneserNeyLM is, as comparable plain data."""
    big = sorted(tuple(r) for r in lm.big.collect())
    ctx = sorted(tuple(r) for r in lm.ctx.collect())
    cont = sorted(tuple(r) for r in lm.cont.collect())
    return big, ctx, cont, lm.total_bigrams, lm.vocab_size


def _churn(tbl, docs):
    """v2 insert evens, v3 delete doc_id in (1, 5), v4 update doc 4."""
    tbl.append(docs.where(F.col("doc_id") % 2 == 0))
    tbl.delete_where(F.col("doc_id").isin(1, 5))
    tbl.upsert(
        docs.where(F.col("doc_id") == 4).select(
            "doc_id",
            F.concat("text", F.lit(" with a fresh update")).alias("text"),
            F.lit(2).cast("long").alias("ver"),
        ),
        ["doc_id"],
        "ver",
    )


def test_kn_ledger_fold_equals_from_scratch(spark, tmp_path):
    """The defining contract: after insert, delete and UPDATE
    commits, lm() is bit-identical (relations and scalars) to a
    from-scratch train_kn_lm over the post-churn corpus — deletes
    subtract exactly what the doc's insert once added, the upsert's
    CDF delete row carries the OLD text."""
    docs = _corpus(spark, _ROWS)
    base = docs.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path)
    try:
        tbl = SnapshotTable.create(spark, root + "/corpus", base)
        idx = NgramCountIndex.create(spark, root + "/index", corpus=base)
        v0 = tbl.current_version()
        _churn(tbl, docs)
        for v in range(v0 + 1, tbl.current_version() + 1):
            idx.ingest_commit(tbl, v)
        want = _model_sig(train_kn_lm(tbl.read()))
        got = _model_sig(idx.lm())
        assert got == want
        # min_count pruning is fold-time semantics on the same ledger
        assert _model_sig(idx.lm(min_count=2)) == _model_sig(
            train_kn_lm(tbl.read(), min_count=2)
        )
    finally:
        release_cached_relations()


def test_kn_replay_and_partial_commit_heal(spark, tmp_path):
    """Per-lane exactly-once without a coordination channel: a full
    replay of an already-committed version is a no-op, and a replay
    after only the BIG lane committed re-appends exactly the missing
    UNI lane."""
    from nebuia_vector_db_spark.streaming.sinks import (
        transactional_append,
    )

    docs = _corpus(spark, _ROWS)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    root = str(tmp_path)
    try:
        tbl = SnapshotTable.create(spark, root + "/corpus", base)
        idx = NgramCountIndex.create(spark, root + "/index", corpus=base)
        tbl.append(delta)
        v = tbl.current_version()
        slice_v = tbl.changes(v - 1, v)
        # crash after the big lane committed, before the uni lane:
        transactional_append(
            spark, idx.big.path, idx._big_rows(delta), v, "lane:big"
        )
        idx.ingest_feed(slice_v, txn=("lane", v))  # the healing replay
        want = _model_sig(train_kn_lm(tbl.read()))
        assert _model_sig(idx.lm()) == want
        # full replay of the committed version: both lanes decline
        idx.ingest_feed(slice_v, txn=("lane", v))
        release_cached_relations()
        assert _model_sig(idx.lm()) == want
    finally:
        release_cached_relations()


def test_kn_compact_folds_atomically(spark, tmp_path):
    """compact() folds each ledger's history in ONE overwrite commit
    (version advances by exactly 1, readers can never observe an
    empty intermediate) and preserves the folded model; pre-compact
    versions stay time-travelable."""
    docs = _corpus(spark, _ROWS)
    base = docs.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path)
    try:
        tbl = SnapshotTable.create(spark, root + "/corpus", base)
        idx = NgramCountIndex.create(spark, root + "/index", corpus=base)
        v0 = tbl.current_version()
        _churn(tbl, docs)
        for v in range(v0 + 1, tbl.current_version() + 1):
            idx.ingest_commit(tbl, v)
        want = _model_sig(idx.lm())
        release_cached_relations()
        pre_big, pre_uni = (
            idx.big.current_version(),
            idx.uni.current_version(),
        )
        pre_rows = idx.big.read().count()
        idx.compact()
        assert idx.big.current_version() == pre_big + 1
        assert idx.uni.current_version() == pre_uni + 1
        assert _model_sig(idx.lm()) == want
        # folded: one row per live type, negatives gone
        assert idx.big.read().count() < pre_rows
        assert idx.big.read().where(F.col("c") <= 0).count() == 0
        # time travel across the overwrite
        assert idx.big.read(pre_big).count() == pre_rows
    finally:
        release_cached_relations()


def test_kn_stream_builds_state_from_feed(spark, tmp_path):
    """The streaming driver builds the WHOLE ledger state from the
    change feed (startVersion=0 delivers the CREATE commit): an
    empty-created index ends bit-identical to from-scratch training,
    and a second run of the drained stream changes nothing."""
    docs = _corpus(spark, _ROWS)
    base = docs.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path)
    try:
        tbl = SnapshotTable.create(spark, root + "/corpus", base)
        _churn(tbl, docs)
        idx = NgramCountIndex.create(spark, root + "/index")
        stream_kn_ingest(
            spark, root + "/corpus", idx, root + "/ck", app="kn"
        ).awaitTermination()
        want = _model_sig(train_kn_lm(tbl.read()))
        assert _model_sig(idx.lm()) == want
        release_cached_relations()
        # a recovery replay from a FRESH checkpoint redelivers every
        # version; the stable app lane declines them all
        stream_kn_ingest(
            spark, root + "/corpus", idx, root + "/ck2", app="kn"
        ).awaitTermination()
        assert _model_sig(idx.lm()) == want
    finally:
        release_cached_relations()


def test_kn_param_guard(spark, tmp_path):
    docs = _corpus(spark, _ROWS)
    root = str(tmp_path)
    NgramCountIndex.create(spark, root + "/index", corpus=docs)
    with pytest.raises(ValueError, match="mismatched tokenization"):
        NgramCountIndex(spark, root + "/index", text_col="body")


def test_grouped_ledger_fold_equals_grouped_retrain(spark, tmp_path):
    """group_col generalization (the multilingual capstone): after
    language-blind insert/delete/update commits, lm() folds to the
    KneserNeyGroupedLM family a from-scratch train_kn_lm_grouped over
    the post-churn corpus would produce — relations, per-group bv
    rows and the family-wide type count all equal."""
    from nebuia_vector_db_spark.operators.lm import train_kn_lm_grouped

    rows = [
        (i, t, g)
        for i, (i0, t) in enumerate(_ROWS, start=1)
        for g in ([("en" if i0 % 3 else "de")])
    ]
    docs = spark.createDataFrame(
        [(i, t, g, 1) for (i, t, g) in rows],
        "doc_id long, text string, lang string, ver long",
    )
    base = docs.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path)
    try:
        tbl = SnapshotTable.create(spark, root + "/corpus", base)
        idx = NgramCountIndex.create(
            spark, root + "/index", corpus=base, group_col="lang"
        )
        v0 = tbl.current_version()
        tbl.append(docs.where(F.col("doc_id") % 2 == 0))
        tbl.delete_where(F.col("doc_id").isin(1, 5))
        tbl.upsert(
            docs.where(F.col("doc_id") == 4).select(
                "doc_id",
                F.concat("text", F.lit(" fresh update")).alias("text"),
                "lang",
                F.lit(2).cast("long").alias("ver"),
            ),
            ["doc_id"],
            "ver",
        )
        for v in range(v0 + 1, tbl.current_version() + 1):
            idx.ingest_commit(tbl, v)
        want = train_kn_lm_grouped(tbl.read())
        got = idx.lm()
        assert got.group_col == "lang"
        assert got.total_types == want.total_types
        for rel in ("big", "ctx", "cont", "bv"):
            w = sorted(tuple(r) for r in getattr(want, rel).collect())
            have = sorted(tuple(r) for r in getattr(got, rel).collect())
            assert have == w, rel
        # param guard covers the grouping too
        with pytest.raises(ValueError, match="mismatched tokenization"):
            NgramCountIndex(spark, root + "/index")
    finally:
        release_cached_relations()
