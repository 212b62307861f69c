"""Incremental cross-snapshot MinHash dedup (operators/incremental.py,
round 12 — VERDICT r11 task #4): incremental ≡ from-scratch on the
real corpus, multi-commit ingest, delete hygiene, and the sketch-
parameter guard. The `dedup_incremental` registry row additionally
hash-certifies the composition against a DuckDB replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.dedup import minhash_lsh_pairs
from nebuia_vector_db_spark.operators.incremental import (
    MinhashBandIndex,
    release_cached_relations,
)
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
        for r in df.collect()
    }


def test_incremental_equals_from_scratch(spark, sf_oracle, tmp_path):
    """ingest(delta) must equal full-corpus minhash_lsh_pairs
    restricted to pairs touching the delta — the module's defining
    contract, on the real corpus (both cross-commit and within-delta
    pairs exist at sf0.01)."""
    docs = _docs(spark, sf_oracle)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "corpus"), base)
    idx = MinhashBandIndex.create(
        spark, str(tmp_path / "idx"), corpus=base
    )
    corpus.append(delta)
    got = _pairs_set(idx.ingest_commit(corpus))
    want_full = minhash_lsh_pairs(docs, threshold=0.8)
    want = {
        t
        for t in _pairs_set(want_full)
        if t[0] % 2 == 0 or t[1] % 2 == 0
    }
    release_cached_relations()
    assert got == want and got
    # both candidate paths actually fired on this corpus
    assert any(a % 2 == 0 and b % 2 == 0 for a, b, _ in got)  # delta×delta
    assert any((a % 2 == 0) != (b % 2 == 0) for a, b, _ in got)  # cross


def test_multi_commit_ingest_tracks_churn(spark, tmp_path):
    """Three commits: each ingest pairs ONLY against its own delta,
    the index accumulates, and a duplicate planted two commits apart
    is still found (the index remembers the whole history)."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words about spark shuffles and parquet files"
    t3 = "a third unrelated document mentioning watermarks and state stores"
    base = mk([(1, t1), (2, t2)])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    # commit 2: no dups
    corpus.append(mk([(3, t3)]))
    assert _pairs_set(idx.ingest_commit(corpus)) == set()
    # commit 3: dup of doc 1 (two commits back) + dups within the
    # delta; 11/12 are also near-dups of doc 3 (one commit back) at
    # jaccard 8/9 — the index must catch BOTH history depths
    corpus.append(mk([(10, t1), (11, t3 + " x"), (12, t3 + " x")]))
    got = _pairs_set(idx.ingest_commit(corpus))
    release_cached_relations()
    assert {(a, b) for a, b, _ in got} == {
        (1, 10), (3, 11), (3, 12), (11, 12)
    }
    # the index holds bands for every doc ingested so far
    assert (
        idx.tbl.read().select("_id").distinct().count() == 6
    )


def test_deleted_partner_never_pairs(spark, tmp_path):
    """A doc deleted from the corpus leaves stale bands, but the
    verify join against the CURRENT snapshot drops its pairs; after
    retract() the stale bands are gone too."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "one two three four five six seven eight nine ten eleven twelve"
    base = mk([(1, t1), (2, "unrelated content entirely " * 3)])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    corpus.delete_where("doc_id = 1")
    corpus.append(mk([(9, t1)]))  # duplicate of the DELETED doc
    got = _pairs_set(idx.ingest_commit(corpus))
    release_cached_relations()
    assert got == set()  # partner no longer in the corpus
    assert idx.tbl.read().where("_id = 1").count() > 0  # stale bands
    idx.retract([1])
    assert idx.tbl.read().where("_id = 1").count() == 0


def test_mismatched_params_raise_on_reopen(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    with pytest.raises(ValueError, match="sketch parameters"):
        MinhashBandIndex(spark, str(tmp_path / "i"), bands=16)
    # matching params reopen fine
    MinhashBandIndex(spark, str(tmp_path / "i"))
    release_cached_relations()


def test_ingest_plan_shape(spark, sf_oracle, tmp_path):
    """Pin the live ingest plan's scale properties (the registry row
    collects through a scratch-table lifecycle, so PLANS.md can't see
    it): the verify pipeline joins candidate-bounded relations, the
    delta fingerprint relation is the only mapInArrow source, and the
    index side arrives from a parquet scan (never recomputed from
    text)."""
    from nebuia_vector_db_spark.plans.inspect import explain_str

    docs = _docs(spark, sf_oracle)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    corpus.append(delta)
    pairs = idx.ingest(
        corpus.changes(1, 2)
        .where(F.col("_change") == "insert")
        .drop("_change", "_commit_version"),
        corpus.read(2),
    )
    plan = explain_str(pairs)
    # the index bands come from storage: a parquet scan over the
    # band-index files, not a second corpus fingerprint
    assert "Scan parquet" in plan or "FileScan parquet" in plan, plan
    # the churn-bounded relations (delta bands / candidates / shingle
    # sets) are persisted and REUSED — their consumers read the cache,
    # they don't replay the band joins or the corpus scan (the 3×
    # recompute the round-12 bench profile caught)
    assert "InMemoryTableScan" in plan, plan
    # note: a raw Exchange count over this plan string is meaningless
    # — explain expands every cached relation's ORIGIN lineage at each
    # of its consumers, so the text shows ~10× the exchanges that
    # execute; the executed-shape witnesses are the bench b20 rows
    release_cached_relations()


def test_stream_ingest_mirrors_batch_and_is_exactly_once(spark, tmp_path):
    """The standing streaming query (CDC feed → foreachBatch ingest →
    transactional pairs sink) must produce exactly the per-commit
    batch ingest_commit pairs, drain idempotently (a second
    AvailableNow run adds nothing), and pick up NEW commits on the
    next drain — the daily dedup-at-ingest loop end to end."""
    from nebuia_vector_db_spark.operators.incremental import (
        stream_dedup_ingest,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words about spark shuffles and parquet files"
    t3 = "a third unrelated document mentioning watermarks and state stores"
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    ppath, ck = str(tmp_path / "pairs"), str(tmp_path / "ck")
    corpus = SnapshotTable.create(spark, cpath, mk([(1, t1), (2, t2)]))
    idx = MinhashBandIndex.create(spark, ipath, corpus=mk([(1, t1), (2, t2)]))
    corpus.append(mk([(3, t3)]))
    corpus.append(mk([(10, t1), (11, t3 + " x"), (12, t3 + " x")]))
    q = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q.awaitTermination()
    release_cached_relations()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in SnapshotTable(spark, ppath).read().collect()
    }
    assert got == {(1, 10), (3, 11), (3, 12), (11, 12)}
    # second drain with no new commits: nothing added, nothing re-run
    n_index_v = idx.tbl.current_version()
    q2 = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q2.awaitTermination()
    release_cached_relations()
    assert SnapshotTable(spark, ppath).read().count() == 4
    assert idx.tbl.current_version() == n_index_v
    # a NEW commit is picked up by the next drain, exactly once
    corpus.append(mk([(20, t2 + " tail")]))
    q3 = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q3.awaitTermination()
    release_cached_relations()
    got3 = {
        (r["doc_a"], r["doc_b"])
        for r in SnapshotTable(spark, ppath).read().collect()
    }
    assert got3 == got | {(2, 20)}


def test_txn_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id) must not duplicate index
    bands, and the recomputed pair set is identical even though the
    delta's bands are already in the index (within-delta pairs migrate
    from the self-join to the cross join; distinct collapses them)."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base = mk([(1, t1)])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    delta = mk([(7, t1), (8, t1)])
    corpus.append(delta)
    first = _pairs_set(
        idx.ingest(delta, corpus.read(2), txn=("lane", 0))
    )
    n_bands = idx.tbl.read().count()
    replay = _pairs_set(
        idx.ingest(delta, corpus.read(2), txn=("lane", 0))
    )
    release_cached_relations()
    assert first == replay == {(1, 7, 1.0), (1, 8, 1.0), (7, 8, 1.0)}
    assert idx.tbl.read().count() == n_bands  # no duplicate bands


def test_index_survives_compaction_and_vacuum(spark, tmp_path):
    """Daily ingest = one small band file per commit; SnapshotTable
    maintenance (compact + vacuum) must leave the index answering
    identically — params metadata survives the rewrite (the _app_meta
    carry-forward contract) and the next ingest still works."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    texts = [(i, f"doc {i} unique words " + " ".join(f"w{i}_{j}" for j in range(8))) for i in range(1, 6)]
    base = mk(texts)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    for k in range(3):  # three daily commits -> three band files
        corpus.append(mk([(100 + k, f"filler {k} " + " ".join(f"f{k}_{j}" for j in range(8)))]))
        idx.ingest_commit(corpus)
    files_before = idx.tbl.n_files()
    idx.tbl.compact(target_partitions=1)
    idx.tbl.vacuum(keep_last=1)
    assert idx.tbl.n_files() < files_before
    # params metadata carried through the maintenance rewrite
    MinhashBandIndex(spark, str(tmp_path / "i"))  # reopen validates
    # and the compacted index still pairs a new duplicate correctly
    corpus.append(mk([(200, t1), (201, t1)]))
    got = _pairs_set(idx.ingest_commit(corpus))
    release_cached_relations()
    assert {(a, b) for a, b, _ in got} == {(200, 201)}


def test_embedding_incremental_equals_from_scratch(spark, sf_oracle, tmp_path):
    """EmbeddingSketchIndex.ingest ≡ embedding_neardup_lsh restricted
    to pairs touching the delta (same seeded sketch kernel — factored
    rp_sketch_rows — so candidates are bit-identical)."""
    from nebuia_vector_db_spark.operators.dedup import (
        embedding_neardup_lsh,
    )
    from nebuia_vector_db_spark.operators.incremental import (
        EmbeddingSketchIndex,
    )

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") % 2 == 1)
    delta = emb.where(F.col("vec_id") % 2 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = EmbeddingSketchIndex.create(
        spark, str(tmp_path / "i"), corpus=base,
        threshold=0.45, n_planes=6, n_tables=96,
    )
    corpus.append(delta)
    got = {
        (r["vec_a"], r["vec_b"], round(r["cosine"], 6))
        for r in idx.ingest_commit(corpus).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], round(r["cosine"], 6))
        for r in embedding_neardup_lsh(
            emb, threshold=0.45, n_planes=6, n_tables=96
        ).collect()
        if r["vec_a"] % 2 == 0 or r["vec_b"] % 2 == 0
    }
    release_cached_relations()
    assert got == want and got
    # param guard on reopen
    with pytest.raises(ValueError, match="sketch parameters"):
        EmbeddingSketchIndex(spark, str(tmp_path / "i"), n_tables=8)


def test_update_commit_replaces_bands_not_accumulates(spark, tmp_path):
    """An UPDATE commit (delete+insert at one version — the CDF upsert
    convention) must REPLACE the doc's bands: code-review r12 found the
    old insert-only filter silently accumulated a second band set per
    _id. After the update, the doc pairs by its NEW text, not its old
    one, and the index holds exactly one band set for it."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    old = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new = "completely different updated words about snapshots and bands"
    base = mk([(1, old), (2, "unrelated filler " + " ".join(f"u{j}" for j in range(8)))])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = MinhashBandIndex.create(spark, str(tmp_path / "i"), corpus=base)
    n_per_doc = idx.tbl.read().where("_id = 1").count()
    # upsert doc 1: COW delete + re-insert with new text
    corpus.delete_where("doc_id = 1")
    corpus.append(mk([(1, new)]))
    idx.ingest_commit(corpus, version=2).collect()  # delete commit
    idx.ingest_commit(corpus, version=3).collect()  # re-insert commit
    release_cached_relations()
    assert idx.tbl.read().where("_id = 1").count() == n_per_doc
    # a dup of the NEW text pairs; a dup of the OLD text does not
    corpus.append(mk([(50, new), (51, old)]))
    got = _pairs_set(idx.ingest_commit(corpus))
    release_cached_relations()
    assert {(a, b) for a, b, _ in got} == {(1, 50)}


def test_stream_transient_doc_matches_per_commit_replay(spark, tmp_path):
    """A doc inserted (v2) and deleted (v3) within ONE drain: the
    per-commit stream loop must still emit its v2 pair — processing
    the drain as a merged delta would verify against read(v3), where
    the doc is gone, and silently lose it (code-review r12)."""
    from nebuia_vector_db_spark.operators.incremental import (
        stream_dedup_ingest,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    ppath, ck = str(tmp_path / "pairs"), str(tmp_path / "ck")
    base = mk([(1, t1)])
    corpus = SnapshotTable.create(spark, cpath, base)
    idx = MinhashBandIndex.create(spark, ipath, corpus=base)
    corpus.append(mk([(9, t1)]))      # v2: transient duplicate of 1
    corpus.delete_where("doc_id = 9")  # v3: gone again
    q = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q.awaitTermination()
    release_cached_relations()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in SnapshotTable(spark, ppath).read().collect()
    }
    assert got == {(1, 9)}  # the transient pair was seen at v2
    # and v3's retract cleaned the index
    assert idx.tbl.read().where("_id = 9").count() == 0


def test_stream_driver_is_index_generic(spark, tmp_path):
    """stream_dedup_ingest takes any _SketchIndexBase: drive it with
    the EMBEDDING index over a vector corpus snapshot and assert the
    pairs mirror the batch ingest (the base-class refactor's claim)."""
    from nebuia_vector_db_spark.operators.incremental import (
        EmbeddingSketchIndex,
        stream_dedup_ingest,
    )

    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    v1 = [1.0, 0.0, 0.0, 0.0] * 16
    v2 = [0.0, 1.0, 0.0, 0.0] * 16
    base = mk([(1, v1), (2, v2)])
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    ppath, ck = str(tmp_path / "p"), str(tmp_path / "ck")
    corpus = SnapshotTable.create(spark, cpath, base)
    idx = EmbeddingSketchIndex.create(
        spark, ipath, corpus=base, threshold=0.9, n_planes=6, n_tables=96
    )
    corpus.append(mk([(9, v1), (10, v2)]))  # dups of both
    q = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q.awaitTermination()
    release_cached_relations()
    got = {
        (r["vec_a"], r["vec_b"])
        for r in SnapshotTable(spark, ppath).read().collect()
    }
    assert got == {(1, 9), (2, 10)}


def test_replayed_update_batch_keeps_new_rows(spark, tmp_path):
    """Second-review r12: replaying a micro-batch that carried an
    UPDATE commit must not delete the doc's new sketch rows (the
    first attempt's retract+append already applied; a bare re-retract
    with a watermark-skipped append would lose the doc forever).
    Driven through the stream's own per-version body by re-running
    the drain against a fresh checkpoint (same versions redelivered —
    the at-least-once shape)."""
    from nebuia_vector_db_spark.operators.incremental import (
        stream_dedup_ingest,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    old = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new = "fresh updated content with totally different words here now"
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    ppath = str(tmp_path / "p")
    base = mk([(1, old)])
    corpus = SnapshotTable.create(spark, cpath, base)
    idx = MinhashBandIndex.create(spark, ipath, corpus=base)
    corpus.delete_where("doc_id = 1")   # v2
    corpus.append(mk([(1, new)]))        # v3: the update's re-insert
    q = stream_dedup_ingest(spark, cpath, idx, ppath, str(tmp_path / "ck1"))
    q.awaitTermination()
    release_cached_relations()
    n_rows = idx.tbl.read().where("_id = 1").count()
    assert n_rows > 0
    # redeliver the SAME versions (fresh checkpoint = full replay)
    q2 = stream_dedup_ingest(spark, cpath, idx, ppath, str(tmp_path / "ck2"))
    q2.awaitTermination()
    release_cached_relations()
    assert idx.tbl.read().where("_id = 1").count() == n_rows
    # and the doc still pairs by its new text after the replay
    corpus.append(mk([(9, new)]))
    q3 = stream_dedup_ingest(spark, cpath, idx, ppath, str(tmp_path / "ck1"))
    q3.awaitTermination()
    release_cached_relations()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in SnapshotTable(spark, ppath).read().collect()
    }
    assert (1, 9) in got


# ---- SubstringAnchorIndex (round 13, VERDICT r12 task #3) -----------


def _span_pairs_set(df):
    return {(r["doc_a"], r["doc_b"], r["n_shared"]) for r in df.collect()}


def test_substring_incremental_equals_from_scratch(
    spark, sf_oracle, tmp_path
):
    """ingest(delta) must equal full-corpus exact_substring_pairs
    restricted to pairs touching the delta — the defining contract on
    the real corpus (same split as the MinHash twin; the
    dedup_substring_incremental registry row additionally
    hash-certifies this against the DuckDB replay)."""
    from nebuia_vector_db_spark.operators.dedup import (
        exact_substring_pairs,
    )
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    docs = _docs(spark, sf_oracle)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "corpus"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "idx"), corpus=base
    )
    corpus.append(delta)
    got = _span_pairs_set(idx.ingest_commit(corpus))
    want = {
        t
        for t in _span_pairs_set(
            exact_substring_pairs(docs, k=32, min_shared=2)
        )
        if t[0] % 2 == 0 or t[1] % 2 == 0
    }
    release_cached_relations()
    assert got == want and got
    # both candidate paths actually fired on this corpus
    assert any(a % 2 == 0 and b % 2 == 0 for a, b, _ in got)
    assert any((a % 2 == 0) != (b % 2 == 0) for a, b, _ in got)


def test_substring_dfcap_is_corpus_global(spark, tmp_path):
    """A gram under the df-cap in the seed corpus but over it once the
    delta lands must be dropped from BOTH join sides — hotness is a
    property of base ∪ delta, exactly the from-scratch semantics
    (planted: span S reaches df 3 > cap 2 only after the delta)."""
    from nebuia_vector_db_spark.operators.dedup import (
        exact_substring_pairs,
    )
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # WHOLE-document copies: identical text selects identical anchors
    # in every copy, so every S anchor reaches df 3 (> cap 2) once the
    # delta lands and must vanish from the join; T stays at df 2
    S = "this exact boilerplate paragraph is stamped into every single page here"
    T = "a genuinely copied unique passage appearing in precisely two documents"
    base = mk([(1, S), (2, S), (4, T)])
    delta = mk([(3, S), (9, T)])
    kw = dict(k=16, min_shared=1, winnow_w=8, max_anchor_df=2)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base, **kw
    )
    corpus.append(delta)
    got = _span_pairs_set(idx.ingest_commit(corpus))
    full = mk([]).unionByName(base).unionByName(delta)
    want = {
        t
        for t in _span_pairs_set(
            exact_substring_pairs(
                full, text_col="text", id_col="doc_id", **kw
            )
        )
        if t[0] in (3, 9) or t[1] in (3, 9)
    }
    release_cached_relations()
    assert got == want
    # non-vacuous: the control span T pairs across the commit...
    assert any({a, b} == {4, 9} for a, b, _ in got)
    # ...and the cap really bit: without it, S would pair 3 with 1 and 2
    uncapped = exact_substring_pairs(
        full, k=16, min_shared=1, winnow_w=8, max_anchor_df=10**9
    )
    assert any(
        {r["doc_a"], r["doc_b"]} == {1, 3} for r in uncapped.collect()
    )
    assert not any({a, b} == {1, 3} for a, b, _ in got)


def test_substring_update_commit_replaces_postings(spark, tmp_path):
    """An update commit (delete+insert of one doc_id) must REPLACE the
    doc's postings: the old text's anchors are retracted before the
    new text's are ingested, so a later duplicate of the OLD text no
    longer pairs with the updated doc."""
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    old = "the original wording of document one which will be rewritten soon"
    new = "a completely fresh body with nothing in common with before at all"
    base = mk([(1, old), (2, "some unrelated second document body here")])
    kw = dict(k=16, min_shared=1, winnow_w=8)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base, **kw
    )
    # upsert doc 1: COW delete + re-insert with new text (ingest BOTH
    # commits, the MinHash twin's convention)
    corpus.delete_where("doc_id = 1")
    corpus.append(mk([(1, new)]))
    assert _span_pairs_set(idx.ingest_commit(corpus, version=2)) == set()
    assert _span_pairs_set(idx.ingest_commit(corpus, version=3)) == set()
    # a later copy of the OLD text pairs with nothing (postings replaced)
    corpus.append(mk([(7, old)]))
    got = _span_pairs_set(idx.ingest_commit(corpus))
    release_cached_relations()
    assert got == set()


def test_substring_param_guard_and_empty_seed(spark, tmp_path):
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    base = spark.createDataFrame(
        [(1, "tiny")], "doc_id long, text string"
    )
    SubstringAnchorIndex.create(spark, str(tmp_path / "i"), corpus=base)
    with pytest.raises(ValueError, match="sketch parameters"):
        SubstringAnchorIndex(spark, str(tmp_path / "i"), winnow_w=8)
    # min_shared / max_anchor_df are query-time knobs, not index layout
    SubstringAnchorIndex(
        spark, str(tmp_path / "i"), min_shared=3, max_anchor_df=7
    )
    release_cached_relations()


def test_substring_ingest_plan_shape(spark, sf_oracle, tmp_path):
    """Pin the live substring-ingest plan's scale properties (the
    registry row collects through a scratch-table lifecycle, so
    PLANS.md can't see it — excluded in tools/explain_dump.py's
    header): the persisted postings arrive from a parquet scan (never
    re-winnowed from text), the churn-bounded relations read the
    cache, and the join tree is equi-join only — no cartesian."""
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )
    from nebuia_vector_db_spark.plans.inspect import explain_str

    docs = _docs(spark, sf_oracle)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base
    )
    corpus.append(delta)
    pairs = idx.ingest(
        corpus.changes(1, 2)
        .where(F.col("_change") == "insert")
        .drop("_change", "_commit_version"),
        corpus.read(2),
    )
    plan = explain_str(pairs)
    # persisted postings come from storage, not a corpus re-winnow
    assert "Scan parquet" in plan or "FileScan parquet" in plan, plan
    # delta anchors + delta-gram postings are cached and reused by
    # both the df-count and the pair joins
    assert "InMemoryTableScan" in plan, plan
    # the hot-gram guard drops boilerplate map-side via broadcast
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    release_cached_relations()


def test_stream_driver_drives_substring_index(spark, tmp_path):
    """stream_dedup_ingest with the SUBSTRING index (round 13):
    continuous span-level dedup-at-ingest — the CDC loop ingests a
    commit carrying a copied paragraph and the pairs table mirrors
    the batch ingest_commit output, (doc_a, doc_b, n_shared) schema
    included."""
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
        stream_dedup_ingest,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    para = "an unmistakably copied paragraph that spans well past the anchor window"
    base = mk([(1, "opening words " + para), (2, "completely unrelated body text")])
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    ppath, ck = str(tmp_path / "p"), str(tmp_path / "ck")
    corpus = SnapshotTable.create(spark, cpath, base)
    idx = SubstringAnchorIndex.create(
        spark, ipath, corpus=base, k=16, min_shared=1, winnow_w=8
    )
    corpus.append(mk([(9, "different framing yet " + para)]))
    q = stream_dedup_ingest(spark, cpath, idx, ppath, ck)
    q.awaitTermination()
    release_cached_relations()
    pairs = SnapshotTable(spark, ppath).read().collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 9)}
    assert all(r["n_shared"] >= 1 for r in pairs)


def test_substring_txn_replay_is_idempotent(spark, tmp_path):
    """The code-review r13 crash scenario: a replayed micro-batch
    whose postings append already committed must recompute the SAME
    pair set with the SAME n_shared counts — without the delta-id
    anti-join in _pair_rows, a within-delta pair would count 3× (its
    own postings meet it through within AND both cross orientations)
    and the df count would double-count delta postings."""
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    para = "a verbatim paragraph long enough to clear the winnow window easily"
    base = mk([(1, "lead " + para)])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base,
        k=16, min_shared=1, winnow_w=8,
    )
    delta = mk([(7, "tail " + para), (8, "coda " + para)])
    corpus.append(delta)
    first = _span_pairs_set(
        idx.ingest(delta, corpus.read(2), txn=("lane", 0))
    )
    n_rows = idx.tbl.read().count()
    replay = _span_pairs_set(
        idx.ingest(delta, corpus.read(2), txn=("lane", 0))
    )
    release_cached_relations()
    assert first == replay and first
    assert {(a, b) for a, b, _ in first} == {(1, 7), (1, 8), (7, 8)}
    assert idx.tbl.read().count() == n_rows  # no duplicate postings


def test_substring_refuses_unretracted_deletes(spark, tmp_path):
    """retract_deletes=False is refused for the substring index (its
    postings ARE the evidence — no exact re-verify exists to drop an
    updated doc's stale rows), while the sketch indexes still accept
    it; the stream driver's replay path (_replay_bands_done) skips the
    retract without tripping the refusal."""
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    base = mk([(1, "some original first document body here")])
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base,
        k=16, min_shared=1, winnow_w=8,
    )
    corpus.append(mk([(2, "a brand new unrelated second document")]))
    feed = corpus.changes(1, 2)
    with pytest.raises(ValueError, match="retract_deletes=False"):
        idx.ingest_feed(feed, corpus.read(2), retract_deletes=False)
    # the replay channel works: bands were NOT appended by the failed
    # call above, so this applies cleanly and finds nothing
    got = _span_pairs_set(
        idx.ingest_feed(feed, corpus.read(2), _replay_bands_done=False)
    )
    release_cached_relations()
    assert got == set()


def test_substring_incremental_randomized_corpus(spark, tmp_path):
    """Seeded-random corpus (the test_dedup winnowing-test pattern):
    texts over a 3-char alphabet with planted copied spans, an uneven
    base/delta split, and a tiny df-cap so naturally-hot grams (space
    runs) exercise the cap — incremental must equal from-scratch
    restricted to delta-touching pairs on ALL of it."""
    import random

    from nebuia_vector_db_spark.operators.dedup import (
        exact_substring_pairs,
    )
    from nebuia_vector_db_spark.operators.incremental import (
        SubstringAnchorIndex,
    )

    rng = random.Random(4242)
    alphabet = "ab "
    texts = {}
    for i in range(48):
        n = rng.randrange(0, 300)
        texts[i] = "".join(rng.choice(alphabet) for _ in range(n))
    # plant copied spans (>= w + k - 1 = 23 chars) across random pairs,
    # including base->delta, delta->delta and base->base directions
    for src, dst in ((1, 3), (2, 9), (6, 12), (4, 8), (15, 33), (20, 21)):
        donor = texts[src]
        if len(donor) < 40:
            donor = donor + "copied span filler material xyz " * 3
            texts[src] = donor
        span_len = rng.randrange(23, 80)
        start = rng.randrange(0, max(1, len(donor) - span_len))
        texts[dst] = texts[dst] + donor[start:start + span_len]
    rows = [(i, t) for i, t in texts.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = docs.where(F.col("doc_id") % 3 != 0)
    delta = docs.where(F.col("doc_id") % 3 == 0)
    kw = dict(k=16, min_shared=1, winnow_w=8, max_anchor_df=4)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SubstringAnchorIndex.create(
        spark, str(tmp_path / "i"), corpus=base, **kw
    )
    corpus.append(delta)
    got = _span_pairs_set(idx.ingest_commit(corpus))
    want = {
        t
        for t in _span_pairs_set(exact_substring_pairs(docs, **kw))
        if t[0] % 3 == 0 or t[1] % 3 == 0
    }
    release_cached_relations()
    assert got == want
    # non-vacuous: planted spans must actually pair across the split
    assert any({a % 3, b % 3} != {1, 2} for a, b, _ in got) and got


# ---- TokenExportIndex (round 14): incrementally maintained export ----


def _read_payloads(spark, out_dir):
    from nebuia_vector_db_spark.sources.webdataset import read_webdataset

    return {
        int(r["key"]): bytes(r["content"]).decode()
        for r in read_webdataset(spark, out_dir)
        .where(F.col("ext") == "txt")
        .collect()
    }


def test_token_export_incremental_equals_from_scratch(spark, tmp_path):
    """create(base) + two ingests ≡ a from-scratch export of the full
    corpus under the frozen base vocab — byte-identical payloads for
    every bin, including the twice-rewritten boundary bins."""
    from nebuia_vector_db_spark.operators.incremental import (
        TokenExportIndex,
        release_cached_relations,
    )
    from nebuia_vector_db_spark.operators.pipeline import (
        bins_from_stream,
        token_stream,
        word_vocab,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 13 + j) % 37}" for j in range(4 + i % 5)))
            for i in range(lo, hi)
        ],
        "doc_id long, text string",
    )
    base, d1, d2 = mk(0, 60), mk(60, 75), mk(75, 100)
    idx = TokenExportIndex.create(
        spark, str(tmp_path / "s"), str(tmp_path / "o"),
        corpus=base, vocab_size=16, capacity=32, bins_per_shard=2,
    )
    r1 = idx.ingest(d1)
    r2 = idx.ingest(d2)
    got = _read_payloads(spark, str(tmp_path / "o"))
    vocab = word_vocab(base, 16)
    want = {
        r["bin_id"]: r["payload"]
        for r in bins_from_stream(
            token_stream(mk(0, 100), vocab), 32
        ).collect()
    }
    release_cached_relations()
    assert got == want
    # the ingests were genuinely incremental: each wrote only the
    # boundary shard onward, not the whole layout
    assert r2["shards_written"] < len({b // 2 for b in want})
    assert r2["total_tokens"] == sum(
        len(p.split(" ")) for p in want.values()
    )


def test_token_export_boundary_merge_and_small_delta(spark, tmp_path):
    """A delta smaller than one bin merges into the stored tail: the
    boundary bin's payload is old-tail + delta prefix, and bins before
    the boundary shard are untouched on disk."""
    import os

    from nebuia_vector_db_spark.operators.incremental import (
        TokenExportIndex,
        release_cached_relations,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    base = mk([(i, "a b c d e f g h") for i in range(20)])  # 10 tok/doc
    idx = TokenExportIndex.create(
        spark, str(tmp_path / "s"), str(tmp_path / "o"),
        corpus=base, vocab_size=8, capacity=16, bins_per_shard=4,
    )
    # 200 tokens → bins 0..12 (bin 12 partial: 8 tokens); shard 0
    # (bins 0-3) must not be rewritten by the ingest
    shard0 = os.path.join(str(tmp_path / "o"), "shard-00000.tar")
    mtime0 = os.path.getmtime(shard0)
    before = _read_payloads(spark, str(tmp_path / "o"))
    r = idx.ingest(mk([(50, "a b")]))  # 4 tokens: fills tail to 12
    after = _read_payloads(spark, str(tmp_path / "o"))
    release_cached_relations()
    assert os.path.getmtime(shard0) == mtime0  # untouched on disk
    assert r["shards_written"] == 1  # only the boundary shard
    tail_before, tail_after = before[12], after[12]
    assert tail_after.startswith(tail_before)
    assert len(tail_after.split(" ")) == 12
    assert {b: p for b, p in after.items() if b != 12} == {
        b: p for b, p in before.items() if b != 12
    }


def test_token_export_guards(spark, tmp_path):
    from nebuia_vector_db_spark.operators.incremental import (
        TokenExportIndex,
        release_cached_relations,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = TokenExportIndex.create(
        spark, str(tmp_path / "s"), str(tmp_path / "o"),
        corpus=mk([(5, "a b c")]), capacity=16,
    )
    with pytest.raises(ValueError, match="append-only"):
        idx.ingest(mk([(3, "x y")]))  # id below the watermark
    with pytest.raises(ValueError, match="capacity"):
        TokenExportIndex(
            spark, str(tmp_path / "s"), str(tmp_path / "o"), capacity=32
        )
    # empty delta is a no-op, not an error
    r = idx.ingest(mk([]).where(F.lit(False)))
    release_cached_relations()
    assert r["bins_written"] == 0 and r["shards_written"] == 0


def test_retract_dataframe_path_equals_list_path(spark, tmp_path):
    """list ≡ DataFrame retraction (round 15, VERDICT r14 task #6):
    the two routes leave the persisted band index in the SAME state —
    identical row sets — and the large-churn probe routes past the
    literal-isin path without ever calling delete_where."""
    from nebuia_vector_db_spark.operators.incremental import (
        _retract_matching,
    )

    rows = [(i, f"tok{i} " * 30) for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = MinhashBandIndex.create(spark, str(tmp_path / "a"), corpus=docs)
    b = MinhashBandIndex.create(spark, str(tmp_path / "b"), corpus=docs)
    dels = [i for i in range(24) if i % 3 == 0]
    a.retract(dels)
    b.retract(
        spark.createDataFrame([(i,) for i in dels], "_id long")
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(a.tbl.read()) == key(b.tbl.read())
    assert not {r["_id"] for r in a.tbl.read().collect()} & set(dels)

    # large-churn route: with the probe threshold forced below the
    # churn, the helper must take the DataFrame path — no literal
    # id list is ever built (delete_where never called)
    c = MinhashBandIndex.create(spark, str(tmp_path / "c"), corpus=docs)
    calls = []
    orig = c.tbl.delete_where
    c.tbl.delete_where = lambda cond: calls.append("where") or orig(cond)
    ids_df = spark.createDataFrame([(i,) for i in dels], "_id long")
    _retract_matching(c.retract, ids_df, list_max=2)
    assert calls == []  # anti-join route, not the isin literal
    assert key(c.tbl.read()) == key(a.tbl.read())
    # small churn keeps the cheap literal path
    d = MinhashBandIndex.create(spark, str(tmp_path / "d"), corpus=docs)
    calls_d = []
    orig_d = d.tbl.delete_where
    d.tbl.delete_where = (
        lambda cond: calls_d.append("where") or orig_d(cond)
    )
    _retract_matching(d.retract, ids_df, list_max=100)
    assert calls_d == ["where"]
    assert key(d.tbl.read()) == key(a.tbl.read())


def test_semdedup_retract_assign_dataframe_path(spark, tmp_path):
    """The semantic index's delete lane accepts the DataFrame route
    too: assignment rows COW-retract via the anti-join with state
    identical to the list route."""
    import numpy as np

    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(20)
    ]
    schema = "vec_id long, embedding array<double>"
    vecs = spark.createDataFrame(rows, schema)
    a = SemDedupClusterIndex.create(
        spark, str(tmp_path / "sa"), corpus=vecs, dim=8, n_planes=3
    )
    b = SemDedupClusterIndex.create(
        spark, str(tmp_path / "sb"), corpus=vecs, dim=8, n_planes=3
    )
    dels = [0, 4, 8, 12]
    a._retract_assign(dels)
    b._retract_assign(
        spark.createDataFrame([(i,) for i in dels], "_id long")
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(a.assign.read()) == key(b.assign.read())
    assert not {r["_id"] for r in a.assign.read().collect()} & set(dels)


def test_stream_decontaminate_mirrors_batch_and_retracts_deletes(
    spark, tmp_path
):
    """The decontamination stream loop (round 15): after draining the
    feed, the decisions table equals the BATCH decontaminate_against
    over the live corpus — including after a DELETE commit, whose
    decision rows are retracted (the mirror shrinks with the corpus).
    """
    from nebuia_vector_db_spark.operators.incremental import (
        stream_decontaminate,
    )
    from nebuia_vector_db_spark.operators.pipeline import (
        decontaminate_against,
    )

    bench = " ".join(f"b{i}" for i in range(13))
    eval_rel = spark.createDataFrame(
        [(900, "x " + bench + " y")], "doc_id long, text string"
    )
    mk = lambda i, contaminated: (  # noqa: E731
        i,
        ("pre " + bench + " post")
        if contaminated
        else f"clean{i} words only here {i}",
    )
    base = spark.createDataFrame(
        [mk(1, True), mk(2, False)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [mk(3, False), mk(4, True)], "doc_id long, text string"
    )
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    corpus.append(delta)

    def _drain():
        q = stream_decontaminate(
            spark, str(tmp_path / "c"), eval_rel,
            str(tmp_path / "dec"), str(tmp_path / "ck"), n=13,
        )
        q.awaitTermination()

    _drain()
    dec = SnapshotTable(spark, str(tmp_path / "dec"))
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    want = decontaminate_against(corpus.read(), eval_rel, n=13)
    assert key(dec.read()) == key(want)
    assert {
        r["doc_id"]: r["dropped"] for r in dec.read().collect()
    } == {1: 1, 2: 0, 3: 0, 4: 1}

    # delete a contaminated and a clean doc; the next drain retracts
    corpus.delete_where(F.col("doc_id").isin(1, 3))
    _drain()
    assert key(dec.read()) == key(
        decontaminate_against(corpus.read(), eval_rel, n=13)
    )
    assert {r["doc_id"] for r in dec.read().collect()} == {2, 4}
