"""Incremental cross-snapshot MinHash dedup (round 12, VERDICT r11
"What's missing" #1): dedup a NEW commit's rows against the existing
corpus WITHOUT rescanning it.

The continuously-crawled-corpus operation: a 100 TB corpus ingests a
daily delta that is a fraction of a percent of the table, and the
near-dup question for that delta is "does any NEW doc duplicate any
EXISTING doc (or another new doc)?". Re-running full-corpus
``minhash_lsh_pairs`` per ingest re-tokenizes, re-hashes and re-joins
the entire history — O(corpus) per day. This module persists the LSH
BAND relation (``dedup.minhash_band_rows`` — (_id, band_id,
band_hash), ~bands·16 B per doc, orders of magnitude smaller than
text) as its own :class:`SnapshotTable` index, and per commit:

1. fingerprints ONLY the delta (one Arrow minhash pass over the new
   rows — O(churn));
2. band-joins the delta's bands against the persisted index (the
   delta side is churn-sized, so AQE broadcasts it; the index side is
   an equi-join on (band_id, band_hash) — posting-list sized, never
   all-pairs) plus a delta×delta self-join;
3. verifies candidates with EXACT Jaccard against the CURRENT corpus
   snapshot, reading text for candidate ids only (a churn-bounded
   semi-join; with the corpus Z-ordered/clustered by id the snapshot
   scan is also file-skipped);
4. appends the delta's bands to the index ATOMICALLY (CAS commit), so
   a crashed ingest never half-updates the index and the index
   version history mirrors the corpus's.

Because the permutations are seeded and the band fold is the same
xxhash64 expression, incremental candidates are bit-identical to the
ones the full-corpus band self-join would generate for pairs touching
the delta — so ``ingest() ≡ minhash_lsh_pairs(full corpus) restricted
to pairs with a delta member`` (the ``dedup_incremental`` registry row
hash-certifies this against a DuckDB replay; tests pin incremental ≡
from-scratch on planted duplicates).

Deletes: a doc deleted from the corpus leaves stale bands in the
index. That costs candidate-generation noise, never correctness — the
verify join against the CURRENT corpus drops pairs whose partner no
longer exists. :meth:`MinhashBandIndex.retract` removes the stale
bands (COW delete on the index) when churn makes the noise matter.

Reference scope note: the reference engine (main.go) has no
incremental anything — this is extension tier, composed entirely from
existing parts (snapshot.changes + dedup.minhash_band_rows + the
exact-Jaccard verify tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.text import (
    shingles_from_tokens,
    with_tokens,
)
from nebuia_vector_db_spark.operators._cache import (
    cached_relation_registry,
)
from nebuia_vector_db_spark.operators.dedup import minhash_band_rows
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

_CACHED_RELATIONS, release_cached_relations = cached_relation_registry()

# application-metadata key holding the index's sketch parameters —
# carried forward by every commit (SnapshotTable._app_meta), validated
# on every ingest: bands built with different (n, num_perm, bands)
# would join garbage silently
_PARAMS_KEY = "minhash_index_params"


def _shingle_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(_id, _shingles) — the exact-Jaccard verify input, same
    tokenize/shingle arithmetic as dedup.minhash_lsh_pairs."""
    return with_tokens(docs, text_col).select(
        F.col(id_col).alias("_id"),
        shingles_from_tokens("_toks", n).alias("_shingles"),
    )


class MinhashBandIndex:
    """A persisted MinHash band index over a document corpus, stored
    as a :class:`SnapshotTable` of (_id, band_id, band_hash)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.8,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 3,
        num_perm: int = 128,
        bands: int = 32,
    ) -> None:
        self.spark = spark
        self.tbl = SnapshotTable(spark, path)
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        stored = self.tbl.meta(_PARAMS_KEY) if self.tbl.versions() else None
        if stored is not None:
            mine = self._params()
            if stored != mine:
                raise ValueError(
                    f"index at {path} was built with {stored}, opened "
                    f"with {mine} — mismatched sketch parameters would "
                    "band-join garbage; reopen with the stored "
                    "parameters or rebuild"
                )

    def _params(self) -> dict:
        return {"n": self.n, "num_perm": self.num_perm, "bands": self.bands}

    # ------------------------------------------------------------ build
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame | None = None,
        **kw,
    ) -> "MinhashBandIndex":
        """Create the index table; with ``corpus``, seed it with the
        existing corpus's bands (the one-time full fingerprint pass —
        every later ingest is O(churn)). With ``corpus=None`` the
        empty seed declares ``_id long`` — for string-keyed corpora
        pass the (possibly empty-filtered) corpus instead, so the
        band schema carries the real id type (appending string ids
        into a long-typed table would cast-mangle them)."""
        params = {
            "n": kw.get("n", 3),
            "num_perm": kw.get("num_perm", 128),
            "bands": kw.get("bands", 32),
        }
        text_col = kw.get("text_col", "text")
        id_col = kw.get("id_col", "doc_id")
        seed = (
            minhash_band_rows(
                corpus, text_col, id_col,
                params["n"], params["num_perm"], params["bands"],
            )
            if corpus is not None
            else spark.createDataFrame(
                [], "_id long, band_id int, band_hash long"
            )
        )
        SnapshotTable.create(
            spark, path, seed, extra_meta={_PARAMS_KEY: params}
        )
        return cls(spark, path, **kw)

    # ----------------------------------------------------------- ingest
    def ingest(
        self,
        delta: DataFrame,
        corpus_now: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> DataFrame:
        """Fingerprint ``delta``, pair it against the persisted index
        and itself, verify with exact Jaccard against ``corpus_now``
        (the POST-commit corpus — must contain the delta rows), and
        atomically append the delta's bands to the index.

        Returns (doc_a, doc_b, jaccard) with doc_a < doc_b — exactly
        the full-corpus ``minhash_lsh_pairs`` output restricted to
        pairs touching the delta. ``delta`` ids must be NEW to the
        index (the snapshot change feed guarantees this when driven
        via :meth:`ingest_commit`).

        ``txn=(app, batch_id)`` makes the band append IDEMPOTENT for
        streaming replays (the foreachBatch at-least-once contract):
        it routes through the stream-watermark CAS append, so a
        replayed micro-batch skips the duplicate band write — and the
        recomputed pair set is unchanged anyway (the delta's bands
        being already IN the index only moves within-delta pairs from
        the self-join to the cross join; ``distinct`` collapses
        them)."""
        idc = self.id_col
        delta_bands = minhash_band_rows(
            delta, self.text_col, idc, self.n, self.num_perm, self.bands
        ).cache()
        _CACHED_RELATIONS.append(delta_bands)
        # pin the index snapshot BEFORE appending the delta's bands
        # (read() resolves the file list eagerly, so the later append
        # cannot leak delta×delta pairs through the cross join)
        index_bands = self.tbl.read()
        cross = (
            delta_bands.alias("x")
            .join(
                index_bands.alias("y"),
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_hash") == F.col("y.band_hash"))
                & (F.col("x._id") != F.col("y._id")),
            )
            .select(
                F.least("x._id", "y._id").alias("doc_a"),
                F.greatest("x._id", "y._id").alias("doc_b"),
            )
        )
        within = (
            delta_bands.alias("x")
            .join(
                delta_bands.alias("y"),
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_hash") == F.col("y.band_hash"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(
                F.col("x._id").alias("doc_a"), F.col("y._id").alias("doc_b")
            )
        )
        # candidate pairs are churn-bounded: persist them, or the
        # union feeding cand_ids + the two verify joins would re-run
        # the band joins THREE times (measured 3× at the 80k bench
        # tier, round 12)
        cand = cross.unionByName(within).distinct().cache()
        _CACHED_RELATIONS.append(cand)
        # exact-Jaccard verify: shingle sets for CANDIDATE ids only —
        # the semi-join is churn-bounded and deliberately unhinted
        # (AQE broadcasts when it fits; a hot-crawl day can make the
        # candidate set large, the leakage_safe_split discipline).
        # Persisted: joined once per pair side, and each recompute
        # would re-scan the corpus.
        cand_ids = (
            cand.select(F.col("doc_a").alias(idc))
            .unionByName(cand.select(F.col("doc_b").alias(idc)))
            .distinct()
        )
        sets = _shingle_sets(
            corpus_now.join(cand_ids, idc, "left_semi"),
            self.text_col, idc, self.n,
        ).cache()
        _CACHED_RELATIONS.append(sets)
        verified = (
            cand.join(
                sets.select(
                    F.col("_id").alias("doc_a"),
                    F.col("_shingles").alias("sha"),
                ),
                "doc_a",
            )
            .join(
                sets.select(
                    F.col("_id").alias("doc_b"),
                    F.col("_shingles").alias("shb"),
                ),
                "doc_b",
            )
            .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
            .withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.size("sha") + F.size("shb") - F.col("inter")),
            )
            .where(F.col("jaccard") >= self.threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
        # atomic index advance: the delta's bands land as ONE commit
        if txn is None:
            self.tbl.append(delta_bands)
        else:
            from nebuia_vector_db_spark.streaming.sinks import (
                transactional_append,
            )

            transactional_append(
                self.spark, self.tbl.path, delta_bands, txn[1], txn[0]
            )
        return verified

    def ingest_commit(
        self, corpus_tbl: SnapshotTable, version: int | None = None
    ) -> DataFrame:
        """Drive :meth:`ingest` from a corpus SnapshotTable's change
        feed: the delta is commit ``version``'s INSERTS (deletes leave
        stale bands — see the module docstring / :meth:`retract`), the
        verify corpus is the post-commit snapshot."""
        v = corpus_tbl.current_version() if version is None else version
        delta = (
            corpus_tbl.changes(v - 1, v)
            .where(F.col("_change") == "insert")
            .drop("_change", "_commit_version")
        )
        return self.ingest(delta, corpus_tbl.read(v))

    # -------------------------------------------------------- maintain
    def retract(self, ids: list) -> int:
        """COW-delete the bands of removed docs (stale-band hygiene —
        optional: stale bands cost candidate noise, not correctness).
        ``ids`` is driver-side and churn-bounded by contract."""
        return self.tbl.delete_where(F.col("_id").isin(list(ids)))


def stream_dedup_ingest(
    spark: SparkSession,
    corpus_path: str,
    index: "MinhashBandIndex",
    pairs_path: str,
    checkpoint: str,
    start_version: int = 1,
    app: str | None = None,
):
    """Continuous incremental dedup (round 12): subscribe to the
    corpus SnapshotTable's CHANGE FEED and, per micro-batch, ingest
    the inserts into the band index and append the discovered pairs
    to a pairs SnapshotTable — the daily dedup-at-ingest loop as a
    standing streaming query instead of a scheduled batch job.

    Exactly-once end to end under foreachBatch's at-least-once
    replays: BOTH writes ride the stream-watermark CAS append
    (streaming/sinks.py::transactional_append) — the band append via
    ``ingest(txn=...)``, the pairs append directly — so a replayed
    batch is acknowledged without duplicating bands or pair rows, and
    the recomputed pair set is deterministic (verify reads the corpus
    at the batch's MAX commit version, not "now").

    ``start_version`` defaults to 1: the seed commit's documents are
    already fingerprinted by ``MinhashBandIndex.create(corpus=...)``,
    so the feed must begin AFTER it (delivering commits
    ``(start_version, ...]``). Runs Trigger.AvailableNow — call again
    to drain new commits; tests assert stream ≡ the per-commit batch
    ``ingest_commit`` replay."""
    from nebuia_vector_db_spark.sources.changes_stream import (
        SnapshotChangesDataSource,
    )
    from nebuia_vector_db_spark.streaming.sinks import (
        transactional_append,
    )

    spark.dataSource.register(SnapshotChangesDataSource)
    feed = (
        spark.readStream.format("nebuia_snapshot_changes")
        .option("path", corpus_path)
        .option("startVersion", start_version)
        .load()
    )
    lane = app if app is not None else checkpoint
    corpus = SnapshotTable(spark, corpus_path)

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        v_max = batch.agg(
            F.max("_commit_version").alias("v")
        ).head()["v"]
        inserts = batch.where(F.col("_change") == "insert").drop(
            "_change", "_commit_version"
        )
        pairs = index.ingest(
            inserts,
            corpus.read(int(v_max)),
            txn=(lane + ":bands", batch_id),
        )
        transactional_append(
            spark, pairs_path, pairs, batch_id, lane + ":pairs"
        )

    return (
        feed.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------- embedding modality (RP-LSH)

_EMB_PARAMS_KEY = "rp_sketch_index_params"


class EmbeddingSketchIndex:
    """The embedding-modality twin of :class:`MinhashBandIndex`
    (round 12): random-hyperplane sign sketches
    (``dedup.rp_sketch_rows`` — same seeded kernel as
    ``embedding_neardup_lsh``, so incremental candidates are
    bit-identical to the full-corpus join's) persisted as a
    SnapshotTable of (_id, table_id, sketch); per commit, sketch ONLY
    the delta, join it against the index + itself, exact-cosine
    verify against the current corpus (vectors fetched for candidate
    ids only), append the delta's sketches atomically. Same delete
    semantics (stale sketches are candidate noise, never correctness)
    and the same incremental ≡ from-scratch contract, hash-certified
    by the ``vs_neardup_incremental`` registry row at the recall-1
    sketch settings the vs_neardup_lsh row pins."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.85,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_planes: int = 6,
        n_tables: int = 16,
        dim: int = 64,
        seed: int = 42,
    ) -> None:
        self.spark = spark
        self.tbl = SnapshotTable(spark, path)
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.dim = dim
        self.seed = seed
        stored = (
            self.tbl.meta(_EMB_PARAMS_KEY) if self.tbl.versions() else None
        )
        if stored is not None and stored != self._params():
            raise ValueError(
                f"index at {path} was built with {stored}, opened with "
                f"{self._params()} — mismatched sketch parameters would "
                "join garbage; reopen with the stored parameters or "
                "rebuild"
            )

    def _params(self) -> dict:
        return {
            "n_planes": self.n_planes,
            "n_tables": self.n_tables,
            "dim": self.dim,
            "seed": self.seed,
        }

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame | None = None,
        **kw,
    ) -> "EmbeddingSketchIndex":
        from nebuia_vector_db_spark.operators.dedup import rp_sketch_rows

        params = {
            "n_planes": kw.get("n_planes", 6),
            "n_tables": kw.get("n_tables", 16),
            "dim": kw.get("dim", 64),
            "seed": kw.get("seed", 42),
        }
        vec_col = kw.get("vec_col", "embedding")
        id_col = kw.get("id_col", "vec_id")
        seed_rows = (
            rp_sketch_rows(corpus, vec_col, id_col, **params)
            if corpus is not None
            else spark.createDataFrame(
                [], "_id long, table_id int, sketch long"
            )
        )
        SnapshotTable.create(
            spark, path, seed_rows, extra_meta={_EMB_PARAMS_KEY: params}
        )
        return cls(spark, path, **kw)

    def ingest(
        self,
        delta: DataFrame,
        corpus_now: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> DataFrame:
        """(vec_a, vec_b, cosine) with vec_a < vec_b — the full-corpus
        ``embedding_neardup_lsh`` output restricted to pairs touching
        the delta (see MinhashBandIndex.ingest for the txn and
        caching contracts, which are identical)."""
        from nebuia_vector_db_spark.functions.vector import dot, l2_norm
        from nebuia_vector_db_spark.operators.dedup import rp_sketch_rows

        idc = self.id_col
        delta_rows = rp_sketch_rows(
            delta, self.vec_col, idc, **self._params()
        ).cache()
        _CACHED_RELATIONS.append(delta_rows)
        index_rows = self.tbl.read()
        cross = (
            delta_rows.alias("x")
            .join(
                index_rows.alias("y"),
                (F.col("x.table_id") == F.col("y.table_id"))
                & (F.col("x.sketch") == F.col("y.sketch"))
                & (F.col("x._id") != F.col("y._id")),
            )
            .select(
                F.least("x._id", "y._id").alias("vec_a"),
                F.greatest("x._id", "y._id").alias("vec_b"),
            )
        )
        within = (
            delta_rows.alias("x")
            .join(
                delta_rows.alias("y"),
                (F.col("x.table_id") == F.col("y.table_id"))
                & (F.col("x.sketch") == F.col("y.sketch"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(
                F.col("x._id").alias("vec_a"), F.col("y._id").alias("vec_b")
            )
        )
        cand = cross.unionByName(within).distinct().cache()
        _CACHED_RELATIONS.append(cand)
        cand_ids = (
            cand.select(F.col("vec_a").alias(idc))
            .unionByName(cand.select(F.col("vec_b").alias(idc)))
            .distinct()
        )
        vecs = (
            corpus_now.join(cand_ids, idc, "left_semi")
            .select(
                F.col(idc).alias("_id"),
                F.col(self.vec_col).alias("_v"),
                l2_norm(self.vec_col).alias("_n"),
            )
            .cache()
        )
        _CACHED_RELATIONS.append(vecs)
        verified = (
            cand.join(
                vecs.select(
                    F.col("_id").alias("vec_a"),
                    F.col("_v").alias("va"),
                    F.col("_n").alias("na"),
                ),
                "vec_a",
            )
            .join(
                vecs.select(
                    F.col("_id").alias("vec_b"),
                    F.col("_v").alias("vb"),
                    F.col("_n").alias("nb"),
                ),
                "vec_b",
            )
            .withColumn(
                "cosine", dot("va", F.col("vb")) / (F.col("na") * F.col("nb"))
            )
            .where(F.col("cosine") >= self.threshold)
            .select("vec_a", "vec_b", "cosine")
        )
        if txn is None:
            self.tbl.append(delta_rows)
        else:
            from nebuia_vector_db_spark.streaming.sinks import (
                transactional_append,
            )

            transactional_append(
                self.spark, self.tbl.path, delta_rows, txn[1], txn[0]
            )
        return verified

    def ingest_commit(
        self, corpus_tbl: SnapshotTable, version: int | None = None
    ) -> DataFrame:
        v = corpus_tbl.current_version() if version is None else version
        delta = (
            corpus_tbl.changes(v - 1, v)
            .where(F.col("_change") == "insert")
            .drop("_change", "_commit_version")
        )
        return self.ingest(delta, corpus_tbl.read(v))

    def retract(self, ids: list) -> int:
        return self.tbl.delete_where(F.col("_id").isin(list(ids)))
