"""Incremental cross-snapshot dedup (round 12, VERDICT r11 "What's
missing" #1): dedup a NEW commit's rows against the existing corpus
WITHOUT rescanning it.

The continuously-crawled-corpus operation: a 100 TB corpus ingests a
daily delta that is a fraction of a percent of the table, and the
near-dup question for that delta is "does any NEW doc duplicate any
EXISTING doc (or another new doc)?". Re-running full-corpus
``minhash_lsh_pairs`` per ingest re-tokenizes, re-hashes and re-joins
the entire history — O(corpus) per day. This module persists the LSH
blocking relation as its own :class:`SnapshotTable` index — MinHash
bands for text (``dedup.minhash_band_rows`` — (_id, band_id,
band_hash), ~bands·16 B per doc), random-hyperplane sign sketches
for embeddings (``dedup.rp_sketch_rows``), or winnowed k-gram anchor
postings for span-level substring dedup (round 13,
``dedup._substring_anchors`` — see :class:`SubstringAnchorIndex`) —
and per commit:

1. sketches ONLY the delta (one Arrow pass over the new rows —
   O(churn));
2. joins the delta's sketch rows against the persisted index (the
   delta side is churn-sized, so AQE broadcasts it; the index side is
   an equi-join on the sketch key — posting-list sized, never
   all-pairs) plus a delta×delta self-join;
3. verifies candidates EXACTLY (Jaccard on shingle sets / cosine on
   raw vectors) against the CURRENT corpus snapshot, reading payload
   for candidate ids only (a churn-bounded semi-join; with the corpus
   Z-ordered/clustered by id the snapshot scan is also file-skipped);
4. appends the delta's sketch rows to the index ATOMICALLY (CAS
   commit), so a crashed ingest never half-updates the index and the
   index version history mirrors the corpus's.

Because the permutations/planes are seeded and the fold expressions
are shared with the batch operators, incremental candidates are
bit-identical to the full-corpus self-join's for pairs touching the
delta — so ``ingest() ≡ <full-corpus pairs> restricted to pairs with
a delta member`` (the ``dedup_incremental`` /
``vs_neardup_incremental`` registry rows hash-certify this against
DuckDB replays; tests pin incremental ≡ from-scratch on planted
duplicates).

Deletes and updates: :meth:`ingest_commit` retracts the bands of the
commit's DELETED ids before ingesting its inserts (COW delete on the
index, churn-bounded), so an UPDATE commit (delete+insert at one
version, the CDF upsert convention) replaces the doc's bands instead
of silently accumulating a second set per ``_id``. With
``retract_deletes=False`` stale bands stay — candidate noise, never
correctness (the verify join against the current corpus drops pairs
whose partner no longer exists) — and :meth:`retract` is the manual
hygiene pass.

Reference scope note: the reference engine (main.go) has no
incremental anything — this is extension tier, composed entirely from
existing parts (snapshot.changes + the dedup sketch kernels + the
exact verify tails).
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

# churn size above which a delete-retraction stops collecting ids into
# a literal isin() predicate (plan bloat + driver memory, ADVICE r14)
# and goes down SnapshotTable.delete_matching's anti-join path instead
_RETRACT_LIST_MAX = 10_000


def _retract_matching(retract_fn, ids_df: DataFrame, list_max: int | None = None):
    """Route a delete-retraction down the list or DataFrame path by
    PROBING, not counting: ``limit(list_max+1).collect()`` ships at
    most list_max+1 ids — small churn keeps the cheap literal-list
    COW delete, anything larger passes the DataFrame through so the
    ids stay distributed (round 15, VERDICT r14 task #6).
    ``retract_fn`` must accept either a list or a DataFrame (the
    :meth:`_SketchIndexBase.retract` convention)."""
    if list_max is None:
        list_max = _RETRACT_LIST_MAX
    sample = ids_df.limit(list_max + 1).collect()
    if not sample:
        return 0
    if len(sample) <= list_max:
        return retract_fn([r[0] for r in sample])
    return retract_fn(ids_df)


def _shingle_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(_id, _shingles) — the exact-Jaccard verify input, same
    tokenize/shingle arithmetic as dedup.minhash_lsh_pairs."""
    return with_tokens(docs, text_col).select(
        F.col(id_col).alias("_id"),
        shingles_from_tokens("_toks", n).alias("_shingles"),
    )


class _SketchIndexBase:
    """Shared skeleton of the three incremental indexes (the
    code-review r12 dedup: the txn/append tail, the pinned-read
    ordering, the candidate/verify delegation, the parameter guard
    and the change-feed driver live ONCE — subclasses supply the
    sketch kernel, the pair generation or verify tail, and the
    column names). MinHash bands (text), RP sign sketches
    (embeddings) share the default sketch-equality ``_pair_rows``;
    the winnowed anchor postings (substring spans, round 13)
    override it."""

    # subclass contract ------------------------------------------------
    _PARAMS_META_KEY: str = ""
    _KEY_COLS: tuple[str, str] = ("", "")
    _OUT_A: str = "a"
    _OUT_B: str = "b"
    _EMPTY_SEED_SCHEMA: str = ""
    #: True when stale index rows of deleted/UPDATED docs are mere
    #: candidate noise because an exact verify against the CURRENT
    #: corpus recomputes the score from live payload (the sketch
    #: indexes). False when the index rows themselves carry the
    #: evidence (the substring postings), so an updated doc's stale
    #: rows would produce WRONG output pairs — retract_deletes=False
    #: is then refused (code-review r13).
    _STALE_ROWS_ARE_NOISE: bool = True

    def _params(self) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    def _sketch_rows(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _verify(
        self, cand: DataFrame, corpus_now: DataFrame
    ) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    # shared ------------------------------------------------------------
    def _open(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.tbl = SnapshotTable(spark, path)
        stored = (
            self.tbl.meta(self._PARAMS_META_KEY)
            if self.tbl.versions()
            else None
        )
        if stored is not None and stored != self._params():
            raise ValueError(
                f"index at {path} was built with {stored}, opened with "
                f"{self._params()} — mismatched sketch parameters would "
                "join garbage; reopen with the stored parameters or "
                "rebuild"
            )

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame | None = None,
        **kw,
    ):
        """Create the index table; with ``corpus``, seed it with the
        existing corpus's sketch rows (the one-time full pass — every
        later ingest is O(churn)). With ``corpus=None`` the empty
        seed declares ``_id long`` — for string-keyed corpora pass
        the (possibly empty-filtered) corpus instead, so the schema
        carries the real id type (appending string ids into a
        long-typed table would cast-mangle them)."""
        # a throwaway instance against a phantom path: resolves kw
        # defaults + the sketch kernel without touching disk (the
        # phantom table has no versions, so the param guard is inert)
        probe = cls(spark, path + ".__param_probe__", **kw)
        seed = (
            probe._sketch_rows(corpus)
            if corpus is not None
            else spark.createDataFrame([], cls._EMPTY_SEED_SCHEMA)
        )
        SnapshotTable.create(
            spark, path, seed,
            extra_meta={cls._PARAMS_META_KEY: probe._params()},
        )
        return cls(spark, path, **kw)

    def ingest(
        self,
        delta: DataFrame,
        corpus_now: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> DataFrame:
        """Sketch ``delta``, pair it against the persisted index and
        itself, verify exactly against ``corpus_now`` (the POST-commit
        corpus — must contain the delta rows), and atomically append
        the delta's sketch rows to the index.

        Returns (a, b, score) with a < b — exactly the full-corpus
        batch operator's output restricted to pairs touching the
        delta. ``delta`` ids must be NEW to the index
        (:meth:`ingest_commit` guarantees this, retracting an update
        commit's deleted ids first).

        ``txn=(app, txn_id)`` makes the sketch append IDEMPOTENT for
        streaming replays (the foreachBatch at-least-once contract):
        it routes through the stream-watermark CAS append, so a
        replayed micro-batch skips the duplicate write — and the
        recomputed pair set is unchanged anyway: for the sketch
        indexes the delta's rows being already IN the index only
        moves within-delta pairs from the self-join to the cross join
        and ``distinct`` collapses them; the COUNT-shaped substring
        subclass instead anti-joins its own delta ids out of the
        pinned index read (see its ``_pair_rows``), which restores
        the pre-append view exactly."""
        delta_rows = self._sketch_rows(delta).cache()
        _CACHED_RELATIONS.append(delta_rows)
        # pin the index snapshot BEFORE appending the delta's rows
        # (read() resolves the file list eagerly, so the later append
        # cannot leak delta×delta pairs through the cross join)
        index_rows = self.tbl.read()
        verified = self._pair_rows(delta_rows, index_rows, corpus_now)
        # atomic index advance: the delta's rows land as ONE commit
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

    def _pair_rows(
        self,
        delta_rows: DataFrame,
        index_rows: DataFrame,
        corpus_now: DataFrame,
    ) -> DataFrame:
        """Candidate generation + exact verify for one ingest — the
        default is the sketch-equality shape shared by the MinHash and
        RP-LSH indexes (equi-join on ``_KEY_COLS``, distinct pairs,
        then the subclass's exact verify against the corpus);
        :class:`SubstringAnchorIndex` overrides it because the anchor
        postings need the corpus-global df-cap and a shared-anchor
        COUNT, not pair identity."""
        k1, k2 = self._KEY_COLS
        a, b = self._OUT_A, self._OUT_B
        cross = (
            delta_rows.alias("x")
            .join(
                index_rows.alias("y"),
                (F.col(f"x.{k1}") == F.col(f"y.{k1}"))
                & (F.col(f"x.{k2}") == F.col(f"y.{k2}"))
                & (F.col("x._id") != F.col("y._id")),
            )
            .select(
                F.least("x._id", "y._id").alias(a),
                F.greatest("x._id", "y._id").alias(b),
            )
        )
        within = (
            delta_rows.alias("x")
            .join(
                delta_rows.alias("y"),
                (F.col(f"x.{k1}") == F.col(f"y.{k1}"))
                & (F.col(f"x.{k2}") == F.col(f"y.{k2}"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(F.col("x._id").alias(a), F.col("y._id").alias(b))
        )
        # candidate pairs are churn-bounded: persist them, or the
        # union feeding the verify id set + the two verify joins would
        # re-run the sketch joins THREE times (measured 3× at the 80k
        # bench tier, round 12)
        cand = cross.unionByName(within).distinct().cache()
        _CACHED_RELATIONS.append(cand)
        return self._verify(cand, corpus_now)

    def _cand_ids(self, cand: DataFrame, id_col: str) -> DataFrame:
        """Distinct candidate ids — the churn-bounded verify fetch
        set; the semi-join against the corpus is deliberately
        unhinted (AQE broadcasts when it fits; a hot-crawl day can
        make the candidate set large — the leakage_safe_split
        discipline)."""
        return (
            cand.select(F.col(self._OUT_A).alias(id_col))
            .unionByName(cand.select(F.col(self._OUT_B).alias(id_col)))
            .distinct()
        )

    def ingest_feed(
        self,
        feed_slice: DataFrame,
        corpus_at_v: DataFrame,
        txn: tuple[str, int] | None = None,
        retract_deletes: bool = True,
        _replay_bands_done: bool = False,
    ) -> DataFrame:
        """Drive :meth:`ingest` from ONE commit's change-feed slice
        (rows carrying ``_change``/``_commit_version``): retract the
        commit's deleted ids from the index (so an UPDATE commit —
        delete+insert at one version, the CDF upsert convention —
        REPLACES its doc's sketch rows instead of accumulating a
        second set), then ingest its inserts, verifying against the
        commit's snapshot. The single change-feed driver for BOTH the
        batch path (:meth:`ingest_commit`) and the streaming loop
        (code-review r12: the convention must not exist twice). The
        retract alone is naturally idempotent (re-deleting absent ids
        is a no-op) — but see stream_dedup_ingest's watermark guard
        for why a REPLAYED already-committed version must skip this
        whole method, retract included."""
        # _replay_bands_done is the stream driver's private channel
        # (see stream_dedup_ingest): the version's retract+bands
        # append already COMMITTED in a first attempt, so the retract
        # must be skipped here (re-retracting would delete the new
        # rows the watermark-guarded append declines to rewrite) and
        # no stale rows exist — the stale-row refusal below does not
        # apply.
        if _replay_bands_done:
            retract_deletes = False
        elif not retract_deletes and not self._STALE_ROWS_ARE_NOISE:
            raise ValueError(
                f"{type(self).__name__} cannot run with "
                "retract_deletes=False: its index rows carry the match "
                "evidence itself (no exact re-verify against the live "
                "corpus exists to drop them), so an UPDATE commit's "
                "stale rows would produce wrong pairs — retract, or "
                "use a sketch index"
            )
        id_col = self._corpus_id_col()
        if retract_deletes:
            _retract_matching(
                self.retract,
                feed_slice.where(F.col("_change") == "delete")
                .select(F.col(id_col).alias("_id"))
                .distinct(),
            )
        delta = feed_slice.where(F.col("_change") == "insert").drop(
            "_change", "_commit_version"
        )
        return self.ingest(delta, corpus_at_v, txn=txn)

    def ingest_commit(
        self,
        corpus_tbl: SnapshotTable,
        version: int | None = None,
        retract_deletes: bool = True,
    ) -> DataFrame:
        """:meth:`ingest_feed` over commit ``version``'s change feed,
        verified against the post-commit snapshot."""
        v = corpus_tbl.current_version() if version is None else version
        return self.ingest_feed(
            corpus_tbl.changes(v - 1, v),
            corpus_tbl.read(v),
            retract_deletes=retract_deletes,
        )

    def _corpus_id_col(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def retract(self, ids) -> int:
        """COW-delete the sketch rows of removed docs (stale-row
        hygiene — optional when deletes aren't retracted at ingest:
        stale rows cost candidate noise, not correctness). ``ids`` is
        a driver-side churn-bounded list, or (round 15, VERDICT r14
        task #6) a single-column DataFrame of ids — the large-churn
        form, COW-retracted via :meth:`SnapshotTable.delete_matching`'s
        anti-join so no id literal ever enters a plan."""
        if isinstance(ids, DataFrame):
            return self.tbl.delete_matching(
                ids.select(F.col(ids.columns[0]).alias("_id"))
            )
        return self.tbl.delete_where(F.col("_id").isin(list(ids)))


class MinhashBandIndex(_SketchIndexBase):
    """A persisted MinHash band index over a document corpus, stored
    as a :class:`SnapshotTable` of (_id, band_id, band_hash); pairs
    verified with exact Jaccard on shingle sets."""

    _PARAMS_META_KEY = "minhash_index_params"
    _KEY_COLS = ("band_id", "band_hash")
    _OUT_A, _OUT_B = "doc_a", "doc_b"
    _EMPTY_SEED_SCHEMA = "_id long, band_id int, band_hash long"

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
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self._open(spark, path)

    def _params(self) -> dict:
        return {"n": self.n, "num_perm": self.num_perm, "bands": self.bands}

    def _corpus_id_col(self) -> str:
        return self.id_col

    def _sketch_rows(self, df: DataFrame) -> DataFrame:
        return minhash_band_rows(
            df, self.text_col, self.id_col,
            self.n, self.num_perm, self.bands,
        )

    def _verify(self, cand: DataFrame, corpus_now: DataFrame) -> DataFrame:
        """Exact-Jaccard verify over candidate ids only; the shingle
        sets are persisted — joined once per pair side, and each
        recompute would re-scan the corpus."""
        idc = self.id_col
        sets = _shingle_sets(
            corpus_now.join(self._cand_ids(cand, idc), idc, "left_semi"),
            self.text_col, idc, self.n,
        ).cache()
        _CACHED_RELATIONS.append(sets)
        return (
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


class EmbeddingSketchIndex(_SketchIndexBase):
    """The embedding-modality twin of :class:`MinhashBandIndex`:
    random-hyperplane sign sketches (``dedup.rp_sketch_rows`` — same
    seeded kernel as ``embedding_neardup_lsh``, so incremental
    candidates are bit-identical to the full-corpus join's) persisted
    as (_id, table_id, sketch); pairs verified with exact cosine on
    vectors fetched for candidate ids only. Hash-certified by the
    ``vs_neardup_incremental`` registry row at the recall-1 sketch
    settings the vs_neardup_lsh row pins."""

    _PARAMS_META_KEY = "rp_sketch_index_params"
    _KEY_COLS = ("table_id", "sketch")
    _OUT_A, _OUT_B = "vec_a", "vec_b"
    _EMPTY_SEED_SCHEMA = "_id long, table_id int, sketch long"

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
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.dim = dim
        self.seed = seed
        self._open(spark, path)

    def _params(self) -> dict:
        return {
            "n_planes": self.n_planes,
            "n_tables": self.n_tables,
            "dim": self.dim,
            "seed": self.seed,
        }

    def _corpus_id_col(self) -> str:
        return self.id_col

    def _sketch_rows(self, df: DataFrame) -> DataFrame:
        from nebuia_vector_db_spark.operators.dedup import rp_sketch_rows

        return rp_sketch_rows(
            df, self.vec_col, self.id_col, **self._params()
        )

    def _verify(self, cand: DataFrame, corpus_now: DataFrame) -> DataFrame:
        from nebuia_vector_db_spark.functions.vector import dot, l2_norm

        idc = self.id_col
        vecs = (
            corpus_now.join(self._cand_ids(cand, idc), idc, "left_semi")
            .select(
                F.col(idc).alias("_id"),
                F.col(self.vec_col).alias("_v"),
                l2_norm(self.vec_col).alias("_n"),
            )
            .cache()
        )
        _CACHED_RELATIONS.append(vecs)
        return (
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


class SubstringAnchorIndex(_SketchIndexBase):
    """Incremental SPAN-LEVEL dedup (round 13, VERDICT r12 missing
    #2): the third :class:`_SketchIndexBase` subclass, persisting the
    winnowed k-gram anchor posting relation of
    ``dedup.exact_substring_pairs`` (``dedup.py`` ``_substring_anchors``
    — positional winnowing, recall 1.0 for spans ≥ winnow_w + k − 1)
    as a SnapshotTable of (_id, gram). A copied PARAGRAPH arriving in
    tomorrow's crawl is exactly what doc-level MinHash misses and a
    daily incremental pass must catch.

    Per commit: anchor-extract ONLY the delta (the O(n·w) winnowing
    scan — the dominant from-scratch cost — runs over churn chars, not
    corpus chars), join it against the persisted postings, count
    shared anchors per pair, and append the delta's postings in the
    same CAS commit discipline as the sketch indexes.

    Where this subclass differs from the sketch-equality base shape
    (why :meth:`_pair_rows` is overridden):

    - **corpus-global df-cap**: ``exact_substring_pairs`` drops
      anchors whose posting list exceeds ``max_anchor_df`` BEFORE the
      self-join (the boilerplate-gram skew guard). Hotness is a
      corpus-wide property, so the incremental pass computes each
      DELTA gram's total df = persisted-postings count + delta count
      (only delta grams can link a delta-touching pair, so counting
      them suffices) and drops over-cap grams from BOTH join sides —
      bit-identical to the from-scratch cap over base ∪ delta.
    - **shared-anchor COUNT, not pair identity**: the output is
      (doc_a, doc_b, n_shared ≥ min_shared); counts survive the join
      directly (cross and within pair sets are disjoint — delta ids
      are new to the index by contract — so no re-aggregation across
      branches), and there is no separate verify fetch: anchors are
      collision-free gram STRINGS, already exact. ``corpus_now`` is
      used only for an existence semi-join — which drops stale
      postings of DELETED docs, but cannot drop an UPDATED doc's
      (the doc is still alive; its old text's postings would pair as
      if the old text were). Because no exact re-verify against live
      payload exists here, ``retract_deletes=False`` is REFUSED for
      this subclass (``_STALE_ROWS_ARE_NOISE = False``,
      code-review r13) instead of silently risking wrong pairs.

    Cost per ingest: one winnowing pass over the delta + ONE
    column-pruned scan of the postings table (the df count and the
    cross join, both semi-join-restricted to delta grams) — vs
    from-scratch's full-corpus re-winnowing (O(corpus chars · w) md5
    HOF work) plus the full postings self-join. The
    ``dedup_substring_incremental`` registry row hash-certifies
    incremental ≡ from-scratch restricted to pairs touching the delta
    (the ``dedup_incremental`` discipline); bench b22 pins the churn
    fraction and the ingest-vs-full ratio.
    """

    _PARAMS_META_KEY = "substring_index_params"
    _KEY_COLS = ("gram", "gram")  # single-key family; see _pair_rows
    _OUT_A, _OUT_B = "doc_a", "doc_b"
    _EMPTY_SEED_SCHEMA = "_id long, gram string"
    _STALE_ROWS_ARE_NOISE = False  # postings ARE the evidence

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 32,
        min_shared: int = 2,
        text_col: str = "text",
        id_col: str = "doc_id",
        segment_chars: int = 4096,
        max_anchor_df: int = 1024,
        winnow_w: int = 32,
    ) -> None:
        self.k = k
        self.min_shared = min_shared
        self.text_col = text_col
        self.id_col = id_col
        self.segment_chars = segment_chars
        self.max_anchor_df = max_anchor_df
        self.winnow_w = winnow_w
        self._open(spark, path)

    def _params(self) -> dict:
        # min_shared/max_anchor_df are QUERY-time semantics, not index
        # layout — the persisted postings are parameterized only by
        # the extraction (k, segmentation, winnow width), so those are
        # what a reopen must match
        return {
            "k": self.k,
            "segment_chars": self.segment_chars,
            "winnow_w": self.winnow_w,
        }

    def _corpus_id_col(self) -> str:
        return self.id_col

    def _sketch_rows(self, df: DataFrame) -> DataFrame:
        from nebuia_vector_db_spark.operators.dedup import (
            _substring_anchors,
        )

        return _substring_anchors(
            df, self.k, self.text_col, self.id_col,
            self.segment_chars, self.winnow_w,
        ).select(F.col("doc_id").alias("_id"), "gram")

    def _pair_rows(
        self,
        delta_rows: DataFrame,
        index_rows: DataFrame,
        corpus_now: DataFrame,
    ) -> DataFrame:
        # postings of DELTA grams only — the one postings-table scan
        # this ingest pays; persisted because both the df count and
        # the cross join consume it. The anti-join on delta ids is the
        # REPLAY-IDEMPOTENCE guard (code-review r13): after a crash
        # between the bands-lane and pairs-lane appends, the replayed
        # recompute reads an index that already holds the delta's own
        # postings — without the exclusion a within-delta pair would
        # count 3× (within + both cross orientations) and the df count
        # would double-count delta postings, flipping the cap for
        # grams within delta_df of it. The sketch indexes are immune
        # (distinct pair identity — see ingest's txn note); this
        # COUNT-shaped subclass is not. On the clean path the new-ids
        # contract makes the exclusion a no-op.
        delta_ids = delta_rows.select("_id").distinct()
        idx_rel = (
            index_rows.join(
                delta_rows.select("gram").distinct(), "gram", "left_semi"
            )
            .join(delta_ids, "_id", "left_anti")
            .cache()
        )
        _CACHED_RELATIONS.append(idx_rel)
        # corpus-global df per delta gram = persisted count + delta
        # count (disjoint doc sets by the new-ids contract, distinct
        # (doc, gram) rows by _substring_anchors) — grams over the cap
        # are boilerplate and are dropped from BOTH sides, exactly the
        # from-scratch guard. The over-cap set is tiny by definition
        # (same argument as exact_substring_pairs) — broadcast it.
        hot = (
            idx_rel.unionByName(delta_rows)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > self.max_anchor_df)
            .select("gram")
        )
        kept_delta = delta_rows.join(F.broadcast(hot), "gram", "left_anti")
        kept_idx = idx_rel.join(F.broadcast(hot), "gram", "left_anti")
        cross = (
            kept_delta.alias("x")
            .join(kept_idx.alias("y"), "gram")
            .where(F.col("x._id") != F.col("y._id"))
            .select(
                F.least("x._id", "y._id").alias("doc_a"),
                F.greatest("x._id", "y._id").alias("doc_b"),
            )
        )
        within = (
            kept_delta.alias("x")
            .join(
                kept_delta.alias("y"),
                (F.col("x.gram") == F.col("y.gram"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(
                F.col("x._id").alias("doc_a"),
                F.col("y._id").alias("doc_b"),
            )
        )
        # one shared-gram row per (pair, gram): cross pairs (delta ×
        # index) and within pairs (delta × delta) are disjoint PAIR
        # sets, so a single groupBy over the union counts each pair's
        # shared anchors exactly once
        pairs = (
            cross.unionByName(within)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= self.min_shared)
        )
        # existence filter (mirrors the sketch indexes' verify join):
        # with retract_deletes=True this is a no-op; without it, stale
        # postings of deleted docs become candidate noise that must
        # not reach the output
        alive = corpus_now.select(F.col(self.id_col).alias("_alive"))
        return (
            pairs.join(
                alive.withColumnRenamed("_alive", "doc_a"), "doc_a",
                "left_semi",
            )
            .join(
                alive.withColumnRenamed("_alive", "doc_b"), "doc_b",
                "left_semi",
            )
            .select("doc_a", "doc_b", "n_shared")
        )


class SemDedupClusterIndex:
    """Incremental SemDeDup (round 14, VERDICT r13 task #3): the
    FOURTH incremental index family, making the SEMANTIC dedup tier
    O(churn) per commit like the doc-sketch, embedding-sketch and
    span families.

    Deliberately NOT a :class:`_SketchIndexBase` subclass: the three
    sketch families emit verified PAIRS restricted to the delta, but
    SemDeDup's unit of recomputation is the CLUSTER — the keep rule
    compares members against the cluster CENTROID (semdedup.py,
    Abbas et al. 2023), and every arrival/departure shifts its
    cluster's centroid, changing existing members' ``sim_centroid``
    and potentially their keep/drop outcomes. A commit's output is
    therefore the full decision set of every TOUCHED cluster
    (a cluster any delta/deleted vector maps to), and the
    certification target is ``ingest ≡ from-scratch semdedup over
    the post-commit corpus RESTRICTED to touched clusters`` (the
    ``dedup_semdedup_incremental`` registry row hash-certifies this
    against the full DuckDB replay; pytest pins insert, delete and
    update commits against a from-scratch pass).

    Persisted state (two SnapshotTables under ``path``):

    - ``path/assign`` — (_id, bucket): the cluster ASSIGNMENTS. The
      bucket is a pure function of the embedding (md5-hyperplane
      signs), but without this relation "who is in the touched
      clusters?" would need a full-corpus re-bucketing scan per
      commit; with it, membership is a posting-list semi-join.
      Deletes are COW-retracted (churn-bounded ``delete_where``).
    - ``path/cent`` — (bucket, d, qs, n): an APPEND-ONLY ledger of
      quantized INTEGER centroid partial sums
      (semdedup.quantized_centroid_rows). Inserts append positive
      rows, deletes append negated rows; the current centroid folds
      the ledger with exact BIGINT adds
      (semdedup.centroids_from_rows), so the maintained centroid is
      bit-identical to a from-scratch aggregation — integer adds
      commute, and deletion is an exact inverse. Append-only means
      the centroid advance is ONE CAS commit (idempotent under
      ``txn`` for streaming replays), never a read-modify-write.

    Contract: an insert's id must be NEW to the index (the base-class
    contract) — re-inserting a live id without its delete would
    double-count the ledger; an UPDATE is the CDF delete+insert pair,
    whose delete rows carry the OLD embedding, making the subtraction
    exact. ``id_col`` must be LONG-typed (the engine-wide integer-id
    convention): :meth:`create` with ``corpus=None`` pins the empty
    assign seed to ``_id long``, so a non-long id corpus would fail
    on its first ingest append (ADVICE r14; with a seed corpus the
    type is derived from it, but the contract is long either way so
    empty-seeded and corpus-seeded indexes stay interchangeable).

    Per commit: bucket ONLY the delta/deleted vectors (O(churn) md5
    HOF work), append the ledger rows, retract+append assignments,
    then re-run the keep rule over members of touched clusters only
    — member vectors fetched from the post-commit corpus via an id
    semi-join (touched-cluster-bounded, never a corpus scan; with
    the corpus clustered by id the scan is also file-skipped). Work
    is O(churn · avg_cluster_size), independent of corpus size;
    ``n_planes`` scales cluster count as 2^planes ≈ N/target like
    the paper's k ≈ √N guidance, keeping cluster size bounded as the
    corpus grows.
    """

    _PARAMS_META_KEY = "semdedup_index_params"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.45,
        n_planes: int = 6,
        dim: int = 64,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        max_bucket: int = 128,
    ) -> None:
        self.spark = spark
        self.path = path
        self.threshold = threshold
        self.n_planes = n_planes
        self.dim = dim
        self.vec_col = vec_col
        self.id_col = id_col
        self.max_bucket = max_bucket
        self.assign = SnapshotTable(spark, path + "/assign")
        self.cent = SnapshotTable(spark, path + "/cent")
        stored = (
            self.assign.meta(self._PARAMS_META_KEY)
            if self.assign.versions()
            else None
        )
        if stored is not None and stored != self._params():
            raise ValueError(
                f"index at {path} was built with {stored}, opened with "
                f"{self._params()} — mismatched bucketing would mix "
                "incompatible cluster ids; reopen with the stored "
                "parameters or rebuild"
            )

    def _params(self) -> dict:
        # threshold/max_bucket are QUERY-time semantics; the persisted
        # assignments and sums are parameterized only by the bucketing
        return {"n_planes": self.n_planes, "dim": self.dim}

    def _assign_rows(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        from nebuia_vector_db_spark.operators.semdedup import rp_bucket

        # long-id contract (class docstring; ADVICE r14): the empty
        # create() seed pins `_id long`, so reject non-integral ids
        # loudly here instead of mismatching on the first append.
        dt = df.schema[self.id_col].dataType
        if not isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            raise TypeError(
                f"SemDedupClusterIndex: id_col {self.id_col!r} must be "
                f"an integral type (long-id contract), got {dt}"
            )
        return df.select(
            F.col(self.id_col).cast("long").alias("_id"),
            rp_bucket(self.vec_col, self.n_planes, self.dim).alias(
                "bucket"
            ),
        )

    def _retract_assign(self, ids) -> int:
        """COW-retract assignment rows by id — list (literal-isin
        predicate, small churn) or single-column DataFrame
        (delete_matching anti-join, large churn); the ledger is NOT
        touched here (deletion there is the separate negated-row
        append, see ingest_feed)."""
        if isinstance(ids, DataFrame):
            return self.assign.delete_matching(
                ids.select(F.col(ids.columns[0]).alias("_id"))
            )
        return self.assign.delete_where(F.col("_id").isin(list(ids)))

    def _cent_rows(self, df: DataFrame, sign: int = 1) -> DataFrame:
        from nebuia_vector_db_spark.operators.semdedup import (
            quantized_centroid_rows,
            rp_bucket,
        )

        rows = quantized_centroid_rows(
            df.select(
                rp_bucket(self.vec_col, self.n_planes, self.dim).alias(
                    "bucket"
                ),
                F.col(self.vec_col).alias("_v"),
            )
        )
        if sign < 0:
            rows = rows.select(
                "bucket",
                "d",
                (-F.col("qs")).alias("qs"),
                (-F.col("n")).alias("n"),
            )
        return rows

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame | None = None,
        **kw,
    ):
        """Create the two state tables; with ``corpus``, seed them
        from the existing corpus (the one-time full pass — every
        later ingest is O(churn))."""
        probe = cls(spark, path + ".__param_probe__", **kw)
        if corpus is not None:
            assign_seed = probe._assign_rows(corpus)
            cent_seed = probe._cent_rows(corpus)
        else:
            assign_seed = spark.createDataFrame(
                [], "_id long, bucket long"
            )
            cent_seed = spark.createDataFrame(
                [], "bucket long, d int, qs long, n long"
            )
        SnapshotTable.create(
            spark, path + "/assign", assign_seed,
            extra_meta={cls._PARAMS_META_KEY: probe._params()},
        )
        SnapshotTable.create(spark, path + "/cent", cent_seed)
        return cls(spark, path, **kw)

    def ingest_feed(
        self,
        feed_slice: DataFrame,
        corpus_at_v: DataFrame,
        txn: tuple[str, int] | None = None,
        _replay_assign_done: bool = False,
    ) -> DataFrame:
        """Advance the index by ONE commit's change-feed slice and
        return the post-commit SemDeDup decisions — (vec_id, bucket,
        sim_centroid, dropped) — for every member of every TOUCHED
        cluster. Delete rows must carry the embedding payload (the
        CDF convention: snapshot.changes replays full rows), which is
        what lets the ledger subtract the exact quantized components
        the row once added.

        ``txn=(lane, version)`` routes both state appends through the
        stream-watermark CAS (lanes ``{lane}:assign`` /
        ``{lane}:cent``) for exactly-once under foreachBatch replays.
        ``_replay_assign_done`` is the stream driver's private
        channel (stream_semdedup_ingest — the stream_dedup_ingest
        convention): when the version's retract + assignment append
        already COMMITTED in a first attempt, the retract must be
        skipped here — an UPDATE commit's re-retract would COW-delete
        the doc's NEW assignment row while the watermark-guarded
        append declines to rewrite it, silently dropping the doc from
        the index (the r12 second-review bug class)."""
        dels = feed_slice.where(F.col("_change") == "delete").drop(
            "_change", "_commit_version"
        )
        ins = feed_slice.where(F.col("_change") == "insert").drop(
            "_change", "_commit_version"
        )
        ins_assign = self._assign_rows(ins).cache()
        del_assign = self._assign_rows(dels).cache()
        _CACHED_RELATIONS.extend([ins_assign, del_assign])
        touched = (
            ins_assign.select("bucket")
            .unionByName(del_assign.select("bucket"))
            .distinct()
            .cache()
        )
        _CACHED_RELATIONS.append(touched)
        # ledger advance: ONE append of (+insert, −delete) rows —
        # exact integer maintenance, idempotent under txn replays
        cent_delta = self._cent_rows(ins).unionByName(
            self._cent_rows(dels, sign=-1)
        )
        # assignment advance: COW-retract deleted ids (churn-bounded
        # by contract, same discipline as _SketchIndexBase.retract —
        # incl. the r15 large-churn anti-join route), then append the
        # inserts
        if not _replay_assign_done:
            _retract_matching(
                self._retract_assign,
                del_assign.select("_id").distinct(),
            )
        if txn is None:
            self.assign.append(ins_assign)
            self.cent.append(cent_delta)
        else:
            from nebuia_vector_db_spark.streaming.sinks import (
                transactional_append,
            )

            transactional_append(
                self.spark, self.assign.path, ins_assign,
                txn[1], txn[0] + ":assign",
            )
            transactional_append(
                self.spark, self.cent.path, cent_delta,
                txn[1], txn[0] + ":cent",
            )
        # decisions for touched clusters from the UPDATED state:
        # centroids fold the ledger (touched rows only), members come
        # from the assignment postings — never a corpus re-bucketing
        from nebuia_vector_db_spark.operators.semdedup import (
            centroids_from_rows,
            semdedup,
        )

        cents = centroids_from_rows(
            self.cent.read().join(touched, "bucket", "left_semi")
        )
        member_ids = (
            self.assign.read()
            .join(touched, "bucket", "left_semi")
            .select(F.col("_id").alias(self.id_col))
        )
        member_vecs = corpus_at_v.join(
            member_ids, self.id_col, "left_semi"
        )
        return semdedup(
            member_vecs,
            threshold=self.threshold,
            n_planes=self.n_planes,
            dim=self.dim,
            vec_col=self.vec_col,
            id_col=self.id_col,
            max_bucket=self.max_bucket,
            centroids=cents,
        )

    def _assign_lane_done(self, lane: str, v: int) -> bool:
        """True iff the assignment lane's stream watermark already
        covers corpus version ``v`` — the replay detector shared by
        the batch and stream drivers."""
        if not self.assign.versions():
            return False
        marks = self.assign.meta("stream_watermarks") or {}
        last = marks.get(lane + ":assign")
        return last is not None and v <= last

    def ingest_commit(
        self, corpus_tbl: SnapshotTable, version: int | None = None
    ) -> DataFrame:
        """:meth:`ingest_feed` over commit ``version``'s change feed,
        decided against the post-commit snapshot.

        Unlike the sketch indexes — where a double-applied commit is
        mere candidate noise — a double-applied SemDeDup commit
        CORRUPTS state (the ledger double-counts the delta's sums),
        so this batch driver routes both appends through the
        stream-watermark CAS keyed by the corpus version under a
        fixed ``semdedup-batch`` lane: re-running a crashed or
        repeated ingest_commit for the same version skips the retract
        and the appends and just recomputes the decisions from the
        committed state. Don't mix this batch driver and
        stream_semdedup_ingest on one index — the lanes are
        independent watermarks and each would re-apply the other's
        versions."""
        v = corpus_tbl.current_version() if version is None else version
        lane = "semdedup-batch"
        return self.ingest_feed(
            corpus_tbl.changes(v - 1, v),
            corpus_tbl.read(v),
            txn=(lane, v),
            _replay_assign_done=self._assign_lane_done(lane, v),
        )


def stream_dedup_ingest(
    spark: SparkSession,
    corpus_path: str,
    index: _SketchIndexBase,
    pairs_path: str,
    checkpoint: str,
    start_version: int = 1,
    app: str | None = None,
):
    """Continuous incremental dedup (round 12): subscribe to the
    corpus SnapshotTable's CHANGE FEED and, PER COMMIT, ingest the
    inserts into the sketch index and append the discovered pairs to
    a pairs SnapshotTable — the daily dedup-at-ingest loop as a
    standing streaming query instead of a scheduled batch job.

    A micro-batch may carry SEVERAL commits; they are processed in
    version order, each verified against the corpus AT ITS OWN
    version — so the stream is exactly the per-commit
    ``ingest_commit`` replay even when a doc is inserted and deleted
    within one drain (processing the drain as a single merged delta
    would silently lose the transient pairs, the code-review r12
    finding). The batch is persisted for the loop (a 100-commit
    catch-up drain would otherwise re-read the source files ~2× per
    version) and each iteration's churn-bounded caches are released
    once its pairs are committed.

    Exactly-once end to end under foreachBatch's at-least-once
    replays: both the sketch append and the pairs append ride the
    stream-watermark CAS (streaming/sinks.py::transactional_append)
    keyed by the COMMIT VERSION — monotonic and unique across the
    stream, so a replayed micro-batch (same or re-split versions)
    duplicates nothing. Crucially a version AT OR BELOW the
    sketch-lane watermark is skipped WHOLE — retract included: a
    replayed update commit would otherwise delete the doc's NEW
    sketch rows while the watermark-guarded append declines to
    rewrite them, silently losing the doc from the index (the
    second-review r12 finding).

    ``start_version`` defaults to 1: the seed commit's documents are
    already sketched by ``create(corpus=...)``, so the feed begins
    AFTER it (delivering commits ``(start_version, ...]``). Runs
    Trigger.AvailableNow — call again to drain new commits."""
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
        batch = batch.persist()
        try:
            versions = sorted(
                r[0]
                for r in batch.select("_commit_version")
                .distinct()
                .collect()
            )
            def _lane_done(tbl_path: str, lane_key: str, v: int) -> bool:
                t = SnapshotTable(spark, tbl_path)
                if not t.versions():
                    return False
                last = (t.meta("stream_watermarks") or {}).get(lane_key)
                return last is not None and v <= last

            for v in versions:
                v = int(v)
                # replay guards (second-review r12): a version whose
                # sketch append already committed must NOT re-run the
                # retract — the watermark-skipped append would decline
                # to rewrite the updated doc's new rows and the
                # re-retract would delete them for good. If the pairs
                # append ALSO committed, the version is fully applied
                # and skipped whole; if only the sketch lane is done
                # (crash between the two appends), pairs are
                # recomputed retract-free — the delta's rows already
                # being in the index leaves the verified set unchanged
                # (see ingest's txn note) — and re-appended.
                bands_done = _lane_done(
                    index.tbl.path, lane + ":bands", v
                )
                if bands_done and _lane_done(
                    pairs_path, lane + ":pairs", v
                ):
                    continue
                pairs = index.ingest_feed(
                    batch.where(F.col("_commit_version") == v),
                    corpus.read(v),
                    txn=(lane + ":bands", v),
                    _replay_bands_done=bands_done,
                )
                transactional_append(
                    spark, pairs_path, pairs, v, lane + ":pairs"
                )
                # this version's churn-bounded caches served their
                # joins; don't let a catch-up drain accumulate them
                release_cached_relations()
        finally:
            batch.unpersist()

    return (
        feed.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_semdedup_ingest(
    spark: SparkSession,
    corpus_path: str,
    index: SemDedupClusterIndex,
    decisions_path: str,
    checkpoint: str,
    start_version: int = 1,
    app: str | None = None,
):
    """Continuous incremental SemDeDup (round 14): the
    :func:`stream_dedup_ingest` convention for the FOURTH index
    family — subscribe to the corpus SnapshotTable's change feed and,
    PER COMMIT, advance the cluster index and append the touched
    clusters' decisions to a decisions SnapshotTable. With this the
    whole incremental tier (doc-sketch, embedding-sketch, span,
    semantic) is drivable from the CDC stream.

    Exactly-once under foreachBatch's at-least-once replays is a
    THREE-lane watermark dance (the sketch indexes needed two): the
    assignment append ({lane}:assign), the centroid-ledger append
    ({lane}:cent) and the decisions append ({lane}:decisions) each
    ride the stream-watermark CAS keyed by the commit version. A
    version whose assign lane already committed skips the COW retract
    WHOLE (``_replay_assign_done`` — re-retracting an update commit's
    id would delete its NEW assignment row while the watermark-
    guarded append declines to rewrite it); the cent ledger is
    append-only so its lane self-guards; decisions are recomputed
    from the POST state either way — identical by construction — and
    their append self-guards. Versions are processed in order, each
    decided against the corpus AT ITS OWN version (the transient-doc
    discipline of stream_dedup_ingest).

    Runs Trigger.AvailableNow — call again to drain new commits."""
    from nebuia_vector_db_spark.operators import semdedup as _sd
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
        batch = batch.persist()
        try:
            versions = sorted(
                r[0]
                for r in batch.select("_commit_version")
                .distinct()
                .collect()
            )

            def _lane_done(tbl_path: str, lane_key: str, v: int) -> bool:
                t = SnapshotTable(spark, tbl_path)
                if not t.versions():
                    return False
                last = (t.meta("stream_watermarks") or {}).get(lane_key)
                return last is not None and v <= last

            for v in versions:
                v = int(v)
                assign_done = _lane_done(
                    index.assign.path, lane + ":assign", v
                )
                if assign_done and _lane_done(
                    index.cent.path, lane + ":cent", v
                ) and _lane_done(
                    decisions_path, lane + ":decisions", v
                ):
                    continue
                decisions = index.ingest_feed(
                    batch.where(F.col("_commit_version") == v),
                    corpus.read(v),
                    txn=(lane, v),
                    _replay_assign_done=assign_done,
                )
                transactional_append(
                    spark, decisions_path, decisions, v,
                    lane + ":decisions",
                )
                # this version's churn-bounded caches (and semdedup's
                # scored relation) served their joins — release before
                # the next version of a catch-up drain
                release_cached_relations()
                _sd.release_cached_relations()
        finally:
            batch.unpersist()

    return (
        feed.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_decontaminate(
    spark: SparkSession,
    corpus_path: str,
    eval_rel: DataFrame,
    decisions_path: str,
    checkpoint: str,
    n: int = 13,
    min_collide: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    start_version: int = 0,
    app: str | None = None,
):
    """Continuous DECONTAMINATION-at-ingest (round 15): subscribe to
    the corpus SnapshotTable's change feed and, per commit, scrub the
    inserted documents against the static benchmark relation
    (operators/pipeline.py::decontaminate_against — the GPT-3 §4
    13-gram gate), maintaining a decisions SnapshotTable that always
    mirrors ``decontaminate_against(live corpus, eval_rel)``. The
    decision is PER-DOC (each train doc vs the frozen benchmark —
    no cross-doc state), so stream ≡ batch holds by construction and
    the ``stream_decontaminate_mirror`` registry row SHARES the batch
    row's oracle: the standing crawl-ingest loop every production
    pipeline runs between acquisition and export, now on the same
    stream ≡ batch ≡ SQL discipline as the four incremental index
    families.

    Deletes RETRACT their decision rows (the corpus shrank, so must
    the mirror) through the churn-probed list/anti-join route —
    idempotent under replays (re-deleting absent ids is a no-op), and
    a version at or below the decisions lane's watermark is skipped
    whole. Appends ride the stream-watermark CAS keyed by commit
    version, so at-least-once redelivery duplicates nothing.
    ``start_version=0`` delivers the CREATE commit too (nothing is
    pre-scrubbed at seed time, unlike the index families whose
    ``create(corpus=...)`` seeds state)."""
    from nebuia_vector_db_spark.operators.pipeline import (
        decontaminate_against,
    )
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
    lane = (app if app is not None else checkpoint) + ":decisions"

    def _scrub(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            versions = sorted(
                r[0]
                for r in batch.select("_commit_version")
                .distinct()
                .collect()
            )
            for v in versions:
                v = int(v)
                tbl = SnapshotTable(spark, decisions_path)
                if tbl.versions():
                    last = (tbl.meta("stream_watermarks") or {}).get(
                        lane
                    )
                    if last is not None and v <= last:
                        continue
                    # retract BEFORE the guarded append: idempotent
                    # (absent ids no-op), and the version-skip above
                    # keeps a fully-committed version untouched

                    def _retract(ids):
                        if isinstance(ids, DataFrame):
                            return tbl.delete_matching(ids)
                        return tbl.delete_where(
                            F.col(id_col).isin(list(ids))
                        )

                    _retract_matching(
                        _retract,
                        batch.where(
                            (F.col("_commit_version") == v)
                            & (F.col("_change") == "delete")
                        )
                        .select(id_col)
                        .distinct(),
                    )
                decisions = decontaminate_against(
                    batch.where(
                        (F.col("_commit_version") == v)
                        & (F.col("_change") == "insert")
                    ).select(id_col, text_col),
                    eval_rel,
                    n=n,
                    min_collide=min_collide,
                    text_col=text_col,
                    id_col=id_col,
                )
                transactional_append(
                    spark, decisions_path, decisions, v, lane
                )
        finally:
            batch.unpersist()

    return (
        feed.writeStream.foreachBatch(_scrub)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


class TokenExportIndex:
    """Incrementally maintained pretraining EXPORT (round 14): the
    fifth incrementally maintained artifact — after the four dedup
    index families, the packed token shards themselves. A 100 TB
    pipeline re-exports daily; re-packing the whole corpus per append
    is O(corpus), but concat-then-chunk packing has a one-directional
    dependency structure: an APPENDED delta's tokens land strictly
    after the existing stream, so only the partial tail bin and
    everything after it can change. This class persists the cursor
    (global token count + the tail bin's partial payload + the
    append watermark) and, per commit, encodes ONLY the delta,
    merges it onto the stored tail, and rewrites shards from the
    boundary shard onward — O(churn) work and O(churn/bins_per_shard
    + 1) shard files touched.

    State under ``path``:

    - ``path/vocab`` — SnapshotTable (word, tok_id): the FROZEN
      tokenizer (a real pipeline's tokenizer is a frozen artifact;
      re-deriving it from the grown corpus would re-encode history
      and invalidate every existing shard). Layout params ride its
      meta and are guarded on reopen.
    - ``path/cursor`` — SnapshotTable, one row per commit:
      (commit_seq, total_tokens, max_doc_id, tail_payload). The tail
      payload is ≤ capacity tokens (driver-small by construction).

    Shards land under ``out_dir`` with SEQUENTIAL routing
    (shard = bin_id div bins_per_shard — write_webdataset's
    ``shard_col`` override): md5 scatter would spread new bins over
    EVERY shard, destroying incrementality.

    Contract: deltas are APPEND-ONLY with ids strictly greater than
    every exported id (``ingest`` refuses otherwise). Updates and
    deletes require re-export — packing is order-dependent (every
    later offset shifts), so in-place mutation is not meaningfully
    incremental for ANY concat-then-chunk packer; curate upstream,
    export downstream.

    Crash-safety: shard files replace atomically (the writer's
    staging discipline) and the cursor advances LAST, so a retry
    after a crash re-runs from the old cursor and rewrites the same
    bytes — the boundary-shard re-read filters to bins strictly
    BELOW the tail bin, which are identical in the old and
    half-updated shard alike, and the tail bin itself is recomputed
    from the cursor, never read back.

    The ``pipe_pretrain_export_incremental`` registry row
    hash-certifies create(base) + ingest(delta) ≡ a from-scratch
    export of the full corpus under the frozen base vocab (the
    incremental-family discipline); pytest additionally pins
    multi-commit ingests and the boundary-bin merge."""

    _PARAMS_META_KEY = "token_export_params"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        out_dir: str,
        capacity: int = 512,
        bins_per_shard: int = 8,
        text_col: str = "text",
        id_col: str = "doc_id",
        tokens_col: str | None = None,
    ) -> None:
        if capacity < 1 or bins_per_shard < 1:
            raise ValueError("capacity and bins_per_shard must be >= 1")
        self.spark = spark
        self.path = path
        self.out_dir = out_dir
        self.capacity = capacity
        self.bins_per_shard = bins_per_shard
        self.text_col = text_col
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.vocab_tbl = SnapshotTable(spark, path + "/vocab")
        self.cursor_tbl = SnapshotTable(spark, path + "/cursor")
        stored = (
            self.vocab_tbl.meta(self._PARAMS_META_KEY)
            if self.vocab_tbl.versions()
            else None
        )
        if stored is not None and stored != self._params():
            raise ValueError(
                f"export at {path} was laid out with {stored}, opened "
                f"with {self._params()} — mismatched capacity/sharding "
                "would misplace every bin; reopen with the stored "
                "parameters or re-export"
            )

    def _params(self) -> dict:
        return {
            "capacity": self.capacity,
            "bins_per_shard": self.bins_per_shard,
        }

    # -- helpers ---------------------------------------------------------
    def _count_tokens(self, docs: DataFrame):
        arr = (
            F.col(self.tokens_col)
            if self.tokens_col is not None
            else F.split(
                F.coalesce(F.col(self.text_col), F.lit("")), " "
            )
        )
        row = docs.agg(
            F.coalesce(
                F.sum(F.size(arr) + 2), F.lit(0)
            ).cast("long").alias("t"),
            F.max(F.col(self.id_col)).alias("m"),
            F.min(F.col(self.id_col)).alias("lo"),
            F.count(F.lit(1)).alias("n"),
        ).head()
        return int(row["t"]), row["m"], row["lo"], int(row["n"])

    def _write_bins(self, bins: DataFrame) -> list:
        from nebuia_vector_db_spark.sources.webdataset import (
            write_webdataset,
        )

        staged = bins.withColumn(
            "_shard",
            # long: bin_id div bins_per_shard passes 2^31 at the token
            # scale the exact-div arithmetic above is built for; an
            # int cast would wrap and misroute shards (ADVICE r14)
            F.expr(f"bin_id div {int(self.bins_per_shard)}").cast("long"),
        )
        return write_webdataset(
            staged,
            self.out_dir,
            key_col="bin_id",
            members={"txt": "payload"},
            shard_col="_shard",
        ).collect()

    def _tail_of(self, bins: DataFrame, total_tokens: int) -> str:
        if total_tokens % self.capacity == 0:
            return ""
        tail_bin = total_tokens // self.capacity
        row = bins.where(F.col("bin_id") == tail_bin).select(
            "payload"
        ).head()
        return row["payload"] if row is not None else ""

    def _append_cursor(
        self, seq: int, total: int, max_id, tail: str
    ) -> None:
        self.cursor_tbl.append(
            self.spark.createDataFrame(
                [(seq, total, max_id, tail)],
                "commit_seq long, total_tokens long, max_doc_id long, "
                "tail_payload string",
            )
        )

    def _cursor(self):
        return (
            self.cursor_tbl.read()
            .orderBy(F.desc("commit_seq"))
            .head()
        )

    # -- lifecycle -------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        out_dir: str,
        corpus: DataFrame,
        vocab_size: int = 4096,
        **kw,
    ):
        """Freeze the vocabulary on ``corpus``, export it fully (the
        one-time O(corpus) pass), and persist the cursor; every later
        :meth:`ingest` is O(churn)."""
        from pyspark import StorageLevel

        from nebuia_vector_db_spark.operators.pipeline import (
            bins_from_stream,
            token_stream,
            word_vocab,
        )

        probe = cls(spark, path + ".__param_probe__", out_dir, **kw)
        # validate BEFORE creating any state: an empty seed must not
        # leave a vocab table + shards behind when it raises (ADVICE
        # r14); the one agg pass is reused for the cursor below.
        total, max_id, _, n = probe._count_tokens(corpus)
        if n == 0:
            raise ValueError("create() needs a non-empty seed corpus")
        vocab = word_vocab(
            corpus,
            vocab_size,
            text_col=probe.text_col,
            tokens_col=probe.tokens_col,
        )
        SnapshotTable.create(
            spark, path + "/vocab", vocab,
            extra_meta={cls._PARAMS_META_KEY: probe._params()},
        )
        idx = cls(spark, path, out_dir, **kw)
        bins = bins_from_stream(
            token_stream(
                corpus,
                idx.vocab_tbl.read(),
                text_col=idx.text_col,
                id_col=idx.id_col,
                tokens_col=idx.tokens_col,
            ),
            idx.capacity,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _CACHED_RELATIONS.append(bins)
        idx._write_bins(bins)
        tail = idx._tail_of(bins, total)
        SnapshotTable.create(
            spark,
            path + "/cursor",
            spark.createDataFrame(
                [(0, total, max_id, tail)],
                "commit_seq long, total_tokens long, max_doc_id long, "
                "tail_payload string",
            ),
        )
        idx.cursor_tbl = SnapshotTable(spark, path + "/cursor")
        return idx

    def ingest(self, delta: DataFrame) -> dict:
        """Extend the export by an append-only ``delta``: encode only
        the delta under the frozen vocab, merge onto the persisted
        tail, rewrite the boundary shard (its earlier full bins
        re-read from the existing tar — one file) and write the new
        shards. Returns {"bins_written", "shards_written",
        "total_tokens"}."""
        from pyspark import StorageLevel

        from nebuia_vector_db_spark.operators.pipeline import (
            bins_from_stream,
            token_stream,
        )
        from nebuia_vector_db_spark.sources.webdataset import (
            read_webdataset,
        )
        import os as _os

        cur = self._cursor()
        d_tokens, d_max, d_min, d_n = self._count_tokens(delta)
        if d_n == 0:
            return {
                "bins_written": 0,
                "shards_written": 0,
                "total_tokens": int(cur["total_tokens"]),
            }
        if d_min is not None and d_min <= cur["max_doc_id"]:
            raise ValueError(
                f"append-only contract violated: delta id {d_min} <= "
                f"exported watermark {cur['max_doc_id']} — updates and "
                "deletes require re-export (packing offsets shift)"
            )
        total0 = int(cur["total_tokens"])
        tail_bin = total0 // self.capacity
        tail_toks = (
            [int(t) for t in cur["tail_payload"].split(" ")]
            if cur["tail_payload"]
            else []
        )
        tail_rows = self.spark.createDataFrame(
            [
                (tail_bin * self.capacity + i, t)
                for i, t in enumerate(tail_toks)
            ],
            "_pos long, _tok long",
        )
        stream = token_stream(
            delta,
            self.vocab_tbl.read(),
            text_col=self.text_col,
            id_col=self.id_col,
            tokens_col=self.tokens_col,
            base_offset=total0,
        ).unionByName(tail_rows)
        bins = bins_from_stream(stream, self.capacity).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _CACHED_RELATIONS.append(bins)
        # the boundary shard's bins BELOW the tail bin are unchanged —
        # recover them from the existing tar (ONE file read); they are
        # identical even if a crashed previous attempt half-updated
        # the shard (only the tail bin onward ever changes)
        s0 = tail_bin // self.bins_per_shard
        shard_path = _os.path.join(
            self.out_dir, f"shard-{s0:05d}.tar"
        )
        if _os.path.exists(shard_path):
            old = (
                read_webdataset(self.spark, shard_path)
                .where(F.col("ext") == "txt")
                .select(
                    F.col("key").cast("long").alias("bin_id"),
                    F.col("content").cast("string").alias("payload"),
                )
                .where(F.col("bin_id") < tail_bin)
                .select(
                    "bin_id",
                    F.size(F.split("payload", " ")).cast("long").alias(
                        "n_tokens"
                    ),
                    "payload",
                )
            )
            write_set = bins.unionByName(old)
        else:
            write_set = bins
        manifest = self._write_bins(write_set)
        new_total = total0 + d_tokens
        tail = self._tail_of(bins, new_total)
        self._append_cursor(
            int(cur["commit_seq"]) + 1, new_total, d_max, tail
        )
        return {
            "bins_written": int(bins.count()),
            "shards_written": len(manifest),
            "total_tokens": new_total,
        }


class NgramCountIndex:
    """Incremental Kneser-Ney TRAINING STATE (round 15, beyond plan —
    the sixth incrementally-maintained artifact, after the four
    dedup/index families and the token export): the bigram and
    unigram COUNT relations an interpolated-KN perplexity filter
    trains from (operators/lm.py::train_kn_lm — the CCNet/KenLM
    production filter's model) maintained as append-only INTEGER
    ledgers over the corpus change feed, so the filter's model
    follows corpus churn at O(churn tokens) per commit instead of a
    full-corpus re-count per refresh.

    This closes the last batch-only stage of the continuous-ingest
    story: dedup indexes, the decontamination gate and the token
    export already follow the crawl commit-by-commit; the perplexity
    filter's model was the remaining artifact that had to be
    re-trained from scratch. At 100 TB a daily model refresh that
    re-tokenizes the entire history is O(corpus) for a permille of
    churn — this ledger is O(churn), and the folded model is
    BIT-identical to the re-train, so nothing about filter quality is
    traded away.

    Persisted state (two SnapshotTables under ``path``):

    - ``path/big`` — (w1, w2, c): per-commit BIGRAM count deltas.
      An insert commit appends its docs' +counts, a delete commit the
      exact negation of what those docs' insert once added (the CDF
      delete rows replay the full OLD text, so the subtraction is
      exact); the live relation folds the ledger with exact BIGINT
      sums, types whose fold reaches 0 vanish.
    - ``path/uni`` — (w, c): the same ledger for unigram counts (the
      vocab-size scalar V of the smoothed mass).

    With ``group_col`` (round 15, the multilingual capstone) the
    group id joins both ledgers' keys — (g, w1, w2, c) / (g, w, c) —
    and :meth:`lm` folds to the
    :class:`~nebuia_vector_db_spark.operators.lm.KneserNeyGroupedLM`
    FAMILY ``train_kn_lm_grouped(corpus_now)`` would train: the CCNet
    per-language filter models (one per language, each scoring its
    own documents) maintained continuously at O(churn) — per-commit
    cost is unchanged (the group id rides the same two aggregations)
    and a group vanishes from the family exactly when its last doc's
    counts cancel. The group value must be STRING-typed (language
    codes; the empty-create seed pins ``g string``).

    PURE ledger — the simplest member of the incremental family: no
    assignment table, no retraction lane, no replay back-channel.
    Integer adds commute and every delete is the exact inverse of an
    insert, so (a) :meth:`lm` ≡ ``train_kn_lm(corpus_now)``
    relation-for-relation and scalar-for-scalar (pytest pins insert,
    delete and update commits; the ``text_lm_kn_incremental``
    registry row value-hash-certifies the full ingest→fold→score
    pipeline against a from-scratch DuckDB replay), and (b) streaming
    replays need only the per-lane watermark CAS — a half-committed
    version (big landed, uni didn't) heals on redelivery because each
    lane independently skips what it already wrote and the recomputed
    delta rows are deterministic. ``min_count`` pruning is QUERY-time
    semantics (applied at fold, like SemDedup's threshold), so one
    ledger serves every pruning level.
    """

    _PARAMS_META_KEY = "ngram_index_params"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        group_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.group_col = group_col
        self.big = SnapshotTable(spark, path + "/big")
        self.uni = SnapshotTable(spark, path + "/uni")
        stored = (
            self.big.meta(self._PARAMS_META_KEY)
            if self.big.versions()
            else None
        )
        if stored is not None and stored != self._params():
            raise ValueError(
                f"index at {path} was built with {stored}, opened with "
                f"{self._params()} — mismatched tokenization would mix "
                "incompatible count relations; reopen with the stored "
                "parameters or rebuild"
            )

    def _params(self) -> dict:
        # the ledger rows are parameterized only by what produced the
        # tokens (and, when grouped, the partitioning of models);
        # id_col never reaches disk — counts are corpus-level
        return {
            "order": 2,
            "text_col": self.text_col,
            "group_col": self.group_col,
        }

    @property
    def _gcols(self) -> list[str]:
        return [self.group_col] if self.group_col else []

    def _big_rows(self, df: DataFrame, sign: int = 1) -> DataFrame:
        from nebuia_vector_db_spark.operators.lm import (
            _pairs,
            doc_tokens,
        )

        g = self._gcols
        rows = (
            doc_tokens(df, self.text_col)
            .select(*g, F.explode(_pairs(F.col("_toks"))).alias("p"))
            .select(*g, "p.w1", "p.w2")
            .groupBy(*g, "w1", "w2")
            .agg((F.count("*") * sign).alias("c"))
        )
        return rows

    def _uni_rows(self, df: DataFrame, sign: int = 1) -> DataFrame:
        from nebuia_vector_db_spark.operators.lm import doc_tokens

        g = self._gcols
        return (
            doc_tokens(df, self.text_col)
            .select(*g, F.explode("_toks").alias("w"))
            .groupBy(*g, "w")
            .agg((F.count("*") * sign).alias("c"))
        )

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame | None = None,
        **kw,
    ):
        """Create the two ledger tables; with ``corpus``, seed them
        with the existing corpus's counts (the one-time full pass —
        every later ingest is O(churn))."""
        probe = cls(spark, path + ".__param_probe__", **kw)
        gp = (
            f"{probe.group_col} string, " if probe.group_col else ""
        )
        if corpus is not None:
            big_seed = probe._big_rows(corpus)
            uni_seed = probe._uni_rows(corpus)
        else:
            big_seed = spark.createDataFrame(
                [], gp + "w1 string, w2 string, c long"
            )
            uni_seed = spark.createDataFrame(
                [], gp + "w string, c long"
            )
        SnapshotTable.create(
            spark, path + "/big", big_seed,
            extra_meta={cls._PARAMS_META_KEY: probe._params()},
        )
        SnapshotTable.create(spark, path + "/uni", uni_seed)
        return cls(spark, path, **kw)

    def ingest_feed(
        self,
        feed_slice: DataFrame,
        txn: tuple[str, int] | None = None,
        stats: bool = False,
    ) -> dict | None:
        """Advance both ledgers by ONE commit's change-feed slice:
        +counts for its inserts, −counts for its deletes, one append
        per ledger. ``stats=True`` additionally returns
        ({"big_rows", "uni_rows"} — the commit's count-delta type
        counts, churn-bounded scalars) at the cost of two extra count
        jobs; the default keeps the hot streaming path at the two
        append actions.

        ``txn=(lane, version)`` routes both appends through the
        stream-watermark CAS (lanes ``{lane}:big`` / ``{lane}:uni``)
        for exactly-once under foreachBatch redelivery; because the
        ledger is append-only and the delta rows are a deterministic
        function of the slice, a replay after a partial commit
        re-appends exactly the missing lane and skips the committed
        one — no cross-lane coordination channel needed (contrast
        SemDedupClusterIndex._replay_assign_done). The batch path
        (``txn=None``) shares that recovery story only if a crashed
        run is re-driven per-version WITH ``txn`` (or the index
        rebuilt): a bare re-run of two plain appends would
        double-count the slice — same two-table discipline as
        SemDedupClusterIndex's assign/cent pair."""
        dels = feed_slice.where(F.col("_change") == "delete").drop(
            "_change", "_commit_version"
        )
        ins = feed_slice.where(F.col("_change") == "insert").drop(
            "_change", "_commit_version"
        )
        big_delta = self._big_rows(ins).unionByName(
            self._big_rows(dels, sign=-1)
        ).cache()
        uni_delta = self._uni_rows(ins).unionByName(
            self._uni_rows(dels, sign=-1)
        ).cache()
        _CACHED_RELATIONS.extend([big_delta, uni_delta])
        if txn is None:
            self.big.append(big_delta)
            self.uni.append(uni_delta)
        else:
            from nebuia_vector_db_spark.streaming.sinks import (
                transactional_append,
            )

            lane, version = txn
            transactional_append(
                self.spark, self.big.path, big_delta, version,
                lane + ":big",
            )
            transactional_append(
                self.spark, self.uni.path, uni_delta, version,
                lane + ":uni",
            )
        if not stats:
            return None
        return {
            "big_rows": int(big_delta.count()),
            "uni_rows": int(uni_delta.count()),
        }

    def ingest_commit(self, corpus_tbl: SnapshotTable,
                      version: int | None = None,
                      stats: bool = False) -> dict | None:
        """:meth:`ingest_feed` over commit ``version``'s change-feed
        slice of ``corpus_tbl``."""
        v = corpus_tbl.current_version() if version is None else version
        return self.ingest_feed(
            corpus_tbl.changes(v - 1, v), stats=stats
        )

    def lm(self, min_count: int = 1):
        """Fold both ledgers into the live count relations and return
        the :class:`~nebuia_vector_db_spark.operators.lm.KneserNeyLM`
        a from-scratch ``train_kn_lm(corpus_now, min_count)`` would
        produce — bit-identical, because the fold is an exact BIGINT
        sum of per-commit integer deltas and every marginal/scalar
        derives from the folded relation exactly as the trainer
        derives it from the one-pass counts. Fold cost is one
        hash-agg over the ledger (ledger rows ≈ live types + churn
        types since last compact; :meth:`compact` folds history
        away). The folded bigram relation is cached — four consumers
        (both marginals, the B scalar, the scoring join) would
        otherwise re-fold per action.

        With ``group_col`` the fold returns the
        :class:`~...lm.KneserNeyGroupedLM` FAMILY
        ``train_kn_lm_grouped(corpus_now, min_count)`` would produce
        (per-group marginals, the (B, V) scalars as a per-group
        relation) — same bit-identity argument, per group."""
        from nebuia_vector_db_spark.operators.lm import (
            KneserNeyGroupedLM,
            KneserNeyLM,
        )

        g = self._gcols
        big = (
            self.big.read()
            .groupBy(*g, "w1", "w2")
            .agg(F.sum("c").alias("c2"))
            .where(F.col("c2") > 0)
            .cache()
        )
        _CACHED_RELATIONS.append(big)
        ctx = big.groupBy(*g, "w1").agg(
            F.sum("c2").alias("c1"), F.count("*").alias("n1f")
        )
        cont = big.groupBy(*g, "w2").agg(F.count("*").alias("n1b"))
        uni_live = (
            self.uni.read()
            .groupBy(*g, "w")
            .agg(F.sum("c").alias("c"))
            .where(F.col("c") > 0)
        )
        if not g:
            b_total = big.count()
            v_total = uni_live.count()
            if min_count > 1:
                big = big.where(F.col("c2") >= min_count)
            return KneserNeyLM(
                big=big,
                ctx=ctx,
                cont=cont,
                total_bigrams=int(b_total),
                vocab_size=int(v_total),
            )
        gc = self.group_col
        b_rel = big.groupBy(gc).agg(F.count("*").alias("b"))
        v_rel = uni_live.groupBy(gc).agg(F.count("*").alias("v"))
        # v-side defines the group set (train_kn_lm_grouped's rule):
        # a token-only group gets b=0; a fully-cancelled group has no
        # live uni rows and drops from the family entirely
        bv = v_rel.join(b_rel, gc, "left").select(
            gc, F.coalesce("b", F.lit(0)).alias("b"), "v"
        )
        total_types = big.count()
        if min_count > 1:
            big = big.where(F.col("c2") >= min_count)
        return KneserNeyGroupedLM(
            big=big,
            cont=cont,
            ctx=ctx,
            bv=bv,
            group_col=gc,
            total_types=int(total_types),
        )

    def compact(self) -> None:
        """Fold each ledger's history into one materialized state
        commit (drop zero-sum types, one row per live type) — the
        ledger's answer to unbounded history growth; O(live types),
        run at the cadence the deployment likes its fold cost. Each
        ledger folds in ONE atomic :meth:`SnapshotTable.overwrite`
        commit, so a concurrent :meth:`lm` fold pins either the
        pre- or post-compact version — both fold to the same model."""
        g = self._gcols
        for tbl, cols in (
            (self.big, g + ["w1", "w2"]),
            (self.uni, g + ["w"]),
        ):
            folded = (
                tbl.read()
                .groupBy(*cols)
                .agg(F.sum("c").alias("c"))
                .where(F.col("c") != 0)
            )
            tbl.overwrite(folded)


def stream_kn_ingest(
    spark: SparkSession,
    corpus_path: str,
    idx: NgramCountIndex,
    checkpoint: str,
    start_version: int = 0,
    app: str | None = None,
):
    """Continuous KN-model maintenance (round 15): subscribe to the
    corpus SnapshotTable's change feed and advance the
    :class:`NgramCountIndex` ledgers per commit, so the perplexity
    filter's model tracks the live corpus — the streaming deployment
    of the sixth incremental artifact, completing the
    continuous-ingest loop (dedup indexes, decontamination gate,
    token export, now the filter model). ``start_version=0``
    delivers the CREATE commit too, so an EMPTY-created index builds
    its whole state from the feed — the
    ``text_lm_kn_incremental_stream`` registry row does exactly that
    and SHARES the batch row's oracle: stream ≡ batch ≡ SQL for the
    model-maintenance modality.

    Exactly-once: both ledger appends ride the stream-watermark CAS
    (lanes ``{app}:big`` / ``{app}:uni`` keyed by commit version).
    The ledgers being append-only pure functions of each slice, a
    replayed micro-batch (at-least-once redelivery, or a crash
    between the two lane commits) re-derives identical delta rows and
    each lane independently declines what it already holds — no
    version-skip pre-check or replay back-channel is needed, which is
    why this driver is a plain per-version loop."""
    from nebuia_vector_db_spark.sources.changes_stream import (
        SnapshotChangesDataSource,
    )

    spark.dataSource.register(SnapshotChangesDataSource)
    feed = (
        spark.readStream.format("nebuia_snapshot_changes")
        .option("path", corpus_path)
        .option("startVersion", start_version)
        .load()
    )
    lane = app if app is not None else checkpoint

    def _advance(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            versions = sorted(
                r[0]
                for r in batch.select("_commit_version")
                .distinct()
                .collect()
            )
            for v in versions:
                v = int(v)
                idx.ingest_feed(
                    batch.where(F.col("_commit_version") == v),
                    txn=(lane, v),
                )
        finally:
            batch.unpersist()

    return (
        feed.writeStream.foreachBatch(_advance)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
