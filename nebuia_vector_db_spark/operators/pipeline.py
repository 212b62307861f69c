"""Training-data pipeline operators: chunking, PII scrubbing, dataset
splitting, sequence packing — the preprocessing stages between a raw
corpus and a tokenized training set (extension surface; the reference
stores pre-chunked documents, main.go:30-35, so chunking is the
missing upstream step).

Everything is codegen'd columnar expressions — at 100 TB these run
map-side with zero shuffles except packing's bucketed cumsum (a
hash-partitioned window over percentile range buckets; never a
single-partition global sort).
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


def leakage_safe_split(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split (round 11): every
    duplicate GROUP lands wholly in one fold, so a test document can
    never have a near-copy in train — the leakage mode a plain
    per-document hash split cannot prevent (Lee et al. 2022 §6.2
    measure exactly this train/test overlap in C4/RealNews).

    ``groups`` is a (id, group_id) relation from any dedup closure
    (operators/components.py::dedup_groups over MinHash/SimHash/
    substring pairs); documents outside every group are their own
    singleton group, so their fold equals the plain
    :func:`dataset_split` fold — introducing group-awareness
    re-routes ONLY the near-duplicated documents (test-pinned).

    Scale shape: the group relation is pair-derived (only docs that
    ARE near-dups appear), usually far smaller than the corpus — but
    web-crawl corpora can have a LARGE grouped fraction (Lee et al.
    2022 find >10% near-dup in C4), so the join is left UNHINTED:
    AQE broadcasts it when it fits and falls back to a shuffle join
    when it doesn't (forcing F.broadcast here would be the
    components.py anti-pattern — its sizes relation is documented
    non-broadcastable at corpus scale). The md5 bucketing is the
    same engine-reproducible arithmetic as dataset_split (no RNG,
    stable under repartition/cluster size).

    Like :func:`dataset_split`, the input schema is PRESERVED and
    ``group_id``/``split`` are appended — a caller can swap the two
    without losing text/metadata columns or re-joining the corpus.

    ``groups`` must be FUNCTIONAL on ``id_col`` (dedup_groups output
    is — one group per doc): a doc mapped to two group_ids would
    duplicate corpus rows through the left join and change downstream
    row counts silently. The guard is a per-id CASE behind a groupBy
    over the groups relation (one groups-sized shuffle, validated
    lazily at execution — no eager job, ADVICE r11); a violation
    raises instead of fanning out.
    """
    clash = {"group_id", "split", "_gid"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"docs already carries {sorted(clash)} — leakage_safe_split "
            "appends group_id/split and will not silently overwrite; "
            "drop or rename the existing columns first"
        )
    g = (
        # a NULL group_id means "no group": drop it up front, so an id
        # whose only row is NULL routes by its own id (countDistinct
        # skips NULLs — without the filter such an id would hit the
        # guard with _gn=0, second-review r12)
        groups.where(F.col("group_id").isNotNull())
        .groupBy(id_col)
        .agg(
            F.min("group_id").alias("_g1"),
            # DISTINCT group ids, not rows: a functional relation with
            # duplicated identical rows (e.g. two unioned closure
            # outputs) must split fine, not spuriously raise
            F.countDistinct("group_id").alias("_gn"),
        )
        .select(
            F.col(id_col),
            F.when(F.col("_gn") == 1, F.col("_g1"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "groups is not keyed by " + id_col
                        + ": id %s maps to %s group_ids — run the "
                        "dedup_groups closure (or dropDuplicates) "
                        "before splitting",
                        F.col(id_col).cast("string"),
                        F.col("_gn").cast("string"),
                    )
                )
            )
            .alias("_gid"),
        )
    )
    routed = docs.join(g, id_col, "left")
    key = F.coalesce(F.col("_gid"), F.col(id_col))
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        routed.withColumn("group_id", key)
        .withColumn("split", split)
        .drop("_gid")
    )


def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 2,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/eval contamination report: for every (eval doc, train doc)
    pair sharing ≥ ``min_shared`` distinct n-gram shingles, emit the
    overlap count — the standard pre-training hygiene check that an
    eval set hasn't leaked into the training split.

    Splits come from :func:`dataset_split` (deterministic md5 buckets),
    so the report is reproducible at any cluster size. The overlap is
    an inverted-index equi-join on the shingle — posting-list sized,
    never |train| × |eval| — the same scale shape as the jaccard dedup
    tier (operators/dedup.py).
    """
    from nebuia_vector_db_spark.functions.text import (
        shingles_from_tokens,
        with_tokens,
    )

    split = dataset_split(docs, id_col, train_pct, val_pct)
    sh = with_tokens(split, text_col).select(
        F.col(id_col),
        "split",
        F.explode(shingles_from_tokens("_toks", n)).alias("shingle"),
    )
    train = sh.where(F.col("split") == "train").select(
        F.col(id_col).alias("train_doc"), "shingle"
    )
    ev = sh.where(F.col("split") != "train").select(
        F.col(id_col).alias("eval_doc"), "shingle"
    )
    return (
        ev.join(train, "shingle")
        .groupBy("eval_doc", "train_doc")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate_against(
    train: DataFrame,
    eval_rel: DataFrame,
    n: int = 13,
    min_collide: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
) -> DataFrame:
    """Train-vs-EXTERNAL-eval n-gram decontamination — the GPT-3 §4 /
    Llama-2 pre-export gate: flag every training document that shares
    any ``n``-gram (default 13, the GPT-3 setting) with the held-out
    benchmark relation, so eval answers can't leak into the training
    set. This is the two-RELATION form of :func:`decontaminate`
    (which audits leakage between a single corpus's own md5 splits);
    production pipelines run this one against each external benchmark
    before :func:`~..incremental.TokenExportIndex`-style export.

    Returns ONE ROW PER TRAIN DOC — (id, n_collide_grams,
    n_eval_docs, dropped) — not just the contaminated pairs, so the
    keep decisions are certified alongside the drop decisions.
    ``n_collide_grams`` counts the doc's DISTINCT colliding grams,
    ``n_eval_docs`` the distinct benchmark docs it collides with, and
    ``dropped = n_collide_grams >= min_collide`` (default 1: any
    shared 13-gram drops the doc, the GPT-3 rule).

    Scale shape: grams are compressed to fixed-width 16-hex-char md5
    prefixes (64-bit keyspace — ~13-word strings would bloat the
    probe; the prefix is SQL-replayable on both engines), the EVAL
    side's distinct (gram, eval_doc) relation is broadcast
    (benchmarks are MBs against a 100 TB train corpus), and the
    collision check is a map-side broadcast hash join + partial agg —
    the train corpus is scanned once and never shuffled on gram.
    """
    from nebuia_vector_db_spark.functions.text import (
        shingles_from_tokens,
        with_tokens,
    )

    eval_text_col = eval_text_col or text_col
    eval_id_col = eval_id_col or id_col
    gk = lambda col: F.substring(F.md5(col), 1, 16)  # noqa: E731
    ev_grams = (
        with_tokens(eval_rel, eval_text_col)
        .select(
            F.col(eval_id_col).alias("_eval_doc"),
            F.explode(shingles_from_tokens("_toks", n)).alias("_g"),
        )
        .select("_eval_doc", gk(F.col("_g")).alias("_gk"))
        .distinct()
    )
    tr_grams = with_tokens(train, text_col).select(
        F.col(id_col),
        F.explode(shingles_from_tokens("_toks", n)).alias("_g"),
    ).select(id_col, gk(F.col("_g")).alias("_gk"))
    hits = (
        tr_grams.join(F.broadcast(ev_grams), "_gk")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_gk").alias("_ncg"),
            F.countDistinct("_eval_doc").alias("_ned"),
        )
    )
    ncg = F.coalesce(F.col("_ncg"), F.lit(0)).cast("long")
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            ncg.alias("n_collide_grams"),
            F.coalesce(F.col("_ned"), F.lit(0))
            .cast("long")
            .alias("n_eval_docs"),
            (ncg >= min_collide).cast("int").alias("dropped"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Contiguous sequence packing (concat-then-chunk): documents in
    ``id_col`` order are laid end-to-end and cut into ``capacity``-token
    bins — ``bin_id = floor(start_offset / capacity)``, the standard
    packing for causal-LM training data. A doc spanning a boundary is
    assigned to the bin its first token lands in.

    By default the token count is the whitespace count of
    ``text_col``; pass ``n_tokens_col`` to pack REAL tokenizer output
    instead (a pipeline packs the encoded id counts, e.g. word count
    + bos + eos — the ``pipe_pretrain_export`` composition, round 14).

    The global cumulative sum is a two-pass distributed cumsum, NOT a
    single unpartitioned window (which would collapse the whole corpus
    into one task): rows are range-bucketed on ``id_col`` by approx
    percentiles, each bucket cumsums locally under a partitioned
    window, and the tiny per-bucket totals are collected and folded
    into running offsets that a broadcast map adds back.  Integer
    arithmetic throughout, so the result is independent of the bucket
    boundaries and identical to the single-window answer.
    """
    spark = docs.sparkSession
    toked = docs.select(
        F.col(id_col),
        (
            F.col(n_tokens_col).cast("long")
            if n_tokens_col is not None
            else F.size(F.split(F.col(text_col), " ")).cast("long")
        ).alias("n_tokens"),
    )
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # pass 0: deterministic monotone bucketing — approx percentile cut
    # points of the id keep buckets row-balanced whatever the id
    # distribution (dense, sparse, or clustered)
    qs = [i / num_buckets for i in range(1, num_buckets)]
    head = toked.select(
        F.percentile_approx(id_col, qs, 10_000).alias("c")
    ).head()
    cuts = sorted(set(head["c"] or [])) if head is not None else []
    if cuts:
        cuts_arr = F.array(*[F.lit(c) for c in cuts])
        # bucket = #cuts strictly below the id — monotone in id, which is
        # all correctness needs (boundary placement only affects balance)
        bucket = F.size(F.filter(cuts_arr, lambda c: c < F.col(id_col)))
    else:
        bucket = F.lit(0)
    bucketed = toked.withColumn("_b", bucket)

    # pass 1: per-bucket token totals — num_buckets rows to the driver
    totals = {
        r["_b"]: r["t"]
        for r in bucketed.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    run = 0
    for b in sorted(totals):
        offsets[b] = run
        run += totals[b]
    off_entries: list = []
    for b, off in offsets.items():
        off_entries += [F.lit(b), F.lit(off)]
    off_col = (
        F.element_at(F.create_map(*off_entries), F.col("_b"))
        if off_entries
        else F.lit(0)
    )

    # pass 2: local cumsum within each bucket + broadcast offset
    w = (
        Window.partitionBy("_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        bucketed.withColumn("start_offset", (local + off_col).cast("long"))
        # integer division (round 14): exact past 2^53 total tokens,
        # where floor(double) would misbin — see pack_token_bins
        .withColumn("bin_id", F.expr(f"start_offset div {int(capacity)}"))
        .drop("_b")
    )


#: special token ids of the pretraining-export encode (round 14):
#: the conventional {pad, bos, eos, unk} reservation at the bottom of
#: the id space; vocabulary words start at UNK_ID + 1.
PAD_ID, BOS_ID, EOS_ID, UNK_ID = 0, 1, 2, 3


def word_vocab(
    docs: DataFrame,
    vocab_size: int = 4096,
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(word, tok_id) — a frequency-ranked word vocabulary: the top
    ``vocab_size`` whitespace tokens by (count DESC, word ASC), ids
    assigned in that total order starting at ``UNK_ID + 1``. This is
    the SQL-replayable member of the tokenizer family (rank over
    exact counts — no iterative fit), which is what lets the
    ``pipe_pretrain_export`` composition carry a full value-hash
    oracle end to end; the trained tokenizers (bpe.py / unigram.py)
    drop into the same encode→pack→shard pipeline and are certified
    against from-scratch references in pytest instead.

    Pass ``tokens_col`` (an ``array<string>`` column — e.g. the
    trained encoders' ``bpe_tokens`` / ``unigram_tokens``) to rank
    PIECES instead of whitespace words: the vocab is then over the
    tokenizer's own output and the same export spine packs trained
    tokenizations (pytest pins the drop-in).

    Scale shape: one corpus token-count shuffle, then the top-V cut
    is TakeOrderedAndProject (never a global sort materialization);
    the ranking window runs over the ALREADY-LIMITED V-row relation —
    bounded by construction, not by data."""
    toks = docs.select(
        F.explode(
            F.col(tokens_col)
            if tokens_col is not None
            else F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("word")
    )
    top = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.desc("_cnt"), "word")
        .limit(vocab_size)
    )
    w = Window.orderBy(F.desc("_cnt"), "word")
    return top.select(
        "word",
        (F.row_number().over(w) + UNK_ID).cast("long").alias("tok_id"),
    )


def pack_token_bins(
    docs: DataFrame,
    vocab: DataFrame,
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Encode + pack the corpus into the MATERIALIZED fixed-length
    token sequences a causal-LM trainer consumes: each document
    becomes ``[BOS] ids… [EOS]`` (per-word lookup against the
    broadcast ``vocab``; OOV → UNK), documents are laid end-to-end in
    ``id_col`` order via :func:`pack_sequences`' distributed cumsum,
    and the global token stream is cut into ``capacity``-token bins.
    Returns (bin_id, n_tokens, payload) where ``payload`` is the
    bin's token ids as a space-joined decimal string — a canonical,
    byte-deterministic serialization for shard export
    (``pipe_pretrain_export`` round-trips it through WebDataset tars
    and hash-certifies the RE-READ stream against a SQL replay).

    Pass ``tokens_col`` to pack a TRAINED tokenizer's output instead
    of the whitespace split: the encoders (bpe.py::encode_bpe,
    unigram.py::encode_unigram) emit ``array<string>`` piece columns
    that drop straight into this spine with a piece-ranked
    ``word_vocab(tokens_col=...)`` — the same offsets, bins and shard
    routing, certified by the same tests.

    Scale shape: the per-token relation shuffles once on ``bin_id``
    (map-side combine inapplicable — collect_list — but every group
    is ≤ capacity rows by construction, so the per-bin sort+join is
    bounded); the vocab join is a broadcast; offsets come from
    pack_sequences' two-pass cumsum, never a global window."""
    stream = token_stream(
        docs, vocab, text_col=text_col, id_col=id_col,
        tokens_col=tokens_col,
    )
    return bins_from_stream(stream, capacity)


def payload_le_hex(payload: Column | str, width: int = 2) -> Column:
    """Lowercase hex of the fixed-width LITTLE-ENDIAN binary encoding
    of a space-joined decimal token payload — the byte layout
    Megatron/GPT-NeoX ``.bin`` token shards use (uint16 for vocabs
    ≤ 65536, width=4 for uint32), so ``unhex`` of this column is a
    trainer-loadable byte run with no text re-parse (the decimal-text
    member inflates bytes ~3× and forces one). Pure JVM codegen
    (split → per-token hex byte-swap → concat), and SQL-replayable:
    DuckDB's ``printf('%04x', t)`` + substr swap mirrors it digit for
    digit, which is what lets ``pipe_pretrain_export_bin`` certify
    the BYTES through an md5-over-hex oracle. A token that overflows
    ``width`` bytes raises (lpad would silently truncate high bits).
    """
    payload = F.col(payload) if isinstance(payload, str) else payload
    nhex = width * 2
    limit = 1 << (8 * width)

    def le(t: Column) -> Column:
        tok = t.cast("long")
        h = F.lpad(F.lower(F.hex(tok)), nhex, "0")
        swapped = F.concat(
            *[
                F.substring(h, nhex - 2 * i - 1, 2)
                for i in range(width)
            ]
        )
        return F.when(
            (tok >= limit) | (tok < 0),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"payload_le_hex: token overflows {width}-byte "
                        "width: "
                    ),
                    tok.cast("string"),
                )
            ),
        ).otherwise(swapped)

    return F.concat_ws(
        "", F.transform(F.split(payload, " "), le)
    )


def token_stream(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    base_offset: int = 0,
) -> DataFrame:
    """The globally-positioned token stream (_pos, _tok) of the
    encoded corpus: per doc ``[BOS] ids… [EOS]`` laid end-to-end in
    ``id_col`` order via pack_sequences' distributed cumsum, starting
    at ``base_offset`` — the hook the INCREMENTAL export uses to lay
    a delta's tokens directly after the persisted cursor
    (incremental.py::TokenExportIndex, round 14)."""
    tok_arr = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    )
    base = docs.select(
        F.col(id_col).alias("_doc"), tok_arr.alias("_arr")
    )
    toks = base.select(
        "_doc", F.posexplode("_arr").alias("_i", "word")
    )
    enc = toks.join(F.broadcast(vocab), "word", "left").select(
        "_doc",
        "_i",
        F.coalesce("tok_id", F.lit(UNK_ID)).cast("long").alias("_tok"),
    )
    counted = base.select(
        "_doc",
        (F.size("_arr") + 2).cast("long").alias("_n"),
    )
    offs = (
        pack_sequences(
            counted, capacity=2048, id_col="_doc", n_tokens_col="_n"
        )
        .select(
            "_doc",
            (F.col("start_offset") + F.lit(int(base_offset))).alias(
                "start_offset"
            ),
            "n_tokens",
        )
    )
    # global position of every token: bos at the doc's offset, word i
    # (0-based) at offset + 1 + i, eos at offset + n − 1 — disjoint
    # by construction, so the union is the exact concatenated stream
    return (
        enc.join(offs, "_doc")
        .select(
            (F.col("start_offset") + F.col("_i") + 1).alias("_pos"),
            "_tok",
        )
        .unionByName(
            offs.select(
                F.col("start_offset").alias("_pos"),
                F.lit(BOS_ID).cast("long").alias("_tok"),
            )
        )
        .unionByName(
            offs.select(
                (F.col("start_offset") + F.col("n_tokens") - 1).alias(
                    "_pos"
                ),
                F.lit(EOS_ID).cast("long").alias("_tok"),
            )
        )
    )


def bins_from_stream(stream: DataFrame, capacity: int) -> DataFrame:
    """(bin_id, n_tokens, payload) from a positioned token stream —
    one shuffle on bin_id, capacity-bounded groups."""
    return (
        # integer division, not floor(double): a 100 TB-scale token
        # stream can exceed 2^53 positions, where double arithmetic
        # would misbin; div stays exact over the full BIGINT range
        stream.withColumn(
            "bin_id", F.expr(f"_pos div {int(capacity)}")
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"].cast("string"),
                ),
                " ",
            ).alias("payload"),
        )
    )


def epoch_shard(
    df: DataFrame,
    epoch: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle + sharding: every row gets a
    ``shard`` in [0, n_shards) and an ``order_key`` — both derived from
    ``md5(epoch ':' id)`` — so a training run reads shard files in
    ``(order_key, id)`` order and sees a different, *reproducible*
    permutation each epoch (same no-RNG stance as dataset_split:
    stable across runs, engines, and cluster sizes; new data routes
    consistently). Map-side only — one codegen'd projection, no
    shuffle; the physical re-partitioning is
    ``repartition(n_shards, "shard")`` at write time."""
    h = F.md5(
        F.concat(
            F.lit(f"{epoch}:"), F.col(id_col).cast("string")
        )
    )
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards
    )
    return df.withColumn("shard", shard).withColumn(
        "order_key", F.substring(h, 5, 12)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff its md5-
    derived uniform in [0,1) falls under its stratum's rate — the
    "downsample boilerplate languages / upweight rare ones" knob of a
    corpus mix. Same no-RNG stance as dataset_split: reproducible at
    any cluster size, new data routes consistently, and an ANSI-SQL
    engine replays the exact keep-set (md5 is portable). Map-side
    only — one codegen'd projection + filter, no shuffle, no sampling
    state."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 5, 8), 16, 10
        ).cast("double")
        / F.lit(float(16**8))
    )
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(float(r))
        ).otherwise(rate)
    return df.withColumn("_u", u).where(F.col("_u") < rate).drop("_u")


def sample_by_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    epoch_size: int,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 1,
    with_replacement: bool = False,
    _safety: float = 4.0,
) -> DataFrame:
    """Materialize a training EPOCH with the given domain proportions
    (round 12, VERDICT r11 stretch #7 — the consumer of
    ``doremi_weights``): domain ``d`` contributes
    ``floor(epoch_size·w_d + 0.5)`` documents — the exact quota, not
    a Bernoulli approximation — chosen as the quota SMALLEST by the
    md5 order key ``md5('{seed}:' || id)`` (ties by id). No RNG
    anywhere: the same epoch materializes on any cluster size, epoch
    N+1 is a different ``seed``, and an ANSI-SQL engine replays the
    exact member set (the pipe_mixture_epoch oracles). Domains absent
    from ``weights`` contribute nothing.

    ``with_replacement=False`` (default) CAPS each quota at the
    domain size — the epoch under-represents a domain whose optimized
    weight exceeds its corpus share. ``with_replacement=True``
    implements the paper's actual resampling semantics for that case
    (DoReMi upweights exactly the small worst-served domains, so
    quota > |d| is the expected regime, not an edge): every domain
    member repeats ``quota // |d|`` times and the ``quota % |d|``
    smallest by order key repeat once more — deterministic
    replication, not sampling noise. ``copy_id`` (1-based pass
    number) is appended and ``epoch_rank`` cycles the domain, so
    copies of one document land maximally far apart in the read
    order (rank = (copy-1)·|d| + within-pass rank).

    Scale shape (the skew trap avoided): a naive per-domain
    row_number window puts the dominant domain's ENTIRE corpus slice
    in one task. Instead a map-side hash pre-cut keeps ~``_safety`` ×
    quota candidates per domain (the md5 prefix is uniform), verified
    by a count and widened (×4, then take-all) in the rare undershoot
    — so the ranked relation is bounded by the EPOCH size, not the
    corpus, and the window runs over candidates only. (A replicated
    domain ranks all |d| < quota ≤ epoch_size rows — epoch-bounded by
    definition.) Exact because the pre-cut is a PREFIX cut of the
    same order key: if ≥ quota candidates survive, the global
    top-quota are all among them.

    Output: the input schema + ``order_key`` + ``copy_id`` +
    ``epoch_rank`` (the dataloader read order within the domain)."""
    import math

    if epoch_size <= 0:
        raise ValueError("epoch_size must be positive")
    counts = {
        r[0]: r[1]
        for r in docs.where(
            F.col(domain_col).isin(list(weights))
        )
        .groupBy(domain_col)
        .count()
        .collect()
    }
    raw = {
        d: int(math.floor(epoch_size * w + 0.5))
        for d, w in weights.items()
        if counts.get(d, 0) > 0
    }
    if with_replacement:
        quotas = {d: q for d, q in raw.items() if q > 0}
    else:
        quotas = {
            d: min(q, counts[d]) for d, q in raw.items() if q > 0
        }
        quotas = {d: q for d, q in quotas.items() if q > 0}
    return _materialize_mixture(
        docs, quotas, counts, domain_col, id_col, seed,
        with_replacement, _safety,
    )


def sample_by_sqrt_mixture(
    docs: DataFrame,
    epoch_size: int,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 1,
    with_replacement: bool = False,
    _safety: float = 4.0,
) -> DataFrame:
    """Temperature-scaled mixture epoch at α = 1/2 — SQUARE-ROOT
    sampling, the multilingual rebalancing family of mBERT/XLM-R
    (Conneau & Lample 2019 §3.1; Raffel et al. 2020 §3.4.2 study the
    same temperature knob): domain weights ∝ sqrt(|d|), flattening
    the head and upweighting the tail WITHOUT a trained weight fit —
    the DoReMi alternative when no proxy-model run exists, with the
    weights derived from the corpus itself instead of passed in.

    α is fixed at the one exponent whose arithmetic is hash-exact
    cross-engine: IEEE sqrt is correctly rounded (``pow(n, α)`` is
    not, so a general-α variant could diverge between engines in the
    last bit), making ``w_micro = floor(sqrt(n_d)·10⁶)`` identical in
    Spark, DuckDB and Python; the normalizer ``S = Σ w_micro`` is an
    exact BIGINT sum (order-free), and the quota
    ``min((2·epoch_size·w_micro + S) div (2·S), |d|)`` is
    round-half-up of ``epoch_size·w_d`` in pure integer arithmetic —
    so the whole weight derivation joins the epoch cut inside one
    value-hash oracle (the ``pipe_mixture_alpha`` row). Members are
    the quota smallest by the md5 order key; replication semantics
    and the skew-safe pre-cut are shared with
    :func:`sample_by_mixture` (same materialization core)."""
    import math

    if epoch_size <= 0:
        raise ValueError("epoch_size must be positive")
    counts = {
        r[0]: r[1]
        for r in docs.where(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .count()
        .collect()
    }
    quotas: dict = {}
    if counts:
        wm = {
            d: int(math.floor(math.sqrt(float(n)) * 1_000_000))
            for d, n in counts.items()
        }
        s_total = sum(wm.values())
        raw = {
            d: (2 * epoch_size * w + s_total) // (2 * s_total)
            for d, w in wm.items()
        }
        if with_replacement:
            quotas = {d: q for d, q in raw.items() if q > 0}
        else:
            quotas = {
                d: min(q, counts[d])
                for d, q in raw.items()
                if q > 0 and min(q, counts[d]) > 0
            }
    return _materialize_mixture(
        docs, quotas, counts, domain_col, id_col, seed,
        with_replacement, _safety,
    )


def _materialize_mixture(
    docs: DataFrame,
    quotas: dict,
    counts: dict,
    domain_col: str,
    id_col: str,
    seed: int,
    with_replacement: bool,
    _safety: float,
) -> DataFrame:
    """The shared quota-materialization core of sample_by_mixture /
    sample_by_sqrt_mixture: md5-order cut per domain with the
    skew-safe prefix pre-cut, optional deterministic replication."""
    if not quotas:
        return (
            docs.withColumn("order_key", F.lit(""))
            .withColumn("copy_id", F.lit(0).cast("long"))
            .withColumn("epoch_rank", F.lit(0).cast("long"))
            .limit(0)
        )
    ok = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    u = (
        F.conv(F.substring(ok, 1, 8), 16, 10).cast("double")
        / F.lit(float(16**8))
    )
    base = docs.where(F.col(domain_col).isin(list(quotas))).withColumn(
        "order_key", ok
    )
    # the pre-cut only applies where quota < |d| (no replication);
    # a replicated domain keeps every row (rate 1.0)
    safety = _safety
    for _ in range(6):
        rate = F.lit(0.0)
        for d, q in quotas.items():
            rate = F.when(
                F.col(domain_col) == d,
                F.lit(min(1.0, safety * q / counts[d])),
            ).otherwise(rate)
        cand = base.where(u < rate)
        got = {
            r[0]: r[1]
            for r in cand.groupBy(domain_col).count().collect()
        }
        if all(
            got.get(d, 0) >= min(q, counts[d])
            for d, q in quotas.items()
        ):
            break
        safety *= 4.0
    else:
        cand = base  # take-all fallback: still exact, just unbounded
    w = Window.partitionBy(domain_col).orderBy("order_key", id_col)
    ranked = cand.withColumn(
        "_rk", F.row_number().over(w).cast("long")
    )
    quota_expr = F.lit(0).cast("long")
    n_expr = F.lit(0).cast("long")
    for d, q in quotas.items():
        quota_expr = F.when(
            F.col(domain_col) == d, F.lit(q).cast("long")
        ).otherwise(quota_expr)
        n_expr = F.when(
            F.col(domain_col) == d, F.lit(counts[d]).cast("long")
        ).otherwise(n_expr)
    if not with_replacement:
        # same trailing column order as the replacement and
        # empty-quota paths (..., copy_id, epoch_rank): a positional
        # union across modes must not silently swap the two longs
        return (
            ranked.where(F.col("_rk") <= quota_expr)
            .withColumn("copy_id", F.lit(1).cast("long"))
            .withColumn("epoch_rank", F.col("_rk"))
            .drop("_rk")
        )
    # replication: quota // n full passes over the domain, plus the
    # (quota % n) smallest by order key once more; empty sequence when
    # a row gets zero copies (sequence(1,0) would DESCEND — guard it)
    n_copies = (
        F.floor(quota_expr / n_expr).cast("long")
        + F.when(F.col("_rk") <= quota_expr % n_expr, 1).otherwise(0)
    )
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)
    ).otherwise(F.array().cast("array<long>"))
    return (
        ranked.withColumn("copy_id", F.explode(copies))
        .withColumn(
            "epoch_rank",
            ((F.col("copy_id") - 1) * n_expr + F.col("_rk")).cast(
                "long"
            ),
        )
        .drop("_rk")
    )


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    score_col: str = "score_micro",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    _acc: int = 10_000,
) -> DataFrame:
    """Budget-constrained selection (round 12): keep the MAXIMAL
    prefix of ``(score desc, id asc)`` whose cumulative token count
    fits ``budget_tokens`` — the "fill a 10B-token training budget
    with the best documents" op (the DSIR/quality-filter sibling with
    a budget instead of a count). Exact and deterministic: integer
    scores + the id tie-break give one well-defined prefix, so an
    ANSI-SQL engine replays the member set with a window cumsum
    (pipe_budget_select's oracle).

    Scale shape — the global-prefix-sum trap avoided: a naive
    ``sum(tokens) OVER (ORDER BY score)`` puts the whole corpus
    through ONE task. Instead the lm.py ``_rank_boundary`` pattern,
    token-weighted: a percentile_approx sketch brackets the boundary
    score between two VALUE thresholds whose above-mass straddles the
    budget (one two-sided conditional agg per probe, ~1-3 rounds);
    everything above the bracket is kept outright, and the running
    sum runs ONLY inside the bracket band — sketch-bounded
    (~4·n/accuracy rows), independent of corpus size. Tie groups lie
    wholly inside the band (value comparisons), so the id tie-break
    is applied exactly where it matters. Extreme tie mass degrades to
    a whole-relation band — still correct, just unbounded, same
    documented fallback as _rank_boundary."""
    rel = docs
    total = rel.agg(F.sum(token_col).alias("t")).head()["t"]
    if total is None:
        return rel.limit(0)
    if int(total) <= budget_tokens:
        return rel
    # bracket the boundary score: mass_above(t_hi) <= budget <
    # mass_above(t_lo)
    q = max(0.0, min(1.0, 1.0 - budget_tokens / int(total)))
    margin = 2.0 / _acc
    t_lo = t_hi = None
    m_above = 0
    for _ in range(6):
        qs = [max(0.0, q - margin), min(1.0, q + margin)]
        t = rel.agg(
            F.percentile_approx(score_col, qs, _acc).alias("t")
        ).head()["t"]
        c_lo, c_hi = t[0], t[1]  # qs[1] → larger score threshold
        got = rel.agg(
            F.sum(
                F.when(F.col(score_col) > c_hi, F.col(token_col))
            ).alias("hi"),
            F.sum(
                F.when(F.col(score_col) > c_lo, F.col(token_col))
            ).alias("lo"),
        ).head()
        m_hi = int(got["hi"] or 0)
        m_lo = int(got["lo"] or 0)
        if m_hi <= budget_tokens < m_lo:
            t_lo, t_hi = c_lo, c_hi
            m_above = m_hi  # already the exact above-bracket mass
            break
        margin *= 4.0
    if t_lo is None:
        # degenerate tie mass: whole relation becomes the band
        kept_above = rel.limit(0)
        band = rel
        m_above = 0
    else:
        kept_above = rel.where(F.col(score_col) > t_hi)
        band = rel.where(
            (F.col(score_col) > t_lo) & (F.col(score_col) <= t_hi)
        )
    w = Window.orderBy(
        F.col(score_col).desc(), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    band_kept = band.withColumn("_cum", F.sum(token_col).over(w)).where(
        F.col("_cum") + F.lit(m_above) <= F.lit(budget_tokens)
    ).drop("_cum")
    return kept_above.unionByName(band_kept)
