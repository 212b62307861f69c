"""Training-data pipeline operators (operators/pipeline.py): chunk
coverage/overlap invariants, scrub idempotence, split stability,
packing capacity bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.pipeline import (
    chunk_documents,
    dataset_split,
    pack_sequences,
    scrub_pii,
)


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, size=64, overlap=16).orderBy("chunk_id").collect()
    # stride 48: starts at 0, 48, 96 → 3 chunks; last one truncated
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 54]
    toks = text.split(" ")
    for r in rows:
        start = r["chunk_id"] * 48
        assert r["chunk_text"].split(" ") == toks[start : start + 64]
    # consecutive chunks share exactly `overlap` tokens
    a, b = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert a[-16:] == b[:16]


def test_chunking_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    [r] = chunk_documents(docs, size=64, overlap=16).collect()
    assert (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"]) == (0, 3, "a b c")


def test_scrub_pii_redacts_and_is_idempotent(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe@corp.io or visit https://x.io/a?b=1 ok"),
            (2, "call +1-555-0199 now"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean_text"] for r in scrub_pii(docs).collect()}
    assert out[1] == "mail me at [EMAIL] or visit [URL] ok"
    assert out[2] == "call [PHONE] now"
    assert out[3] == "nothing sensitive here"
    # idempotent: scrubbing clean text changes nothing
    clean = scrub_pii(docs).select("doc_id", F.col("clean_text").alias("text"))
    again = {r["doc_id"]: r["clean_text"] for r in scrub_pii(clean).collect()}
    assert again == out


def test_dataset_split_deterministic_and_partitioned(spark, sf_oracle):
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_oracle, "documents")
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert a == b  # no RNG — identical across runs
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    n = len(a)
    assert counts["train"] > 0.7 * n  # ~80%
    assert counts["val"] + counts["test"] > 0.1 * n


def test_pack_sequences_bins_are_contiguous_and_bounded(spark):
    rows = [(i, " ".join(["t"] * (100 + i))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(docs, capacity=1000).orderBy("doc_id").collect()
    # offsets are the running total; bins are floor(offset/capacity)
    off = 0
    for r in packed:
        assert r["start_offset"] == off
        assert r["bin_id"] == off // 1000
        off += r["n_tokens"]
    # every bin's docs are consecutive in id order
    bins = {}
    for r in packed:
        bins.setdefault(r["bin_id"], []).append(r["doc_id"])
    for ids in bins.values():
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_decontaminate_flags_cross_split_overlap(spark):
    from nebuia_vector_db_spark.operators.pipeline import decontaminate

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, f"unique{i} filler{i} mixer{i} pad{i} more{i}") for i in range(40)]
    # plant the shared passage in every doc id < 8 — whatever the md5
    # split assigns, some pair must cross the train/eval boundary
    planted = [(100 + i, shared + f" tail{i}") for i in range(8)]
    docs = spark.createDataFrame(rows + planted, "doc_id long, text string")
    got = decontaminate(docs, n=3, min_shared=2).collect()
    from nebuia_vector_db_spark.operators.pipeline import dataset_split

    splits = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    planted_ids = [i for i, _ in planted]
    crossers = [
        (e, t)
        for e in planted_ids
        for t in planted_ids
        if splits[e] != "train" and splits[t] == "train"
    ]
    found = {(r["eval_doc"], r["train_doc"]) for r in got}
    for pair in crossers:
        assert pair in found  # every cross-split planted pair reported
    # only planted docs share >= 2 shingles
    assert all(e in planted_ids and t in planted_ids for e, t in found)


def test_decontaminate_against_external_eval_13gram(spark):
    """Planted contamination: a train doc embedding an exact 13-token
    span from the benchmark is dropped; a 12-token overlap (one short
    of n) is kept — the GPT-3 §4 boundary."""
    from nebuia_vector_db_spark.operators.pipeline import (
        decontaminate_against,
    )

    bench_words = [f"bench{i}" for i in range(13)]
    bench = " ".join(bench_words)
    eval_rel = spark.createDataFrame(
        [(900, "intro " + bench + " outro"), (901, "other eval words")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # full 13-gram planted mid-document → dropped
            (1, "pre text " + bench + " post text"),
            # only the first 12 benchmark tokens → kept
            (2, "pre " + " ".join(bench_words[:12]) + " post"),
            # clean doc → kept
            (3, "totally unrelated training prose here"),
            # shorter than 13 tokens → no grams, kept
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate_against(train, eval_rel, n=13).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # one row per TRAIN doc
    assert got[1]["dropped"] == 1
    assert got[1]["n_collide_grams"] == 1
    assert got[1]["n_eval_docs"] == 1
    for clean in (2, 3, 4):
        assert got[clean]["dropped"] == 0, clean
        assert got[clean]["n_collide_grams"] == 0
        assert got[clean]["n_eval_docs"] == 0


def test_decontaminate_against_counts_distinct_grams_and_eval_docs(spark):
    from nebuia_vector_db_spark.operators.pipeline import (
        decontaminate_against,
    )

    # 14 shared tokens → two distinct 13-grams; the same span sits in
    # TWO eval docs, so n_eval_docs = 2 while grams stay distinct
    span = " ".join(f"s{i}" for i in range(14))
    eval_rel = spark.createDataFrame(
        [(10, span), (11, "lead " + span)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, span + " tail")], "doc_id long, text string"
    )
    row = decontaminate_against(train, eval_rel, n=13).collect()[0]
    assert row["n_collide_grams"] == 2
    assert row["n_eval_docs"] == 2
    assert row["dropped"] == 1
    # min_collide above the overlap keeps the doc
    row3 = decontaminate_against(
        train, eval_rel, n=13, min_collide=3
    ).collect()[0]
    assert row3["dropped"] == 0 and row3["n_collide_grams"] == 2


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    import pandas as pd

    from nebuia_vector_db_spark.operators.pipeline import stratified_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(2000),
            "lang": ["en", "es", "de", "fr"] * 500,
        }
    )
    df = spark.createDataFrame(pdf)
    rates = {"en": 0.5, "es": 1.0, "de": 0.0}
    s1 = stratified_sample(df, rates).collect()
    s2 = stratified_sample(df, rates).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(
        r["doc_id"] for r in s2
    )  # no RNG, fully reproducible
    by_lang = {}
    for r in s1:
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += 1
    assert by_lang.get("es") == 500       # rate 1.0 keeps all
    assert "de" not in by_lang            # rate 0.0 keeps none
    assert "fr" not in by_lang            # default_rate 0.0
    assert 180 < by_lang.get("en", 0) < 320  # ~0.5 of 500


def test_epoch_shard_reshuffles_per_epoch_deterministically(spark, sf_smoke):
    """Same epoch → identical (shard, order); different epoch →
    different permutation; shards stay roughly balanced; every doc
    appears exactly once regardless of epoch."""
    from nebuia_vector_db_spark.operators.pipeline import epoch_shard
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n = docs.count()

    def keyed(epoch):
        return sorted(
            (r["doc_id"], r["shard"], r["order_key"])
            for r in epoch_shard(docs, epoch, n_shards=8).collect()
        )

    e1a, e1b, e2 = keyed(1), keyed(1), keyed(2)
    assert e1a == e1b  # reproducible
    assert e1a != e2  # epoch actually reshuffles
    assert len(e1a) == n  # conservation

    counts = [
        r["c"]
        for r in epoch_shard(docs, 1, n_shards=8)
        .groupBy("shard")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) <= 3 * min(counts)  # rough md5 balance at n=500


def test_leakage_safe_split_groups_never_span_folds(spark):
    """Round 11: every near-dup group lands wholly in one fold, and
    introducing group-awareness re-routes ONLY grouped documents —
    singletons keep their plain dataset_split fold."""
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.operators.pipeline import (
        dataset_split,
        leakage_safe_split,
    )

    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    # groups: {0,1,2} -> 0, {10,11} -> 10, {50,399} -> 50
    groups = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (50, 50), (399, 50)],
        "doc_id long, group_id long",
    )
    out = leakage_safe_split(docs, groups)
    rows = {r["doc_id"]: (r["group_id"], r["split"]) for r in out.collect()}
    assert len(rows) == 400
    # group cohesion: one fold per group
    for members in ([0, 1, 2], [10, 11], [50, 399]):
        folds = {rows[m][1] for m in members}
        keys = {rows[m][0] for m in members}
        assert len(folds) == 1 and keys == {members[0]}, members
    # singletons match the plain per-doc split exactly
    plain = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs).collect()
    }
    grouped = {0, 1, 2, 10, 11, 50, 399}
    for d in range(400):
        if d not in grouped:
            assert rows[d] == (d, plain[d]), d
    # and a grouped member inherits its CANONICAL's plain fold
    assert rows[399][1] == plain[50]
    # a NON-functional groups relation (doc in two groups) must raise
    # at execution, not silently duplicate corpus rows (ADVICE r11)
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(0, 0), (0, 7), (1, 0)], "doc_id long, group_id long"
    )
    with _pytest.raises(Exception, match="group_ids"):
        leakage_safe_split(docs, bad).collect()
    # duplicated IDENTICAL rows are still functional (e.g. two unioned
    # closure outputs): must split fine, not spuriously raise — the
    # guard counts DISTINCT group ids (code-review r12)
    dup_rows = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 0), (1, 0)], "doc_id long, group_id long"
    )
    out2 = {
        r["doc_id"]: r["group_id"]
        for r in leakage_safe_split(docs, dup_rows).collect()
    }
    assert len(out2) == 400 and out2[0] == 0 and out2[1] == 0


def test_leakage_split_null_group_routes_by_own_id(spark):
    """Second-review r12: a NULL group_id means 'no group' — the doc
    must route by its own id (like any singleton), not trip the
    functional guard with _gn=0."""
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.operators.pipeline import (
        dataset_split,
        leakage_safe_split,
    )

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    groups = spark.createDataFrame(
        [(7, None), (3, 3), (4, 3)], "doc_id long, group_id long"
    )
    out = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in leakage_safe_split(docs, groups).collect()
    }
    plain = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert out[7] == (7, plain[7])        # NULL group -> own id
    assert out[3][0] == out[4][0] == 3    # real group intact


# --------------------------------------------------------------------------
# Pretraining export (round 14): word_vocab + pack_token_bins — the
# encode→pack stages of the pipe_pretrain_export composition (the
# shard/re-read stages are certified by that registry row's oracle and
# tests/test_webdataset.py).
# --------------------------------------------------------------------------


def test_pack_sequences_n_tokens_col_override(spark):
    """Packing a precomputed count column equals packing the same
    counts derived from text — and packs REAL counts (here +2 for
    bos/eos) the text itself doesn't carry."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(10 + i))) for i in range(20)],
        "doc_id long, text string",
    )
    via_text = {
        r["doc_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_sequences(docs, capacity=16).collect()
    }
    counted = docs.withColumn(
        "n", F.size(F.split("text", " ")).cast("long")
    )
    via_col = {
        r["doc_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_sequences(
            counted, capacity=16, n_tokens_col="n"
        ).collect()
    }
    assert via_text == via_col
    shifted = {
        r["doc_id"]: r["start_offset"]
        for r in pack_sequences(
            counted.withColumn("n", F.col("n") + 2),
            capacity=16,
            n_tokens_col="n",
        ).collect()
    }
    for i in sorted(shifted):
        assert shifted[i] == via_text[i][0] + 2 * i  # +2 per prior doc


def test_word_vocab_rank_and_specials(spark):
    from nebuia_vector_db_spark.operators.pipeline import (
        UNK_ID,
        word_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c d b")], "doc_id long, text string"
    )
    got = {r["word"]: r["tok_id"] for r in word_vocab(docs, 3).collect()}
    # counts: a=3 b=3 c=2 d=1 → rank by (cnt DESC, word ASC), top 3
    assert got == {"a": UNK_ID + 1, "b": UNK_ID + 2, "c": UNK_ID + 3}


def test_pack_token_bins_reassembles_the_exact_stream(spark):
    """Bin payloads, concatenated in bin order, equal the per-doc
    [BOS] ids [EOS] streams concatenated in doc order — offsets, bin
    cuts and in-bin ordering all exact; every bin but the last is
    exactly `capacity` tokens."""
    from nebuia_vector_db_spark.operators.pipeline import (
        BOS_ID,
        EOS_ID,
        UNK_ID,
        pack_token_bins,
        word_vocab,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 4)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {
        r["word"]: r["tok_id"] for r in word_vocab(docs, 8).collect()
    }
    bins = (
        pack_token_bins(docs, word_vocab(docs, 8), capacity=32)
        .orderBy("bin_id")
        .collect()
    )
    got_stream = [
        int(t) for r in bins for t in r["payload"].split(" ")
    ]
    want_stream = []
    for _, text in sorted(rows):
        want_stream += (
            [BOS_ID]
            + [vocab.get(w, UNK_ID) for w in text.split(" ")]
            + [EOS_ID]
        )
    assert got_stream == want_stream
    sizes = [r["n_tokens"] for r in bins]
    assert all(s == 32 for s in sizes[:-1]) and 0 < sizes[-1] <= 32
    assert all(
        len(r["payload"].split(" ")) == r["n_tokens"] for r in bins
    )
    assert [r["bin_id"] for r in bins] == list(range(len(bins)))


def test_trained_tokenizer_drops_into_export_spine(spark):
    """The docstring's drop-in claim: encode_bpe's piece column packs
    through word_vocab(tokens_col=) + pack_token_bins(tokens_col=)
    and the reassembled bin stream equals the per-doc [BOS] piece-ids
    [EOS] streams built independently from the encoder's own output."""
    from nebuia_vector_db_spark.operators.bpe import (
        encode_bpe,
        train_bpe,
    )
    from nebuia_vector_db_spark.operators.pipeline import (
        BOS_ID,
        EOS_ID,
        UNK_ID,
        pack_token_bins,
        word_vocab,
    )

    rows = [
        (i, " ".join(["lower lowest newer wider new low"] * 2))
        for i in range(8)
    ] + [(8, "unrelated zz qq"), (9, "low lower newest")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=12)
    enc = encode_bpe(docs, merges).cache()
    vocab = word_vocab(enc, 16, tokens_col="bpe_tokens")
    vmap = {r["word"]: r["tok_id"] for r in vocab.collect()}
    assert vmap and all(v > UNK_ID for v in vmap.values())
    bins = (
        pack_token_bins(enc, vocab, capacity=24, tokens_col="bpe_tokens")
        .orderBy("bin_id")
        .collect()
    )
    got_stream = [int(t) for r in bins for t in r["payload"].split(" ")]
    pieces = {
        r["doc_id"]: r["bpe_tokens"]
        for r in enc.select("doc_id", "bpe_tokens").collect()
    }
    want_stream = []
    for i, _ in sorted(rows):
        want_stream += (
            [BOS_ID]
            + [vmap.get(p, UNK_ID) for p in pieces[i]]
            + [EOS_ID]
        )
    enc.unpersist()
    assert got_stream == want_stream
    sizes = [r["n_tokens"] for r in bins]
    assert all(s == 24 for s in sizes[:-1]) and 0 < sizes[-1] <= 24


def test_payload_le_hex_is_struct_pack_exact_and_guards_overflow(spark):
    """payload_le_hex ≡ struct.pack('<NH') byte-for-byte (the
    Megatron/GPT-NeoX .bin layout), at both widths; a token that
    overflows the width raises instead of silently truncating."""
    import struct

    from pyspark.sql.utils import PythonException

    from nebuia_vector_db_spark.operators.pipeline import payload_le_hex

    toks = [0, 1, 255, 256, 4099, 65535]
    payload = " ".join(str(t) for t in toks)
    df = spark.createDataFrame([(payload,)], "payload string")
    got16 = df.select(
        F.unhex(payload_le_hex("payload", 2)).alias("b")
    ).head()["b"]
    assert bytes(got16) == struct.pack(f"<{len(toks)}H", *toks)
    got32 = df.select(
        F.unhex(payload_le_hex("payload", 4)).alias("b")
    ).head()["b"]
    assert bytes(got32) == struct.pack(f"<{len(toks)}I", *toks)

    over = spark.createDataFrame([("70000",)], "payload string")
    import pytest as _pt

    with _pt.raises(Exception, match="overflows"):
        over.select(payload_le_hex("payload", 2).alias("h")).collect()
