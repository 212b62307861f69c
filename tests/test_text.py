import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions import text as T


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "机器学习 很 有趣"),
        (2, "el niño come mañana"),
        (3, "über die brücke"),
        (4, "où est la forêt"),
        (5, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_shingles(df):
    out = df.select(
        "doc_id",
        T.token_count("text").alias("n"),
        F.size(T.shingles("text", 3)).alias("nsh"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n"] == 6
    assert by_id[0]["nsh"] == 4  # 6 tokens → 4 trigrams
    assert by_id[5]["nsh"] == 0  # below shingle width → empty set


def test_lang_id_rules(df):
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", T.lang_id("text").alias("l")).collect()}
    assert got == {0: "en", 1: "zh", 2: "es", 3: "de", 4: "fr", 5: "en"}


def test_stopword_and_quality_bounds(df):
    rows = df.select(
        T.stopword_ratio("text").alias("sr"),
        T.quality_score("text").alias("q"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["sr"] <= 1.0
        assert 0.0 <= r["q"] <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "hello  world ")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]  # case + whitespace collapse
    assert fps[2] != fps[0]  # trailing space preserved (documented)


def test_repetition_ratio(spark):
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.functions.text import repetition_ratio

    rows = [
        (1, "a b c a b c a b c"),  # 7 grams, 3 distinct -> 4/7
        (2, "all distinct words in this doc"),  # 0.0
        (3, "x y"),  # shorter than n -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["rr"]
        for r in df.select(
            "doc_id", F.round(repetition_ratio("text"), 6).alias("rr")
        ).collect()
    }
    assert abs(got[1] - 4 / 7) < 1e-6
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_boilerplate_stats(spark):
    from nebuia_vector_db_spark.functions.text import boilerplate_stats
    from nebuia_vector_db_spark.operators.dedup import shingle_postings

    # "x y z" appears in 3 docs (boilerplate at min_df=3); each doc
    # also has one unique shingle
    rows = [
        (1, "x y z a b c"),
        (2, "x y z d e f"),
        (3, "x y z g h i"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in boilerplate_stats(
            shingle_postings(docs), min_df=3
        ).collect()
    }
    # 4 shingles per doc (xyz, yza.., zab.., abc-style); exactly one
    # ("x y z") clears df>=3
    for d in (1, 2, 3):
        assert got[d]["n_shingles"] == 4
        assert got[d]["n_boiler"] == 1
        assert abs(got[d]["boiler_ratio_raw"] - 0.25) < 1e-12


def test_text_repetition_long_doc_bounded_time(spark, tmp_path):
    """Round 6 (VERDICT r5 task #1): a 50k-word document with ~all-
    distinct bigrams must complete in bounded time. The pre-round-6
    per-row HOF was O(distinct_bigrams x n_bigrams) ~ 2.5e9 string
    comparisons for this doc (minutes in one task); the linear
    explode/groupBy/max shape is one partial-agg pass."""
    import time

    from nebuia_vector_db_spark.queries import q_text_repetition

    n = 50_000
    # all words distinct -> 49_999 distinct bigrams (worst case for
    # the old HOF), then a planted hot bigram repeated 100 times
    words = [f"w{i}" for i in range(n)] + ["hot", "pair"] * 100
    rows = [(1, " ".join(words)), (2, "solo")]
    sf_dir = str(tmp_path / "sf_longdoc")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    t0 = time.monotonic()
    got = {r["doc_id"]: r for r in q_text_repetition(spark, sf_dir).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"long-doc repetition took {elapsed:.1f}s"

    d = got[1]
    assert d["n_words"] == n + 200
    assert d["n_bigrams"] == n + 200 - 1
    # "hot pair" occurs 100x, "pair hot" 99x, everything else once
    assert d["top_bigram_n"] == 100
    # zero-bigram doc still reports a 0 (explode_outer path)
    assert got[2]["n_bigrams"] == 0
    assert got[2]["top_bigram_n"] == 0
    assert got[2]["top_bigram_share"] == 0.0
