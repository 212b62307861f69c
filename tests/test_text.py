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
