"""Interchange round trips — the adversarial-content cases the
registry rows' synthetic corpus can't exercise.

pipe_csv_roundtrip / pipe_orc_roundtrip hash-certify the format layer
on the test corpus; these tests push the content that actually breaks
CSV serializers (embedded newlines, quotes, delimiters, leading
zeros-as-strings, unicode, empty and NULL fields) through the SAME
writer/reader option set the registry rows use.
"""

from pyspark.sql import functions as F

ADVERSARIAL = [
    (0, 'comma, inside', "en"),
    (1, 'quote " inside', "en"),
    (2, "newline\ninside", "de"),
    (3, 'both ",\n" at once', "de"),
    (4, "trailing space ", "es"),
    (5, "", "es"),            # empty string (must NOT round-trip to NULL)
    (6, None, "es"),          # NULL text
    (7, "unicode: 日本語 🚀 ümlaut", "ja"),
    (8, "007", "en"),         # numeric-looking string, schema-pinned read
    (9, "\twindows\r\nline", "en"),
]


def _write_read_csv(spark, df, path):
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .option("quoteAll", "true")
        .option("escape", '"')
        # the writer-side trim defaults are the bug this suite exists
        # to catch — see q_pipe_csv_roundtrip
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
    return (
        spark.read.schema("doc_id long, text string, lang string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


def test_csv_adversarial_content_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        ADVERSARIAL, "doc_id long, text string, lang string"
    )
    back = _write_read_csv(spark, df, str(tmp_path / "csv"))
    got = {r.doc_id: r.text for r in back.collect()}
    want = {i: t for i, t, _ in ADVERSARIAL}
    # CSV cannot distinguish NULL from empty under quoteAll: Spark
    # writes NULL as an empty unquoted field and "" as a quoted empty
    # field; with emptyValue defaults both read back as "" or null
    # depending on options. Pin the exact observed contract per field:
    for i in want:
        if want[i] in ("", None):
            assert got[i] in ("", None), (i, got[i])
        else:
            assert got[i] == want[i], (i, got[i], want[i])


def test_orc_adversarial_content_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        ADVERSARIAL, "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.schema("doc_id long, text string, lang string").orc(
        path
    )
    got = {r.doc_id: r.text for r in back.collect()}
    # ORC is typed: NULL and "" round-trip EXACTLY
    assert got == {i: t for i, t, _ in ADVERSARIAL}


def test_csv_distinguishes_content_not_row_count(spark, tmp_path):
    """Embedded newlines must not split rows (multiLine read)."""
    df = spark.createDataFrame(
        [(i, f"line1\nline2-{i}", "en") for i in range(50)],
        "doc_id long, text string, lang string",
    )
    back = _write_read_csv(spark, df, str(tmp_path / "csv"))
    assert back.count() == 50
    assert back.where(F.col("text").contains("\n")).count() == 50
