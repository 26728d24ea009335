"""Text-analysis functions (functions/text.py)."""

from pyspark.sql import functions as F

from replicadb_spark.functions import text as X


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(col.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "  the quick  brown fox ", X.token_count(F.col("t"))) == 4
    assert _one(spark, "", X.token_count(F.col("t"))) == 0
    assert _one(spark, "ab12cd x", X.word_token_count(F.col("t"))) == 4  # ab|12|cd|x


def test_stopword_and_punct_ratio(spark):
    assert _one(spark, "the cat is here", X.stopword_ratio(F.col("t"))) == 0.5
    assert _one(spark, "ab!?", X.punct_ratio(F.col("t"))) == 0.5
    assert _one(spark, "", X.punct_ratio(F.col("t"))) == 0.0


def test_quality_score_bounds(spark):
    v = _one(spark, "the quick brown fox jumps over a lazy dog " * 8, X.quality_score(F.col("t")))
    assert 0.0 <= v <= 1.0
    junk = _one(spark, "!!! ??? ***", X.quality_score(F.col("t")))
    good = _one(spark, "the cat sat on a mat and it is nice to see that " * 6, X.quality_score(F.col("t")))
    assert good > junk


def test_language_id(spark):
    assert _one(spark, "the cat and the dog is here", X.language_id(F.col("t"))) == "en"
    assert _one(spark, "el perro y la casa es grande", X.language_id(F.col("t"))) == "es"
    assert _one(spark, "der hund und die katze ist da", X.language_id(F.col("t"))) == "de"
    assert _one(spark, "xyzzy plugh", X.language_id(F.col("t"))) == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, "Hello   World", X.fingerprint(F.col("t")))
    b = _one(spark, "hello world ", X.fingerprint(F.col("t")))
    c = _one(spark, "hello worlds", X.fingerprint(F.col("t")))
    assert a == b
    assert a != c
    assert 0 <= a < 1_000_000_007


def test_winnowing_fingerprints_tiny(spark):
    """Hand-checkable winnowing: identical docs share all fingerprints;
    a doc shorter than k yields none; overlapping docs share some."""
    from replicadb_spark.functions.text import winnowing_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical
        (3, "short"),                                        # < k chars? no: 5 < 8
        (4, "a completely different sentence with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnowing_fingerprints(df, "doc_id", "text", k=8, w=4)
    by_id = {}
    for r in fp.collect():
        by_id.setdefault(r["id"], set()).add(r["fp"])
    assert by_id[1] == by_id[2]          # identical docs → identical sketch
    assert 3 not in by_id                # too short for any k-gram
    assert by_id[1] != by_id[4]          # different docs → different sketch
    # windows overlap, so selected set is smaller than the gram count
    assert 0 < len(by_id[1]) <= len(rows[0][1]) - 8 + 1


def test_bpe_token_count(spark):
    from replicadb_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("It's 42 degrees, isn't it?",), ("hello world",), ("",)], ["t"]
    )
    got = [r["n"] for r in df.select(bpe_token_count(F.col("t")).alias("n")).collect()]
    # "it" "'s" " 42" " degrees" "," " isn" "'t" " it" "?"  → 9 pre-tokens
    assert got[0] == 9
    # "hello" " world" → 2
    assert got[1] == 2
    assert got[2] == 0


def test_redact_pii_masks_and_counts(spark):
    from replicadb_spark.functions.text import redact_pii

    rows = [
        (1, "contact john.doe+x@example.co.uk or call 5551234567 now"),
        (2, "k=42 v=007"),
        (3, "no pii here"),
        (4, "two mails a@b.io c@d.org and run 123456789012"),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    cols = redact_pii(F.col("s"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            cols["redacted"].alias("red"),
            cols["n_email"].alias("ne"),
            cols["n_longnum"].alias("nl"),
            cols["n_num"].alias("nn"),
        ).collect()
    }
    assert out[1]["red"] == "contact <EMAIL> or call <NUM> now"
    assert (out[1]["ne"], out[1]["nl"], out[1]["nn"]) == (1, 1, 0)
    assert out[2]["red"] == "k=# v=#"
    assert (out[2]["ne"], out[2]["nl"], out[2]["nn"]) == (0, 0, 2)
    assert out[3]["red"] == "no pii here"
    assert out[4]["red"] == "two mails <EMAIL> <EMAIL> and run <NUM>"
    assert (out[4]["ne"], out[4]["nl"], out[4]["nn"]) == (2, 1, 0)
