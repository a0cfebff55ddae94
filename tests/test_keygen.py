"""Golden key sets per predicate — mirrors dedupe/tests/test_predicates.py:6-126."""

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.functions import keygen, normalize


def keys(spark, expr_fn, value, *args):
    df = spark.createDataFrame([(value,)], "v string")
    row = df.select(expr_fn(F.col("v"), *args).alias("k")).collect()[0]
    return set(row["k"]) if row["k"] is not None else set()


def test_whole_field(spark):
    assert keys(spark, keygen.whole_field, "a b") == {"a b"}
    assert keys(spark, keygen.whole_field, None) == set()


def test_tokens(spark):
    assert keys(spark, keygen.tokens, "a b a") == {"a", "b"}
    assert keys(spark, keygen.tokens, None) == set()


def test_first_token(spark):
    assert keys(spark, keygen.first_token, "foo bar") == {"foo"}
    assert keys(spark, keygen.first_token, "") == set()


def test_prefix(spark):
    assert keys(spark, keygen.prefix, "abcdef", 3) == {"abc"}
    assert keys(spark, keygen.prefix, "ab", 3) == set()


def test_fingerprint(spark):
    # sorted unique words concatenated (predicates.py:421-422)
    assert keys(spark, keygen.fingerprint, "tomato potato tomato") == {"potatotomato"}


def test_sorted_acronym(spark):
    assert keys(spark, keygen.sorted_acronym, "zebra apple mango") == {"amz"}


def test_common_integers(spark):
    assert keys(spark, keygen.common_integers, "a 007 b 12") == {"7", "12"}
    assert keys(spark, keygen.common_integers, "no digits") == set()


def test_first_integer(spark):
    assert keys(spark, keygen.first_integer, "042 main st") == {"42"}
    assert keys(spark, keygen.first_integer, "main 42") == set()


def test_near_integers(spark):
    assert keys(spark, keygen.near_integers, "x 5") == {"4", "5", "6"}


def test_alpha_numeric(spark):
    assert keys(spark, keygen.alpha_numeric, "apt 4b zip 12f77") == {"4b", "12f77"}


def test_word_ngrams(spark):
    assert keys(spark, keygen.word_ngrams, "a b c", 2) == {"a b", "b c"}
    assert keys(spark, keygen.word_ngrams, "a", 2) == set()


def test_char_ngrams(spark):
    # spaces removed first (predicates.py:437-444)
    assert keys(spark, keygen.char_ngrams, "ab cd", 4) == {"abcd"}
    assert keys(spark, keygen.char_ngrams, "abcde", 4) == {"abcd", "bcde"}


def test_exists_key(spark):
    assert keys(spark, keygen.exists_key, "x") == {"1"}
    assert keys(spark, keygen.exists_key, None) == {"0"}


def test_compound(spark):
    df = spark.range(1)
    row = df.select(
        keygen.compound(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit("x"))
        ).alias("k")
    ).collect()[0]
    assert set(row["k"]) == {"a:x", "b:x"}


def test_domain_key(spark):
    assert keys(spark, keygen.domain_key, "https://www.Example.com/p/1") == {
        "example.com"
    }
    assert keys(spark, keygen.domain_key, "http://sub.site.org:8080/x?q=1") == {
        "sub.site.org"
    }


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!! ",), ("...",), (None,)], "v string")
    got = [r["n"] for r in df.select(normalize.normalize_text("v").alias("n")).collect()]
    assert got == ["hello world", None, None]


def test_canonicalize_abbrev(spark):
    df = spark.createDataFrame(
        [("123 main st",), ("p o box 55",), ("stop street",)], "v string"
    )
    got = [
        r["n"] for r in df.select(normalize.canonicalize_abbrev("v").alias("n")).collect()
    ]
    assert got == ["123 main street", "post office box 55", "stop street"]


def test_extract_text_roundtrip(spark):
    html = "<html><body><p>Hello  world</p></body></html>".encode()
    df = spark.createDataFrame([(html,), (None,)], "h binary")
    got = [
        r["t"]
        for r in df.select(normalize.extract_text_udf()(F.col("h")).alias("t")).collect()
    ]
    assert got == ["Hello world", None]
