"""Golden key sets for the extended predicate family (SURVEY.md §2.4)."""

import pyspark.sql.functions as F

from ny_campaign_finance_dedupe_spark.functions import keygen


def keys(spark, expr_fn, value, *args, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    row = df.select(expr_fn(F.col("v"), *args).alias("k")).collect()[0]
    return set(row["k"]) if row["k"] is not None else set()


def test_suffix_array(spark):
    # suffixes of length >= 5 (predicates.py:462-469)
    assert keys(spark, keygen.suffix_array, "abcdefg") == {
        "abcdefg",
        "bcdefg",
        "cdefg",
    }
    assert keys(spark, keygen.suffix_array, "abcd") == set()
    assert keys(spark, keygen.suffix_array, None) == set()


def test_one_gram_fingerprint(spark):
    assert keys(spark, keygen.one_gram_fingerprint, "b ab a") == {"ab"}
    assert keys(spark, keygen.one_gram_fingerprint, "") == set()


def test_two_gram_fingerprint(spark):
    # "abab" -> 2-grams {ab, ba} sorted -> "abba" (spaces removed first)
    assert keys(spark, keygen.two_gram_fingerprint, "ab ab") == {"abba"}
    assert keys(spark, keygen.two_gram_fingerprint, "a") == set()


def test_hundred_integers(spark):
    assert keys(spark, keygen.hundred_integers, "got 123 and 4567") == {
        "100",
        "4500",
    }


def test_hundred_integers_odd(spark):
    assert keys(spark, keygen.hundred_integers_odd, "123 124") == {
        "100@1",
        "100@0",
    }


def test_order_of_magnitude(spark):
    assert keys(spark, keygen.order_of_magnitude, 4500.0, typ="double") == {"3"}
    assert keys(spark, keygen.order_of_magnitude, 0.0, typ="double") == set()


def test_round_to_1(spark):
    assert keys(spark, keygen.round_to_1, 4501.0, typ="double") == {"5000"}
    assert keys(spark, keygen.round_to_1, 0.0, typ="double") == {"0"}
    # nulls emit NO keys (module contract) — not the "0" mega-block
    assert keys(spark, keygen.round_to_1, None, typ="double") == set()


def test_latlong_grid(spark):
    df = spark.createDataFrame([(40.712, -74.006)], "lat double, lon double")
    row = df.select(
        keygen.latlong_grid(F.col("lat"), F.col("lon")).alias("k")
    ).collect()[0]
    assert set(row["k"]) == {"40.7,-74.0"}
    df0 = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    assert (
        df0.select(keygen.latlong_grid("lat", "lon").alias("k")).collect()[0]["k"]
        == []
    )


def test_phonetic(spark):
    # soundex('robert') == soundex('rupert') — the phonetic-canopy property
    assert keys(spark, keygen.phonetic, "robert") == keys(
        spark, keygen.phonetic, "rupert"
    )
    assert keys(spark, keygen.phonetic_tokens, "robert smith") == keys(
        spark, keygen.phonetic_tokens, "rupert smyth"
    )


def test_set_predicates(spark):
    df = spark.createDataFrame([(["b", "a", "c"],)], "v array<string>")

    def k(fn):
        return set(df.select(fn(F.col("v")).alias("k")).collect()[0]["k"])

    assert k(keygen.whole_set) == {"a,b,c"}
    assert k(keygen.common_set_elements) == {"a", "b", "c"}
    assert k(keygen.first_set_element) == {"a"}
    assert k(keygen.last_set_element) == {"c"}
    assert k(keygen.magnitude_of_cardinality) == {"0"}


def test_typo_variants(spark):
    got = keys(spark, keygen.typo_variants, "hello")
    assert "hello" in got          # identity
    assert "hell" in got           # prefix >= 4
    assert "hll" in got            # consonant skeleton
    assert "ehllo" in got          # transposition of chars 1-2
    assert "helol" in got          # transposition of chars 4-5
    assert keys(spark, keygen.typo_variants, None) == set()


def test_ngram_exprs_are_udf_arg_safe_over_python_source(spark):
    """Regression: Spark 4.1.2's ExtractPythonUDFs declines to extract a
    pandas UDF whose argument contains a nested-capture lambda when the
    plan sits above another Python-eval node (mapInPandas upstream), and
    the job dies with INTERNAL_ERROR 'Cannot evaluate expression'. The
    shingle chain (word_ngrams -> shingle_hashes -> minhash/simhash UDF)
    is exactly that shape, and synth_pages/foreachBatch put a Python node
    upstream — so word_ngrams/char_ngrams must stay capture-free
    (keygen._ngram_zip), not use keygen._bind."""
    from ny_campaign_finance_dedupe_spark.functions import hashing

    base = spark.createDataFrame(
        [("a b c d e f g",), ("hello world hello again and again",)], "t string"
    )
    mapped = base.mapInPandas(lambda it: it, schema="t string")
    fused = hashing.minhash_simhash_udf(8)(
        hashing.shingle_hashes(keygen.word_ngrams(F.col("t"), 3))
    )
    rows = mapped.select(fused.alias("s")).collect()
    assert len(rows) == 2 and all(len(r["s"]["sig"]) == 8 for r in rows)
    # char_ngrams through a scalar-iter UDF over the same Python source
    sig = hashing.minhash_signature_udf(8)(
        hashing.shingle_hashes(keygen.char_ngrams(F.col("t"), 4))
    )
    rows = mapped.select(sig.alias("s")).collect()
    assert len(rows) == 2 and all(len(r["s"]) == 8 for r in rows)
