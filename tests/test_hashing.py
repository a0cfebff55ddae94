"""MinHash / SimHash determinism + similarity properties."""

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.functions import hashing, keygen


def _sig_df(spark, texts, num_perm=64):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    sh = keygen.word_ngrams(F.col("t"), 3)
    df = df.withColumn("hs", hashing.shingle_hashes(sh))
    return df.withColumn("sig", hashing.minhash_signature_udf(num_perm)(F.col("hs")))


def test_minhash_deterministic(spark):
    a = _sig_df(spark, ["the quick brown fox jumps over the lazy dog"]).collect()
    b = _sig_df(spark, ["the quick brown fox jumps over the lazy dog"]).collect()
    assert list(a[0]["sig"]) == list(b[0]["sig"])


def test_minhash_similarity_estimates_jaccard(spark):
    t1 = "a b c d e f g h i j k l m n o p q r s t"
    t2 = "a b c d e f g h i j k l m n o p q r s X"  # ~ high shingle overlap
    t3 = "z y x w v u t9 s8 r7 q6 p5 o4 n3 m2 l1 k0"
    rows = {r["id"]: list(r["sig"]) for r in _sig_df(spark, [t1, t2, t3], 128).collect()}
    sim12 = sum(x == y for x, y in zip(rows[0], rows[1])) / 128
    sim13 = sum(x == y for x, y in zip(rows[0], rows[2])) / 128
    assert sim12 > 0.6
    assert sim13 < 0.1


def test_minhash_null_and_empty(spark):
    df = spark.createDataFrame([(0, None), (1, "a b")], "id long, t string")
    sh = keygen.word_ngrams(F.col("t"), 3)  # 'a b' has no trigram
    df = df.withColumn("hs", hashing.shingle_hashes(sh)).withColumn(
        "sig", hashing.minhash_signature_udf(16)(F.col("hs"))
    )
    rows = {r["id"]: r["sig"] for r in df.collect()}
    assert rows[0] is None and rows[1] is None


def test_band_keys_collide_for_similar(spark):
    t1 = "a b c d e f g h i j k l m n o p q r s t"
    t2 = "a b c d e f g h i j k l m n o p q r s X"
    df = _sig_df(spark, [t1, t2], 64).withColumn(
        "bk", hashing.minhash_band_keys(F.col("sig"), bands=16, rows=4)
    )
    rows = {r["id"]: set(r["bk"]) for r in df.collect()}
    assert rows[0] & rows[1], "similar texts must share >=1 band key"


def test_simhash_hamming(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy cat today"),
            (2, "completely unrelated words about spark dataframes here"),
        ],
        "id long, t string",
    )
    toks = keygen.tokens(F.col("t"))
    df = df.withColumn("hs", hashing.shingle_hashes(toks)).withColumn(
        "sim", hashing.simhash_udf()(F.col("hs"))
    )
    df.createOrReplaceTempView("sh")
    rows = {r["id"]: r["sim"] for r in df.collect()}
    d01 = bin((rows[0] ^ rows[1]) & (2**64 - 1)).count("1")
    d02 = bin((rows[0] ^ rows[2]) & (2**64 - 1)).count("1")
    assert d01 < d02
    assert d01 <= 16


def test_simhash_band_keys_native_hamming(spark):
    df = spark.createDataFrame([(1, 7), (2, 5)], "id long, sim long")
    out = df.select(hashing.hamming64(F.col("sim"), F.lit(5)).alias("h")).collect()
    assert [r["h"] for r in out] == [1, 0]


def _offline_simhash(hashes):
    import numpy as np

    h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bitm = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    votes = bitm.sum(axis=0) * 2 - len(h)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out.astype(np.int64)))


def test_simhash_exact_in_batches_with_nulls(spark):
    """Regression: a batch containing a null row must not degrade the
    OTHER rows' simhash precision. (An object series with Nones — or
    .astype('Int64') on one — round-trips through float64 in the Arrow
    serializer, zeroing the low ~11 bits of every 64-bit value and
    collapsing the band-key space ~30x at 200k pages.)"""
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e unique{i} tok{i}") for i in range(40)]
    rows.append((40, None))
    df = spark.createDataFrame(rows, "id long, t string")
    df = df.withColumn("hs", hashing.shingle_hashes(keygen.tokens(F.col("t"))))
    got = {
        r["id"]: (r["sim"], r["hs"])
        for r in df.withColumn("sim", hashing.simhash_udf()(F.col("hs"))).collect()
    }
    assert got[40][0] is None
    for i in range(40):
        sim, hs = got[i]
        assert sim == _offline_simhash(hs), f"row {i} lost precision"


def test_fused_minhash_simhash_matches_singles(spark):
    """The fused struct UDF must agree bit-for-bit with the composable
    single-signature UDFs, nulls included."""
    rows = [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(20)]
    rows.append((20, None))
    df = spark.createDataFrame(rows, "id long, t string")
    df = df.withColumn("hs", hashing.shingle_hashes(keygen.tokens(F.col("t"))))
    fused = df.withColumn("s", hashing.minhash_simhash_udf(32)(F.col("hs"))).select(
        "id", F.col("s.sig").alias("sig"), F.col("s.simhash").alias("sim")
    )
    singles = df.withColumn(
        "sig", hashing.minhash_signature_udf(32)(F.col("hs"))
    ).withColumn("sim", hashing.simhash_udf()(F.col("hs")))
    a = {r["id"]: (r["sig"], r["sim"]) for r in fused.collect()}
    b = {r["id"]: (r["sig"], r["sim"]) for r in singles.collect()}
    assert a == b


def test_lsh_topk_recall_at_default_geometry(spark):
    """Planted-truth recall gate for the LSH ANN path (VERDICT r03 #8):
    200 queries planted at cosine 0.99 to a corpus vector among 2000
    distractors; the default geometry (bands=8, bits=12) must put the
    planted neighbor in top-10 for >= 0.99 of queries. The analytic
    hyperplane model predicts 0.999 here; the full measured-vs-analytic
    sweep across geometries is tools/lsh_recall_sweep.py (table in
    BASELINE.md "LSH-ANN recall curve")."""
    import pathlib
    import sys

    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parents[1] / "tools")
    )
    try:
        import lsh_recall_sweep as sweep
    finally:
        sys.path.pop(0)

    assert sweep.analytic_recall(0.99, 8, 12) >= 0.99
    got = sweep.measured_recall(spark, cosine=0.99, bands=8, bits=12)
    assert got >= 0.99, f"recall@10 {got} below 0.99 at default geometry"


def test_word_ngram_hashes_matches_gram_set_size(spark):
    """The string-free shingle ids must be one-to-one with the string
    grams: same per-row count as array_distinct'd word_ngrams (nulls,
    short texts, and repeated grams included), and deterministic."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f",
        "a a a a a",          # one distinct trigram
        None,                  # -> empty (word_ngrams contract)
        "one two",             # < n tokens -> empty
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    out = df.select(
        "id",
        F.size(hashing.word_ngram_hashes(F.col("t"), 3)).alias("nh"),
        F.size(keygen.word_ngrams(F.col("t"), 3)).alias("ng"),
    ).collect()
    for r in out:
        assert r["nh"] == r["ng"], f"row {r['id']}: {r['nh']} != {r['ng']}"
    a = df.select(hashing.word_ngram_hashes(F.col("t"), 3).alias("h")).collect()
    b = df.select(hashing.word_ngram_hashes(F.col("t"), 3).alias("h")).collect()
    assert [r["h"] for r in a] == [r["h"] for r in b]


def test_word_ngram_hashes_order_sensitive(spark):
    """Same token multiset, different order -> different shingle ids
    (the combine is a fold, not a commutative mix)."""
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "z y x"), (2, "x y z")], "id long, t string"
    )
    rows = {
        r["id"]: list(r["h"])
        for r in df.select(
            "id", hashing.word_ngram_hashes(F.col("t"), 3).alias("h")
        ).collect()
    }
    assert len(rows[0]) == len(rows[1]) == 1
    assert rows[0] != rows[1]
    assert rows[0] == rows[2]


def test_word_ngram_hashes_minhash_recall_on_planted_dup(spark):
    """End-to-end through the fast minhash operator: a planted near-dup
    pair must surface as a candidate with high est_jaccard under the
    token-hash-combined shingles."""
    from ny_campaign_finance_dedupe_spark.operators import dedup

    base = "w%d " * 30
    texts = [(i, (base % tuple(range(i * 40, i * 40 + 30)))) for i in range(20)]
    texts.append((100, texts[0][1] + "tail"))  # near-dup of doc 0
    df = spark.createDataFrame(texts, "id long, t string")
    pairs_df = dedup.minhash_candidate_pairs(df, "id", "t")
    pairs = pairs_df.collect()
    dedup.release(pairs_df)
    hits = {(r["src"], r["dst"]): r["est_jaccard"] for r in pairs}
    assert (0, 100) in hits and hits[(0, 100)] > 0.7
