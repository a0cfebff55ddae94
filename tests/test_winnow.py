"""Winnowing rolling-hash fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) — textstats.winnow_fingerprints + dedup.winnow_jaccard_pairs.

Pins: bit-exactness against an independent scalar implementation
(portable family), the paper's coverage guarantee (any shared substring
of length >= w+k-1 yields a shared fingerprint), the 2/(w+1) expected
density, and the near-dup pair operator end-to-end on planted dups.
"""

import hashlib
import random

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.functions.textstats import (
    winnow_fingerprints,
)
from ny_campaign_finance_dedupe_spark.operators import dedup

K, W = 8, 4


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text, k=K, w=W):
    """Independent scalar winnow (the SIGMOD'03 definition, set form)."""
    if text is None:
        return None
    n = len(text)
    if n == 0:
        return []
    if n < k:
        grams = [_hash60(text)]
    else:
        grams = [_hash60(text[i : i + k]) for i in range(n - k + 1)]
    if len(grams) <= w:
        wins = [min(grams)]
    else:
        wins = [min(grams[j : j + w]) for j in range(len(grams) - w + 1)]
    return sorted(set(wins))


def _fps(spark, texts, family="portable", k=K, w=W):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, text string"
    )
    rows = df.select(
        "id", winnow_fingerprints(F.col("text"), k=k, w=w, family=family).alias("fp")
    ).collect()
    return {r["id"]: r["fp"] for r in rows}


def test_winnow_matches_scalar_reference(spark):
    rng = random.Random(7)
    alpha = "abcdefgh "
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 120)))
        for _ in range(40)
    ] + [None, "", "a", "exactly8", "ninechar", "a" * 50]
    got = _fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[str(i)] == _winnow_py(t), (i, t)


def test_winnow_coverage_guarantee(spark):
    """Any substring match of length >= w+k-1 (= 11 here) must produce
    at least one SHARED fingerprint — per family."""
    rng = random.Random(13)
    shared = "thecommonsubstringblock"  # len 23 >= 11
    for family in ("fast", "portable", "expr"):
        for trial in range(5):
            a = "".join(rng.choice("xyzuvw") for _ in range(60)) + shared
            b = shared + "".join(rng.choice("qrstmn") for _ in range(60))
            got = _fps(spark, [a, b], family=family)
            assert set(got["0"]) & set(got["1"]), (family, trial)


def test_winnow_density(spark):
    """Expected selection density is 2/(w+1) = 0.4 at w=4: a long
    high-entropy string should select 30-50% of its gram positions."""
    rng = random.Random(99)
    t = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(3000))
    (fp,) = _fps(spark, [t]).values()
    npos = len(t) - K + 1
    assert 0.3 <= len(fp) / npos <= 0.5


def test_winnow_families_differ_but_both_work(spark):
    t = "the quick brown fox jumps over the lazy dog" * 3
    fast = _fps(spark, [t], family="fast")["0"]
    portable = _fps(spark, [t], family="portable")["0"]
    assert fast and portable and fast != portable
    with pytest.raises(ValueError, match="family"):
        winnow_fingerprints(F.col("x"), family="nope")


def test_winnow_jaccard_pairs_planted(spark):
    """A near-identical pair shares most fingerprints; an unrelated doc
    shares ~none. df_cap path exercised (no-op at this scale)."""
    rng = random.Random(5)
    base = "".join(rng.choice("abcdefg ") for _ in range(400))
    near = base[:200] + "XX" + base[202:]  # two-char substitution
    far = "".join(rng.choice("qrstuv ") for _ in range(400))
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far), ("d", None)],
        "doc_id string, text string",
    )
    rows = dedup.winnow_jaccard_pairs(
        df, "doc_id", "text", k=K, w=W, threshold=0.5, df_cap=1000
    ).collect()
    pairs = {(r["src"], r["dst"]): r["jaccard"] for r in rows}
    assert ("a", "b") in pairs and pairs[("a", "b")] > 0.7
    assert all({s, d} == {"a", "b"} for s, d in pairs)
