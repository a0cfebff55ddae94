"""Unigram LM quality score (textstats.lm_score / unigram_vocab)."""

import math

import pytest

from ny_campaign_finance_dedupe_spark.functions import textstats


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zyxwvut qqqq zzzz the the"),  # mostly OOV at small V
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_vocab_counts_and_total(spark, tiny):
    vocab, total = textstats.unigram_vocab(tiny, "text", vocab_size=3)
    assert total == 17  # 6 + 6 + 5 tokens; NULL text contributes none
    rows = {r["token"]: r["cnt"] for r in vocab.collect()}
    assert rows["the"] == 6
    assert len(rows) == 3


def test_vocab_tiebreak_is_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "bb aa cc aa bb cc dd")], "doc_id bigint, text string"
    )
    vocab, _ = textstats.unigram_vocab(df, "text", vocab_size=2)
    assert [r["token"] for r in vocab.collect()] == ["aa", "bb"]


def test_scores_match_independent_scalar_computation(spark, tiny):
    """avg_logprob pinned against a from-scratch computation of the same
    add-one-smoothed model — independent of the kernel's code path."""
    V = 4
    out = {
        r["record_id"]: r
        for r in textstats.lm_score(tiny, "doc_id", "text", vocab_size=V)
        .collect()
    }
    # rebuild the model by hand
    texts = {1: "the cat sat on the mat", 2: "the dog sat on the rug",
             3: "zyxwvut qqqq zzzz the the"}
    from collections import Counter

    c = Counter(t for s in texts.values() for t in s.split(" "))
    total = sum(c.values())
    vocab = dict(
        sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    )
    denom = total + len(vocab) + 1
    for did, s in texts.items():
        toks = s.split(" ")
        lp = sum(
            math.log((vocab[t] + 1) / denom) if t in vocab
            else math.log(1 / denom)
            for t in toks
        )
        oov = sum(1 for t in toks if t not in vocab)
        r = out[did]
        assert r["n_tok"] == len(toks)
        assert r["n_oov"] == oov
        assert r["known_frac"] == (len(toks) - oov) / len(toks)
        assert r["avg_logprob"] == pytest.approx(lp / len(toks), rel=1e-12)
    # NULL text propagates NULL stats
    assert out[4]["n_tok"] is None and out[4]["avg_logprob"] is None


def test_oov_prices_below_known(spark, tiny):
    out = {
        r["record_id"]: r
        for r in textstats.lm_score(tiny, "doc_id", "text", vocab_size=4)
        .collect()
    }
    # the junk doc must score strictly worse than the natural ones
    assert out[3]["avg_logprob"] < out[1]["avg_logprob"]
    assert out[3]["avg_logprob"] < out[2]["avg_logprob"]
    assert out[3]["known_frac"] < out[1]["known_frac"]
