"""Hashed n-gram text classifier (operators/quality.py).

Inference semantics are pinned by an independent hashlib recomputation
(the gate's DuckDB oracle covers the same kernel at fixture scale);
training is pinned by fitting weak labels on a synthetic separable
corpus and scoring held-out docs.
"""

import hashlib

import pytest

from ny_campaign_finance_dedupe_spark.operators import quality


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _buckets(text, B):
    toks = text.split(" ")
    out = [_h60(f"ft1:{t}") % B for t in toks]
    out += [
        _h60(f"ft2:{a} {b}") % B for a, b in zip(toks, toks[1:])
    ]
    return out


def _pseudo_w(b):
    return (b * 2654435761) % 1001 - 500


def test_pseudo_score_matches_independent_recomputation(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "one"),          # single token: no bigrams
        (3, None),           # NULL text: NULL score
        (4, ""),             # empty string: one empty token
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["record_id"]: r
        for r in quality.score_text_classifier(
            df, "doc_id", "text", model=None, n_buckets=64
        ).collect()
    }
    for rid, text in rows:
        if text is None:
            assert got[rid]["n_feat"] == 0
            assert got[rid]["logit_milli"] is None
            assert got[rid]["score"] is None
            continue
        bks = _buckets(text, 64)
        s = sum(_pseudo_w(b) for b in bks)
        assert got[rid]["n_feat"] == len(bks)
        assert got[rid]["logit_milli"] == s
        assert got[rid]["score"] == s / (len(bks) * 1000.0)


def test_trained_model_scores_through_same_kernel(spark):
    """A handwritten model dict routes through the broadcast-join path:
    absent buckets weigh 0, bias adds to the exact milli-sum."""
    df = spark.createDataFrame(
        [(1, "aa bb")], "doc_id bigint, text string"
    )
    B = 32
    bks = _buckets("aa bb", B)  # [uni(aa), uni(bb), bi(aa bb)]
    model = {"w_milli": {bks[0]: 100}, "bias_milli": 7}
    r = quality.score_text_classifier(
        df, "doc_id", "text", model=model, n_buckets=B
    ).collect()[0]
    expect = 100 * bks.count(bks[0]) + 7
    assert r["logit_milli"] == expect
    assert r["score"] == expect / (3 * 1000.0)


@pytest.fixture(scope="module")
def weak_labeled(spark):
    # separable synthetic corpus: "good" docs draw from one vocabulary,
    # "bad" from a disjoint one; labels are the weak heuristic signal
    good_vocab = [f"g{i}" for i in range(30)]
    bad_vocab = [f"b{i}" for i in range(30)]
    rows = []
    for i in range(200):
        v = good_vocab if i % 2 == 0 else bad_vocab
        toks = [v[(i * 7 + j * 13) % 30] for j in range(12)]
        rows.append((i, " ".join(toks), 1 if i % 2 == 0 else 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


def test_train_then_score_separates_held_out(spark, weak_labeled):
    train = weak_labeled.where("doc_id % 5 != 0")
    test = weak_labeled.where("doc_id % 5 = 0")
    model = quality.train_text_classifier(
        train, "doc_id", "text", "y", n_buckets=256, sample_cap=1000
    )
    assert model["w_milli"]  # learned something
    scored = quality.score_text_classifier(
        test, "doc_id", "text", model=model, n_buckets=256
    )
    joined = {
        r["record_id"]: r["score"]
        for r in scored.collect()
    }
    labels = {r["doc_id"]: r["y"] for r in test.collect()}
    correct = sum(
        1
        for rid, s in joined.items()
        if (s > 0) == (labels[rid] == 1)
    )
    assert correct / len(joined) >= 0.95


def test_fast_family_equivalent_quality(spark, weak_labeled):
    """The xxhash64 fast family (the benched deployment path) trains
    and serves through the identical kernel and separates the same
    held-out split as well as the portable family — the repo-wide
    fast/portable equivalence contract."""
    train = weak_labeled.where("doc_id % 5 != 0")
    test = weak_labeled.where("doc_id % 5 = 0")
    model = quality.train_text_classifier(
        train, "doc_id", "text", "y", n_buckets=256, sample_cap=1000,
        family="fast",
    )
    assert model["family"] == "fast"
    scored = {
        r["record_id"]: r["score"]
        for r in quality.score_text_classifier(
            test, "doc_id", "text", model=model, n_buckets=256,
            family="fast",
        ).collect()
    }
    labels = {r["doc_id"]: r["y"] for r in test.collect()}
    correct = sum(
        1 for rid, s in scored.items() if (s > 0) == (labels[rid] == 1)
    )
    assert correct / len(scored) >= 0.95


def test_train_cap_enforced(spark, weak_labeled):
    with pytest.raises(ValueError, match="sample_cap"):
        quality.train_text_classifier(
            weak_labeled, "doc_id", "text", "y", sample_cap=10
        )


def test_scoring_plan_shape(spark, weak_labeled):
    """Trained-model inference: model side broadcasts, no sort-merge
    join of the corpus against the weight table."""
    model = {"w_milli": {1: 5, 2: -5}, "bias_milli": 0}
    out = quality.score_text_classifier(
        weak_labeled, "doc_id", "text", model=model, n_buckets=256
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
