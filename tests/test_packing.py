"""Sequence packing (operators/packing.pack_sequences).

The layout must be a pure function of (salt, id, n_tok): pinned here
against a from-scratch Python recomputation (hashlib.md5 + a scalar
cumsum — independent of the Spark code path), and shown invariant under
input repartitioning (the determinism the north_rule's two-cluster-size
runs rely on).
"""

import hashlib

import pytest

from ny_campaign_finance_dedupe_spark.operators import packing


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected(rows, seq_len, n_shards, salt="pack"):
    """Independent scalar recomputation of the whole layout."""
    docs = []
    for rid, text in rows:
        n = 0 if text is None else len(text.split(" "))
        docs.append(
            (
                _h60(f"{salt}-shard:{rid}") % n_shards,
                _h60(f"{salt}-order:{rid}"),
                rid,
                n,
            )
        )
    out = {}
    for shard in {d[0] for d in docs}:
        c = 0
        for _, h, rid, n in sorted(
            [d for d in docs if d[0] == shard], key=lambda d: (d[1], d[2])
        ):
            n_seqs = (
                0 if n == 0 else (c + n - 1) // seq_len - c // seq_len + 1
            )
            out[rid] = (shard, n, c // seq_len, c % seq_len, n_seqs)
            c += n
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    # token counts chosen so docs straddle seq_len=10 cuts; a NULL and
    # an empty text exercise the zero-budget conventions
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(3 + (i * 7) % 23)))
            for i in range(40)]
    rows += [(100, None), (101, "")]
    return rows, spark.createDataFrame(rows, "doc_id bigint, text string")


def test_layout_matches_independent_recomputation(spark, corpus):
    rows, df = corpus
    got = {
        r["record_id"]: (
            r["shard"], r["n_tok"], r["seq_start"], r["tok_offset"],
            r["n_seqs"],
        )
        for r in packing.pack_sequences(
            df, "doc_id", "text", seq_len=10, n_shards=4
        ).collect()
    }
    assert got == _expected(rows, seq_len=10, n_shards=4)


def test_empty_and_null_text_pack_as_expected(spark, corpus):
    rows, df = corpus
    got = {
        r["record_id"]: r
        for r in packing.pack_sequences(
            df, "doc_id", "text", seq_len=10, n_shards=4
        ).collect()
    }
    # NULL text: zero tokens, zero sequences, sits at the running offset
    assert got[100]["n_tok"] == 0 and got[100]["n_seqs"] == 0
    # empty string splits to one empty token (the corpus-wide n_tok
    # convention, same as lm_score/repetition_stats)
    assert got[101]["n_tok"] == 1 and got[101]["n_seqs"] == 1


def test_invariant_under_repartition(spark, corpus):
    rows, df = corpus

    def run(d):
        return sorted(
            tuple(r) for r in packing.pack_sequences(
                d, "doc_id", "text", seq_len=10, n_shards=4
            ).collect()
        )

    assert run(df) == run(df.repartition(7))


def test_spanning_doc_counts_every_sequence(spark):
    # one shard, known order-free case: a single 25-token doc at offset
    # 0 with seq_len=10 touches sequences 0,1,2
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 25))], "doc_id bigint, text string"
    )
    r = packing.pack_sequences(
        df, "doc_id", "text", seq_len=10, n_shards=1
    ).collect()[0]
    assert (r["seq_start"], r["tok_offset"], r["n_seqs"]) == (0, 0, 3)


def test_offsets_bounded_and_contiguous(spark, corpus):
    rows, df = corpus
    out = packing.pack_sequences(
        df, "doc_id", "text", seq_len=10, n_shards=4
    ).collect()
    assert all(0 <= r["tok_offset"] < 10 for r in out)
    # per shard: sum of token counts equals final doc's start+count
    for shard in {r["shard"] for r in out}:
        members = [r for r in out if r["shard"] == shard]
        total = sum(r["n_tok"] for r in members)
        last = max(
            members, key=lambda r: r["seq_start"] * 10 + r["tok_offset"]
        )
        assert last["seq_start"] * 10 + last["tok_offset"] + last["n_tok"] \
            == total


def test_arg_validation(spark, corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "text", seq_len=0)
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "text", n_shards=0)
