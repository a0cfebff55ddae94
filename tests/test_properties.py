"""Property-based tests (hypothesis) for the pure kernels.

At 10^11 rows every weird input WILL occur; the row-at-a-time kernels
(metaphone state machine, winnow fingerprinter, affine-gap DP) must be
total, deterministic, and equal to an independent scalar recompute on
ARBITRARY bytes/strings — not just on the fixture vocabulary. Each
property here is checked against a from-scratch reimplementation (or an
algebraic invariant like the winnowing coverage guarantee), never
against the kernel itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from ny_campaign_finance_dedupe_spark.functions import textstats
from ny_campaign_finance_dedupe_spark.functions.metaphone import (
    double_metaphone,
)
from ny_campaign_finance_dedupe_spark.functions.normalize import (
    canonical_url,
)
from ny_campaign_finance_dedupe_spark.operators.scoring import (
    affine_gap_batch,
)
from tests.test_variable_features import _affine_gap_scalar

# ---------------------------------------------------------------------------
# Double Metaphone: total, deterministic, bounded, case-insensitive


#: the code alphabet Philips' rules can emit ('0' is the TH phone)
_DM_ALPHABET = set("0AFHJKLMNPRSTXW")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=24))
def test_double_metaphone_total_deterministic_bounded(s):
    p, a = double_metaphone(s)
    assert isinstance(p, str) and isinstance(a, str)
    assert (p, a) == double_metaphone(s)  # no hidden state
    assert len(p) <= 4 and len(a) <= 4
    assert set(p) <= _DM_ALPHABET and set(a) <= _DM_ALPHABET


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=24))
def test_double_metaphone_case_insensitive(s):
    assert double_metaphone(s.upper()) == double_metaphone(s.lower())


# ---------------------------------------------------------------------------
# Winnowing: independent scalar recompute + the coverage guarantee
# (Schleimer et al. 2003: every w-window of k-gram hashes contributes
# its minimum, so any match of length >= w+k-1 shares a fingerprint)


def _scalar_gram_hashes(data: bytes, k: int) -> list[int]:
    """From-scratch Karp-Rabin + splitmix finalizer in plain Python
    (arbitrary-precision ints masked to 64 bits — no numpy, so an
    overflow-semantics bug in the kernel cannot hide here)."""
    M = (1 << 64) - 1
    kr_base = textstats._KR_BASE
    c1, c2 = textstats._SM_C1, textstats._SM_C2
    n = len(data)
    if n == 0:
        return []
    if n < k:
        spans = [data]
    else:
        spans = [data[i : i + k] for i in range(n - k + 1)]
    out = []
    for span in spans:
        h = 0
        for byte in span:
            h = (h * kr_base + byte) & M
        h ^= h >> 30
        h = (h * c1) & M
        h ^= h >> 27
        h = (h * c2) & M
        h ^= h >> 31
        out.append(h)
    return out


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@settings(max_examples=200, deadline=None)
@given(
    st.binary(max_size=120),
    st.sampled_from([2, 4, 8]),
    st.sampled_from([1, 4, 16]),
)
def test_winnow_row_matches_scalar_and_covers_windows(data, k, w):
    got = sorted(textstats._winnow_row(data, k, w, np))
    grams = _scalar_gram_hashes(data, k)
    if not grams:
        assert got == []
        return
    if len(grams) <= w:
        mins = {min(grams)}
    else:
        mins = {
            min(grams[j : j + w]) for j in range(len(grams) - w + 1)
        }
    assert got == sorted(_to_i64(m) for m in mins)
    # coverage guarantee: every w-window's minimum is fingerprinted
    for j in range(max(len(grams) - w + 1, 1)):
        assert _to_i64(min(grams[j : j + w])) in got


# ---------------------------------------------------------------------------
# Affine gap (Gotoh DP): vectorized batch == independent scalar DP


_AG_ALPHA = "ab cd-é"  # collisions + space + unicode on purpose


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=_AG_ALPHA, max_size=10),
            st.text(alphabet=_AG_ALPHA, max_size=10),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_affine_gap_batch_equals_scalar_on_random_pairs(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = affine_gap_batch(a, b)
    for i, (s1, s2) in enumerate(pairs):
        want = _affine_gap_scalar(s1, s2)
        assert got[i] == (
            want
        ) or abs(got[i] - want) < 1e-9, (s1, s2, got[i], want)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_AG_ALPHA, min_size=1, max_size=12))
def test_affine_gap_identity_is_match_weight(s):
    """Identical strings cost matchWeight per char and normalize by
    mean length, so d(s,s) == matchWeight == 1.0 EXACTLY under the
    published affinegap defaults (match is the cheapest op, weight 1,
    not 0 — the reference library's convention, variables/string.py:4)."""
    assert affine_gap_batch(pd.Series([s]), pd.Series([s]))[0] == 1.0


# ---------------------------------------------------------------------------
# canonical_url: idempotence over url-shaped inputs (one Spark job per
# example, examples batched into a single DataFrame to bound job count)


_LABEL = st.text(
    alphabet="aB9-", min_size=1, max_size=6
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_PARAM = st.tuples(
    st.sampled_from(["a", "b", "utm_source", "fbclid", "Z"]),
    st.text(alphabet="xY2", max_size=3),
)
_URL = st.builds(
    lambda scheme, host, port, path, slash, params, frag: (
        scheme
        + host
        + port
        + "/"
        + path
        + slash
        + ("?" + "&".join(f"{k}={v}" for k, v in params) if params else "")
        + frag
    ),
    st.sampled_from(["http://", "HTTPS://", "https://WWW.", "http://www."]),
    st.builds(lambda a, b: a + "." + b, _LABEL, _LABEL),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _LABEL,
    st.sampled_from(["", "/"]),
    st.lists(_PARAM, max_size=3),
    st.sampled_from(["", "#frag", "#a-b"]),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_URL, min_size=1, max_size=24))
def test_canonical_url_idempotent(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("once"),
    ).select(
        "once", canonical_url(F.col("once")).alias("twice")
    )
    for r in out.collect():
        assert r["once"] == r["twice"], (r["once"], r["twice"])
