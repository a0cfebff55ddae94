"""Micro-bench for the TF-IDF cosine kernel shape (operators/scoring.py
tfidf_cosine_udf): per-row C-level loop vs a pandas groupby/merge
formulation vs a hashed-token numpy intersect, at web-page token counts.

Run: python tools/tfidf_microbench.py  -> markdown table on stdout
(recorded in BASELINE.md "TF-IDF kernel micro-bench"). Pure-Python/numpy
comparison of the batch kernels — Spark/Arrow transfer cost is identical
for all three (same UDF signature), so the kernel is the only variable.
"""

from __future__ import annotations

import math
import random
import time

import numpy as np
import pandas as pd

VOCAB = 50_000
BATCH = 2_000  # rows per Arrow batch (spark default 10k; pairs are wide)


def make_batch(tokens_per_doc: int, seed: int = 7):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(VOCAB)]
    # zipf-ish sampling so overlaps and hot tokens exist
    wts = [1.0 / (i + 1) ** 0.7 for i in range(VOCAB)]
    a, b = [], []
    for _ in range(BATCH):
        da = rng.choices(words, wts, k=tokens_per_doc)
        # b shares ~60% of a's tokens (near-dup candidate pair shape)
        keep = da[: int(0.6 * tokens_per_doc)]
        db = keep + rng.choices(words, wts, k=tokens_per_doc - len(keep))
        a.append(" ".join(da))
        b.append(" ".join(db))
    idf = {w: math.log(1 + (i + 1)) + 1.0 for i, w in enumerate(words)}
    return pd.Series(a), pd.Series(b), idf


def kernel_row_loop(a: pd.Series, b: pd.Series, w2: dict, d2: float):
    """The shipped kernel: per-row loop, C-level set/dict ops."""
    g = w2.get
    n = len(a)
    out = np.empty(n, dtype="float64")
    for i, (x, y) in enumerate(zip(a, b)):
        ta = set(x.split()) if isinstance(x, str) else set()
        tb = set(y.split()) if isinstance(y, str) else set()
        na = 0.0
        for t in ta:
            na += g(t, d2)
        nb = 0.0
        for t in tb:
            nb += g(t, d2)
        if len(tb) < len(ta):
            ta, tb = tb, ta
        num = 0.0
        for t in ta:
            if t in tb:
                num += g(t, d2)
        out[i] = num / math.sqrt(na * nb) if na > 0 and nb > 0 else 0.0
    return out


def kernel_pandas(a: pd.Series, b: pd.Series, w2: dict, d2: float):
    """Frame formulation: explode both sides, weight-join, groupby-sum."""
    wtab = pd.Series(w2, name="w")

    def side(s: pd.Series) -> pd.Series:
        ex = s.str.split().explode()
        fr = ex.to_frame("tok")
        fr["row"] = fr.index
        fr = fr.drop_duplicates(["row", "tok"])
        fr["w"] = fr["tok"].map(wtab).fillna(d2)
        return fr

    fa, fb = side(a), side(b)
    na = fa.groupby("row")["w"].sum()
    nb = fb.groupby("row")["w"].sum()
    inter = fa.merge(fb, on=["row", "tok"])
    num = inter.groupby("row")["w_x"].sum()
    denom = np.sqrt(na.reindex(a.index, fill_value=0.0) * nb.reindex(b.index, fill_value=0.0))
    res = num.reindex(a.index, fill_value=0.0) / denom.replace(0.0, np.nan)
    return res.fillna(0.0).to_numpy()


def kernel_numpy_hash(a: pd.Series, b: pd.Series, w2: dict, d2: float):
    """Hashed-token numpy intersect: tokenize once per row (Python),
    then all arithmetic (sort, intersect via searchsorted, sums) in
    numpy over the concatenated batch."""
    g = w2.get
    n = len(a)
    out = np.empty(n, dtype="float64")
    for i, (x, y) in enumerate(zip(a, b)):
        ta = list(set(x.split())) if isinstance(x, str) else []
        tb = list(set(y.split())) if isinstance(y, str) else []
        if not ta or not tb:
            out[i] = 0.0
            continue
        wa = np.fromiter((g(t, d2) for t in ta), dtype="float64", count=len(ta))
        wb = np.fromiter((g(t, d2) for t in tb), dtype="float64", count=len(tb))
        ha = np.fromiter((hash(t) for t in ta), dtype="int64", count=len(ta))
        hb = np.fromiter((hash(t) for t in tb), dtype="int64", count=len(tb))
        order = np.argsort(hb)
        hb_s = hb[order]
        idx = np.searchsorted(hb_s, ha)
        idx[idx == len(hb_s)] = 0
        hit = hb_s[idx] == ha
        num = wa[hit].sum()
        out[i] = num / math.sqrt(wa.sum() * wb.sum())
    return out


def run():
    rows = []
    for tokens in (100, 500, 2000):
        a, b, idf = make_batch(tokens)
        w2 = {k: v * v for k, v in idf.items()}
        d2 = (math.log(1 + VOCAB) + 1.0) ** 2
        ref = kernel_row_loop(a, b, w2, d2)
        times = {}
        for name, fn in (
            ("row_loop", kernel_row_loop),
            ("pandas_merge", kernel_pandas),
            ("numpy_hash", kernel_numpy_hash),
        ):
            best = min(
                (lambda: (lambda t0: (fn(a, b, w2, d2), time.perf_counter() - t0))(
                    time.perf_counter()
                ))()[1]
                for _ in range(3)
            )
            got = fn(a, b, w2, d2)
            assert np.allclose(got, ref, atol=1e-9), f"{name} diverges"
            times[name] = best
        rows.append((tokens, times))
    print("| tokens/doc | row_loop (s/2k rows) | pandas_merge | numpy_hash |")
    print("|---|---|---|---|")
    for tokens, t in rows:
        print(
            f"| {tokens} | {t['row_loop']:.3f} | {t['pandas_merge']:.3f} "
            f"({t['pandas_merge']/t['row_loop']:.1f}x) | {t['numpy_hash']:.3f} "
            f"({t['numpy_hash']/t['row_loop']:.1f}x) |"
        )


if __name__ == "__main__":
    run()
