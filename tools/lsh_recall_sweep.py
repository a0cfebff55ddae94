"""LSH-ANN recall sweep on planted nearest neighbors.

Measures lsh_topk recall@10 for the planted true neighbor across
(bands, bits) geometries and planted cosines, against the analytic
random-hyperplane model (operators/ann.py bucket_keys): two vectors at
angle theta collide in one band with p = (1 - theta/pi)^bits, so
recall_pred = 1 - (1 - p)^bands.

Run: python tools/lsh_recall_sweep.py  -> markdown table on stdout
(recorded in BASELINE.md "LSH-ANN recall curve"). The pytest twin
(tests/test_hashing.py::test_lsh_topk_recall_at_default_geometry)
asserts recall >= 0.99 at the default geometry on the same planted
construction.
"""

from __future__ import annotations

import math

import numpy as np

DIM = 64
N_CORPUS = 2000
N_QUERIES = 200
K = 10
SEED = 1234


def planted(cosine: float, seed: int = SEED):
    """Corpus of random unit vectors + queries planted at a fixed cosine
    to a chosen corpus vector (disjoint id ranges). Returns
    (corpus_rows, query_rows, truth) with truth[query_id] = corpus id of
    the planted neighbor."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((N_CORPUS, DIM))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    truth = {}
    q_rows = []
    for qi in range(N_QUERIES):
        tgt = int(rng.integers(0, N_CORPUS))
        base = c[tgt]
        noise = rng.standard_normal(DIM)
        noise -= noise @ base * base  # orthogonalize
        noise /= np.linalg.norm(noise)
        q = cosine * base + math.sqrt(1 - cosine * cosine) * noise
        qid = 1_000_000 + qi
        truth[qid] = tgt
        q_rows.append((qid, [float(x) for x in q]))
    c_rows = [(i, [float(x) for x in row]) for i, row in enumerate(c)]
    return c_rows, q_rows, truth


def analytic_recall(cosine: float, bands: int, bits: int) -> float:
    theta = math.acos(max(-1.0, min(1.0, cosine)))
    p_band = (1.0 - theta / math.pi) ** bits
    return 1.0 - (1.0 - p_band) ** bands


def measured_recall(spark, cosine: float, bands: int, bits: int) -> float:
    from ny_campaign_finance_dedupe_spark.operators import ann

    c_rows, q_rows, truth = planted(cosine)
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(c_rows, schema)
    queries = spark.createDataFrame(q_rows, schema)
    got = ann.lsh_topk(
        queries, corpus, dim=DIM, k=K, bands=bands, bits=bits
    ).collect()
    hits = {
        r["query_id"]
        for r in got
        if truth.get(r["query_id"]) == r["neighbor_id"]
    }
    return len(hits) / len(truth)


def run():
    from ny_campaign_finance_dedupe_spark.session import get_spark

    spark = get_spark("lsh-recall-sweep")
    geometries = [(4, 8), (8, 8), (8, 12), (16, 12), (8, 16)]
    cosines = [0.90, 0.95, 0.99]
    print("| (bands, bits) | cosine | analytic recall | measured recall@10 |")
    print("|---|---|---|---|")
    for bands, bits in geometries:
        for cos in cosines:
            pred = analytic_recall(cos, bands, bits)
            meas = measured_recall(spark, cos, bands, bits)
            mark = " (default)" if (bands, bits) == (8, 12) else ""
            print(
                f"| ({bands}, {bits}){mark} | {cos:.2f} | {pred:.3f} "
                f"| {meas:.3f} |"
            )


if __name__ == "__main__":
    run()
