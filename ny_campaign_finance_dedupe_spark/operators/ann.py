"""Similarity search over embedding columns (array<float>).

Two physical strategies behind one contract:
- ``brute_force_topk``: exact — cross join + native dot-product
  expression + per-query window top-k. Correctness baseline and the
  right plan when one side broadcasts (queries small, corpus large).
- ``lsh_topk``: scale path — random-hyperplane LSH buckets
  (sign-pattern key per band) so the join is an equi-join on bucket id;
  exact cosine re-rank within the union of probed buckets. Recall is
  tunable by (bands, bits); the candidate generation is the same
  banded-key shape as MinHash blocking — one shuffle, no n^2.

The cosine kernel is a pure Catalyst expression (zip_with + aggregate in
doubles) — stays in codegen, no Python, no UDF serialization of vectors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, cosine).

    Self-search convention: a vector is never its own neighbor.
    Physical plan: BroadcastNestedLoopJoin with the (small) query side
    broadcast — each corpus partition streams once; per-query top-k via
    window. On a cluster the corpus never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, bands: int, bits: int, seed: int) -> list[list[list[float]]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bands, bits, dim)).tolist()


def bucket_keys(
    vec: Column, dim: int, bands: int = 8, bits: int = 12, seed: int = 11
) -> Column:
    """array<string> of per-band sign-pattern bucket ids.

    Each band key is the sign bit pattern of ``bits`` fixed random
    hyperplane projections (Charikar SimHash for real vectors) — two
    vectors at angle theta collide in a band with prob
    (1 - theta/pi)^bits. Constants are driver-generated (seeded) literal
    arrays, so the whole thing is a native expression.
    """
    keys = []
    planes = _hyperplanes(dim, bands, bits, seed)
    for b in range(bands):
        bit_cols = []
        for i in range(bits):
            plane = F.array(*[F.lit(float(v)) for v in planes[b][i]])
            bit_cols.append(
                F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
            )
        keys.append(F.concat(F.lit(f"b{b}:"), *bit_cols))
    return F.array(*keys)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bands: int = 8,
    bits: int = 12,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket keys, exact cosine
    re-rank within candidates. Same output schema as brute_force_topk."""
    def keyed(df, role):
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}v"),
            F.explode(
                bucket_keys(F.col(vec_col), dim, bands, bits, seed)
            ).alias("bucket"),
        )

    qk = keyed(queries, "query")
    ck = keyed(corpus, "neighbor")
    cand = (
        qk.join(ck, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("queryv"), F.col("neighborv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine >= threshold (src < dst). Exact (cross-join)
    kernel — at scale, feed candidates from ``bucket_keys`` instead; the
    filter and output contract are identical."""
    a = df.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
