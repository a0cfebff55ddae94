"""Deterministic, engine-reproducible sampling for training-data
pipelines.

``df.sample()`` is seed-dependent on partitioning (a repartition or a
speculative retry changes which rows survive) — unusable where a corpus
recipe must be auditable and re-creatable. These operators derive a
uniform in [0, 1) from the 60-bit portable hash of the record id
(functions/portable.hash60: md5-based, zero UDF, bit-identical in any
engine that has md5 — the DuckDB oracle recomputes it), so membership is
a pure function of (id, salt):

- stable under repartition / retry / cluster size (the north_rule's
  two-cluster-size runs select identical samples),
- incremental: a new crawl tick samples consistently with the last one,
- exclusion-safe: disjoint salts give independent samples, the same salt
  gives nested ones (rate 0.1 sample is a subset of the rate 0.2 sample
  — Knuth's multiplicative-hash sampling property).

Scale shape: every operator is one narrow filter/projection on the scan
(no shuffle, no state); the filter pushes to the row level inside
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import portable

#: hash60 emits 60-bit non-negative ints; dividing by 2^60 yields a
#: uniform double in [0, 1). The double rounding at 53 bits of mantissa
#: is IEEE-identical across engines, so u < rate agrees bit-for-bit.
_HASH_SPAN = float(1 << 60)


def uniform01(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from a record identifier. The
    ':' delimiter keeps (salt, id) injective — without it salt 's1' +
    id 23 and salt 's' + id 123 would hash the same string and the
    independent-salts guarantee would silently break for prefix-related
    salt families. (Keep ':' out of salts; numeric ids never contain
    it.)"""
    c = F.col(col) if isinstance(col, str) else col
    return portable.hash60(
        F.concat(F.lit(salt + ":"), c.cast("string"))
    ) / F.lit(_HASH_SPAN)


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff uniform01(salt || id) < rate. Same salt =>
    nested samples across rates; different salts => independent."""
    return df.where(uniform01(id_col, salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (the corpus-mixing knob: e.g.
    keep 100% of rare languages, 10% of English boilerplate). ``rates``
    compiles to one native CASE chain; strata absent from it fall back
    to ``default_rate``."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.where(uniform01(id_col, salt) < rate)


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('test' iff uniform01 < test_frac else
    'train') — deterministic per id, so re-runs, incremental ticks, and
    different cluster sizes never leak a train row into test."""
    return df.withColumn(
        "split",
        F.when(
            uniform01(id_col, salt) < F.lit(float(test_frac)), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shard"
) -> DataFrame:
    """Adds a ``shard`` column in [0, n_shards): the deterministic
    global shuffle a training-ingestion job needs — hash-based, so shard
    membership is reproducible across runs and cluster sizes, and
    approximately uniform (the write side then does
    ``.repartition('shard').write.partitionBy('shard')`` for one
    shuffle into N stable shards). Same hash family as the samplers:
    nested/independent-salt properties carry over."""
    if n_shards <= 0:
        raise ValueError(f"assign_shards: n_shards must be > 0, got {n_shards}")
    c = F.col(id_col)
    return df.withColumn(
        "shard",
        (
            portable.hash60(F.concat(F.lit(salt + ":"), c.cast("string")))
            % F.lit(n_shards)
        ).cast("int"),
    )
