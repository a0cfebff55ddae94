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


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target_total: int,
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-pretraining
    recipe — XLM-R / mT5 style): sample group g with probability mass
    p_g = n_g^alpha / sum_h n_h^alpha, so low-resource groups are
    up-weighted relative to their head-heavy natural frequencies
    (alpha=1 reproduces them; alpha=0 is uniform across groups). Rates
    are derived FROM the observed counts — the knob stratified_sample
    expects you to hand it — then applied with the same deterministic
    uniform01 filter, so the recipe is reproducible and auditable:
    rate_g = min(1, target_total * p_g / n_g). Expected output size is
    <= target_total (head groups clip at rate 1 before redistribution;
    no iterative rebalance — document the clip, don't hide it). Returns
    df's rows plus a ``mix_rate`` column.

    Scale shape: one map-side-combining groupBy(group) count (group
    cardinality ~ languages/domains, tiny), the rate table broadcasts
    back onto the scan, and the filter is a narrow per-row predicate —
    no corpus shuffle anywhere. Operand order in the rate expression is
    fixed (pow, then /sum, then *target, then /n) and mirrored token-
    for-token by the oracle so the IEEE doubles agree bit-for-bit.
    """
    if target_total <= 0:
        raise ValueError(
            f"temperature_mix: target_total must be > 0, got {target_total}"
        )
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").alias("_n")
    )
    # sum over groups of n^alpha: a scalar. NOT F.sum — float addition
    # is order-sensitive in the last ULPs and a distributed agg's order
    # is partition-dependent, which would make the rates (and therefore
    # the sampled SET) differ between runs and cluster sizes. Fold the
    # group-sorted list left-to-right instead: deterministic at any
    # parallelism, mirrored exactly by the oracle's
    # list_reduce(list_sort(...)). Group cardinality is metadata-scale
    # (languages/domains), so the single collected list is tiny.
    tot = counts.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_g"),
                        F.pow(F.col("_n"), F.lit(float(alpha))).alias(
                            "_pw"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["_pw"],
        ).alias("_tot")
    )
    rates = (
        counts.withColumn("_pw", F.pow(F.col("_n"), F.lit(float(alpha))))
        .crossJoin(F.broadcast(tot))
        .select(
            "_g",
            F.least(
                F.lit(1.0),
                F.lit(float(target_total))
                * (F.col("_pw") / F.col("_tot"))
                / F.col("_n"),
            ).alias("mix_rate"),
        )
    )
    return df.join(
        F.broadcast(rates), F.col(group_col) == F.col("_g")
    ).drop("_g").where(uniform01(id_col, salt) < F.col("mix_rate"))
