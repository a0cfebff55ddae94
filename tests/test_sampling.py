"""Deterministic sampling operators: engine-reproducible membership."""

import pyspark.sql.functions as F

from ny_campaign_finance_dedupe_spark.operators import sampling


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_is_nested_and_partition_invariant(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    s10 = _ids(sampling.deterministic_sample(df, "doc_id", 0.1, salt="s"))
    s20 = _ids(sampling.deterministic_sample(df, "doc_id", 0.2, salt="s"))
    # nested: the 10% sample is a subset of the 20% one (same salt)
    assert s10 <= s20
    # rate lands near the target (hash60 uniformity)
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.14 < len(s20) / 2000 < 0.26
    # partition-invariant: repartitioning must not change membership
    rep = _ids(
        sampling.deterministic_sample(df.repartition(17), "doc_id", 0.1,
                                      salt="s")
    )
    assert rep == s10
    # independent under a different salt (overlap ~ rate product, not 1)
    other = _ids(sampling.deterministic_sample(df, "doc_id", 0.1, salt="t"))
    assert other != s10


def test_stratified_rates_and_default(spark):
    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr"))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["en"] == 2000          # rate 1.0 keeps everything
    assert "de" not in by            # rate 0.0 keeps nothing
    assert 350 < by["fr"] < 650      # default 0.5 on ~1000 rows


def test_train_test_split_deterministic_and_disjoint(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    a = sampling.train_test_split(df, "doc_id", test_frac=0.2)
    b = sampling.train_test_split(df.repartition(13), "doc_id",
                                  test_frac=0.2)
    ra = {(r["doc_id"], r["split"]) for r in a.collect()}
    rb = {(r["doc_id"], r["split"]) for r in b.collect()}
    assert ra == rb and len(ra) == 3000
    n_test = sum(1 for _, s in ra if s == "test")
    assert 0.15 < n_test / 3000 < 0.25
    # nested-frac property: every 10% test id is a 20% test id
    t10 = {d for d, s in
           ((r["doc_id"], r["split"]) for r in
            sampling.train_test_split(df, "doc_id", 0.1).collect())
           if s == "test"}
    t20 = {d for d, s in ra if s == "test"}
    assert t10 <= t20


def test_sampling_plan_is_narrow(spark):
    """No shuffle: the sample filter must sit on the scan (one stage,
    zero Exchange nodes)."""
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    out = sampling.deterministic_sample(df, "doc_id", 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_salt_id_concat_is_injective(spark):
    """Prefix-related salts must give independent uniforms: the ':'
    delimiter stops ('s1', 23) and ('s', 123) hashing the same string."""
    df = spark.createDataFrame([(23,)], "doc_id long")
    u = lambda salt: df.select(
        sampling.uniform01("doc_id", salt).alias("u")
    ).collect()[0]["u"]
    df2 = spark.createDataFrame([(123,)], "doc_id long")
    u2 = df2.select(
        sampling.uniform01("doc_id", "s").alias("u")
    ).collect()[0]["u"]
    assert u("s1") != u2


def test_assign_shards_uniform_and_stable(spark):
    df = spark.range(0, 4800).select(F.col("id").alias("doc_id"))
    a = sampling.assign_shards(df, "doc_id", 16)
    counts = {r["shard"]: r["n"] for r in
              a.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(16))
    # near-uniform: every shard within 2x of the expected 300
    assert all(150 < n < 600 for n in counts.values())
    # stable under repartition
    b = sampling.assign_shards(df.repartition(7), "doc_id", 16)
    assert {(r["doc_id"], r["shard"]) for r in a.collect()} == \
           {(r["doc_id"], r["shard"]) for r in b.collect()}
    import pytest as _pt
    with _pt.raises(ValueError, match="n_shards"):
        sampling.assign_shards(df, "doc_id", 0)
