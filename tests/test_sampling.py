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


def _mix_corpus(spark):
    # head-heavy: 800 en, 150 fr, 50 mi
    rows = (
        [(i, "en") for i in range(800)]
        + [(1000 + i, "fr") for i in range(150)]
        + [(2000 + i, "mi") for i in range(50)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_mix_upweights_tail(spark):
    """alpha=0.5 lifts low-resource groups: the tail group's keep RATE
    exceeds the head's, while expected totals stay <= target."""
    df = _mix_corpus(spark)
    out = sampling.temperature_mix(df, "doc_id", "lang", target_total=300)
    rates = {
        r["lang"]: r["mix_rate"]
        for r in out.select("lang", "mix_rate").distinct().collect()
    }
    assert rates["mi"] > rates["fr"] > rates["en"]
    # rate_g = T * sqrt(n_g)/sum(sqrt) / n_g, exact values
    import math
    tot = math.sqrt(800) + math.sqrt(150) + math.sqrt(50)
    for lang, n in (("en", 800), ("fr", 150), ("mi", 50)):
        assert abs(rates[lang] - min(1.0, 300 * (math.sqrt(n) / tot) / n)) < 1e-12
    assert out.count() <= 1000


def test_temperature_mix_alpha_extremes(spark):
    """alpha=1 reproduces natural frequencies (one shared rate);
    alpha=0 gives every group the same expected SIZE (rate inversely
    proportional to n)."""
    df = _mix_corpus(spark)
    nat = sampling.temperature_mix(df, "doc_id", "lang", 100, alpha=1.0)
    rates = {r["lang"]: r["mix_rate"] for r in
             nat.select("lang", "mix_rate").distinct().collect()}
    assert max(rates.values()) - min(rates.values()) < 1e-12
    uni = sampling.temperature_mix(df, "doc_id", "lang", 90, alpha=0.0)
    urates = {r["lang"]: r["mix_rate"] for r in
              uni.select("lang", "mix_rate").distinct().collect()}
    for lang, n in (("en", 800), ("fr", 150), ("mi", 50)):
        assert abs(urates[lang] * n - 30.0) < 1e-9


def test_temperature_mix_deterministic_and_clipped(spark):
    """The sampled SET is a pure function of (salt, id, counts) — same
    rows at any parallelism; an over-large target clips at rate 1.0 and
    keeps everything."""
    df = _mix_corpus(spark)
    a = sampling.temperature_mix(df, "doc_id", "lang", 300, salt="t1")
    b = sampling.temperature_mix(
        df.repartition(7), "doc_id", "lang", 300, salt="t1"
    )
    assert {r["doc_id"] for r in a.collect()} == \
           {r["doc_id"] for r in b.collect()}
    full = sampling.temperature_mix(df, "doc_id", "lang", 10_000_000)
    assert full.count() == 1000
    assert full.select("mix_rate").distinct().collect()[0]["mix_rate"] == 1.0
    import pytest as _pt
    with _pt.raises(ValueError, match="target_total"):
        sampling.temperature_mix(df, "doc_id", "lang", 0)
