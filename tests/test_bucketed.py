"""BucketedParquetFormat: co-located joins through the checkpoint seam.

The property under test is the plan, not just the rows: two stages
checkpointed bucketed on the same key must join and aggregate WITHOUT a
shuffle Exchange — the layout the signatures/pairs hydration joins rely
on at scale.
"""

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.sources.checkpoint import (
    BucketedParquetFormat,
    CheckpointStore,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def store(spark, tmp_path):
    return CheckpointStore(
        str(tmp_path / "ckpt"),
        run_id="bktest",
        table_format=BucketedParquetFormat(["url"], n_buckets=8),
    )


@pytest.fixture()
def two_stages(spark, store):
    left = spark.range(2000).select(
        F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
        (F.col("id") % 97).alias("sig"),
    )
    right = spark.range(2000).select(
        F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
        (F.col("id") % 13).alias("score"),
    )
    a = store.write(left, "signatures")
    b = store.write(right, "score")
    return a, b


def test_roundtrip_rows(spark, two_stages):
    a, b = two_stages
    assert a.count() == 2000 and b.count() == 2000
    assert a.join(b, "url").count() == 2000


def test_bucketed_join_has_no_exchange(spark, two_stages):
    """Same-bucketed tables sort-merge join with ZERO Exchange: the
    whole point of the layout. Broadcast is disabled so the planner
    can't sidestep the property under test."""
    a, b = two_stages
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "url").select("url", "sig", "score")
        plan = _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_has_no_exchange(spark, two_stages):
    a, _ = two_stages
    agg = a.groupBy("url").agg(F.max("sig").alias("m"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_store_does_not_respread_bucketed_read(spark, store, two_stages):
    """_spread's repartition would destroy co-location; the store must
    skip it for layout-preserving formats."""
    a = store.read(spark, "signatures")
    plan = _plan(a.groupBy("url").count())
    assert "Exchange" not in plan, plan


def test_unbucketed_join_pays_the_exchange(spark, two_stages, tmp_path):
    """Control: the same join through the default parquet path DOES
    shuffle — proving the bucketed plans above aren't vacuous."""
    a, b = two_stages
    pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
    a.write.mode("overwrite").parquet(pa)
    b.write.mode("overwrite").parquet(pb)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.read.parquet(pa).join(spark.read.parquet(pb), "url")
        plan = _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" in plan


def test_identifier_folding_stays_injective(tmp_path):
    f = BucketedParquetFormat(["url"])
    t1 = f.target(str(tmp_path), "exp-1", "score")
    t2 = f.target(str(tmp_path), "exp.1", "score")
    assert t1 != t2
