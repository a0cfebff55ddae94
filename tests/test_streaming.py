"""Incremental (gazetteer-style) matching: batch kernel + streaming query."""

import time

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.plans.pipeline import PipelineConfig
from ny_campaign_finance_dedupe_spark.streaming import incremental
from ny_campaign_finance_dedupe_spark.synth import PAGES_SCHEMA, synth_pages


@pytest.fixture(scope="module")
def corpus(spark):
    pages, _ = synth_pages(spark, n_pages=300, seed=7, dup_rate=0.0)
    return pages.localCheckpoint()


def test_match_batch_finds_planted_match(spark, corpus):
    cfg = PipelineConfig()
    index = incremental.build_index(corpus, cfg).localCheckpoint()
    # query batch: an exact copy of one corpus page under a new url
    one = corpus.limit(1).collect()[0]
    batch = spark.createDataFrame(
        [("https://newsite.example.com/q/1", one["warc_ts"], one["html"],
          one["text"], one["lang"])],
        PAGES_SCHEMA,
    )
    out = incremental.match_batch(batch, index, cfg, n_matches=1).collect()
    assert len(out) == 1
    assert out[0]["match_url"] == one["url"]
    assert out[0]["score"] > 0.9
    assert out[0]["rank"] == 1


def test_match_batch_no_false_match(spark, corpus):
    cfg = PipelineConfig()
    index = incremental.build_index(corpus, cfg).localCheckpoint()
    batch = spark.createDataFrame(
        [("https://newsite.example.com/q/2", None, None,
          "entirely novel text with vocabulary shared by no corpus page qqq",
          "en")],
        PAGES_SCHEMA,
    )
    out = incremental.match_batch(batch, index, cfg, n_matches=3).collect()
    assert out == []


def test_streaming_query_end_to_end(spark, corpus, tmp_path):
    """availableNow file-source stream through foreachBatch to parquet."""
    cfg = PipelineConfig()
    index = incremental.build_index(corpus, cfg).localCheckpoint()
    src = tmp_path / "stream_src"
    out_dir = tmp_path / "matches"
    ckpt = tmp_path / "stream_ckpt"
    two = corpus.limit(2).collect()
    batch = spark.createDataFrame(
        [
            (f"https://newsite.example.com/s/{i}", r["warc_ts"], r["html"],
             r["text"], r["lang"])
            for i, r in enumerate(two)
        ],
        PAGES_SCHEMA,
    )
    batch.write.parquet(str(src))
    q = incremental.start_incremental_matcher(
        spark, str(src), index, cfg, str(out_dir), str(ckpt), PAGES_SCHEMA
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir)).collect()
    matches = {r["query_url"]: r["match_url"] for r in got}
    for i, r in enumerate(two):
        assert matches[f"https://newsite.example.com/s/{i}"] == r["url"]
