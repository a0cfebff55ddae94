"""Offline classifier training end-to-end (T8, api.py:1043-1044):
features from synth labeled pairs -> train_logistic -> the trained model
must separate matches from non-matches and sustain F1 >= 0.99 through
the full pipeline."""

import pyspark.sql.functions as F
import pytest

from ny_campaign_finance_dedupe_spark.functions import keygen, normalize
from ny_campaign_finance_dedupe_spark.operators import blocking, pairs, scoring
from ny_campaign_finance_dedupe_spark.plans.evaluate import evaluate_pairs
from ny_campaign_finance_dedupe_spark.plans.pipeline import (
    DedupePipeline,
    PipelineConfig,
)
from ny_campaign_finance_dedupe_spark.sources.checkpoint import CheckpointStore
from ny_campaign_finance_dedupe_spark.synth import synth_pages, true_pairs


@pytest.fixture(scope="module")
def labeled(spark):
    """Co-blocked candidate pairs labeled by synth ground truth —
    the reference's training file, derived instead of hand-labeled."""
    pages, entities = synth_pages(spark, n_pages=800, seed=7)
    ntext = normalize.normalize_text(
        normalize.canonicalize_abbrev(F.col("text"))
    )
    recs = pages.select("url", ntext.alias("ntext")).localCheckpoint()
    bm = blocking.build_blocking_map(
        recs, "url", {"ft": keygen.first_token(F.col("ntext"))}
    )
    cand = pairs.candidate_pairs(bm)
    hyd = pairs.hydrate_pairs(cand, recs, "url", ["ntext"])
    feats = scoring.with_features(hyd, "ntext_a", "ntext_b")
    t = true_pairs(entities).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst"),
        F.lit(1).alias("label"),
    )
    lab = feats.join(t, ["src", "dst"], "left").withColumn(
        "label", F.coalesce("label", F.lit(0))
    )
    return lab.localCheckpoint()


def test_train_logistic_separates(labeled):
    model = scoring.train_logistic(labeled)
    scored = scoring.score_pairs(labeled, model)
    agg = scored.groupBy("label").agg(F.avg("score").alias("s")).collect()
    by = {r["label"]: r["s"] for r in agg}
    assert by[1] > 0.8
    assert by[0] < 0.2


def test_trained_model_f1_through_pipeline(spark, labeled, tmp_path):
    model = scoring.train_logistic(labeled)
    pages, entities = synth_pages(spark, n_pages=1200, seed=21)
    pages = pages.localCheckpoint()
    cfg = PipelineConfig(model=model.to_dict())
    store = CheckpointStore(str(tmp_path), run_id="train-e2e")
    em = DedupePipeline(cfg, store).run(spark, pages)
    cand = store.read(spark, "pairs")
    pred = (
        store.read(spark, "score")
        .where(F.col("score") >= cfg.score_threshold)
        .select("src", "dst")
    )
    ev = evaluate_pairs(pred, cand, true_pairs(entities))
    assert ev.f1 >= 0.99, ev
    assert em.count() == 1200
