"""Pairwise precision/recall/F1 — the north_rule acceptance metric.

Reference: tests/canonical.py:28-39 ``evaluateDuplicates`` (pairwise P/R
against true duplicate pairs derived from a unique_id column,
canonical_matching.py:66-73). Evaluation is *at the shared blocking key*:
recall's denominator is true pairs that co-block (north_rule wording),
with overall blocking recall reported alongside so blocking losses stay
visible.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class PairwiseEval:
    tp: int
    fp: int
    fn_at_key: int
    precision: float
    recall: float
    f1: float
    blocking_recall: float
    total_true_pairs: int


def evaluate_pairs(
    predicted: DataFrame,  # (src, dst) predicted-match pairs, src<dst
    candidates: DataFrame,  # (src, dst) all co-blocked pairs, src<dst
    truth: DataFrame,  # (url_a, url_b) true pairs, url_a<url_b
) -> PairwiseEval:
    t = truth.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).localCheckpoint()
    cand_true = candidates.join(t, ["src", "dst"], "left_semi").localCheckpoint()
    tp = predicted.join(cand_true, ["src", "dst"], "left_semi").count()
    fp = predicted.count() - predicted.join(t, ["src", "dst"], "left_semi").count()
    co = cand_true.count()
    total = t.count()
    fn = co - tp
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return PairwiseEval(
        tp=tp,
        fp=fp,
        fn_at_key=fn,
        precision=prec,
        recall=rec,
        f1=f1,
        blocking_recall=co / max(total, 1),
        total_true_pairs=total,
    )


def clusters_to_pairs(entity_map: DataFrame) -> DataFrame:
    """entity_map -> all within-cluster pairs (src<dst), for evaluating
    the *transitive* output rather than the edge list. Per-cluster
    self-join; clusters are bounded by the oversize guard so the fan-out
    is bounded."""
    a = entity_map.select("cluster_id", F.col("record_id").alias("src"))
    b = entity_map.select("cluster_id", F.col("record_id").alias("dst"))
    return (
        a.join(b, "cluster_id")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
