"""Reporting aggregates over the entity map (SURVEY.md §2.8).

Reference: the post-run SQL block campaign_finance_dedupe.py:375-471.
Each function is a one-agg DataFrame plan; the top-10s compile to
TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cluster_size_histogram(entity_map: DataFrame) -> DataFrame:
    """A3: COUNT(*) GROUP BY canon_id (campaign_finance_dedupe.py:423-425)."""
    return entity_map.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))


def biggest_clusters(entity_map: DataFrame, n: int = 10) -> DataFrame:
    """A4: top-N by size (campaign_finance_dedupe.py:419-428)."""
    return (
        cluster_size_histogram(entity_map)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
        .limit(n)
    )


def run_stats(entity_map: DataFrame) -> DataFrame:
    """A5: MAX/AVG cluster size, cluster count, record count, ratio
    (campaign_finance_dedupe.py:443-471).

    avg/ratio are spelled as ONE double division of two exact integer
    aggregates (not F.avg) so the result is bit-identical across engines
    — incremental-mean implementations differ in the last ulp.
    """
    h = cluster_size_histogram(entity_map)
    return h.agg(
        F.max("cluster_size").alias("biggest_cluster_size"),
        (F.sum("cluster_size").cast("double") / F.count("*").cast("double")).alias(
            "avg_cluster_size"
        ),
        F.count("*").alias("total_clusters"),
        F.sum("cluster_size").alias("total_records"),
        (F.count("*").cast("double") / F.sum("cluster_size").cast("double")).alias(
            "cluster_record_ratio"
        ),
    )


def top_entities_by_measure(
    facts: DataFrame,
    entity_map: DataFrame,
    fact_key: str,
    measure: str,
    n: int = 10,
) -> DataFrame:
    """A1/A2 (campaign_finance_dedupe.py:381-411): SUM(measure) grouped by
    the *canonical* id — the deduped top-donors query. ``facts`` joins to
    the entity map on ``fact_key``; unmatched facts keep their own id
    (J6's COALESCE(canon_id, donor_id))."""
    joined = facts.join(
        entity_map.select(
            F.col("record_id").alias(fact_key), "cluster_id"
        ),
        fact_key,
        "left",
    ).withColumn("canon_id", F.coalesce("cluster_id", F.col(fact_key)))
    return (
        joined.groupBy("canon_id")
        .agg(F.sum(measure).alias("total"))
        .orderBy(F.desc("total"), F.asc("canon_id"))
        .limit(n)
    )


def canonical_value_per_cluster(
    entity_map_payload: DataFrame, value_col: str
) -> DataFrame:
    """A7 (post_processing/initial_analysis.py:34-38): modal value per
    cluster — count + row_number window (deterministic tie-break by
    value) rather than F.mode so ties are stable across engines.

    NULLs are not modal candidates: Spark's asc sort is nulls-FIRST, so
    an unfiltered NULL group would beat any equally-common real value
    (and engines disagree on null sort order — DuckDB defaults LAST). A
    cluster whose every value is NULL gets no row."""
    counts = (
        entity_map_payload.where(F.col(value_col).isNotNull())
        .groupBy("cluster_id", value_col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cnt"), F.asc(value_col)
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col(value_col).alias("canonical_value"))
    )
