"""The composed incremental crawl pipeline — the production shape a
crawler actually runs, wiring three pieces that each exist (and are
tested) separately into ONE foreachBatch streaming query:

  readStream(pages)
    -> content key (ingest.with_content_key — the batch pipeline's
       exact-identity chain, so stream and batch agree on "same page")
    -> Bloom novelty vs indexed history (operators/bloom — negatives
       are certainly novel and skip the join entirely; the small
       positive remainder pays an exact confirm anti-join against the
       history KEY projection, never the corpus)
    -> gazetteer match of the novel pages against the static blocking
       index (incremental.match_batch — same predicates, features and
       model as batch)
    -> entity-map append: a novel page adopts its best match's url as
       cluster id (the gazetteer decision, reference api.py:612-896),
       or founds a new singleton cluster when nothing clears the
       threshold. Non-novel pages are suppressed before matching —
       that is the point of the Bloom stage at 100 TB/day.

Scale shape per micro-batch: one Arrow bloom probe (broadcast or
bucket-join, size-gated — bloom.bloom_probe's strategy knob), one
anti-join whose history side is the distinct key column, one
stream-static equi-join on block_key for the (novel-only) batch, one
window rank. History artifacts (bloom index + key projection + blocking
index) are built once per ingest epoch and persisted; between epochs
they are plain appends (parquet/Iceberg via the TableFormat seam).

Restart semantics ride the streaming checkpoint: the file source tracks
consumed files, so a restarted availableNow query resumes at the first
unseen file and never re-appends a processed batch (pinned by
test_crawl_pipeline_restart_resumes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators import bloom
from . import incremental, ingest

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]


def build_history_index(
    history_pages: DataFrame, *, n_buckets: int = 64
) -> tuple[DataFrame, DataFrame]:
    """History side, built once per epoch: (history_keys, bloom_index).

    ``history_keys`` is the distinct content-key projection (one 64-hex
    string per distinct page identity — the exact-confirm side);
    ``bloom_index`` is the partitioned Bloom filter over the same keys.
    Both are returned unmaterialized — persist/localCheckpoint them (or
    write via TableFormat) before probing many batches.
    """
    keys = (
        ingest.with_content_key(history_pages)
        .select("exact_key")
        .distinct()
    )
    idx = bloom.build_bloom_index(
        keys, F.col("exact_key"), n_buckets=n_buckets
    )
    return keys, idx


def match_novel_batch(
    batch: DataFrame,
    history_keys: DataFrame,
    bloom_index: DataFrame,
    index: DataFrame,
    cfg,
    *,
    n_buckets: int = 64,
    threshold: float | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """One micro-batch -> entity-map rows for its NOVEL pages.

    Returns (record_id, cluster_id, cluster_score, exact_key, matched):
    cluster_id is the best gazetteer match's url when one clears the
    threshold, else the page's own url (new singleton entity). Pages
    whose content key is already in history yield no row (suppressed).
    Pure DataFrame ops — runs identically under foreachBatch or as a
    plain batch call (how the tests drive it deterministically).
    """
    keyed = ingest.with_content_key(batch).select(*PAGE_COLS, "exact_key")
    novel = bloom.novel_rows(
        keyed, "exact_key", history_keys, bloom_index,
        n_buckets=n_buckets, strategy=strategy,
    )
    matches = incremental.match_batch(
        novel.select(*PAGE_COLS),
        index,
        cfg,
        n_matches=1,
        threshold=threshold,
    )
    best = matches.where(F.col("rank") == 1).select(
        F.col("query_url").alias("record_id"),
        F.col("match_url"),
        F.col("score"),
    )
    return (
        novel.select(F.col("url").alias("record_id"), "exact_key")
        .join(best, "record_id", "left")
        .select(
            "record_id",
            F.coalesce(F.col("match_url"), F.col("record_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("score"), F.lit(1.0)).alias("cluster_score"),
            "exact_key",
            F.col("match_url").isNotNull().alias("matched"),
        )
    )


def start_crawl_pipeline(
    spark,
    stream_source_dir: str,
    history_keys: DataFrame,
    bloom_index: DataFrame,
    index: DataFrame,
    cfg,
    out_dir: str,
    checkpoint_dir: str,
    pages_schema,
    *,
    n_buckets: int = 64,
    threshold: float | None = None,
    strategy: str = "auto",
    watermark: str = "1 hour",
):
    """Wire the composed query: file-source pages stream ->
    foreachBatch(match_novel_batch) -> entity-map parquet append.

    ``trigger(availableNow)`` drains the source directory and stops, so
    repeated calls are the crawl's ingestion ticks; each restart resumes
    from ``checkpoint_dir`` (already-consumed files are never
    reprocessed, so the entity-map append is effectively exactly-once at
    file granularity). The watermark exists for the same reason as in
    start_incremental_matcher: foreachBatch itself never drops late
    rows, but a stateful stage added downstream inherits sane bounds.
    """
    if strategy == "auto":
        # The index is fixed for the query's lifetime: resolve the
        # size-gated probe strategy ONCE here instead of paying the
        # auto agg job inside every micro-batch.
        tot_bits = bloom_index.agg(F.sum("m")).collect()[0][0] or 0
        strategy = (
            "broadcast"
            if tot_bits // 8 <= bloom.BROADCAST_MAX_BYTES
            else "join"
        )
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(stream_source_dir)
        .withWatermark("warc_ts", watermark)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        out = match_novel_batch(
            batch_df,
            history_keys,
            bloom_index,
            index,
            cfg,
            n_buckets=n_buckets,
            threshold=threshold,
            strategy=strategy,
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
