"""Incremental matching: stream of new pages vs a persistent indexed corpus.

Reference: the Gazetteer API (dedupe/api.py:612-896) — maintain an indexed
canonical set, ``index``/``unindex`` deltas, ``search`` each new batch,
return top-N matches per query (clustering.py:280-308). Its driver-side
inverted index becomes a *stream-static equi-join on block_key* against a
persisted blocking map; the per-block top-N becomes a window rank inside
``foreachBatch``.

Shape:
  readStream(pages) --watermark(warc_ts)--> foreachBatch(match_batch)
where ``match_batch`` = build batch blocking keys -> join static index ->
score (same native expression as batch) -> top-N per query url -> append
to the matches sink. The static index is reloaded per batch (cheap
metadata op with parquet/Iceberg), so index/unindex are plain appends/
deletes on the index table between batches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..operators import scoring


def build_index(pages: DataFrame, cfg) -> DataFrame:
    """Static side: (block_key, url, ntext) for the indexed corpus.

    ``cfg`` is a plans.pipeline.PipelineConfig; the key families MUST be
    the same expressions as the batch pipeline so stream and batch block
    identically (the reference shares Fingerprinter between Dedupe and
    Gazetteer for the same reason, blocking.py:48-104).
    """
    from ..plans.pipeline import DedupePipeline

    pipe = DedupePipeline(cfg)
    extracted = pipe.extract(pages)
    bm = pipe.block(pipe.signatures(extracted))
    # ntext hydrates from the extract output — the signatures stage is
    # keys-only by design (see DedupePipeline.signatures)
    return bm.join(
        extracted.select(F.col("url").alias("record_id"), "ntext"), "record_id"
    ).select("block_key", F.col("record_id").alias("url"), "ntext")


def match_batch(
    batch: DataFrame,
    index: DataFrame,
    cfg,
    n_matches: int = 1,
    threshold: float | None = None,
) -> DataFrame:
    """One micro-batch: new pages -> top-N scored matches vs the index.

    Returns (query_url, match_url, score, rank). Pure DataFrame ops, so
    it runs identically under foreachBatch or as a plain batch call
    (which is how the tests drive it deterministically).
    ``threshold=None`` takes ``cfg.score_threshold`` — stream and batch
    accept at the SAME configured score unless explicitly overridden.
    """
    from ..plans.pipeline import DedupePipeline

    if threshold is None:
        threshold = getattr(cfg, "score_threshold", 0.5)
    pipe = DedupePipeline(cfg)
    ext = pipe.extract(batch)
    bm = pipe.block(pipe.signatures(ext))
    qk = bm.join(
        ext.select(F.col("url").alias("record_id"), F.col("ntext").alias("q_ntext")),
        "record_id",
    ).select("block_key", F.col("record_id").alias("query_url"), "q_ntext")
    cand = (
        qk.join(index, "block_key")
        .where(F.col("query_url") != F.col("url"))
        .dropDuplicates(["query_url", "url"])
    )
    feats = scoring.with_features(
        cand.withColumnRenamed("q_ntext", "text_a").withColumnRenamed(
            "ntext", "text_b"
        )
    )
    model = scoring.LogisticModel.from_dict(cfg.model)
    scored = scoring.score_pairs(feats, model)
    w = Window.partitionBy("query_url").orderBy(F.desc("score"), F.asc("url"))
    return (
        scored.where(F.col("score") >= threshold)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_matches)
        .select(
            "query_url", F.col("url").alias("match_url"), "score", "rank"
        )
    )


def start_incremental_matcher(
    spark,
    stream_source_dir: str,
    index: DataFrame,
    cfg,
    out_dir: str,
    checkpoint_dir: str,
    pages_schema,
    n_matches: int = 1,
    watermark: str = "1 hour",
    threshold: float | None = None,
):
    """Wire the streaming query: file-source pages stream, foreachBatch
    append sink. ``threshold`` forwards to match_batch (default:
    cfg.score_threshold). NOTE on the watermark: with foreachBatch and
    no stateful aggregation/join downstream, a watermark does NOT drop
    late rows — every file-source row reaches match_batch; it exists so
    that adding a stateful dedup/windowed stage later inherits sane
    late-data bounds, not as a filter today."""
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(stream_source_dir)
        .withWatermark("warc_ts", watermark)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        out = match_batch(
            batch_df, index, cfg, n_matches=n_matches, threshold=threshold
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
