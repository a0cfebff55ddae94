"""Streaming crawl-ingest exact dedup: suppress re-crawled duplicate
pages at ingestion time, before they ever reach storage.

Batch twin: ``operators/dedup.exact_duplicates`` (P5) — the key is the
same sha2 over the same normalization chain, so a page admitted by the
stream and a page deduped in batch agree on identity. The streaming form
uses Spark's native stateful dedup operator
(``dropDuplicatesWithinWatermark``): state is keyed by the content hash,
expired by the event-time watermark (a re-crawl AFTER the watermark
horizon is re-admitted by design — content may have changed meaning by
then, and unbounded state at 10^12 urls/day is the alternative), and
persisted in the streaming checkpoint, so a restarted query resumes with
its dedup memory intact (pinned by test).

Scale shape: state lives in the state store partitioned by key hash —
no driver membership set, no broadcast; per micro-batch cost is one
shuffle on the 64-hex key. The watermark bounds state size to
(ingest rate x delay), the knob a 100 TB/day crawl tunes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import normalize


def content_key(text_col) -> "F.Column":
    """sha2-256 identity key over the SAME normalization the batch
    pipeline hashes (DedupePipeline.signatures' exact_key), so stream
    and batch dedup agree on what "the same page" means."""
    return F.sha2(normalize.normalize_text(text_col), 256)


def with_content_key(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, text, ...) + exact_key. NULL-normalized texts
    get the url itself as key (never dropped as dups of each other)."""
    return pages.withColumn(
        "exact_key",
        F.coalesce(content_key(F.col("text")), F.col("url")),
    )


def start_ingest_dedup(
    spark,
    stream_source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pages_schema,
    watermark: str = "1 hour",
):
    """File-source pages stream -> watermarked stateful exact dedup ->
    append parquet sink. ``trigger(availableNow)`` drains what exists and
    stops, so repeated calls against a growing source directory are the
    crawl's ingestion ticks — each restart reloads dedup state from
    ``checkpoint_dir``."""
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(stream_source_dir)
        .withWatermark("warc_ts", watermark)
    )
    deduped = with_content_key(stream).dropDuplicatesWithinWatermark(
        ["exact_key"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
