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


def content_key(text_col, html_col=None) -> "F.Column":
    """sha2-256 identity key over the SAME ntext chain the batch
    pipeline hashes (DedupePipeline.extract -> signatures' exact_key:
    html fallback, normalize_text, gated abbrev canonicalization), so
    stream and batch dedup agree on what "the same page" means — an
    abbreviation variant ('123 Main St' vs '123 Main Street') is ONE
    page in both. Single-expression form: fine for a key (one consumer);
    the batch extract's two-step select exists because IT fans ntext out
    to many downstream expressions."""
    txt = text_col
    if html_col is not None:
        txt = F.coalesce(
            text_col,
            normalize.extract_text_udf()(
                F.when(text_col.isNull(), html_col)
            ),
        )
    nt = normalize.normalize_text(txt)
    gated = normalize.canonicalize_udf()(
        F.when(nt.rlike(normalize.any_abbrev_pattern()), nt)
    )
    return F.sha2(F.coalesce(gated, nt), 256)


def with_content_key(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, ...) + exact_key. NULL-normalized
    texts (no text AND no extractable html) get the url itself as key
    (never dropped as dups of each other — matching batch, where a null
    exact_key never forms an exact block, pipeline.predicates)."""
    # two-step select: nt feeds three expressions (rlike gate, UDF arg,
    # coalesce fallback) — compute the normalize chain once per row
    nt = normalize.normalize_text(
        F.coalesce(
            F.col("text"),
            normalize.extract_text_udf()(
                F.when(F.col("text").isNull(), F.col("html"))
            ),
        )
    )
    pre = pages.withColumn("_nt", nt)
    gated = normalize.canonicalize_udf()(
        F.when(
            F.col("_nt").rlike(normalize.any_abbrev_pattern()), F.col("_nt")
        )
    )
    return pre.withColumn(
        "exact_key",
        F.coalesce(
            F.sha2(F.coalesce(gated, F.col("_nt")), 256), F.col("url")
        ),
    ).drop("_nt")


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
