"""Partitioned Bloom-filter index for incremental dedup against history.

The reference's incremental story re-blocks every new batch against the
full historical table (dedupe Gazetteer semantics; see
dedupe_extension/gazetteer usage referenced from SURVEY.md §2.11). At
Common-Crawl scale the history side is ~10^12 keys, so "join every batch
against all of history" is the dominant cost even when the batch is tiny
and mostly novel. The standard engine answer is a *Bloom-filter index*:

1. ``build_bloom_index`` — one pass over history builds B independent
   Bloom filters, one per hash bucket of the key space. The shuffle
   carries only ``(bucket, h1, h2)`` — 20 bytes/key, never the payload —
   and each bucket's bitmap is sized from its own key count (m = next
   power of two >= bits_per_key * n). The index table is tiny relative
   to history (bits_per_key/8 bytes per key, ~2 GB per 10^9 keys at the
   default 16 bits) and is a durable artifact: persist it once, reuse it
   for every subsequent batch (the TableFormat seam in
   sources/checkpoint.py writes it like any other stage output).

2. ``bloom_probe`` — flags each batch row ``bloom_maybe`` by testing the
   k double-hashed bit positions (Kirsch-Mitzenmacher: pos_i = h1 + i*h2
   mod m) against the broadcast bucket bitmaps. Zero false negatives by
   construction; false-positive rate ~ (1 - e^(-k/bits_per_key))^k
   (~4e-4 at the 16/8 default).

3. ``bloom_novelty`` — EXACT novelty set: bloom-negative rows are novel
   with certainty and never touch history again; only the (small)
   bloom-positive remainder pays the exact confirm join. For a
   mostly-novel batch the expensive join shrinks by ~(1 - dup_rate),
   which is the whole point at 100 TB. The result is exact regardless of
   the filter's false positives, so the operator is oracle-checkable by
   a plain ANTI JOIN.

Key hashing follows the exact_duplicates convention
(operators/dedup.py:99-104): NULL payloads map to a marker key that
cannot collide with hex sha2 output, so they group together under SQL
GROUP BY NULL semantics instead of silently vanishing.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Default geometry: 16 bits/key with k=8 double-hashed probes gives a
#: false-positive rate of ~(1 - e^(-0.5))^8 ~= 4e-4 — at that rate the
#: exact confirm join on a 10^9-row mostly-novel batch sees ~4e5 stray
#: rows, i.e. noise. Raise bits_per_key for colder batches, lower it to
#: shrink the index.
BITS_PER_KEY = 16
N_HASHES = 8
MIN_BITS = 1 << 13  # floor so tiny buckets still spread bits (1 KiB)

#: Above this total bitmap size the probe stops broadcasting the index
#: and shuffle-joins on the bucket column instead. 256 MiB is well under
#: Spark's practical broadcast ceiling (the driver must hold and ship
#: every executor a full copy); a 10^11-key history at 16 bits/key is a
#: ~200 GB index, which no broadcast survives but the bucket join
#: handles by sending each task 1/n_buckets of the bitmaps.
BROADCAST_MAX_BYTES = 256 << 20


def payload_key(payload: Column) -> Column:
    """sha2 content key with the repo's NULL-marker convention."""
    c = payload.cast("string")
    return F.when(c.isNull(), F.lit("__NULL_PAYLOAD__")).otherwise(
        F.sha2(c, 256)
    )


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of the key (Kirsch-Mitzenmacher
    double hashing derives all k probe positions from these two)."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(0x9E3779B9))


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def build_bloom_index(
    history: DataFrame,
    key: Column | str,
    *,
    n_buckets: int = 64,
    bits_per_key: int = BITS_PER_KEY,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """One Bloom filter per key-hash bucket: (bucket, m, n_keys, bloom).

    The groupBy shuffle carries (bucket, h1, h2) only — the payload
    column is projected away before the exchange, so indexing 10^12
    pages moves ~20 TB of hashes, not the corpus. Duplicate keys just
    re-set the same bits (no distinct pass needed). ``n_buckets``
    bounds per-task memory: each task materializes one bucket's hashes
    plus its bitmap, so size it to keys/bucket * 16B <~ executor task
    memory at the target scale (the bitmap itself is n*bits_per_key/8).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    h1, h2 = _hash_cols(key_col)
    hashed = history.select(
        F.pmod(h1, F.lit(n_buckets)).cast("int").alias("bucket"),
        h1.alias("h1"),
        h2.alias("h2"),
    )

    import numpy as np

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = max(_next_pow2(n * bits_per_key), MIN_BITS)
        mask = np.uint64(m - 1)
        bits = np.zeros(m // 8, dtype=np.uint8)
        hh1 = pdf["h1"].to_numpy().astype(np.uint64)
        hh2 = pdf["h2"].to_numpy().astype(np.uint64)
        for i in range(n_hashes):
            pos = (hh1 + np.uint64(i) * hh2) & mask
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "m": [m],
                "n_keys": [n],
                "bloom": [bits.tobytes()],
            }
        )

    return hashed.groupBy("bucket").applyInPandas(
        _build, "bucket int, m bigint, n_keys bigint, bloom binary"
    )


def bloom_probe(
    batch: DataFrame,
    index: DataFrame,
    key: Column | str,
    *,
    n_buckets: int = 64,
    n_hashes: int = N_HASHES,
    strategy: str = "auto",
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Batch columns + ``bloom_maybe`` (false => certainly not in history).

    Join strategy (the 100x-scale knob):

    - ``'broadcast'`` — ship the whole index to every executor. Right
      whenever the total bitmap fits comfortably in executor memory.
    - ``'join'`` — shuffle-join batch rows to index rows on the bucket
      column. Each task receives 1/n_buckets of the batch plus ONE
      bucket's bitmap, so a 10^11-key (~200 GB) index never has to
      exist in one place. Parallelism is capped at ``n_buckets`` —
      size it accordingly when choosing this path at scale.
    - ``'auto'`` (default) — one cheap agg over the index's
      ``n_buckets`` rows sums the bitmap bytes and picks: broadcast
      below ``broadcast_max_bytes``, bucket join above. The agg is an
      extra job; pass an explicit strategy (or a persisted prebuilt
      index, the production shape) to skip it.

    The membership test kernel is identical under both strategies: rows
    in a batch share few distinct bitmaps, so the Arrow-batched kernel
    factorizes on the blob and tests each group with vectorized numpy
    bit probes.
    """
    if strategy == "auto":
        tot_bits = index.agg(F.sum("m")).collect()[0][0] or 0
        strategy = (
            "broadcast" if tot_bits // 8 <= broadcast_max_bytes else "join"
        )
    key_col = F.col(key) if isinstance(key, str) else key
    h1, h2 = _hash_cols(key_col)
    keyed = batch.withColumns(
        {
            "_bb": F.pmod(h1, F.lit(n_buckets)).cast("int"),
            "_h1": h1,
            "_h2": h2,
        }
    )
    idx = index.withColumnRenamed("bucket", "_bb")
    if strategy == "broadcast":
        probed = keyed.join(F.broadcast(idx), "_bb", "left")
    elif strategy == "join":
        # shuffle_hash hint: keeps Catalyst/AQE from auto-broadcasting a
        # statistically-small-looking index whose rows are huge blobs,
        # and avoids sorting bitmap rows (merge join would).
        probed = keyed.join(idx.hint("shuffle_hash"), "_bb", "left")
    else:
        raise ValueError(
            f"bloom_probe strategy must be auto|broadcast|join, got {strategy!r}"
        )

    import numpy as np

    @F.pandas_udf("boolean")
    def _test(bloom: pd.Series, h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        out = np.zeros(len(bloom), dtype=bool)
        if len(bloom) == 0:
            return pd.Series(out)
        hh1 = h1s.to_numpy().astype(np.uint64)
        hh2 = h2s.to_numpy().astype(np.uint64)
        codes, uniques = pd.factorize(bloom)
        for code, blob in enumerate(uniques):
            sel = codes == code
            if blob is None:
                continue  # no bucket in history => certainly novel
            bits = np.frombuffer(blob, dtype=np.uint8)
            mask = np.uint64(len(bits) * 8 - 1)
            hit = np.ones(int(sel.sum()), dtype=bool)
            s1, s2 = hh1[sel], hh2[sel]
            for i in range(n_hashes):
                pos = (s1 + np.uint64(i) * s2) & mask
                byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
                hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
            out[sel] = hit
        return pd.Series(out)

    return probed.withColumn(
        "bloom_maybe", _test(F.col("bloom"), F.col("_h1"), F.col("_h2"))
    ).drop("_bb", "_h1", "_h2", "m", "n_keys", "bloom")


def novel_rows(
    keyed: DataFrame,
    key_col: str,
    history_keys: DataFrame,
    index: DataFrame,
    *,
    n_buckets: int = 64,
    n_hashes: int = N_HASHES,
    strategy: str = "auto",
) -> DataFrame:
    """EXACT subset of ``keyed`` whose ``key_col`` value is absent from
    ``history_keys`` (a DataFrame carrying the same-named key column) —
    the shared exactness-critical core of :func:`bloom_novelty` and the
    streaming crawl pipeline: bloom-negative rows short-circuit (no
    false negatives => certainly novel), only the positive remainder
    pays the confirm anti-join, and the history side of that join is
    its distinct key projection. Returns ``keyed``'s rows minus the
    ``bloom_maybe`` scratch column."""
    flagged = bloom_probe(
        keyed,
        index,
        F.col(key_col),
        n_buckets=n_buckets,
        n_hashes=n_hashes,
        strategy=strategy,
    )
    certain = flagged.where(~F.col("bloom_maybe")).drop("bloom_maybe")
    confirmed = (
        flagged.where(F.col("bloom_maybe"))
        .drop("bloom_maybe")
        .join(
            history_keys.select(key_col).distinct(), key_col, "left_anti"
        )
    )
    return certain.unionByName(confirmed)


def bloom_novelty(
    batch: DataFrame,
    history: DataFrame,
    id_col: str,
    payload: str,
    *,
    n_buckets: int = 64,
    bits_per_key: int = BITS_PER_KEY,
    n_hashes: int = N_HASHES,
    index: DataFrame | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """EXACT set of batch rows whose payload does not appear in history.

    Bloom-negative rows short-circuit (no false negatives => novel with
    certainty); only bloom-positive rows pay the exact confirm
    anti-join, and the history side of that join is its (distinct) key
    projection — never the payload. Pass a prebuilt ``index`` to
    amortize the history scan across batches (the production shape:
    build once per ingest epoch, persist via TableFormat, probe every
    batch). Returns (record_id, novel_key) ordered by caller.
    """
    bkey = payload_key(F.col(payload)).alias("_k")
    keyed = batch.select(F.col(id_col).alias("record_id"), bkey)
    if index is None:
        index = build_bloom_index(
            history,
            payload_key(F.col(payload)),
            n_buckets=n_buckets,
            bits_per_key=bits_per_key,
            n_hashes=n_hashes,
        )
        if strategy == "auto":
            # auto's size agg is an ACTION: without a materialization
            # barrier it would run the whole index build once for the
            # agg and again for the probe (measured +0.5 s at sf0.1;
            # at scale, two full history scans). Prebuilt-index callers
            # (the production shape) manage their own persistence.
            index = index.localCheckpoint()
    hist_keys = history.select(payload_key(F.col(payload)).alias("_k"))
    return novel_rows(
        keyed, "_k", hist_keys, index,
        n_buckets=n_buckets, n_hashes=n_hashes, strategy=strategy,
    ).select("record_id", F.col("_k").alias("novel_key"))
