"""Fixed-length sequence packing for LLM pretraining ingestion.

The training side of a 100 TB corpus pipeline doesn't consume documents
— it consumes fixed-length token sequences. The standard recipe
(GPT-style concat-and-chunk) lays documents out in a reproducible
pseudo-random order into one token stream per shard and cuts the stream
every ``seq_len`` tokens; a document may span a cut. This operator
computes that layout as METADATA (which sequence, at which offset, how
many sequences each document occupies) so the actual byte-shuffling
writer is a deterministic per-shard pass.

Reference anchor: the reference has no training-side packing (it ends at
entity maps / reports); this extends the engine along the
training-data-pipeline axis like sampling.py, with the same portable
determinism contract (`dedupe_extension/campaign_finance_dedupe.py`'s
reproducible-run framing, settings files pinning every knob).

Determinism contract (same portable md5 hash60 family as sampling.py):
shard membership AND within-shard order are pure functions of
(salt, id) — bit-identical under repartition, retries, cluster size
(the north_rule's two-cluster-size runs pack identically), and in any
engine with md5 (the DuckDB oracle recomputes the full layout).

Scale shape: ONE hash-partition shuffle on ``shard`` plus a per-shard
sort feeding a running-sum window — the sort is the honest, spillable
cost of a reproducible global order; ``n_shards`` bounds each sort to
corpus/n_shards rows (pick shards so a shard's (id, hash, n_tok)
triples — NOT its text — fit a task's spill budget; the text column is
never carried). At 10^12 docs × 1k tokens the per-shard running sums
stay < 2^63 by 5+ orders of magnitude.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import portable


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document its place in the packed-sequence layout.

    Output per document (record_id = ``id_col``):

    - ``shard``      int in [0, n_shards) — hash60(salt-shard: || id)
    - ``n_tok``      whitespace token count (NULL text packs as 0
                     tokens: it consumes no budget and sits at the
                     current offset; dropping nulls is the caller's
                     filter, not a packing side effect)
    - ``seq_start``  index of the sequence holding the doc's first token
    - ``tok_offset`` offset of that first token within seq_start
    - ``n_seqs``     sequences the doc touches (0 for empty docs;
                     a doc spanning a cut counts every sequence it
                     crosses: floor((c+n-1)/L) - floor(c/L) + 1)

    Within a shard, documents are ordered by (hash60(salt-order: || id),
    id) — a reproducible pseudo-random interleave (the "global shuffle"
    training wants) with the id tiebreak making the total order
    deterministic even under hash collisions. The two salts are
    namespaced ('-shard:' / '-order:') so shard membership and order are
    independent draws of the same family; the ':' delimiter keeps
    (salt, id) injective (see sampling.uniform01).
    """
    if seq_len <= 0:
        raise ValueError(f"pack_sequences: seq_len must be > 0, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(
            f"pack_sequences: n_shards must be > 0, got {n_shards}"
        )
    c_id = F.col(id_col).cast("string")
    n_tok = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
    )
    base = df.select(
        F.col(id_col).alias("record_id"),
        (
            portable.hash60(F.concat(F.lit(salt + "-shard:"), c_id))
            % F.lit(n_shards)
        )
        .cast("int")
        .alias("shard"),
        portable.hash60(F.concat(F.lit(salt + "-order:"), c_id)).alias("h"),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "record_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # c = tokens laid down in this shard BEFORE this doc; integer DIV /
    # % keep the arithmetic exact (a double floor() drifts past 2^53)
    cum = base.withColumn(
        "c", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long")
    )
    L = int(seq_len)
    return cum.select(
        "record_id",
        "shard",
        "n_tok",
        F.expr(f"c DIV {L}").alias("seq_start"),
        (F.col("c") % F.lit(L)).alias("tok_offset"),
        F.when(F.col("n_tok") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"(c + n_tok - 1) DIV {L} - c DIV {L} + 1").cast("long")
        )
        .alias("n_seqs"),
    )
