"""FastText-style hashed n-gram text classifier for corpus filtering.

The standard web-corpus quality gate (CCNet / DataComp / Gopher
pipelines): a linear classifier over hashed bag-of-token+bigram
features, trained on cheap weak labels (wiki-vs-crawl, lang tags,
heuristic gates) and then run over EVERY page to keep the head of the
score distribution. The 100 TB-relevant half is inference, and here it
is fully Catalyst-native — zero Python in the hot path:

  tokens+bigrams -> portable-md5 bucket in [0, B)   (native md5/conv)
  bucket -> weight       broadcast hash join against the B-row model
  per-doc logit          map-side-combining groupBy(id)

The explode stream never carries text (only ids + 8-byte buckets), the
partial agg collapses it to ~1 row/doc before the exchange, and the
model table (B rows — KBs at B=4096, MBs at 2^18) broadcasts. Training
follows the reference's physical plan for classifier fitting
(`dedupe_extension/dedupe/dedupe/api.py:1212-1250` trains rlr on ~1.5k
actively-labeled pairs on one node; scoring.train_logistic mirrors it):
fit on a BOUNDED deterministic sample driver-side with numpy, because a
linear model saturates long before the corpus does — the cap is
enforced, not assumed.

Weights are integer milli-units (w in [-500, 500] => logit arithmetic
is an exact BIGINT sum + ONE float divide), so the DuckDB oracle
reproduces scores bit-for-bit — the same int-ratio discipline as
textstats. Trained float weights are quantized to the same grid;
quantization at 1e-3 on unit-mean-feature logits is noise relative to
weak-label noise (and what ships to 10^12 rows must be the thing the
gate checked).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import portable

#: Knuth multiplicative constant for the oracle-checkable pseudo-weight
#: family (see pseudo_weights).
_KNUTH = 2654435761


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hashed_feature_buckets(
    text_col: Column | str,
    n_buckets: int,
    salt: str = "ft",
    family: str = "portable",
) -> Column:
    """array<long> of hashed feature buckets for a document: one per
    whitespace token (salt ``<salt>1:``) plus one per adjacent token
    bigram (``<salt>2:`` — fastText's wordNgrams=2), each hashed into
    [0, n_buckets). Duplicates are KEPT: the model is bag-of-features,
    a token occurring 5 times contributes 5 weight pulls. NULL text
    yields NULL (callers propagate).

    ``family``: 'portable' (md5 hash60 — the DuckDB oracle recomputes
    it) or 'fast' (codegen'd xxhash64 — the deployment path; same
    repo-wide fast/portable contract as hashing.py vs portable.py: the
    kernel around the hash is identical, only the bucket function
    differs, and a model is tied to the family it was trained under)."""
    if family not in ("portable", "fast"):
        raise ValueError(f"hashed_feature_buckets: unknown family {family!r}")

    if family == "fast":

        def bucket(s: Column) -> Column:
            return F.pmod(F.xxhash64(s), F.lit(n_buckets))

    else:

        def bucket(s: Column) -> Column:
            return portable.hash60(s) % F.lit(n_buckets)

    toks = F.split(_c(text_col), " ")
    uni = F.transform(
        toks,
        lambda t: bucket(F.concat(F.lit(salt + "1:"), t)),
    )
    n = F.size(toks)
    # zip_with over two shifted slices, NOT transform over
    # sequence(1, n-1) + element_at: higher-order lambdas are
    # interpreted, and an outer array referenced inside the lambda
    # (toks via element_at) is re-evaluated per ELEMENT — the split
    # runs O(tokens) times per doc, making the bigram arm quadratic.
    # Identical bucket VALUES (same concat string, both families);
    # measured 35 s -> 4.6 s for the full fast-family scorer at 500k
    # pages.
    bi = F.when(n < 2, F.array().cast("array<bigint>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: bucket(
                F.concat(F.lit(salt + "2:"), a, F.lit(" "), b)
            ),
        )
    )
    return F.concat(uni, bi)


def pseudo_weights(bucket: Column | str) -> Column:
    """The oracle-checkable weight family: w_milli(bucket) =
    (bucket * 2654435761) % 1001 - 500, a deterministic integer in
    [-500, 500]. Exists so the INFERENCE kernel (hashing, bucket join,
    normalization) is value-checked end-to-end by the DuckDB gate
    without shipping trained floats into SQL; trained models broadcast
    through the identical join (see score_text_classifier)."""
    return (_c(bucket) * F.lit(_KNUTH)) % F.lit(1001) - F.lit(500)


def score_text_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict | None = None,
    n_buckets: int = 4096,
    salt: str = "ft",
    family: str = "portable",
) -> DataFrame:
    """Per-document linear score over hashed token+bigram features.

    ``model`` is {"w_milli": {bucket: int}, "bias_milli": int} (the
    artifact save_model_artifact persists; absent buckets weigh 0).
    ``model=None`` scores under the pseudo_weights family — the
    oracle-checked configuration.

    Output: (record_id, n_feat, logit_milli, score) where logit_milli
    is the exact integer sum of milli-weights (+ bias), n_feat =
    tokens + bigrams, and score = logit_milli / (n_feat * 1000.0) —
    fastText's feature-mean normalization as one float divide. NULL
    text and empty-feature docs yield NULL score.

    Scale shape: explode ships (id, bucket) only; partial aggregation
    collapses to ~1 row/doc pre-exchange; the model side broadcasts.
    """
    spark = df.sparkSession
    feats = df.select(
        F.col(id_col).alias("record_id"),
        F.explode_outer(
            hashed_feature_buckets(text_col, n_buckets, salt, family)
        ).alias("bucket"),
    )
    if model is None:
        bias = F.lit(0).cast("long")
        weighted = feats.withColumn(
            "w",
            F.when(F.col("bucket").isNull(), F.lit(None)).otherwise(
                pseudo_weights("bucket").cast("long")
            ),
        )
    else:
        bias = F.lit(int(model.get("bias_milli", 0))).cast("long")
        w_rows = [
            (int(b), int(w)) for b, w in model.get("w_milli", {}).items()
        ]
        wdf = spark.createDataFrame(
            w_rows or [(0, 0)], "bucket bigint, mw bigint"
        )
        weighted = feats.join(F.broadcast(wdf), "bucket", "left").select(
            "record_id",
            F.when(
                F.col("bucket").isNull(), F.lit(None).cast("long")
            )
            .otherwise(F.coalesce(F.col("mw"), F.lit(0)))
            .alias("w"),
        )
    agg = weighted.groupBy("record_id").agg(
        F.count("w").alias("n_feat"),  # count skips the NULL-text marker
        F.sum("w").alias("s"),
    )
    return agg.select(
        "record_id",
        "n_feat",
        F.when(F.col("s").isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("s") + bias)
        .alias("logit_milli"),
        F.when(
            (F.col("s").isNull()) | (F.col("n_feat") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            (F.col("s") + bias) / (F.col("n_feat") * F.lit(1000.0))
        )
        .alias("score"),
    )


def train_text_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 4096,
    sample_cap: int = 20_000,
    salt: str = "ft",
    l2: float = 1e-3,
    lr: float = 0.5,
    epochs: int = 150,
    family: str = "portable",
) -> dict:
    """Fit the hashed-feature logistic model on a bounded sample.

    The sample's (id, bucket-list, label) rows come back to the driver
    — BOUNDED: raises past ``sample_cap`` rows instead of silently
    collecting (the ann.py broadcast-contract discipline; callers
    deterministic_sample first at corpus scale). Fit is full-batch
    numpy gradient descent with scatter-add gradients over the sparse
    bucket lists (feature value = count/n_feat, fastText's mean
    pooling). Returns the score_text_classifier model dict with weights
    on the exact milli-grid the serving join uses.
    """
    import numpy as np

    rows = (
        df.select(
            F.col(label_col).cast("double").alias("y"),
            hashed_feature_buckets(
                text_col, n_buckets, salt, family
            ).alias("bk"),
        )
        .where(F.col("bk").isNotNull() & (F.size("bk") > 0))
        .limit(sample_cap + 1)
        .collect()
    )
    if len(rows) > sample_cap:
        raise ValueError(
            f"train_text_classifier: sample exceeds sample_cap="
            f"{sample_cap}; deterministic_sample the input first"
        )
    if not rows:
        raise ValueError("train_text_classifier: empty training sample")
    y = np.array([r["y"] for r in rows])
    docs = [np.asarray(r["bk"], dtype=np.int64) for r in rows]
    inv = np.array([1.0 / len(d) for d in docs])
    n = len(docs)
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(epochs):
        z = np.fromiter(
            (w[d].sum() * iv for d, iv in zip(docs, inv)),
            dtype=np.float64,
            count=n,
        ) + b
        g = 1.0 / (1.0 + np.exp(-z)) - y  # dL/dz per doc
        gw = np.zeros(n_buckets)
        for d, gi, iv in zip(docs, g, inv):
            np.add.at(gw, d, gi * iv)
        w -= lr * (gw / n + l2 * w)
        b -= lr * g.mean()
    w_milli = np.clip(np.rint(w * 1000.0), -500, 500).astype(int)
    return {
        "w_milli": {
            int(i): int(v) for i, v in enumerate(w_milli) if v != 0
        },
        "bias_milli": int(np.clip(round(b * 1000.0), -500, 500)),
        "n_buckets": int(n_buckets),
        "salt": salt,
        "family": family,
    }
