"""Text analysis for training-data pipelines — native expressions (plus
one Arrow numpy kernel for the fast winnow family).

Every function here mirrors a shape the reference computes row-wise in
Python (token predicates, predicates.py:353-355; string cleanup,
clean_donors.py) but stays entirely in Catalyst so it runs at scan speed
at 100 TB. Each is designed to be exactly reproducible in ANSI SQL (the
DuckDB oracle in __spark_entry__): integer counts and single-divide
ratios only — no accumulation-order-dependent float math.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# fixed tiny stop-word lists per language for the lang-ID heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish tokenizer: letter runs, digit runs, or single other non-space
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Non-empty whitespace-delimited tokens (\\S+ runs). A split-based
    tokenizer counts phantom '' tokens on empty or padded text ("" -> 1
    token, " a " -> 3); extraction counts what's actually there."""
    return F.regexp_extract_all(text, F.lit(r"\S+"), 0)


def token_count(text: Column) -> Column:
    """Whitespace token count (null text -> null)."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(ws_tokens(text))
    )


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens over lowercased text."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0))
    )


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    """Count of stop-word tokens (null text -> null, not size(null)=-1)."""
    words = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    n = F.size(
        F.filter(ws_tokens(F.lower(text)), lambda t: F.array_contains(words, t))
    )
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(n)


def alpha_char_count(text: Column) -> Column:
    return F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.5 * stopword_ratio_capped + 0.5 * alpha_char_ratio.

    stopword_ratio_capped = least(1, stopword_count / (0.04 * n_tokens))
    — classic Gopher-style 'has enough function words' signal; alpha
    ratio penalizes symbol/boilerplate soup. Single divides only, so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    # greatest(nt, 1): whitespace-only text has 0 tokens now that
    # ws_tokens extracts \S+ runs — keep the ratio 0, not 0/0
    nt = F.greatest(F.size(ws_tokens(text)).cast("double"), F.lit(1.0))
    sw = stopword_count(text).cast("double")
    stop_ratio = F.least(F.lit(1.0), sw / (F.lit(0.04) * nt))
    alpha_ratio = alpha_char_count(text).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(
        F.lit(0.5) * stop_ratio + F.lit(0.5) * alpha_ratio
    )


def lang_votes(text: Column, lang: str) -> Column:
    return stopword_count(text, LANG_STOPWORDS[lang])


def lang_id(text: Column) -> Column:
    """Argmax of per-language stop-word hits; deterministic tie-break by
    alphabetical code order (de < en < es < fr — the scan below is over
    sorted codes with a strict >); 'und' (undetermined) when all votes
    are zero. A cheap n-gram-free heuristic — the structure (vote arrays
    + argmax) is what a real fastText-style scorer plugs into."""
    votes = {code: lang_votes(text, code) for code in LANG_STOPWORDS}
    # strict > while scanning codes alphabetically = first-code-wins ties
    out_code, out_votes = F.lit("und"), F.lit(0)
    for code in sorted(votes):
        v = votes[code]
        cond = v > out_votes
        out_code = F.when(cond, F.lit(code)).otherwise(out_code)
        out_votes = F.when(cond, v).otherwise(out_votes)
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(out_code)


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: sorted distinct tokens
    joined (predicates.py:421-422 'fingerprint'); hash with xxhash64 for
    a compact id when needed — the string form is the SQL-checkable
    canonical."""
    return F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens(F.lower(text)))))


def winnow_fingerprints(
    text: Column,
    k: int = 16,
    w: int = 8,
    family: str = "fast",
) -> Column:
    """Winnowing rolling-hash document fingerprints (Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003): hash every character ``k``-gram,
    slide a ``w``-hash window, keep each window's minimum hash; the
    sorted distinct selected hashes are the document's fingerprint set
    (array<bigint>, null for null text, empty for empty text).

    Guarantees (the paper's §2): any substring match of length
    >= w + k - 1 between two documents contributes at least one SHARED
    fingerprint, and expected density is 2/(w+1) — so the set is both a
    near-dup join key source and a bounded-size sketch.

    ``family``:

    - "fast" (default, the benched path): Arrow-batched numpy kernel —
      a true Karp-Rabin byte-gram polynomial hash (uint64 wraparound,
      splitmix64 finalizer for mixing) with a w-shift vectorized window
      minimum. Catalyst higher-order functions run interpreted per
      element (no codegen inside lambdas), so the expression form costs
      O(len·w) interpreted array ops per doc; the numpy kernel does the
      same work as ~k+w flat vector passes per row — measured ~15×
      faster on the sf0.1 documents table (14.3 s → <1 s stage time),
      the same Arrow-vs-interpreted trade as operators/ann.py.
    - "portable": Catalyst-native md5-derived portable.hash60 over
      character k-grams (substr/transform/slice/array_min), so DuckDB
      recomputes the values bit-identically — the gate query uses this.
    - "expr": the xxhash64 twin of "portable" — fully JVM-side, no
      Python worker in the plan; keeps the interpreted higher-order
      cost. Use where starting Python workers is undesirable.

    The SELECTED POSITIONS depend on the hash values ("fast" also grams
    over utf-8 BYTES where the expression families gram over
    CHARACTERS), so the families emit different, internally consistent
    fingerprint sets; the coverage guarantee holds within any one
    family.
    """
    from .keygen import _bind
    from .portable import hash60

    if family == "fast":
        return _winnow_fast_udf(k, w)(text)
    if family == "portable":
        h = hash60
    elif family == "expr":
        h = F.xxhash64
    else:
        raise ValueError(f"unknown winnow family: {family!r}")
    empty = F.array().cast("array<bigint>")
    n = F.length(text)

    def _fps(hs: Column) -> Column:
        nw = F.size(hs) - w + 1
        wins = F.when(
            nw >= 1,
            F.transform(
                F.sequence(F.lit(1), nw),
                lambda j: F.array_min(F.slice(hs, j, w)),
            ),
        ).otherwise(
            F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(empty)
        )
        return F.array_sort(F.array_distinct(wins))

    npos = n - k + 1
    grams = F.when(
        npos >= 1,
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: h(text.substr(i, F.lit(k))),
        ),
    ).otherwise(
        # shorter than one gram: the whole text is the only gram
        F.when(n > 0, F.array(h(text))).otherwise(empty)
    )
    # _bind: the gram-hash array feeds size() and every window slice —
    # unbound it would re-evaluate per window element (O(len^2) hashing)
    return F.when(text.isNull(), F.lit(None).cast("array<bigint>")).otherwise(
        _bind(grams, _fps)
    )


# Karp-Rabin base (odd, golden-ratio) + splitmix64 finalizer constants —
# the polynomial hash alone leaves low bytes position-correlated, which
# biases the window-min selection; the finalizer decorrelates it.
_KR_BASE = 0x9E3779B97F4A7C15
_SM_C1, _SM_C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB


def _winnow_row(data: bytes, k: int, w: int, np) -> list[int]:
    """One document's winnow fingerprint set over utf-8 bytes — flat
    numpy vector passes only (k Horner steps + w-1 shifted minima):
    per-row numpy beats batched concat shapes at these row sizes (see
    functions/hashing.py note)."""
    u64 = np.uint64
    b = np.frombuffer(data, dtype=np.uint8)
    n = b.size
    if n == 0:
        return []
    with np.errstate(over="ignore"):
        if n < k:
            h = u64(0)
            for byte in data:  # < k iterations
                h = h * u64(_KR_BASE) + u64(byte)
            grams = np.array([h], dtype=np.uint64)
        else:
            npos = n - k + 1
            grams = np.zeros(npos, dtype=np.uint64)
            for j in range(k):  # Horner: h = h*B + b[j]
                grams *= u64(_KR_BASE)
                grams += b[j : j + npos]
        grams ^= grams >> u64(30)
        grams *= u64(_SM_C1)
        grams ^= grams >> u64(27)
        grams *= u64(_SM_C2)
        grams ^= grams >> u64(31)
        if grams.size <= w:
            wins = grams.min(keepdims=True)
        else:
            wins = grams[: grams.size - w + 1].copy()
            for j in range(1, w):
                np.minimum(wins, grams[j : j + wins.size], out=wins)
    return np.unique(wins.view(np.int64)).tolist()


def _winnow_fast_udf(k: int, w: int):
    """Arrow-batched pandas UDF for the fast winnow family (see
    winnow_fingerprints). Returns array<bigint>; null text -> null."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _winnow(texts):
        import numpy as np

        return pd.Series(
            [
                None if t is None else _winnow_row(t.encode("utf-8"), k, w, np)
                for t in texts
            ],
            dtype="object",
        )

    # real (non-stringified) annotations: the module-level
    # `from __future__ import annotations` would otherwise leave the
    # pandas_udf typehint parser an unresolvable 'pd.Series' string
    _winnow.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_winnow, "array<bigint>")


def repetition_stats(df, id_col: str, text_col: str):
    """Within-document repetition signals — the Gopher repetition
    quality filters (Rae et al. 2021, arXiv:2112.11446 §A1.1), at token
    granularity (the corpus carries no char-level structure worth
    weighting; a documented deviation from the paper's character
    fractions):

    (record_id, n_tok, dup_token_frac, top2_frac, dup2_frac, top3_frac,
    dup3_frac) where for n-grams of n in {2, 3}: ``topN_frac`` =
    occurrences of the MOST frequent n-gram x n / n_tok when that gram
    repeats, else 0.0 (a unique most-frequent gram is no repetition
    signal; a looping page scores high), ``dupN_frac`` = total
    occurrences of n-grams seen more than once x n / n_tok;
    ``dup_token_frac`` = repeated-token share.
    Fractions are single int-ratio divides — bit-identical in any IEEE
    engine, so the DuckDB oracle recomputes them exactly.

    Physical shape: one Arrow-batched kernel, per-row C-level Counter
    over the token stream — ZERO shuffle (the explode + per-doc groupBy
    alternative keys a corpus-sized exchange on (doc, gram) for a
    per-row statistic; same argument as the TF-IDF kernel micro-bench in
    BASELINE.md). NULL text propagates NULL stats (nullable Int64/float
    arrays — pandas object+None int columns corrupt low bits through
    Arrow otherwise)."""
    from collections import Counter

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"record_id {id_type}, n_tok long, dup_token_frac double,"
        f" top2_frac double, dup2_frac double,"
        f" top3_frac double, dup3_frac double"
    )

    def one(text):
        if text is None:
            return (None,) * 6
        toks = text.split(" ")
        n = len(toks)
        uniq = len(set(toks))
        out = [n, (n - uniq) / n]
        for k in (2, 3):
            if n < k:
                out += [0.0, 0.0]
                continue
            c = Counter(
                tuple(toks[i : i + k]) for i in range(n - k + 1)
            )
            top = max(c.values())
            dup = sum(m for m in c.values() if m > 1)
            out += [(top * k) / n if top > 1 else 0.0, (dup * k) / n]
        return tuple(out)

    def batch(it):
        for pdf in it:
            stats = [one(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "record_id": pdf[id_col],
                    "n_tok": pd.array(
                        [s[0] for s in stats], dtype="Int64"
                    ),
                    "dup_token_frac": [s[1] for s in stats],
                    "top2_frac": [s[2] for s in stats],
                    "dup2_frac": [s[3] for s in stats],
                    "top3_frac": [s[4] for s in stats],
                    "dup3_frac": [s[5] for s in stats],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batch, schema=schema)


# --- C4-style corpus cleaning (Raffel et al. 2020, JMLR 21(140) §2.2) ---

#: Representative stand-in for C4's public bad-word blocklist (the full
#: "List of Dirty, Naughty, Obscene..." is hundreds of entries; shipping
#: three mild markers keeps the filter's plan shape and word-boundary
#: semantics identical while the real deployment swaps in the full list
#: via the parameter).
C4_BAD_WORDS = ["porn", "xxx", "nsfw"]

C4_TERMINAL_RE = '[.!?"]$'


def c4_line_keep(line: Column) -> Column:
    """C4's line filter: keep a line iff it ends in terminal punctuation
    (period / ! / ? / closing quote), has >= 5 whitespace words, and
    does not mention javascript (case-insensitive). Pure Catalyst — runs
    inside the scan's codegen stage."""
    t = F.trim(line)
    words = F.size(F.split(t, r"\s+"))
    return (
        (t != "")
        & t.rlike(C4_TERMINAL_RE)
        & (words >= 5)
        & ~F.lower(line).contains("javascript")
    )


def c4_clean(
    df,
    id_col: str,
    text_col: str,
    *,
    min_sentences: int = 3,
    bad_words: list[str] | None = None,
):
    """C4 cleaning as one narrow projection: line-filter each document,
    rebuild the kept text, and flag documents that fail the doc-level
    gates (>= min_sentences terminal punctuation marks in the kept text,
    no 'lorem ipsum', no curly brace, no blocklist word). Returns every
    input row — (record_id, clean_text, n_lines, n_kept, n_sentences,
    keep_doc) — so the caller chooses between auditing the drops and
    filtering on ``keep_doc``.

    Scale shape: ZERO shuffle — split / higher-order filter / array_join
    / regexp counts all evaluate inside the scan projection, so the
    operator is scan-speed at any corpus size and the plan is one
    WholeStageCodegen span over the parquet read. Every predicate is an
    integer count or anchored regex: the DuckDB oracle reproduces the
    output bit-for-bit (no float math anywhere).
    """
    bw = C4_BAD_WORDS if bad_words is None else bad_words
    raw = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    lines = F.split(raw, "\n")
    kept = F.filter(lines, c4_line_keep)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit("[.!?]"), F.lit(0)))
    low = F.lower(raw)
    bad_re = r"\b(?:" + "|".join(bw) + r")\b"
    drop_doc = (
        low.contains("lorem ipsum")
        | raw.contains("{")
        | low.rlike(bad_re)
        | (n_sent < min_sentences)
    )
    return df.select(
        F.col(id_col).alias("record_id"),
        clean.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        (~drop_doc).alias("keep_doc"),
    )


# --- corpus-trained unigram LM quality score (CCNet-style filtering) ---


def unigram_vocab(df, text_col: str, vocab_size: int = 50_000):
    """Top-``vocab_size`` whitespace tokens by corpus frequency, ties
    broken lexicographically (deterministic at any parallelism), plus
    the TOTAL corpus token count. The groupBy(token) is map-side
    combining and vocab-sized; the top-V compiles to
    TakeOrderedAndProject (per-partition heap + driver merge, bounded by
    V — never a global sort). Returns (vocab_df(token, cnt), total)."""
    toks = df.select(
        F.explode(F.split(F.col(text_col).cast("string"), " ")).alias(
            "token"
        )
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(
        F.sum(F.col("cnt").cast("decimal(38,0)")).alias("t")
    ).collect()[0]["t"]
    vocab = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(
        int(vocab_size)
    )
    return vocab, int(total or 0)


def lm_score(df, id_col: str, text_col: str, vocab_size: int = 50_000):
    """Per-document unigram-LM familiarity score against the corpus's
    own token distribution — the shape of CCNet's LM quality filter
    (Wenzek et al. 2019: score each page under a reference LM, keep the
    head of the distribution), with the corpus itself as the reference
    (a 100 TB pipeline fits the reference once, broadcasts it, and
    scores at scan speed).

    Two stages: ``unigram_vocab`` (one vocab-sized map-side-combining
    agg + bounded top-V) fits the model; scoring broadcasts the
    {token: count} dict (V entries — MBs at V=50k, the explicit bound)
    into ONE Arrow kernel, so the corpus never shuffles for scoring.

    Output per doc: (record_id, n_tok, n_oov, known_frac, avg_logprob)
    where avg_logprob = mean over tokens of ln((cnt+1)/(total+V+1)) with
    add-one smoothing and every OOV token priced at ln(1/(total+V+1)).
    NULL text propagates NULL stats (repetition_stats convention).
    Integer counts and the single-divide known_frac are oracle-exact;
    avg_logprob is a float accumulation (pinned by pytest against an
    independent scalar computation, the fast/portable-family split).
    """
    import math

    import pandas as pd

    vocab, total = unigram_vocab(df, text_col, vocab_size)
    lut = {r["token"]: r["cnt"] for r in vocab.collect()}
    denom = float(total + len(lut) + 1)
    oov_lp = math.log(1.0 / denom)
    bc = df.sparkSession.sparkContext.broadcast((lut, denom, oov_lp))

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"record_id {id_type}, n_tok long, n_oov long,"
        f" known_frac double, avg_logprob double"
    )

    def batch(it):
        lut_, denom_, oov_ = bc.value
        log = math.log
        for pdf in it:
            out = {
                "record_id": pdf[id_col],
                "n_tok": [],
                "n_oov": [],
                "known_frac": [],
                "avg_logprob": [],
            }
            for t in pdf[text_col]:
                if t is None:
                    for k in ("n_tok", "n_oov", "known_frac", "avg_logprob"):
                        out[k].append(None)
                    continue
                toks = t.split(" ")
                n = len(toks)
                oov = 0
                lp = 0.0
                for tok in toks:
                    c = lut_.get(tok)
                    if c is None:
                        oov += 1
                        lp += oov_
                    else:
                        lp += log((c + 1) / denom_)
                out["n_tok"].append(n)
                out["n_oov"].append(oov)
                out["known_frac"].append((n - oov) / n)
                out["avg_logprob"].append(lp / n)
            yield pd.DataFrame(
                {
                    "record_id": out["record_id"],
                    "n_tok": pd.array(out["n_tok"], dtype="Int64"),
                    "n_oov": pd.array(out["n_oov"], dtype="Int64"),
                    "known_frac": out["known_frac"],
                    "avg_logprob": out["avg_logprob"],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batch, schema=schema)
