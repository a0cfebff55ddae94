"""Text analysis for training-data pipelines — all native expressions.

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
    k: int = 8,
    w: int = 4,
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

    Fully Catalyst-native (substr/md5-or-xxhash64/transform/slice/
    array_min) — no Python in the plan. The classic formulation computes
    each gram hash in O(1) from its neighbor (Karp-Rabin "rolling");
    here each k-gram (k <= ~16 bytes) is hashed independently — inside
    the JVM that is the same memory-bandwidth-bound cost without the
    modular-arithmetic dependency chain, and it keeps the values
    engine-portable. Note the higher-order ops run interpreted (no
    codegen inside lambdas — see keygen._bind), so per-doc cost is
    O(len * w) interpreted array ops: linear in the corpus, the same
    trade the portable minhash family makes.

    ``family``: "fast" hashes grams with xxhash64 (JVM, cheapest);
    "portable" uses portable.hash60 (md5-derived) so DuckDB recomputes
    the values bit-identically — the gate query uses this. The SELECTED
    POSITIONS depend on the hash values, so the two families emit
    different (internally consistent) fingerprint sets; the coverage
    guarantee holds within either family.
    """
    from .keygen import _bind
    from .portable import hash60

    if family == "portable":
        h = hash60
    elif family == "fast":
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
