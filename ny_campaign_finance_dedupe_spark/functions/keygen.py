"""Blocking-key generators — the reference's predicate family, Spark-native.

Reference: every predicate in dedupe/predicates.py is a pure function
record -> set-of-keys, flat-mapped by ``Fingerprinter.__call__``
(dedupe/blocking.py:48-104) into ``(key + ':' + predicate_idx, id)``.

Here each predicate is a Column expression returning
``array<string>`` of keys; ``operators/blocking.py`` explodes the union.
Everything below is native Catalyst (split/substring/regexp/transform/
sequence) — no Python per row, fully codegen'd.

Null/empty inputs emit no keys (predicates.py:64-69): callers explode the
array, and explode of an empty array yields no rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _empty_if_null(col: Column, keys: Column) -> Column:
    return F.when(col.isNull(), F.array().cast("array<string>")).otherwise(keys)


def whole_field(col: Column | str) -> Column:
    """predicates.py:345-350 — the whole value as one key."""
    c = _c(col)
    return _empty_if_null(c, F.array(c))


def tokens(col: Column | str) -> Column:
    """predicates.py:353-355 — distinct word tokens."""
    c = _c(col)
    return _empty_if_null(c, F.array_distinct(F.split(c, r"\s+")))


def first_token(col: Column | str) -> Column:
    """predicates.py:358-363 — leading word."""
    c = _c(col)
    t = F.regexp_extract(c, r"^([\w']+)", 1)
    return F.when(c.isNull() | (t == ""), F.array().cast("array<string>")).otherwise(
        F.array(t)
    )


def prefix(col: Column | str, k: int) -> Column:
    """sameThree/Five/SevenCharStartPredicate (predicates.py:447-459)."""
    c = _c(col)
    return F.when(
        c.isNull() | (F.length(c) < k), F.array().cast("array<string>")
    ).otherwise(F.array(F.substring(c, 1, k)))


def fingerprint(col: Column | str) -> Column:
    """predicates.py:421-422 — sorted unique words concatenated."""
    c = _c(col)
    fp = F.concat_ws("", F.array_sort(F.array_distinct(F.split(c, r"\s+"))))
    return _empty_if_null(c, F.array(fp))


def sorted_acronym(col: Column | str) -> Column:
    """predicates.py:472-473 — sorted initials of words."""
    c = _c(col)
    ac = F.concat_ws(
        "",
        F.array_sort(F.transform(F.split(c, r"\s+"), lambda w: F.substring(w, 1, 1))),
    )
    return _empty_if_null(c, F.array(ac))


def common_integers(col: Column | str) -> Column:
    """predicates.py:366-368 — all integers, canonical (no leading zeros)."""
    c = _c(col)
    ints = F.transform(
        F.regexp_extract_all(c, F.lit(r"(\d+)"), 1),
        lambda s: s.cast("long").cast("string"),
    )
    return _empty_if_null(c, F.array_distinct(ints))


def first_integer(col: Column | str) -> Column:
    """predicates.py:396-401 — leading integer or nothing."""
    c = _c(col)
    t = F.regexp_extract(c, r"^(\d+)", 1)
    return F.when(c.isNull() | (t == ""), F.array().cast("array<string>")).otherwise(
        F.array(t.cast("long").cast("string"))
    )


def near_integers(col: Column | str) -> Column:
    """predicates.py:375-385 — {n-1, n, n+1} for every integer."""
    c = _c(col)
    ints = F.transform(F.regexp_extract_all(c, F.lit(r"(\d+)"), 1), lambda s: s.cast("long"))
    keys = F.flatten(
        F.transform(
            ints,
            lambda n: F.array(
                (n - 1).cast("string"), n.cast("string"), (n + 1).cast("string")
            ),
        )
    )
    return _empty_if_null(c, F.array_distinct(keys))


def alpha_numeric(col: Column | str) -> Column:
    """predicates.py:371-372 — tokens containing a digit."""
    c = _c(col)
    return _empty_if_null(
        c, F.array_distinct(F.regexp_extract_all(c, F.lit(r"([a-z]*\d+[a-z\d]*)"), 1))
    )


def word_ngrams(col: Column | str, n: int) -> Column:
    """commonTwoTokens/commonThreeTokens (predicates.py:404-418) and the
    shingle source for MinHash — contiguous word n-grams, native via
    transform(sequence(...)) so it stays in codegen."""
    c = _c(col)
    words = F.split(c, r"\s+")
    m = F.size(words) - (n - 1)
    grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    return _empty_if_null(c, F.array_distinct(grams))


def char_ngrams(col: Column | str, n: int) -> Column:
    """cpredicates.pyx:3-24 / commonFourGram (predicates.py:437-444) —
    contiguous char n-grams with spaces removed, native substring walk."""
    c = F.regexp_replace(_c(col), r"\s", "")
    m = F.length(c) - (n - 1)
    grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), m), lambda i: F.substring(c, i, F.lit(n)))
    )
    return _empty_if_null(_c(col), F.array_distinct(grams))


def exists_key(col: Column | str) -> Column:
    """ExistsPredicate (predicates.py:94-118) — '1'/'0' null indicator."""
    c = _c(col)
    return F.array(c.isNotNull().cast("int").cast("string"))


def compound(a: Column, b: Column) -> Column:
    """CompoundPredicate (predicates.py:325-342): cartesian product of two
    key arrays joined with ':'. Our composite blocking key
    domain + simhash_band IS this operator."""
    return F.flatten(
        F.transform(a, lambda x: F.transform(b, lambda y: F.concat_ws(":", x, y)))
    )


def domain_key(url: Column | str) -> Column:
    """Normalized registrable-domain blocking key from a url — the graft's
    first compound component (north_star). Native parse_url-equivalent via
    regexp; lowercased, 'www.' stripped."""
    u = _c(url)
    host = F.lower(F.regexp_extract(u, r"^[a-z]+://([^/:?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.array().cast("array<string>")).otherwise(F.array(host))
