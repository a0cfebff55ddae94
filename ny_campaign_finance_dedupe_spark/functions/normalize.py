"""Text normalization — the "byte-identical extraction" contract.

Reference analogs (SURVEY.md §2.3): lowercase+trim on every field
(init_postgres_db.py:114-121), period strip (clean_donors.py:94-100),
address-abbreviation canonicalization with longest-form-wins
(clean_donors.py:53-91), whitespace collapse + punctuation strip that
``StringPredicate`` applies before every blocking key
(dedupe/predicates.py:76-82), and empty->NULL (init_postgres_db.py:114).

All of it is native Catalyst expressions (lower/trim/regexp_replace) so
normalization stays inside whole-stage codegen; determinism is trivial
because no Python executes per row. HTML->text extraction is the one
pandas UDF, and it is pure-Python/regex only (no version-drifting C
libs) so extracted ``text`` is byte-identical per ``url`` on every
executor (input_hint invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

# Longest-form-wins synonym groups, canonical form first
# (reference: clean_donors.py:53-91 — street/st, avenue/ave, po box forms).
ABBREV_GROUPS: list[tuple[str, list[str]]] = [
    ("street", ["str", "st"]),
    ("avenue", ["ave", "av"]),
    ("road", ["rd"]),
    ("department", ["dept"]),
    ("international", ["intl"]),
    ("corporation", ["corp"]),
    ("company", ["co"]),
    ("service", ["svc"]),
    ("post office box", ["po box", "p o box", "pob"]),
]


def normalize_text(col: Column | str) -> Column:
    """lower -> strip punctuation -> collapse whitespace -> trim; '' -> NULL.

    Equivalent composition of init_postgres_db.py:114-121 (LOWER/TRIM/
    NULLIF), clean_donors.py:94-100 (period strip) and predicates.py:76-82
    (``\\W+`` split/rejoin). Applied identically at every use site so
    blocking keys and scoring features see the same bytes.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"[^\w\s]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    return F.nullif(c, F.lit(""))


def canonicalize_abbrev(col: Column | str) -> Column:
    """Map every synonym to its longest form (clean_donors.py:53-91).

    Chain of word-boundary regexp_replace — native, order-stable,
    longest-alternative-first within each group so 'p o box' wins over
    'po'-prefix accidents.
    """
    c = F.col(col) if isinstance(col, str) else col
    for canon, alts in ABBREV_GROUPS:
        pat = r"\b(?:" + "|".join(sorted(alts, key=len, reverse=True)) + r")\b"
        c = F.regexp_replace(c, pat, canon)
    return c


def empty_to_null(col: Column | str) -> Column:
    """CASE LOWER(TRIM(x)) WHEN '' THEN NULL (init_postgres_db.py:114-121)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit(""))


def name_concat(*cols: Column | str) -> Column:
    """CONCAT_WS(' ', first, middle, last) (init_postgres_db.py:480-483)."""
    return F.concat_ws(" ", *[F.col(c) if isinstance(c, str) else c for c in cols])


# --- HTML -> text extraction (the graft's N7) --------------------------------

_TAG_RE = r"<[^>]*>"


def _extract_batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    import re

    tag = re.compile(_TAG_RE, re.S)
    ws = re.compile(r"\s+")
    for s in it:
        def one(b):
            if b is None:
                return None
            txt = tag.sub(" ", bytes(b).decode("utf-8", "replace"))
            return ws.sub(" ", txt).strip() or None

        yield s.map(one)


def extract_text_udf():
    """Arrow-batched pandas UDF: html binary -> extracted text.

    Pure stdlib (re) so every executor produces byte-identical output for
    the same input bytes — the input_hint per-row invariant. At 100 TB
    this runs once per page and is checkpointed (plans/pipeline.py), never
    recomputed downstream.
    """
    return F.pandas_udf(_extract_batch, "string")
