"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Mirrors the duplicate structure the reference's donor data exhibits and
that its evaluation plants (FIXTURES.md §1): E entities, each with a
canonical text, 1..k near-duplicate pages per entity with seeded
mutations of exactly the kinds the reference normalizes or tolerates —
punctuation/period noise (clean_donors.py:94-100), whitespace collapse
(dedupe/predicates.py:76-82), abbreviation swaps (clean_donors.py:53-74),
token transpositions / consonant-skeleton typos (clean_donors.py:6-27),
plus byte-identical exact duplicates.

Generation is *distributed and seedable*: ``spark.range(n)`` ->
``mapInPandas`` with a per-row RNG keyed on (seed, page_id), so the same
(seed, n_pages) always yields byte-identical tables at any parallelism
and any scale — no driver-side materialization, no external data.

Ground truth ``entity_id`` is returned in a sidecar DataFrame (url ->
entity_id), never in ``pages`` (FIXTURES.md §3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_GEN_SCHEMA = T.StructType(
    PAGES_SCHEMA.fields + [T.StructField("entity_id", T.LongType(), False)]
)

# Fixed wordlist: common filler vocabulary + per-entity rare "name" tokens
# are appended at generation time (the analog of donor name/street tokens).
_VOCAB = (
    "the of and to a in for is on that by this with you it not or be are "
    "from at as your all have new more an was we will home can us about if "
    "page my has search free but our one other do no information time they "
    "site he up may what which their news out use any there see only so his "
    "when contact here business who web also now help get view online first "
    "am been would how were me services some these click its like service "
    "than find price date back top people had list name just over state year "
    "day into email two health world next used go work last most products "
    "music buy data make them should product system post city policy number "
    "such please available copyright support message after best software "
    "then good video well where info rights public books high school through"
).split()

_ABBREV = [
    ("street", "st"),
    ("avenue", "ave"),
    ("road", "rd"),
    ("department", "dept"),
    ("international", "intl"),
    ("corporation", "corp"),
    ("company", "co"),
    ("service", "svc"),
]

_LANGS = ["en", "en", "en", "en", "de", "fr", "es"]  # en-heavy like CC


def _entity_words(rng: np.random.Generator, entity_id: int) -> list[str]:
    n = int(rng.integers(30, 80))
    words = [(_VOCAB[i]) for i in rng.integers(0, len(_VOCAB), n)]
    # 3 rare name tokens keyed to the entity: what makes entities separable
    # (the analog of donor name/street — distinct across entities).
    for j in range(3):
        words.insert(
            int(rng.integers(0, len(words))), f"ent{entity_id}tok{j}"
        )
    return words


def _mutate(
    rng: np.random.Generator, words: list[str]
) -> tuple[list[str], bool]:
    """One seeded near-duplicate mutation pass (reference mutation kinds).

    Returns (words, is_exact). Exactness is signaled by KIND, not by
    list equality: kind 5 (render-noise only) and guard-failed kinds
    1-3 also return the list unchanged but must still go through
    _render's punctuation/whitespace/case noise — they are the
    near-dup class normalization exists to collapse, while kind 0 must
    stay byte-identical to the anchor rendering."""
    w = list(words)
    kind = int(rng.integers(0, 6))
    if kind == 0:  # exact duplicate
        return w, True
    if kind == 1 and len(w) > 2:  # adjacent transposition (clean_donors.py:21-24)
        i = int(rng.integers(0, len(w) - 1))
        w[i], w[i + 1] = w[i + 1], w[i]
    elif kind == 2 and len(w) > 3:  # token drop
        del w[int(rng.integers(0, len(w)))]
    elif kind == 3:  # abbreviation swap (clean_donors.py:53-74)
        for long, short in _ABBREV:
            if long in w:
                w[w.index(long)] = short
                break
    elif kind == 4:  # duplicate a token (stutter)
        i = int(rng.integers(0, len(w)))
        w.insert(i, w[i])
    # kind == 5 handled at render time (punctuation/whitespace/case noise)
    return w, False


def _render(rng: np.random.Generator, words: list[str]) -> str:
    """Render words to text with seeded punctuation/ws/case noise — all of
    which normalization (functions/normalize.py) must collapse."""
    out = []
    for t in words:
        r = rng.random()
        if r < 0.05:
            t = t.capitalize()
        if r > 0.97:
            t = t + "."
        out.append(t)
        if rng.random() < 0.03:
            out.append("")  # double space
    return " ".join(out)


def _template_words(seed: int, family: int) -> list[str]:
    """Boilerplate template body for one skew family: ~60 shared words
    (site chrome / legal footer analog). Deterministic in (seed, family)."""
    trng = np.random.default_rng((seed << 21) ^ 0x7E47 ^ family)
    return [_VOCAB[i] for i in trng.integers(0, len(_VOCAB), 60)]


def _gen_batch(pdfs: Iterator[pd.DataFrame], *, seed: int, dup_rate: float,
               n_domains: int, null_text_rate: float,
               skew_domain_frac: float = 0.0,
               skew_templates: int = 1) -> Iterator[pd.DataFrame]:
    tcache: dict[int, str] = {}
    for pdf in pdfs:
        rows = []
        for pid in pdf["id"].to_numpy():
            pid = int(pid)
            # skew decision on an INDEPENDENT rng stream: skew=0 output
            # stays byte-identical to the historical generator (tests,
            # oracles, and the scaling series all depend on that)
            if skew_domain_frac > 0.0:
                srng = np.random.default_rng((seed << 21) ^ 0xB0B0 ^ pid)
                if srng.random() < skew_domain_frac:
                    fam = int(srng.integers(0, skew_templates))
                    if fam not in tcache:
                        tcache[fam] = " ".join(_template_words(seed, fam))
                    # shared ~60-word template + unique slug: pages are
                    # near-identical (hot minhash bands, one hot domain)
                    # but not byte-equal (exact-dedup must not collapse
                    # the stress away)
                    text = f"{tcache[fam]} ref{pid} page{pid % 9973}"
                    rows.append(
                        {
                            "url": f"https://template{fam}.example.com"
                            f"/p/{pid:012d}",
                            "warc_ts": pd.Timestamp("2026-01-01")
                            + pd.Timedelta(seconds=pid % 86400),
                            "html": (
                                f"<html><body><p>{text}</p></body></html>"
                            ).encode(),
                            "text": text,
                            "lang": _LANGS[pid % len(_LANGS)],
                            # one entity per template family (the pages
                            # ARE near-dups of each other by design)
                            "entity_id": -(fam + 1),
                        }
                    )
                    continue
            rng = np.random.default_rng((seed << 20) ^ pid)
            # page -> entity assignment: a dup_rate fraction of pages are
            # extra copies of an earlier entity (geometric-ish copy index)
            if rng.random() < dup_rate and pid > 4:
                entity = pid - int(rng.integers(1, 5))
            else:
                entity = pid
            ent_rng = np.random.default_rng((seed << 20) ^ 0x5EED ^ entity)
            words = _entity_words(ent_rng, entity)
            if entity != pid:
                mutated, exact = _mutate(rng, words)
                if exact:
                    # the exact-duplicate mutation class (kind 0 ONLY —
                    # render-noise and guard-failed kinds still render)
                    # must be BYTE identical to the anchor rendering;
                    # routing it through _render's per-token noise made
                    # an "exact" copy identical only with p~0.89^n_tokens
                    text = " ".join(words)
                else:
                    text = _render(rng, mutated)
            else:
                text = " ".join(words)
            # dup copies stay on the entity's domain 85% of the time: the
            # residual 15% exercises cross-domain recall via minhash bands.
            if entity != pid and rng.random() < 0.15:
                dom = f"site{int(rng.integers(0, n_domains))}.example.com"
            else:
                dom = f"site{entity % n_domains}.example.com"
            if rng.random() < null_text_rate:
                text_out = None  # missing-data path (datamodel.py:96-115)
                html = None
            else:
                text_out = text
                html = f"<html><body><p>{text}</p></body></html>".encode()
            rows.append(
                {
                    "url": f"https://{dom}/p/{pid:012d}",
                    "warc_ts": pd.Timestamp("2026-01-01")
                    + pd.Timedelta(seconds=pid % 86400),
                    "html": html,
                    "text": text_out,
                    "lang": _LANGS[pid % len(_LANGS)],
                    "entity_id": entity,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _GEN_SCHEMA.fields])


def synth_pages(
    spark: SparkSession,
    n_pages: int = 1000,
    seed: int = 42,
    dup_rate: float = 0.45,
    n_domains: int = 50,
    null_text_rate: float = 0.01,
    partitions: int | None = None,
    skew_domain_frac: float = 0.0,
    skew_templates: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(pages, entities)``; both deterministic in (seed, n_pages).

    ``pages`` has the exact input_hint shape; ``entities(url, entity_id)``
    is the oracle sidecar (FIXTURES.md §3).

    ``skew_domain_frac`` > 0 plants blocking-key skew: that fraction of
    pages become boilerplate template pages spread over
    ``skew_templates`` template families — each family shares one hot
    domain and a near-identical ~60-word body (hot minhash bands), with
    a unique per-page slug so exact-dedup cannot collapse the stress
    away. Each family is one entity (id -(family+1)); decided on an
    independent rng stream, so skew=0 output is byte-identical to the
    historical generator. NOTE: true_pairs on a skewed corpus is
    quadratic in the family size — don't materialize it at scale."""
    parts = partitions or max(2, n_pages // 25_000)
    base = spark.range(0, n_pages, numPartitions=parts)
    full = base.mapInPandas(
        lambda it: _gen_batch(
            it,
            seed=seed,
            dup_rate=dup_rate,
            n_domains=n_domains,
            null_text_rate=null_text_rate,
            skew_domain_frac=skew_domain_frac,
            skew_templates=skew_templates,
        ),
        schema=_GEN_SCHEMA,
    )
    pages = full.select("url", "warc_ts", "html", "text", "lang")
    entities = full.select("url", "entity_id")
    return pages, entities


def true_pairs(entities: DataFrame) -> DataFrame:
    """All same-entity url pairs (url_a < url_b) — pairwise ground truth
    (reference analog: tests/canonical_matching.py:66-73)."""
    a = entities.alias("a")
    b = entities.alias("b")
    return (
        a.join(b, F.col("a.entity_id") == F.col("b.entity_id"))
        .where(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
        )
    )
