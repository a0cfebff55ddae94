"""Genuine Double Metaphone (functions/metaphone.py) — Philips'
public-domain rule set, pinned against classic published vectors and
the reference's own predicate test
(dedupe/tests/test_predicates.py:19-22)."""

import pytest

from ny_campaign_finance_dedupe_spark.functions import metaphone as mp


# (word, primary, secondary) — secondary "" when identical. Classic
# vectors exercising the S/CH/TH/G/J/W/L rule families.
VECTORS = [
    ("SMITH", "SM0", "XMT"),
    ("SCHMIDT", "XMT", "SMT"),
    ("SNIDER", "SNTR", "XNTR"),
    ("SCHNEIDER", "XNTR", "SNTR"),
    ("Thomas", "TMS", ""),
    ("church", "XRX", "XRK"),
    ("Xavier", "SF", "SFR"),
    ("KATHERINE", "K0RN", "KTRN"),
    ("jose", "HS", ""),
    ("cabrillo", "KPRL", "KPR"),
    ("aubrey", "APR", ""),
    ("richard", "RXRT", "RKRT"),
    ("dumb", "TM", ""),
    ("Wasserman", "ASRM", "FSRM"),
    ("ghislane", "JLN", ""),
    ("knight", "NT", ""),
    ("9301", "", ""),
    # initial-W fall-through: the cur==0 vowel branch must NOT consume
    # the W, so Witz-/Wicz- surnames still reach the polish WICZ/WITZ
    # rule ('ATS'/'FFX', not 'ATS'/'FTS')
    ("WITZ", "ATS", "FFX"),
    ("WICZ", "ATS", "FFX"),
    ("FILIPOWICZ", "FLPT", "FLPF"),
    # broader classic set (C/G/J/X/Z/GH/MB/CC families)
    ("maurice", "MRS", ""),
    ("cambrillo", "KMPR", ""),
    ("heidi", "HT", ""),
    ("Thumbail", "0MPL", "TMPL"),
    ("rajiv", "RJF", ""),
    ("michael", "MKL", "MXL"),
    ("rogier", "RJ", "RJR"),
    ("caesar", "SSR", ""),
    ("czerny", "SRN", "XRN"),
    ("chianti", "KNT", ""),
    ("michelangelo", "MXLN", "MKLN"),
    ("edgar", "ATKR", ""),
    ("edge", "AJ", ""),
    ("island", "ALNT", ""),
    ("accident", "AKST", ""),
    ("focaccia", "FKX", ""),
    ("McHugh", "MK", ""),
    ("McLaughlin", "MKLF", ""),
    ("Jankelowicz", "JNKL", "ANKL"),
    ("zhao", "J", ""),
    ("pizza", "PS", "PTS"),
    ("campbell", "KMPL", ""),
    ("raspberry", "RSPR", ""),
    ("Gallegos", "KLKS", "KKS"),
    ("Jugoslavia", "JKSL", "AKSL"),
    ("bellocchio", "PLX", ""),
    ("sugar", "XKR", "SKR"),
    ("San Jacinto", "SNHS", ""),
    # truncation counts accumulated code CHARS, not segments: the
    # Spanish-LL rule emits an empty secondary segment, so a
    # segment-count guard would stop before the final S (AKR, not AKRS)
    ("ALLEGROS", "ALKR", "AKRS"),
]


@pytest.mark.parametrize("word,p,s", VECTORS)
def test_double_metaphone_vectors(word, p, s):
    assert mp.double_metaphone(word) == (p, s)


def test_untruncated_codes():
    # polish -wicz: TS / FX tails survive without the 4-char cap
    assert mp.double_metaphone("filipowicz", max_length=None) == (
        "FLPTS", "FLPFX",
    )


def test_reference_metaphone_token_vector():
    """dedupe/tests/test_predicates.py:20-22 verbatim:
    metaphoneToken('9301 S. State St. ') == {'STT', 'S', 'ST'}."""
    assert mp.metaphone_token_codes("9301 S. State St. ") == {
        "STT", "S", "ST",
    }


def test_double_metaphone_codes_set():
    # predicates.py:476-479: the non-empty code set
    assert mp.metaphone_codes("SMITH") == {"SM0", "XMT"}
    assert mp.metaphone_codes("Thomas") == {"TMS"}
    assert mp.metaphone_codes("9301") == set()


def test_fixture_vocabulary_pinned():
    """The CORRECTNESS gate's metaphone_keys oracle joins against
    __spark_entry__.METAPHONE_VOCAB — a truth table derived BY HAND from
    the published rule set, not generated from this implementation. This
    test closes the loop: the implementation must reproduce every
    hand-derived row (sorted '|'-joined code-set contract), so a bug in
    either the DM state machine or the lookup table surfaces here AND at
    the gate."""
    import __spark_entry__ as e

    assert len(e.METAPHONE_VOCAB) == 30
    for token, want in e.METAPHONE_VOCAB.items():
        got = "|".join(sorted(mp.metaphone_codes(token)))
        assert got == want, (token, got, want)


def test_phonetic_cross_spelling_coblocks():
    """The property the blocking family exists for: common cross-
    spellings share at least one code."""
    for a, b in [
        ("SMITH", "SCHMIDT"),
        ("SNIDER", "SCHNEIDER"),
        ("Wasserman", "Vasserman"),
        ("Arnow", "Arnoff"),
    ]:
        assert mp.metaphone_codes(a) & mp.metaphone_codes(b), (a, b)


def test_metaphone_spark_keys(spark):
    df = spark.createDataFrame(
        [("1", "Smith"), ("2", "Schmidt"), ("3", None), ("4", "9301")],
        "id string, name string",
    )
    rows = {
        r["id"]: r["keys"]
        for r in df.select(
            "id", mp.double_metaphone_keys("name").alias("keys")
        ).collect()
    }
    assert set(rows["1"]) == {"SM0", "XMT"}
    assert set(rows["1"]) & set(rows["2"])  # co-block
    assert rows["3"] == [] and rows["4"] == []

    tok = {
        r["id"]: r["keys"]
        for r in spark.createDataFrame(
            [("1", "9301 S. State St. ")], "id string, addr string"
        )
        .select("id", mp.metaphone_token_keys("addr").alias("keys"))
        .collect()
    }
    assert set(tok["1"]) == {"STT", "S", "ST"}
