"""Double Metaphone — Lawrence Philips' public-domain phonetic
algorithm (C/C++ Users Journal, June 2000), reimplemented from the
published rule set.

Reference parity: ``predicates.doubleMetaphone`` / ``metaphoneToken``
(dedupe/predicates.py:476-484) call the ``doublemetaphone`` package — a
wrapper of Philips' original code — and block records on the set of
non-empty codes. ``soundex_code`` in ``keygen`` remains the
engine-portable (zero-UDF, DuckDB-twinned) phonetic used by the
oracle-checked ``phonetic_keys`` query; this module is the
high-fidelity family for users who need metaphone-compatible blocks.

Spark side: blocking keygen is per-record (never per-pair), so an
Arrow-batched pandas UDF over the token stream is the same cost shape
as the reference's own per-record Python predicates — a narrow map,
no shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

VOWELS = frozenset("AEIOUY")


def _dm(word: str, max_length: int | None = 4) -> tuple[str, str]:
    """(primary, secondary) codes; secondary is "" when identical.

    ``max_length=4`` matches Philips' original truncation; pass None
    for untruncated codes.
    """
    w = word.upper()
    length = len(w)
    last = length - 1
    w = w + "     "  # pad: lookahead windows never slice out of range

    def at(i: int) -> str:
        return w[i] if 0 <= i else ""

    def st(start: int, ln: int, *opts: str) -> bool:
        if start < 0:
            return False
        return w[start : start + ln] in opts

    def vowel(i: int) -> bool:
        return 0 <= i < length and w[i] in VOWELS

    slavo_germanic = (
        "W" in w[:length] or "K" in w[:length] or "CZ" in w[:length]
        or "WITZ" in w[:length]
    )

    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    cur = 0
    # silent letters at start: 'gnome', 'knight', 'pneumonia', 'wrack',
    # 'psyche'
    if st(0, 2, "GN", "KN", "PN", "WR", "PS"):
        cur = 1
    # initial 'X' is pronounced 'Z' -> 'S' ('Xavier')
    if at(0) == "X":
        add("S")
        cur = 1

    while cur < length:
        # Philips' guard counts accumulated code CHARS, not rule firings:
        # segments may be empty (Spanish-LL secondary) or multi-char, so
        # a segment-count break truncates words like ALLEGROS too early
        # (secondary AKR instead of AKRS)
        if (
            max_length
            and sum(map(len, pri)) >= max_length
            and sum(map(len, sec)) >= max_length
        ):
            break
        ch = at(cur)
        if ch in VOWELS:
            if cur == 0:  # all initial vowels map to 'A'
                add("A")
            cur += 1
        elif ch == "B":
            add("P")  # '-mb' as in 'dumb' handled under 'M'
            cur += 2 if at(cur + 1) == "B" else 1
        elif ch == "\xc7":  # Ç
            add("S")
            cur += 1
        elif ch == "C":
            # various germanic: 'bacher', 'macher'
            if (
                cur > 1
                and not vowel(cur - 2)
                and st(cur - 1, 3, "ACH")
                and at(cur + 2) != "I"
                and (
                    at(cur + 2) != "E"
                    or st(cur - 2, 6, "BACHER", "MACHER")
                )
            ):
                add("K")
                cur += 2
            elif cur == 0 and st(cur, 6, "CAESAR"):
                add("S")
                cur += 2
            elif st(cur, 4, "CHIA"):  # italian 'chianti'
                add("K")
                cur += 2
            elif st(cur, 2, "CH"):
                if cur > 0 and st(cur, 4, "CHAE"):  # 'michael'
                    add("K", "X")
                    cur += 2
                elif (
                    cur == 0
                    and (
                        st(cur + 1, 5, "HARAC", "HARIS")
                        or st(cur + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not st(0, 5, "CHORE")
                ):  # greek roots: 'chorus', 'chymera'
                    add("K")
                    cur += 2
                elif (
                    st(0, 4, "VAN ", "VON ")
                    or st(0, 3, "SCH")
                    or st(cur - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or st(cur + 2, 1, "T", "S")
                    or (
                        (st(cur - 1, 1, "A", "O", "U", "E") or cur == 0)
                        and (
                            st(
                                cur + 2, 1,
                                "L", "R", "N", "M", "B", "H", "F", "V",
                                "W", " ",
                            )
                            or cur + 2 > last
                        )
                    )
                ):  # germanic/greek 'ch' -> 'kh'
                    add("K")
                    cur += 2
                else:
                    if cur > 0:
                        if st(0, 2, "MC"):  # 'McHugh'
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                    cur += 2
            elif st(cur, 2, "CZ") and not st(cur - 2, 4, "WICZ"):
                add("S", "X")  # 'czerny'
                cur += 2
            elif st(cur + 1, 3, "CIA"):  # 'focaccia'
                add("X")
                cur += 3
            elif st(cur, 2, "CC") and not (cur == 1 and at(0) == "M"):
                # double 'C' but not 'McClellan'
                if st(cur + 2, 1, "I", "E", "H") and not st(cur + 2, 2, "HU"):
                    # 'bellocchio' but not 'bacchus'
                    if (cur == 1 and at(cur - 1) == "A") or st(
                        cur - 1, 5, "UCCEE", "UCCES"
                    ):  # 'accident', 'succeed'
                        add("KS")
                    else:  # 'bacci', 'bertucci'
                        add("X")
                    cur += 3
                else:  # Pierce's rule
                    add("K")
                    cur += 2
            elif st(cur, 2, "CK", "CG", "CQ"):
                add("K")
                cur += 2
            elif st(cur, 2, "CI", "CE", "CY"):
                if st(cur, 3, "CIO", "CIE", "CIA"):  # italian vs english
                    add("S", "X")
                else:
                    add("S")
                cur += 2
            else:
                add("K")
                if st(cur + 1, 2, " C", " Q", " G"):  # 'mac caffrey'
                    cur += 3
                elif st(cur + 1, 1, "C", "K", "Q") and not st(
                    cur + 1, 2, "CE", "CI"
                ):
                    cur += 2
                else:
                    cur += 1
        elif ch == "D":
            if st(cur, 2, "DG"):
                if st(cur + 2, 1, "I", "E", "Y"):  # 'edge'
                    add("J")
                    cur += 3
                else:  # 'edgar'
                    add("TK")
                    cur += 2
            elif st(cur, 2, "DT", "DD"):
                add("T")
                cur += 2
            else:
                add("T")
                cur += 1
        elif ch == "F":
            add("F")
            cur += 2 if at(cur + 1) == "F" else 1
        elif ch == "G":
            if at(cur + 1) == "H":
                if cur > 0 and not vowel(cur - 1):
                    add("K")
                    cur += 2
                elif cur == 0:
                    if at(cur + 2) == "I":  # 'ghislane'
                        add("J")
                    else:  # 'ghoul'
                        add("K")
                    cur += 2
                # Parker's rule (with further refinements): 'hugh'
                elif (
                    (cur > 1 and st(cur - 2, 1, "B", "H", "D"))
                    or (cur > 2 and st(cur - 3, 1, "B", "H", "D"))
                    or (cur > 3 and st(cur - 4, 1, "B", "H"))
                ):
                    cur += 2
                else:
                    # 'laugh', 'McLaughlin', 'cough', 'rough', 'tough'
                    if (
                        cur > 2
                        and at(cur - 1) == "U"
                        and st(cur - 3, 1, "C", "G", "L", "R", "T")
                    ):
                        add("F")
                    elif cur > 0 and at(cur - 1) != "I":
                        add("K")
                    cur += 2
            elif at(cur + 1) == "N":
                if cur == 1 and vowel(0) and not slavo_germanic:
                    add("KN", "N")
                elif (
                    not st(cur + 2, 2, "EY")
                    and at(cur + 1) != "Y"
                    and not slavo_germanic
                ):  # not 'cagney'
                    add("N", "KN")
                else:
                    add("KN")
                cur += 2
            elif st(cur + 1, 2, "LI") and not slavo_germanic:  # 'tagliaro'
                add("KL", "L")
                cur += 2
            elif cur == 0 and (
                at(cur + 1) == "Y"
                or st(
                    cur + 1, 2,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE",
                    "EI", "ER",
                )
            ):  # -ges-, -gep-, -gel- at first letter
                add("K", "J")
                cur += 2
            elif (
                (st(cur + 1, 2, "ER") or at(cur + 1) == "Y")
                and not st(0, 6, "DANGER", "RANGER", "MANGER")
                and not st(cur - 1, 1, "E", "I")
                and not st(cur - 1, 3, "RGY", "OGY")
            ):  # -ger-, -gy-
                add("K", "J")
                cur += 2
            elif st(cur + 1, 1, "E", "I", "Y") or st(
                cur - 1, 4, "AGGI", "OGGI"
            ):  # italian 'biaggi'
                if (
                    st(0, 4, "VAN ", "VON ")
                    or st(0, 3, "SCH")
                    or st(cur + 1, 2, "ET")
                ):  # obvious germanic
                    add("K")
                elif st(cur + 1, 4, "IER "):  # french ending
                    add("J")
                else:
                    add("J", "K")
                cur += 2
            else:
                add("K")
                cur += 2 if at(cur + 1) == "G" else 1
        elif ch == "H":
            # keep only if first & before vowel, or between two vowels
            if (cur == 0 or vowel(cur - 1)) and vowel(cur + 1):
                add("H")
                cur += 2
            else:
                cur += 1
        elif ch == "J":
            # obvious spanish: 'jose', 'san jacinto'
            if st(cur, 4, "JOSE") or st(0, 4, "SAN "):
                if (cur == 0 and at(cur + 4) == " ") or st(0, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                cur += 1
            else:
                if cur == 0:
                    add("J", "A")  # Yankelovich / Jankelowicz
                elif (
                    vowel(cur - 1)
                    and not slavo_germanic
                    and at(cur + 1) in ("A", "O")
                ):  # spanish 'bajador'
                    add("J", "H")
                elif cur == last:
                    add("J", "")
                elif not st(
                    cur + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z"
                ) and not st(cur - 1, 1, "S", "K", "L"):
                    add("J")
                cur += 2 if at(cur + 1) == "J" else 1
        elif ch == "K":
            add("K")
            cur += 2 if at(cur + 1) == "K" else 1
        elif ch == "L":
            if at(cur + 1) == "L":
                # spanish: 'cabrillo', 'gallegos'
                if (
                    cur == length - 3
                    and st(cur - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (st(last - 1, 2, "AS", "OS") or st(last, 1, "A", "O"))
                    and st(cur - 1, 4, "ALLE")
                ):
                    add("L", "")
                else:
                    add("L")
                cur += 2
            else:
                add("L")
                cur += 1
        elif ch == "M":
            if (
                st(cur - 1, 3, "UMB")
                and (cur + 1 == last or st(cur + 2, 2, "ER"))
            ) or at(cur + 1) == "M":  # 'dumb', 'thumb'
                cur += 2
            else:
                cur += 1
            add("M")
        elif ch == "N":
            add("N")
            cur += 2 if at(cur + 1) == "N" else 1
        elif ch == "\xd1":  # Ñ
            add("N")
            cur += 1
        elif ch == "P":
            if at(cur + 1) == "H":
                add("F")
                cur += 2
            else:
                add("P")  # 'campbell', 'raspberry'
                cur += 2 if st(cur + 1, 1, "P", "B") else 1
        elif ch == "Q":
            add("K")
            cur += 2 if at(cur + 1) == "Q" else 1
        elif ch == "R":
            # french: 'rogier', but not 'hochmeier'
            if (
                cur == last
                and not slavo_germanic
                and st(cur - 2, 2, "IE")
                and not st(cur - 4, 2, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            cur += 2 if at(cur + 1) == "R" else 1
        elif ch == "S":
            if st(cur - 1, 3, "ISL", "YSL"):  # 'island', 'carlisle'
                cur += 1
            elif cur == 0 and st(cur, 5, "SUGAR"):
                add("X", "S")
                cur += 1
            elif st(cur, 2, "SH"):
                if st(cur + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                cur += 2
            elif st(cur, 3, "SIO", "SIA") or st(cur, 4, "SIAN"):
                # italian & armenian
                add("S") if slavo_germanic else add("S", "X")
                cur += 3
            elif (cur == 0 and st(cur + 1, 1, "M", "N", "L", "W")) or st(
                cur + 1, 1, "Z"
            ):  # 'smith' matches 'schmidt', 'snider' matches 'schneider'
                add("S", "X")
                cur += 2 if st(cur + 1, 1, "Z") else 1
            elif st(cur, 2, "SC"):
                if at(cur + 2) == "H":  # Schlesinger's rule
                    if st(cur + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        # dutch: 'school', 'schooner'
                        if st(cur + 3, 2, "ER", "EN"):
                            add("X", "SK")  # 'schermerhorn', 'schenker'
                        else:
                            add("SK")
                        cur += 3
                    else:
                        if cur == 0 and not vowel(3) and at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                        cur += 3
                elif st(cur + 2, 1, "I", "E", "Y"):
                    add("S")
                    cur += 3
                else:
                    add("SK")
                    cur += 3
            else:
                # french: 'resnais', 'artois'
                if cur == last and st(cur - 2, 2, "AI", "OI"):
                    add("", "S")
                else:
                    add("S")
                cur += 2 if st(cur + 1, 1, "S", "Z") else 1
        elif ch == "T":
            if st(cur, 4, "TION"):
                add("X")
                cur += 3
            elif st(cur, 3, "TIA", "TCH"):
                add("X")
                cur += 3
            elif st(cur, 2, "TH") or st(cur, 3, "TTH"):
                if st(cur + 2, 2, "OM", "AM") or st(
                    0, 4, "VAN ", "VON "
                ) or st(0, 3, "SCH"):  # 'thomas', 'thames', germanic
                    add("T")
                else:
                    add("0", "T")
                cur += 2
            else:
                add("T")
                cur += 2 if st(cur + 1, 1, "T", "D") else 1
        elif ch == "V":
            add("F")
            cur += 2 if at(cur + 1) == "V" else 1
        elif ch == "W":
            if st(cur, 2, "WR"):  # can also be in middle of word
                add("R")
                cur += 2
            else:
                if cur == 0 and (vowel(cur + 1) or st(cur, 2, "WH")):
                    if vowel(cur + 1):  # Wasserman should match Vasserman
                        add("A", "F")
                    else:  # need Uomo to match Womo
                        add("A")
                    # no advance: the original FALLS THROUGH, so an
                    # initial WICZ/WITZ (Witz-, Wicz- surnames) still
                    # reaches the polish rule below
                if (
                    (cur == last and vowel(cur - 1))
                    or st(cur - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or st(0, 3, "SCH")
                ):  # Arnow should match Arnoff
                    add("", "F")
                    cur += 1
                elif st(cur, 4, "WICZ", "WITZ"):  # polish 'filipowicz'
                    add("TS", "FX")
                    cur += 4
                else:
                    cur += 1
        elif ch == "X":
            # french: 'breaux'
            if not (
                cur == last
                and (
                    st(cur - 3, 3, "IAU", "EAU")
                    or st(cur - 2, 2, "AU", "OU")
                )
            ):
                add("KS")
            cur += 2 if st(cur + 1, 1, "C", "X") else 1
        elif ch == "Z":
            if at(cur + 1) == "H":  # chinese pinyin 'zhao'
                add("J")
                cur += 2
            else:
                if st(cur + 1, 2, "ZO", "ZI", "ZA") or (
                    slavo_germanic and cur > 0 and at(cur - 1) != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                cur += 2 if at(cur + 1) == "Z" else 1
        else:
            cur += 1

    p = "".join(pri)
    s = "".join(sec)
    if max_length:
        p, s = p[:max_length], s[:max_length]
    return (p, "") if s == p else (p, s)


def double_metaphone(word: str, max_length: int | None = 4) -> tuple[str, str]:
    """Public entry: (primary, secondary) codes for one word; secondary
    is "" when it matches the primary. Non-letters are skipped, so a
    purely numeric token codes to ("", "")."""
    if not word:
        return ("", "")
    return _dm(word, max_length)


def metaphone_codes(field: str) -> set[str]:
    """predicates.doubleMetaphone (predicates.py:476-479): the set of
    non-empty codes for the whole field."""
    return {c for c in double_metaphone(field) if c}


def metaphone_token_codes(field: str) -> set[str]:
    """predicates.metaphoneToken (predicates.py:480-484): union of
    non-empty codes over whitespace tokens."""
    out: set[str] = set()
    for tok in field.split():
        out |= metaphone_codes(tok)
    return out


def _keys_udf(fn):
    def batch(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: sorted(fn(v)) if isinstance(v, str) and v else []
        )

    return F.pandas_udf(batch, T.ArrayType(T.StringType()))


def double_metaphone_keys(col) -> "F.Column":
    """Blocking keys: sorted non-empty double-metaphone codes of the
    whole field (Arrow-batched; NULL/empty -> [])."""
    return _keys_udf(metaphone_codes)(F.col(col) if isinstance(col, str) else col)


def metaphone_token_keys(col) -> "F.Column":
    """Blocking keys: sorted union of per-token codes."""
    return _keys_udf(metaphone_token_codes)(
        F.col(col) if isinstance(col, str) else col
    )
