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


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once per row and hand it to ``fn`` as a bound
    lambda variable.

    Higher-order lambdas re-evaluate every captured subtree once PER
    ELEMENT (ArrayTransform.eval runs the whole function subtree for
    each element, and there is no subexpression elimination inside a
    lambda), so a transform(sequence(...), i -> f(split(text), i)) walk
    re-runs the regex split once per output element — O(n^2) in the
    gram count. Measured on the minhash shingle chain: ~3 s/5k docs
    inline vs ~0.2 s bound. Wrapping the expensive expression in a
    one-element array and transforming over it makes it a
    NamedLambdaVariable: evaluated once, O(1) to reference.

    CONSTRAINT — never let a _bind expression reach a pandas-UDF
    argument: when ``fn``'s body holds an inner lambda that captures
    the bound variable (a nested-capture lambda), Spark 4.1.2's
    ExtractPythonUDFs declines to extract any pandas UDF whose
    argument contains it *if the plan sits above another Python-eval
    node* (MapInPandas / ArrowEvalPython upstream), and execution dies
    with INTERNAL_ERROR "Cannot evaluate expression: <udf>(...)".
    Verified minimally: transform(array(split(t)), w ->
    transform(seq, i -> get(w, i))) inside a UDF arg fails over a
    mapInPandas child and succeeds over a plain scan; the same shape
    with no inner capture extracts fine. Functions that feed UDF args
    (word_ngrams, char_ngrams -> shingle_hashes -> minhash/simhash
    UDFs) therefore use the capture-free zip_with shape (_ngram_zip);
    _bind is reserved for native-only blocking paths."""
    return F.get(F.transform(F.array(expr), fn), 0)


def whole_field(col: Column | str) -> Column:
    """predicates.py:345-350 — the whole value as one key."""
    c = _c(col)
    return _empty_if_null(c, F.array(c))


def tokens(col: Column | str) -> Column:
    """predicates.py:353-355 — distinct word tokens.

    Leading/trailing whitespace makes split emit "" entries; those are
    dropped — a "" block key would co-block every padded record into one
    mega-block (same contract as first_token's empty-match guard)."""
    c = _c(col)
    return _empty_if_null(
        c, F.array_remove(F.array_distinct(F.split(c, r"\s+")), "")
    )


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


def _ngram_zip(tokens: Column, m: Column, n: int, sep: str) -> Column:
    """n-gram walk as a zip_with chain: gram_i = sep-join of
    tokens[i..i+n-1], built by zipping the n shifted length-m slices of
    ``tokens`` elementwise.

    Why this shape and not transform(sequence(...), i -> slice(tokens,
    i+1, n)): (a) ``tokens`` appears only in CHILD position (the slice
    args), so the expensive split/regex producing it evaluates once per
    ROW, not once per gram — same win as _bind without the nested
    lambda; (b) the zip lambdas capture nothing from an enclosing
    lambda scope, which keeps the expression legal inside a pandas-UDF
    argument (see the _bind docstring: a nested capture there breaks
    ExtractPythonUDFs whenever the plan sits above another Python-eval
    node). Callers guard m > 0."""
    slices = [F.slice(tokens, k + 1, m) for k in range(n)]
    g = slices[0]
    for s in slices[1:]:
        g = F.zip_with(g, s, lambda x, y: F.concat_ws(sep, x, y))
    return g


def word_ngrams(col: Column | str, n: int) -> Column:
    """commonTwoTokens/commonThreeTokens (predicates.py:404-418) and the
    shingle source for MinHash — contiguous word n-grams, native via a
    zip_with chain over the split-once token array (see _ngram_zip:
    split evaluates per row, not per gram, and the expression stays
    extraction-safe inside pandas-UDF arguments)."""
    c = _c(col)
    words = F.split(c, r"\s+")
    m = F.size(words) - (n - 1)
    grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        _ngram_zip(words, m, n, " ")
    )
    return _empty_if_null(c, F.array_distinct(grams))


def char_ngrams(col: Column | str, n: int) -> Column:
    """cpredicates.pyx:3-24 / commonFourGram (predicates.py:437-444) —
    contiguous char n-grams with spaces removed. Same zip_with shape as
    word_ngrams (the whitespace-strip regex evaluates once per row)."""
    stripped = F.regexp_replace(_c(col), r"\s", "")
    chars = F.split(stripped, "")
    m = F.length(stripped) - (n - 1)
    grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        _ngram_zip(chars, m, n, "")
    )
    return _empty_if_null(_c(col), F.array_distinct(grams))


def exists_key(col: Column | str) -> Column:
    """ExistsPredicate (predicates.py:94-118) — '1'/'0' null indicator."""
    c = _c(col)
    return F.array(c.isNotNull().cast("int").cast("string"))


def compound(a: Column, b: Column) -> Column:
    """CompoundPredicate (predicates.py:325-342): cartesian product of two
    key arrays joined with ':'. Our composite blocking key
    domain + simhash_band IS this operator.

    array_distinct upholds build_blocking_map's per-record-distinct
    invariant: the ':' separator is ambiguous when component keys
    themselves contain ':' (['x:y','x'] x ['z','y:z'] both yield
    'x:y:z'), and a repeated (key, id) row would duplicate self-join
    pairs and inflate block-size profiles. Per-record cost only."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                a, lambda x: F.transform(b, lambda y: F.concat_ws(":", x, y))
            )
        )
    )


def suffix_array(col: Column | str, min_len: int = 5) -> Column:
    """suffixArray (predicates.py:462-469) — all suffixes of length >=
    ``min_len`` (on the first 100 chars, bounding fan-out like the
    reference bounds comparator cost); native substring walk."""
    def sufs_of(c):
        m = F.length(c) - (min_len - 1)
        return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), m), lambda i: F.substring(c, i, F.lit(100))
            )
        )

    sufs = _bind(F.substring(_c(col), 1, 100), sufs_of)
    return _empty_if_null(_c(col), F.array_distinct(sufs))


def one_gram_fingerprint(col: Column | str) -> Column:
    """oneGramFingerprint (predicates.py:425-430) — sorted unique chars,
    spaces removed, joined."""
    c = F.regexp_replace(_c(col), r"\s", "")

    def fp_of(s):
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.substring(s, i, 1),
        )
        return F.concat_ws("", F.array_sort(F.array_distinct(grams)))

    return F.when(
        _c(col).isNull() | (F.length(c) == 0), F.array().cast("array<string>")
    ).otherwise(F.array(_bind(c, fp_of)))


def two_gram_fingerprint(col: Column | str) -> Column:
    """twoGramFingerprint (predicates.py:425-434) — sorted unique char
    2-grams joined; empty for strings shorter than 2."""
    c = F.regexp_replace(_c(col), r"\s", "")
    m = F.length(c) - 1

    def fp_of(s):
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - 1, F.lit(1))),
            lambda i: F.substring(s, i, 2),
        )
        return F.concat_ws("", F.array_sort(F.array_distinct(grams)))

    return F.when(
        _c(col).isNull() | (m <= 0), F.array().cast("array<string>")
    ).otherwise(F.array(_bind(c, fp_of)))


def hundred_integers(col: Column | str) -> Column:
    """hundredIntegerPredicate (predicates.py:388-390) — integers rounded
    down to hundreds."""
    c = _c(col)
    ints = F.transform(
        F.regexp_extract_all(c, F.lit(r"(\d+)"), 1),
        lambda s: ((s.cast("long") / 100).cast("long") * 100).cast("string"),
    )
    return _empty_if_null(c, F.array_distinct(ints))


def hundred_integers_odd(col: Column | str) -> Column:
    """hundredIntegersOddPredicate (predicates.py:391-393) — hundreds
    bucket plus parity bit."""
    c = _c(col)
    ints = F.transform(
        F.regexp_extract_all(c, F.lit(r"(\d+)"), 1),
        lambda s: F.concat_ws(
            "@",
            ((s.cast("long") / 100).cast("long") * 100).cast("string"),
            (s.cast("long") % 2).cast("string"),
        ),
    )
    return _empty_if_null(c, F.array_distinct(ints))


def order_of_magnitude(col: Column | str) -> Column:
    """orderOfMagnitude (predicates.py:537-542) — floor(log10(x)) for a
    positive numeric column."""
    c = _c(col).cast("double")
    key = F.floor(F.log10(c)).cast("long").cast("string")
    return F.when(c.isNull() | (c <= 0), F.array().cast("array<string>")).otherwise(
        F.array(key)
    )


def round_to_1(col: Column | str) -> Column:
    """roundTo1 (predicates.py:545-548) — one significant figure."""
    c = _c(col).cast("double")
    exp = F.floor(F.log10(F.abs(c)))
    key = (F.round(c / F.pow(F.lit(10.0), exp)) * F.pow(F.lit(10.0), exp)).cast(
        "long"
    ).cast("string")
    # NULL (incl. failed numeric cast) emits NO keys like every other
    # predicate — routing nulls into the "0" key would co-block every
    # missing-value record with every zero-valued record in one
    # mega-block; only a true 0 takes the "0" key (log10(0) is null)
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
        F.when(c == 0, F.array(F.lit("0"))).otherwise(F.array(key))
    )


def latlong_grid(lat: Column | str, lon: Column | str) -> Column:
    """latLongGridPredicate (predicates.py:521-534) — 0.1-degree grid
    cell; empty for (0, 0) like the reference treats missing coords."""
    la, lo = _c(lat).cast("double"), _c(lon).cast("double")
    key = F.concat_ws(
        ",", F.round(la, 1).cast("string"), F.round(lo, 1).cast("string")
    )
    missing = la.isNull() | lo.isNull() | ((la == 0) & (lo == 0))
    return F.when(missing, F.array().cast("array<string>")).otherwise(F.array(key))


SOUNDEX_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
SOUNDEX_TO = "01230120022455012623010202"


def soundex_code(col: Column | str) -> Column:
    """Soundex-style phonetic code, fully specified so any engine can
    recompute it (the doubleMetaphone stand-in, predicates.py:476-479):

      letters   = upper(s) with non-A-Z stripped
      digits    = translate(letters, SOUNDEX_FROM, SOUNDEX_TO)
      collapsed = adjacent-duplicate digits collapsed (fold, not regex
                  backrefs — RE2 engines lack them)
      code      = letters[0] + rpad(strip_zeros(collapsed[1:])[:3], 3, '0')

    NULL for inputs with no letters. All native Catalyst (translate +
    aggregate fold); deviation from true soundex: no H/W-transparency
    rule — documented, mirrored exactly by the DuckDB oracle."""
    c = _c(col)

    def code_of(letters):
        def from_digits(digits):
            chars = F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(digits), F.lit(1))),
                lambda i: F.substring(digits, i, F.lit(1)),
            )
            collapsed = F.aggregate(
                chars,
                F.lit(""),
                lambda acc, x: F.when(
                    F.substring(acc, -1, 1) == x, acc
                ).otherwise(F.concat(acc, x)),
            )
            rest = F.regexp_replace(F.substring(collapsed, 2, 1000), "0", "")
            return F.concat(
                F.substring(letters, 1, 1),
                F.rpad(F.substring(rest, 1, 3), 3, "0"),
            )

        # letters and digits each bound once per row (_bind): captured
        # inline, the upper+regex+translate chain would re-run once per
        # character inside the transform/aggregate lambdas
        return _bind(
            F.translate(letters, SOUNDEX_FROM, SOUNDEX_TO), from_digits
        )

    letters_expr = F.regexp_replace(F.upper(c), "[^A-Z]+", "")
    return F.when(
        c.isNull() | (F.length(letters_expr) == 0), F.lit(None)
    ).otherwise(_bind(letters_expr, code_of))


def phonetic(col: Column | str) -> Column:
    """doubleMetaphone-analog (predicates.py:476-479): phonetic code of
    the whole field (see ``soundex_code``) — same role as the reference's
    phonetic canopy, engine-portable, no UDF.

    For metaphone-compatible codes (the reference's exact blocking
    family), use ``functions.metaphone.double_metaphone_keys`` /
    ``metaphone_token_keys`` — a real Double Metaphone, Arrow-batched,
    pinned against the reference's own predicate test vectors. This
    soundex stays as the zero-UDF, DuckDB-twinned family for the
    oracle-checked ``phonetic_keys`` query."""
    code = soundex_code(col)
    return F.when(code.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(code)
    )


def phonetic_tokens(col: Column | str) -> Column:
    """metaphoneToken (predicates.py:482-484): phonetic code per word."""
    c = _c(col)
    return _empty_if_null(
        c,
        F.array_distinct(
            F.filter(
                F.transform(F.split(c, r"\s+"), lambda w: soundex_code(w)),
                lambda k: k.isNotNull(),
            )
        ),
    )


def whole_set(col: Column | str) -> Column:
    """wholeSetPredicate (predicates.py:487-489) — the sorted set as one
    key (array-typed input column)."""
    c = _c(col)
    return _empty_if_null(c, F.array(F.concat_ws(",", F.array_sort(c))))


def common_set_elements(col: Column | str) -> Column:
    """commonSetElementPredicate (predicates.py:492-495) — each element
    is a key (array-typed input)."""
    c = _c(col)
    return _empty_if_null(c, F.array_distinct(c.cast("array<string>")))


def _sorted_element_ngrams(col: Column | str, n: int) -> Column:
    """Contiguous n-grams of the SORTED set elements, space-joined —
    ngramsTokens over sorted(field) (predicates.py:404-410)."""
    c = _c(col)
    s = F.array_sort(c.cast("array<string>"))
    m = F.size(s) - (n - 1)
    grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.concat_ws(" ", F.slice(s, i + 1, n)),
        )
    )
    return _empty_if_null(c, F.array_distinct(grams))


def common_two_elements(col: Column | str) -> Column:
    """commonTwoElementsPredicate (predicates.py:497-499): adjacent pairs
    of the sorted set."""
    return _sorted_element_ngrams(col, 2)


def common_three_elements(col: Column | str) -> Column:
    """commonThreeElementsPredicate (predicates.py:502-504): adjacent
    triples of the sorted set."""
    return _sorted_element_ngrams(col, 3)


def first_set_element(col: Column | str) -> Column:
    """firstSetElementPredicate (predicates.py:507-509) on the sorted set."""
    c = _c(col)
    return F.when(
        c.isNull() | (F.size(c) == 0), F.array().cast("array<string>")
    ).otherwise(F.array(F.array_sort(c)[0].cast("string")))


def last_set_element(col: Column | str) -> Column:
    """lastSetElementPredicate (predicates.py:502-504) on the sorted set."""
    c = _c(col)
    return F.when(
        c.isNull() | (F.size(c) == 0), F.array().cast("array<string>")
    ).otherwise(F.array(F.element_at(F.array_sort(c), -1).cast("string")))


def magnitude_of_cardinality(col: Column | str) -> Column:
    """magnitudeOfCardinality (predicates.py:512-518) — order of magnitude
    of the set size."""
    c = _c(col)
    return order_of_magnitude(F.size(c))


def typo_variants(col: Column | str) -> Column:
    """N6 (clean_donors.py:6-27 generate_word_list): candidate typo keys
    for a single word — prefixes (len>=4), consonant skeleton, adjacent
    transpositions. Exploration helper, not a hot-path predicate; all
    native (substring walk + regexp + transform)."""
    c = _c(col)
    n = F.length(c)
    prefixes = F.when(n <= 4, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(4), n - 1), lambda k: F.substring(c, 1, k))
    )
    skeleton = F.array(F.regexp_replace(c, r"[aeiou]", ""))
    transpos = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.substring(c, 1, i - 1),
                F.substring(c, i + 1, 1),
                F.substring(c, i, 1),
                c.substr(i + 2, n),
            ),
        )
    )
    return _empty_if_null(
        c, F.array_distinct(F.concat(F.array(c), prefixes, skeleton, transpos))
    )


def deletion_variants(col: Column | str, key_len: int = 12) -> Column:
    """Edit-distance blocking keys (the LevenshteinCanopy/Search analog,
    dedupe/index_predicates.py): the first ``key_len`` chars plus every
    single-character deletion of them (SymSpell neighborhood). Two keys
    within Levenshtein distance 1 ALWAYS share a variant (a deletion
    covers delete/insert/substitute), so the banded equi-join +
    exact-levenshtein filter has total recall at distance 1 — the
    shared-nothing replacement for the reference's driver-side
    Levenshtein ball tree. Linear fan-out: key_len+1 keys per record."""
    def keys_of(c):
        n = F.length(c)
        # n == 1 emits the empty-string deletion so two distinct
        # single-char keys (distance 1 via substitution) still co-block.
        # NOTE: only the number of distinct KEYS is alphabet-bounded; the
        # "" block itself holds every record whose field is a single
        # character, so its SIZE is record-count-bounded only — a hot ""
        # block relies on downstream cap_blocks like any other hot key
        dels = F.when(n <= 1, F.array(F.lit(""))).otherwise(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(
                    F.substring(c, 1, i - 1), c.substr(i + 1, F.lit(key_len))
                ),
            )
        )
        return F.array_distinct(F.concat(F.array(c), dels))

    keys = _bind(F.substring(_c(col), 1, key_len), keys_of)
    return F.when(
        _c(col).isNull() | (F.length(_c(col)) == 0),
        F.array().cast("array<string>"),
    ).otherwise(keys)


def domain_key(url: Column | str) -> Column:
    """Normalized registrable-domain blocking key from a url — the graft's
    first compound component (north_star). Native parse_url-equivalent via
    regexp; lowercased, 'www.' stripped."""
    u = _c(url)
    host = F.lower(F.regexp_extract(u, r"^[a-z]+://([^/:?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.array().cast("array<string>")).otherwise(F.array(host))
