"""Engine-portable MinHash / SimHash — the *verifiable* twins of
functions/hashing.py.

The fast signatures (hashing.py) are built on ``xxhash64`` + Arrow numpy
kernels: optimal on the hot path, but no other engine can recompute them,
so the LSH dedup queries were stuck at rows-only correctness. This module
re-derives both schemes from primitives every SQL engine computes
BIT-IDENTICALLY:

  H(s)   = int64 of the first 15 hex chars (60 bits) of md5(s)
  h      = H mod P,            P = 2^31 - 1 (Mersenne)
  minhash sig_i = min over shingles of (a_i*h + b_i) mod P
                  (a_i*h < 2^62: no 64-bit overflow in either engine)
  simhash bit_j = majority over tokens of bit j of (H & 0xffffffff)

Everything on the Spark side is a native Catalyst expression
(md5/conv/transform/array_min/filter — zero Python, zero UDF), so the
plan shape is identical to the fast path: linear keygen, banded equi-join.
The DuckDB twins are emitted by the ``sql_*`` helpers below from the SAME
constants, which is what makes the driver's value-hash check meaningful.

The a_i/b_i permutation constants are themselves md5-derived (no RNG, no
process state) so both sides regenerate them from nothing.

Reference analog: this replaces the TfidfCanopy/Levenshtein index
predicates (dedupe/predicates.py:248-305) exactly like hashing.py does —
see that module's docstring for the scale argument.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

# single _bind definition: keygen's carries the verified Spark 4.1.2
# constraint notes (interpreted higher-order fns do no CSE; _bind shapes
# must not become pandas-UDF arguments above another Python-eval node)
from .keygen import _bind

P = (1 << 31) - 1
MASK32 = (1 << 32) - 1


def _const(tag: str, lo: int, hi: int) -> int:
    """Deterministic pseudo-random int in [lo, hi] from md5(tag)."""
    v = int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)
    return lo + v % (hi - lo + 1)


def perm_constants(num_perm: int) -> tuple[list[int], list[int]]:
    a = [_const(f"mh-a{i}", 1, P - 1) for i in range(num_perm)]
    b = [_const(f"mh-b{i}", 0, P - 1) for i in range(num_perm)]
    return a, b


# --- Spark-side expressions (all native) -----------------------------------

def hash60(col: Column) -> Column:
    """60-bit portable hash: first 15 hex chars of md5, base-16 parsed."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_sig(grams: Column, num_perm: int = 16) -> Column:
    """array<string> shingles -> array<long> portable signature
    (null for null/empty shingles — no keys downstream)."""
    a, b = perm_constants(num_perm)

    def _perm(ai: int, bi: int):
        # single-arg lambda required: pyspark passes (element, index) to
        # two-arg transform lambdas (see blocking.build_blocking_map)
        return lambda h: (F.lit(ai) * h + F.lit(bi)) % P

    def _mins(hs):
        # hs is the bound, once-evaluated md5-hash array
        return F.array(
            *[
                F.array_min(F.transform(hs, _perm(a[i], b[i])))
                for i in range(num_perm)
            ]
        )

    sig = _bind(F.transform(grams, lambda g: hash60(g) % P), _mins)
    return F.when(
        grams.isNull() | (F.size(grams) == 0), F.lit(None).cast("array<long>")
    ).otherwise(sig)


def minhash_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Portable band keys: the r signature values themselves, joined —
    recomputable by any engine (unlike hashing.minhash_band_keys' F.hash)."""
    parts = [
        F.concat_ws(
            "_",
            F.lit(f"mh{i}"),
            *[F.element_at(sig, i * rows + j + 1).cast("string") for j in range(rows)],
        )
        for i in range(bands)
    ]
    return F.when(sig.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(*parts)
    )


def simhash32(tokens: Column) -> Column:
    """array<string> tokens -> 32-bit portable simhash (long; null for
    null/empty tokens). bit_j = 1 iff a strict majority of token hashes
    have bit j set (2*ones > n; exact-half votes 0, matching
    hashing._simhash_one's ``votes > 0``)."""
    def _bit(mask: int):
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    def _total(hs):
        # hs bound once; the 33 references below scan the materialized
        # array instead of re-running the md5 chain per reference
        n = F.size(hs)
        total = F.lit(0).cast("long")
        for j in range(32):
            ones = F.size(F.filter(hs, _bit(1 << j)))
            total = total + F.when(ones * 2 > n, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
        return total

    total = _bind(
        F.transform(tokens, lambda t: hash60(t).bitwiseAND(F.lit(MASK32))),
        _total,
    )
    return F.when(
        tokens.isNull() | (F.size(tokens) == 0), F.lit(None).cast("long")
    ).otherwise(total)


def simhash_band_keys(sim: Column, bands: int = 4, bits: int = 32) -> Column:
    """32-bit portable simhash -> band keys (bits/bands-bit chunks)."""
    width = bits // bands
    mask = (1 << width) - 1
    parts = [
        F.concat_ws(
            ":",
            F.lit(f"sh{i}"),
            F.shiftrightunsigned(sim, i * width)
            .bitwiseAND(F.lit(mask).cast("long"))
            .cast("string"),
        )
        for i in range(bands)
    ]
    return F.when(sim.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(*parts)
    )


def plane_signs(dim: int, bands: int, bits: int) -> list[list[int]]:
    """±1 hyperplane matrix (bands*bits rows x dim), md5-derived — the
    portable replacement for ann._hyperplanes' seeded gaussians. Sign
    LSH only needs symmetric random directions; Rademacher ±1 vectors
    are standard (Achlioptas '03 database-friendly projections) and,
    applied to integer-quantized vectors, make the bucket pattern
    integer-exact — no float-summation-order sensitivity across engines."""
    return [
        [
            1 if (_const(f"p{b}:{i}:{j}", 0, 1) == 1) else -1
            for j in range(dim)
        ]
        for b in range(bands)
        for i in range(bits)
    ]


QUANT = 1000  # vector quantization scale: q_j = floor(v_j * QUANT + 0.5)


# --- DuckDB SQL twins -------------------------------------------------------

def sql_hash60(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def sql_minhash_cols(num_perm: int = 16, hv: str = "hv") -> str:
    """SELECT-list fragment: MIN((a_i*hv+b_i)%P) AS s{i} per permutation,
    for a grouped-by-doc aggregation over per-shingle hashes ``hv``."""
    a, b = perm_constants(num_perm)
    return ", ".join(
        f"MIN(({a[i]} * {hv} + {b[i]}) % {P}) AS s{i}" for i in range(num_perm)
    )


def sql_minhash_band_cond(bands: int, rows: int, l: str = "a", r: str = "b") -> str:
    """Join condition: the two signatures agree on at least one band."""
    terms = []
    for i in range(bands):
        eqs = " AND ".join(
            f"{l}.s{i * rows + j} = {r}.s{i * rows + j}" for j in range(rows)
        )
        terms.append(f"({eqs})")
    return " OR ".join(terms)


def sql_minhash_agree(num_perm: int = 16, l: str = "a", r: str = "b") -> str:
    """Count of agreeing signature positions (est-Jaccard numerator)."""
    return (
        "("
        + " + ".join(
            f"CAST({l}.s{i} = {r}.s{i} AS INT)" for i in range(num_perm)
        )
        + ")"
    )


def sql_simhash32(hv: str = "hv", n: str = "cnt") -> str:
    """Aggregate expression: 32-bit simhash from grouped per-token hashes.

    Use over GROUP BY doc: hv is the per-row token hash (already &0xffffffff),
    n the per-group token count; emits sum of (1<<j) where majority bit set.
    """
    terms = [
        f"(CASE WHEN 2 * SUM(CASE WHEN ({hv} & {1 << j}) <> 0 THEN 1 ELSE 0 END)"
        f" > {n} THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    ]
    return "(" + " + ".join(terms) + ")"
