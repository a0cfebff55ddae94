"""MinHash / SimHash — the scale replacements for index predicates.

The reference's approximate-similarity blocking is TF-IDF canopies over a
driver-side inverted index (dedupe/predicates.py:248-305,
canopy_index.py:14-61) — a corpus-global mutable structure that cannot
exist on a 1000-executor cluster. The standard shared-nothing
replacement (Broder '97 minwise hashing, Charikar '02 simhash — see
PAPERS.md) needs only per-row computation + a shuffle on band keys:

  shingles -> xxhash64 (JVM-side) -> k universal-hash permutations ->
  per-permutation min  =>  signature;  bands of r rows  =>  block keys.

Base shingle hashing is Spark's native ``xxhash64`` so the expensive
string hashing never leaves the JVM; the k-permutation min-fold is a
single Arrow-vectorized numpy pass (O(k·s) per row, zero string work).
Permutation constants are derived from a fixed seed on the driver and
closed over — identical on every executor, every run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

MERSENNE_61 = (1 << 61) - 1


def shingle_hashes(shingles: Column) -> Column:
    """array<string> shingles -> array<long> xxhash64 values (JVM-side)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def word_ngram_hashes(col: Column, n: int) -> Column:
    """array<long> ids of the distinct contiguous word n-grams of a text
    column WITHOUT materializing the n-gram strings — the fast-family
    twin of ``shingle_hashes(keygen.word_ngrams(col, n))``.

    Each token's bytes are hashed ONCE (xxhash64 of the short token),
    then the n shifted slices of the token-hash array fold elementwise
    with the native multi-argument ``xxhash64(acc, next)`` combiner in a
    zip_with chain (the keygen._ngram_zip shape, over 8-byte longs
    instead of strings). The string formulation copies every token's
    bytes into up to n concat_ws gram buffers and re-hashes them from
    each — per-token allocation and memory traffic the signatures stage
    pays at 2M+ rows on the shared bus (BASELINE.md: block/signatures
    are the two stages whose executor CPU inflates 2->8 cores; this
    removes the JVM-side share of that traffic).

    Values differ from ``xxhash64(gram_string)`` by design: MinHash /
    SimHash need any well-mixed stable 64-bit id per distinct shingle,
    not a specific one (fast-vs-portable family equivalence is
    behavioral, pinned by test_family_equivalence.py). The portable
    family keeps string grams so the DuckDB oracle can recompute them.
    Distinctness applies AFTER hashing (array_distinct over longs ==
    distinct grams modulo 2^-64 collisions). NULL text -> empty array
    (matching word_ngrams' _empty_if_null contract so downstream
    null-signature gating is unchanged); < n tokens -> empty array.
    """
    words = F.split(col, r"\s+")
    th = F.transform(words, lambda w: F.xxhash64(w))
    m = F.size(th) - (n - 1)
    slices = [F.slice(th, k + 1, m) for k in range(n)]
    g = slices[0]
    for s in slices[1:]:
        g = F.zip_with(g, s, lambda x, y: F.xxhash64(x, y))
    grams = F.when(m <= 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(g)
    )
    return F.when(col.isNull(), F.array().cast("array<bigint>")).otherwise(
        grams
    )


def _perm_constants(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_61, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_61, size=num_perm, dtype=np.int64)
    return a, b


def _as_u64(hs) -> np.ndarray:
    """Shingle-hash list/array -> contiguous uint64 view, ZERO-copy when
    the element already arrives as an int64 ndarray (the Arrow->pandas
    shape for array<long>): int64 -> uint64 is a bit reinterpretation
    (two's complement == the mod-2^64 cast ``astype`` would compute),
    so ``view`` replaces the per-row array copy ``astype`` made."""
    h = np.ascontiguousarray(np.asarray(hs, dtype=np.int64))
    return h.view(np.uint64)


def _minhash_u64(h: np.ndarray, a_u: np.ndarray, b_u: np.ndarray):
    """One converted row: (s,) uint64 hashes -> (k,) int64 signature.

    Permutation family: v = a*h + b mod 2^64 (natural uint64 wraparound,
    multiply-shift style — Dietzfelbinger et al.); the min is taken over
    the full 64-bit value so the high (well-mixed) bits dominate. No
    explicit modulo: the `% M61` of the classic construction costs a
    scalar divide per cell — measured ~2x on the signature stage.
    Per-row (k x s) temporaries stay L2-resident; batching rows into
    (total x k) blocks measured strictly slower (cache-bound, not
    dispatch-bound).
    """
    v = a_u[:, None] * h[None, :] + b_u[:, None]
    return v.min(axis=1).astype(np.int64)


def _simhash_u64(h: np.ndarray, bits: int = 64):
    """One converted row: (s,) uint64 hashes -> int simhash over ``bits``.

    Charikar bit-vote via unpackbits on the byte view (uint8 bit matrix:
    8x less memory traffic than int64 shifts; measured ~3.5x), re-packed
    little-endian. ``bits < 64`` keeps the low ``bits`` positions (vote
    vector truncation — the narrow-simhash contract of simhash_band_keys
    with matching ``bits``).
    """
    bitm = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    votes = bitm.sum(axis=0).astype(np.int64) * 2 - len(h)
    val = int(
        np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        .view("<i8")[0]
    )
    if bits < 64:
        val &= (1 << bits) - 1
    return val


def _minhash_one(hs, a_u: np.ndarray, b_u: np.ndarray):
    """One raw row (null-checked + converted) -> minhash signature."""
    if hs is None or len(hs) == 0:
        return None
    return _minhash_u64(_as_u64(hs), a_u, b_u)


def _simhash_one(hs, bits: int = 64):
    """One raw row (null-checked + converted) -> simhash value."""
    if hs is None or len(hs) == 0:
        return None
    return _simhash_u64(_as_u64(hs), bits)


def minhash_signature_udf(num_perm: int = 64, seed: int = 7):
    """pandas UDF: array<long> shingle hashes -> array<long> signature.

    sig[i] = min over shingles of (a_i * h + b_i mod 2^64). Rows with
    null/empty shingles yield null (no keys downstream —
    predicates.py:64-69 contract).
    """
    a, b = _perm_constants(num_perm, seed)
    a_u = a.astype(np.uint64)
    b_u = b.astype(np.uint64)

    def batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda hs: _minhash_one(hs, a_u, b_u))

    return F.pandas_udf(batch, T.ArrayType(T.LongType()))


def minhash_simhash_udf(num_perm: int = 64, seed: int = 7, bits: int = 64):
    """Fused pandas UDF: gram_hashes -> struct<sig array<long>,
    simhash long> in ONE Python round-trip over ONE shingle array.

    Both signatures come from the same word-n-gram shingles. Simhash over
    unigram tokens is a trap at scale: every page shares the language's
    top tokens, so unrelated pages land within small Hamming distance and
    the domain+band blocks blow up toward the cap (measured: ~4M
    candidate pairs from 200k pages, dominated by correlated-simhash
    blocks). Shingles are near-unique across non-duplicates, so shingle
    simhash decorrelates — the same reason the reference strips
    stop-words from its canopy index (canopy_index.py:20-38).
    """
    a, b = _perm_constants(num_perm, seed)
    a_u = a.astype(np.uint64)
    b_u = b.astype(np.uint64)

    def batch(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for grams in it:
            # ONE pass over the batch: both signatures share the row's
            # uint64 conversion and its (already cache-resident) hashes,
            # instead of two .map passes that each re-read and re-convert
            # every shingle array — the signatures stage is the pipeline's
            # most memory-bandwidth-sensitive (see BASELINE.md anomaly
            # post-mortem), so the duplicate pass is the first thing to go.
            sigs: list = []
            simhashes: list = []
            for hs in grams:
                if hs is None or len(hs) == 0:
                    sigs.append(None)
                    simhashes.append(None)
                    continue
                h = _as_u64(hs)
                sigs.append(_minhash_u64(h, a_u, b_u))
                simhashes.append(_simhash_u64(h, bits))
            # simhash MUST be built with pd.array(Int64): an object
            # series with Nones (or .astype("Int64") on one) round-trips
            # through float64 and zeroes the low ~11 bits of every hash
            # (53-bit mantissa) — measured as a collapse of the band-key
            # space to 1.7k values over 50k pages and a ~35x flood of
            # candidate pairs.
            yield pd.DataFrame(
                {
                    "sig": pd.Series(sigs, index=grams.index, dtype="object"),
                    "simhash": pd.array(simhashes, dtype="Int64"),
                }
            )

    return F.pandas_udf(batch, "sig array<long>, simhash long")


def minhash_band_keys(sig: Column, bands: int, rows: int, prefix: str = "mh") -> Column:
    """signature -> array of band block-keys '<prefix><band>:<hash of r rows>'.

    Native: slice + xxhash64 per band. 64-bit matters at design scale:
    F.hash is 32-bit Murmur3, so 10^12 signatures per band would fold
    into 2^32 buckets (~230 unrelated records/bucket) — the collision-
    merged blocks blow past max_block_size and cap_blocks DROPS them,
    silently losing true pairs that shared the band. xxhash64 costs the
    same and is deterministic within a Spark version, which is all
    blocking needs (keys only compare to keys from the same run).
    """
    parts = [
        F.concat_ws(
            ":",
            F.lit(f"{prefix}{i}"),
            F.xxhash64(F.slice(sig, i * rows + 1, rows)).cast("string"),
        )
        for i in range(bands)
    ]
    return F.when(sig.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(*parts)
    )


def simhash_udf(bits: int = 64):
    """pandas UDF: array<long> token hashes -> long simhash over ``bits``
    bit positions (pair with simhash_band_keys at the same ``bits``).

    Charikar's scheme: per bit position, sum +-1 over token hashes; sign
    gives the bit. Output is a nullable-Int64 pd.array, never an object
    series with Nones — those round-trip through float64 and truncate
    64-bit values to 53-bit mantissas (see minhash_simhash_udf).
    """

    def batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield pd.Series(
                pd.array([_simhash_one(v, bits) for v in s], dtype="Int64")
            )

    return F.pandas_udf(batch, T.LongType())


def simhash_band_keys(
    sim: Column, bands: int = 4, bits: int = 64, prefix: str = "sh"
) -> Column:
    """64-bit simhash -> array of band keys (16-bit chunks by default).

    Two pages within Hamming distance (bands-1) share >=1 band key —
    the pigeonhole LSH used in Google's near-dup detection (Manku '07).
    Native shiftrightunsigned + mask, no Python.
    """
    width = bits // bands
    mask = (1 << width) - 1
    parts = [
        F.concat_ws(
            ":",
            F.lit(f"{prefix}{i}"),
            F.shiftrightunsigned(sim, i * width)
            .bitwiseAND(F.lit(mask).cast("long"))
            .cast("string"),
        )
        for i in range(bands)
    ]
    return F.when(sim.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(*parts)
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes — native bit_count."""
    return F.bit_count(a.bitwiseXOR(b))
