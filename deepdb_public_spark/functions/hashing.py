"""Hash-family column functions: MinHash signatures, SimHash, LSH band
keys (extension surface, SURVEY.md §7.6).

Everything is built from `xxhash64` + higher-order array functions, so
signature computation is embarrassingly parallel JVM work — no Python,
no shuffle. The shuffle happens only once, at the band-bucket join in
operators/dedup.py, which is the scale-correct place for it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """array<string|bigint> shingles -> array<bigint> of length
    n_hashes. Signature element i = min over shingles of
    h_i(s) = xxhash64(i, s) — multi-argument xxhash64 with the
    permutation index as the first operand works for string or
    already-hashed bigint shingles with no string building.

    Measured note: an affine universal family over one base hash
    ((a·x+b) mod 2^31-1) was tried and is SLOWER here — per-element
    HOF work is interpreted either way, and xxhash64 on a bigint is a
    cheap JVM intrinsic while the affine form costs a multiply plus
    two pmods per element. Empty shingle sets yield null elements
    (callers filter empty docs first).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def band_keys(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Split a signature into bands and hash each band to one bigint
    key -> array<struct<band:int, key:bigint>>. Two documents agreeing
    on ANY band land in the same LSH bucket.

    Band geometry is known at plan-build time, so each band key is a
    single multi-argument xxhash64 over its signature elements
    (literal indices) — no string building, no per-element lambdas."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[
                        F.element_at(signature, b * rows_per_band + j + 1)
                        for j in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def portable_hash64(col: Column) -> Column:
    """Engine-portable 64-bit token hash: first 8 bytes of md5,
    big-endian, as a SIGNED bigint.

    Spark: conv(hex_prefix, 16, -10) — the negative toBase makes conv
    interpret the 64-bit value as two's complement, so no overflow
    under ANSI mode. DuckDB reproduces it bit-for-bit as
    ('0x' || substr(md5(t), 1, 16))::UBIGINT wrapped to signed via a
    HUGEINT subtract — the same md5-prefix determinism trick the
    split/decontamination oracles use (x23/x47). md5 costs ~2x
    xxhash64 per token, but token hashing is a small slice of the one
    simhash aggregate pass and this keeps the whole simhash +
    pigeonhole pipeline oracle-checkable cross-engine."""
    return F.conv(F.substring(F.md5(col), 1, 16), 16, -10).cast("long")


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array -> bigint.

    For each bit j: sum over tokens of (+1 if bit j of
    portable_hash64(token) else -1); bit j of the output is 1 iff the
    sum is positive. Near-duplicate documents differ in few bits
    (small Hamming distance). The token hash is the md5-derived
    portable_hash64 (not xxhash64) so DuckDB can replay the exact
    signature — see portable_hash64's docstring for the cost
    trade-off. Bits fold most-significant-first via acc*2+bit in two
    32-bit halves joined with shiftleft|or — a plain 64-bit fold would
    trip ANSI-mode overflow on the sign bit.

    ONE aggregate pass with a 64-long accumulator, not 64 aggregates:
    lambda bodies are inlined per use site, so a per-bit aggregate
    over a shared `transform(tokens, xxhash64)` expression would
    recompute every token hash 64 times (HOF lambdas are interpreted
    — no common-subexpression elimination across them). The
    single-element transform below binds each token's hash to a
    lambda variable, forcing exactly one xxhash64 per token.
    """
    seq64 = F.sequence(F.lit(63), F.lit(0), F.lit(-1))
    # counts[j] = number of tokens with bit j set, in ONE pass;
    # element_at(transform(array(h0), λh ...), 1) = let-binding for h0
    counts = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.element_at(
                F.transform(
                    F.array(portable_hash64(t)),
                    lambda h: F.transform(
                        seq64, lambda j: F.bit_get(h, j).cast("long")
                    ),
                ),
                1,
            ),
            lambda a, b: a + b,
        ),
    )
    # sum of (2*bit - 1) over n tokens is positive iff 2*count > n
    n_tok = F.size(tokens).cast("long")
    bits = F.transform(
        counts,
        lambda c: F.when(c * 2 > n_tok, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )

    def fold(part):
        return F.aggregate(part, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)

    hi, lo = fold(F.slice(bits, 1, 32)), fold(F.slice(bits, 33, 32))
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_block_keys(sig: Column, n_blocks: int = 4) -> Column:
    """Split the 64-bit simhash into n_blocks contiguous bit blocks ->
    array<struct<block:int, key:bigint>>. Pigeonhole: two signatures
    within Hamming distance (n_blocks - 1) agree on at least one
    block, so block-equality buckets are a complete candidate filter
    for distance <= n_blocks - 1.

    When n_blocks does not divide 64 the top 64 - n_blocks*width bits
    are excluded from every key. That only WIDENS buckets (differing
    bits there affect no key, adding candidate collisions); it never
    drops a qualifying pair, so completeness is preserved."""
    width = 64 // n_blocks
    mask = (1 << width) - 1
    # n_blocks is a plain int -> unroll on the driver (shift amounts
    # must be Python ints for shiftrightunsigned)
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.shiftrightunsigned(sig, b * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_blocks)
        ]
    )
