"""Hashing / fingerprinting expression builders.

Two families:
  * xxhash64-based (JVM-native, codegen'd) — the production/scale path
    for MinHash, SimHash, bucketing. `xxhash64` is seeded by prefixing
    a literal permutation index, giving k independent hash functions
    without leaving the JVM.
  * polynomial character hashes — slower (materializes a char array)
    but defined purely in arithmetic both Spark AND other SQL engines
    can evaluate identically, used where a cross-engine-deterministic
    fingerprint is required (differential testing).

Spark-version dependency (ADVICE r13): the pure-Python twins below
(`xxh64_*_py`, `hashed_py`, and the split/ascii semantics they bake
in — `split(c, '')` yielding no trailing empty element, `ascii()` =
code point, Spark's XXH64 tail/length handling) replicate the pinned
Spark 4.1.2 behavior bit-for-bit. A Spark version bump could silently
diverge on inputs outside the test corpus: the JVM-equivalence tests
in tests/test_dedup.py are a MANDATORY gate for any upgrade.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = 2147483647  # 2^31 - 1


def shingles(col: Column | str, k: int = 5) -> Column:
    """All k-character shingles of a string as array<string>.

    Built from sequence+transform — stays in codegen, no UDF. Empty /
    short strings yield an empty array.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(0))
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k))
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (space-joined) from a whitespace-tokenized string.

    Implementation note: built as a zip_with chain over k SHIFTED
    SLICES of the token array, not `transform(sequence(i), slice(toks,
    i, k))`. Higher-order-function lambdas are interpreted per element,
    so a lambda body that references `split(...)` re-tokenizes the
    whole document once per shingle — O(L²). The slice form evaluates
    the split k times total: O(k·L).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))

    def shifted(j: int) -> Column:
        return F.slice(toks, j + 1, n)

    acc = shifted(0)
    for j in range(1, k):
        acc = F.zip_with(acc, shifted(j), lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(acc)


def hashed(col: Column, seed: int) -> Column:
    """One of a family of independent 64-bit hashes (JVM xxhash64,
    'seeded' by a literal prefix column)."""
    return F.xxhash64(F.lit(seed), col)


def minhash_signature(shingle_arr: Column, num_perm: int = 64) -> Column:
    """MinHash signature: array of num_perm minima of per-permutation
    shingle hashes. Entirely expression-level (transform + array_min
    over the shingle array) — no UDF, no shuffle; evaluated row-local.

    Empty shingle arrays yield nulls in every slot (callers filter).

    Implementation note: ONE `aggregate` pass with an array<long>
    accumulator (acc[i] = running min of hash_i), not num_perm
    independent `array_min(transform(...))` subtrees — the latter
    duplicates the shingle-array expression num_perm times and
    CollapseProject re-inlines it even if the caller materialized it
    as a column, turning O(|shingles|·k) into O(|shingles|·k²).
    """
    max_long = (1 << 63) - 1
    init = F.array_repeat(F.lit(max_long).cast("long"), num_perm)
    sig = F.aggregate(
        shingle_arr,
        init,
        lambda acc, s: F.array(
            *[F.least(acc[i], hashed(s, i)) for i in range(num_perm)]
        ),
    )
    nulls = F.array(*[F.lit(None).cast("long") for _ in range(num_perm)])
    return F.when(F.size(shingle_arr) == 0, nulls).otherwise(sig)


# affine permutation constants for the cross-engine MinHash family
# h_i(x) = (a*x + b) mod MERSENNE_31 — any fixed a≠0 works (p prime)
MINHASH_AFFINE: list[tuple[int, int]] = [
    (3, 101), (5, 211), (7, 307), (11, 401),
    (13, 503), (17, 601), (19, 701), (23, 809),
]


def poly_hash(col: Column, modulus: int = MERSENNE_31) -> Column:
    """Cross-engine base hash of a string (see char_fingerprint)."""
    return char_fingerprint(col, modulus)


def minhash_signature_xengine(
    shingle_arr: Column, num_perm: int = 8, modulus: int = MERSENNE_31
) -> Column:
    """MinHash signature computed ONLY from arithmetic any SQL engine
    reproduces bit-for-bit: polynomial char hash per shingle, then
    per-permutation affine maps, min over shingles. Slower than the
    xxhash64 family (`minhash_signature`) — use for differential
    testing, not the 100 TB path."""
    if num_perm > len(MINHASH_AFFINE):
        raise ValueError(f"num_perm ≤ {len(MINHASH_AFFINE)} for the x-engine family")
    # one aggregate pass over the (once-evaluated) poly-hash array:
    # the char-level hash runs once per shingle, the cheap affine maps
    # run num_perm times per shingle (see minhash_signature note)
    hs = F.transform(shingle_arr, lambda s: poly_hash(s, modulus))
    max_long = (1 << 63) - 1
    init = F.array_repeat(F.lit(max_long).cast("long"), num_perm)
    sig = F.aggregate(
        hs,
        init,
        lambda acc, h: F.array(
            *[
                F.least(acc[i], (F.lit(a) * h + F.lit(b)) % modulus)
                for i, (a, b) in enumerate(MINHASH_AFFINE[:num_perm])
            ]
        ),
    )
    nulls = F.array(*[F.lit(None).cast("long") for _ in range(num_perm)])
    return F.when(F.size(shingle_arr) == 0, nulls).otherwise(sig)


def rolling_hash(
    col: Column | str, base: int = 257, modulus: int = MERSENNE_31
) -> Column:
    """Rabin–Karp polynomial rolling hash of a string, mod a Mersenne
    prime: h = Σ ascii(s_i)·base^(L−i) mod p, folded as
    acc = (acc·base + ascii) per char.

    Cross-engine-deterministic (pure integer arithmetic; DuckDB:
    `list_reduce` over `string_split(s, '')`) AND well-mixed — unlike
    `char_fingerprint`'s cyclic position weights, every output bit
    avalanches, so it can seed per-bit constructions (SimHash votes).
    base=257/131 give two quasi-independent families. Intermediate
    acc·base < 2^39 — safe under ANSI overflow checking.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch).cast("long")) % modulus,
    )


def simhash_token_hash_xengine(col: Column | str) -> Column:
    """62-bit cross-engine token hash for SimHash: two independent
    31-bit rolling-hash families packed as lo | (hi << 31). Per-bit
    majority votes over this value reproduce bit-for-bit in any SQL
    engine (see workload q25b's oracle); one 31-bit family alone
    leaves SimHash bits too correlated on a shared-vocabulary corpus
    (measured: 14.7k vs 1.1k near-dup pairs at hamming ≤ 3, sf0.01).

    Both families fold in ONE aggregate pass (struct accumulator) —
    higher-order lambdas are interpreted per element, so two separate
    `rolling_hash` calls would double the per-char interpretation cost
    and re-split the string.
    """
    c = F.col(col) if isinstance(col, str) else col
    zero = F.lit(0).cast("long")
    acc0 = F.struct(zero.alias("a"), zero.alias("b"))
    folded = F.aggregate(
        F.split(c, ""),
        acc0,
        lambda acc, ch: F.struct(
            ((acc["a"] * 257 + F.ascii(ch).cast("long")) % MERSENNE_31).alias("a"),
            ((acc["b"] * 131 + F.ascii(ch).cast("long")) % MERSENNE_31).alias("b"),
        ),
    )
    return folded["a"] + F.shiftleft(folded["b"], 31)


def char_fingerprint(col: Column | str, modulus: int = MERSENNE_31) -> Column:
    """Order-weighted character-sum fingerprint:

        sum_i ascii(s[i]) * (1 + (i-1) % 64)   (mod modulus)

    Pure arithmetic over (position, char-code) — any SQL engine
    computes the identical value, so it serves as the cross-engine
    document fingerprint in differential tests. For production-scale
    fingerprinting prefer `hashed` (xxhash64).
    """
    c = F.col(col) if isinstance(col, str) else col
    # transform over split('') with the two-arg (element, index) lambda
    # instead of indexing substr(c, i, 1) per position: same values
    # (ascii('') = 0 covers the empty-string edge; verified
    # bit-identical), ~25% faster — no per-char substring allocation,
    # and the lambda no longer closes over the whole string column.
    terms = F.transform(
        F.split(c, ""),
        lambda ch, i: F.ascii(ch).cast("long") * (F.lit(1) + (i % 64)),
    )
    return (
        F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x) % modulus
    )


# ---------------------------------------------------------------------------
# Pure-Python ports of the two SimHash token-hash families, for the
# Arrow-batched signature path (operators.dedup.with_simhash). Each is
# equivalence-tested against its JVM expression on the real corpus and
# adversarial unicode (tests/test_dedup.py) — the port is a
# PERFORMANCE twin, never an alternative definition: the JVM
# expression stays the contract.
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def _xx_round(acc: int, x: int) -> int:
    return (_rotl64((acc + x * _XXP2) & _M64, 31) * _XXP1) & _M64


def xxh64_int_py(value: int, seed: int) -> int:
    """Spark `XXH64.hashInt` (catalyst xxhash64 over an INT field)."""
    h = (seed + _XXP5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _XXP1) & _M64
    h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
    return _xx_fmix(h)


def xxh64_bytes_py(data: bytes, seed: int) -> int:
    """Spark `XXH64.hashUnsafeBytes` (catalyst xxhash64 over a STRING
    field's UTF-8 bytes; little-endian word reads, the JVM layout)."""
    length = len(data)
    off, end = 0, length
    if length >= 32:
        limit = end - 32
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while True:
            v1 = _xx_round(v1, int.from_bytes(data[off:off + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[off + 8:off + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[off + 16:off + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
            if off > limit:
                break
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
             + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xx_round(0, v)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + length) & _M64
    while off + 8 <= end:
        h ^= _xx_round(0, int.from_bytes(data[off:off + 8], "little"))
        h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
        off += 8
    if off + 4 <= end:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        off += 4
    while off < end:
        h ^= (data[off] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        off += 1
    return _xx_fmix(h)


def hashed_py(token: str, seed: int) -> int:
    """Pure-Python twin of `hashed(col, seed)` =
    `F.xxhash64(F.lit(seed), col)`: catalyst chains fields with the
    running hash as the next field's seed, starting at 42."""
    h = xxh64_int_py(seed, 42)
    h = xxh64_bytes_py(token.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h  # as signed long


def simhash_token_hash_xengine_py(token: str) -> int:
    """Pure-Python twin of `simhash_token_hash_xengine`: the same two
    rolling-hash folds over the token's code points. Spark's
    `split(c, '')` yields one code point per element and `ascii`
    returns its code point, which is exactly Python `ord`."""
    a = b = 0
    for ch in token:
        cp = ord(ch)
        a = (a * 257 + cp) % MERSENNE_31
        b = (b * 131 + cp) % MERSENNE_31
    return a + (b << 31)


def poly_hash_py(s: str, modulus: int = MERSENNE_31) -> int:
    """Pure-Python twin of `poly_hash` / `char_fingerprint`:
    sum_i ord(s[i]) * (1 + (i % 64)), i 0-based (the two-arg transform
    index), mod at the END (the JVM aggregate folds unreduced — longs
    cannot overflow below ~2^37 chars)."""
    acc = 0
    for i, ch in enumerate(s):
        acc += ord(ch) * (1 + (i & 63))
    return acc % modulus
