"""Portable deterministic hashing — identical results in Spark SQL and
DuckDB SQL, which is what makes the MinHash/SimHash/fingerprint operators
oracle-checkable value-for-value.

The trick: both engines expose md5() returning the same lowercase hex
string, and both can parse a hex prefix into a BIGINT
(Spark: conv(hex, 16, 10) cast bigint; DuckDB: CAST('0x'||hex AS BIGINT)).
A 15-hex-char prefix is 60 bits — always inside signed-64 range.

MinHash permutations are the classic universal-hash family
h_i(x) = (a_i * x + b_i) mod p with p prime. To keep a_i * x inside
signed-64 arithmetic in *both* engines we hash shingles to 32 bits and
draw a_i < 2^31: (2^31)*(2^32) < 2^63.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# 32-bit universal-hash modulus (largest prime < 2^32).
MINHASH_P = 4294967291
NUM_PERM = 64  # signature length
LSH_BANDS = 16  # 16 bands x 4 rows; P(candidate | s=0.8) = 1-(1-0.8^4)^16 ≈ 0.9998
LSH_ROWS = 4

_rng = random.Random(0x5CA1AB1E)
# (a, b) pairs for the 64 permutations; a in [1, 2^31), b in [0, p).
MINHASH_PARAMS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 31), _rng.randrange(0, MINHASH_P)) for _ in range(NUM_PERM)
]

SIMHASH_BITS = 60  # bits of the md5-prefix hash used for simhash


def hash60(c: Column) -> Column:
    """60-bit positive BIGINT hash of a string column (md5-prefix based).

    Spark-side twin of DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash32(c: Column) -> Column:
    """32-bit positive BIGINT hash (md5 8-hex-char prefix)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """Spark-SQL string form of :func:`hash60` — for builders that batch
    a projection into ONE expr string (a transform lambda costs ~10 py4j
    round trips as a Column; the parsed string costs one)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def hash32_sql(expr: str) -> str:
    """Spark-SQL string form of :func:`hash32`."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def duck_hash60(expr: str) -> str:
    """DuckDB SQL for hash60 of an expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def duck_hash32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def minhash_signature(shingle_hashes: Column) -> Column:
    """64-element MinHash signature over an array<long> of 32-bit shingle
    hashes. Pure Catalyst: per permutation, array_min of an affine rehash —
    stays in whole-stage codegen, no shuffle, no Python.
    """
    # ONE fold over the shingle hashes carrying all 64 minima as the
    # accumulator array; the permutation params live in two literal arrays
    # indexed inside the lambda. Expression size is O(1) instead of O(64)
    # — 64 separate aggregate subtrees blow past whole-stage-codegen
    # limits and fall back to interpreted evaluation, which then gets
    # re-evaluated per join branch (measured 10-70s swings at sf0.1).
    # one expr string each: 2 x 64 literal Columns cost ~250 py4j round
    # trips per signature projection build (same literal nodes)
    a_lits = F.expr(
        "array(" + ", ".join(f"{a}L" for a, _ in MINHASH_PARAMS) + ")"
    )
    b_lits = F.expr(
        "array(" + ", ".join(f"{b}L" for _, b in MINHASH_PARAMS) + ")"
    )
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), NUM_PERM)
    return F.aggregate(
        shingle_hashes,
        init,
        lambda acc, h: F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (F.element_at(a_lits, i + 1) * h + F.element_at(b_lits, i + 1))
                % F.lit(MINHASH_P),
            ),
        ),
    )


def minhash_signature_pandas(shingle_hashes: Column) -> Column:
    """Arrow-vectorized twin of :func:`minhash_signature` — identical
    integers (same (a, b) params, same modulus), computed as one NumPy
    broadcast per document instead of an interpreted Catalyst fold.

    The fold form never enters whole-stage codegen (higher-order functions
    are interpreted), so at 64 permutations it dominates the MinHash
    pipeline; the Arrow batch path is ~5-10x faster and keeps the
    signature oracle-checkable value-for-value. No overflow: a < 2^31 and
    h < 2^32, so a*h + b < 2^63 stays inside int64 in both engines.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    a_np = np.array([a for a, _ in MINHASH_PARAMS], dtype=np.int64)
    b_np = np.array([b for _, b in MINHASH_PARAMS], dtype=np.int64)

    def _sig(shash):
        out = []
        for h in shash:
            hv = np.asarray(h, dtype=np.int64)
            if hv.size == 0:
                out.append(np.full(NUM_PERM, MINHASH_P, dtype=np.int64))
                continue
            out.append(((hv[:, None] * a_np[None, :] + b_np[None, :]) % MINHASH_P).min(axis=0))
        return pd.Series(out)

    # Explicit (non-string) annotations: `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature introspection cannot resolve against local imports.
    _sig.__annotations__ = {"shash": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "array<long>")(shingle_hashes)


def duck_minhash_select(hash_col: str, doc_col: str, rel: str) -> str:
    """DuckDB SQL producing (doc, perm_id, minhash) from a relation of
    (doc, shingle-hash32) rows — the oracle-side twin of
    ``minhash_signature``. Uses a VALUES list of the same (a, b) params.
    """
    values = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS))
    return f"""
    SELECT {doc_col} AS doc, p.i AS perm, MIN((p.a * {hash_col} + p.b) % {MINHASH_P}) AS mh
    FROM {rel}, (VALUES {values}) AS p(i, a, b)
    GROUP BY {doc_col}, p.i
    """


_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 (Cyan4973's public xxHash, the algorithm Spark's
    ``F.xxhash64`` implements), UNSIGNED 64-bit result. Seed defaults to
    42 — Spark's fixed seed — so ``xxh64(s.encode()) & (2**64-1)`` equals
    ``xxhash64(lit(s))`` reinterpreted unsigned (parity-pinned in
    tests/test_sql_functions.py).

    Exists so DRIVER-side planning can compute engine-internal xxhash64
    partition keys (inverted-index term buckets, LSH band keys) without
    paying a Spark job per lookup: bm25_from_index's bucket pruning used
    a createDataFrame+distinct+collect round trip per query build. Never
    use for oracle-checked values — portable hashing is md5-based
    (hash60) by the CLAUDE.md rule; this is the internal-key path only."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _M64
        v2 = (seed + _XXH_P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXH_P1) & _M64
        while i + 32 <= n:
            v1 = (_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            h = ((h * _XXH_P1) + _XXH_P4) & _M64
    else:
        h = (seed + _XXH_P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((k * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
        h = ((_rotl64(h, 27) * _XXH_P1) + _XXH_P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXH_P1) & _M64
        h = ((_rotl64(h, 23) * _XXH_P2) + _XXH_P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _M64
        h = (_rotl64(h, 11) * _XXH_P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXH_P2) & _M64
    h ^= h >> 29
    h = (h * _XXH_P3) & _M64
    h ^= h >> 32
    return h


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed-64 xxh64 of a string's UTF-8 bytes — bit-equal to Spark's
    ``F.xxhash64(string_col)``."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def lsh_params(
    n_hashes: int = LSH_BANDS * LSH_ROWS,
    threshold: float = 0.5,
    min_recall: float = 0.99,
):
    """Choose (bands, rows) for a VERIFIED banded-LSH pipeline targeting
    a Jaccard ``threshold``: among factorizations b*r = n_hashes whose
    candidate recall at the threshold, P(candidate|s=t) = 1-(1-t^r)^b
    (the standard banding analysis, Mining of Massive Datasets ch. 3),
    meets ``min_recall``, pick the one with the LEAST false-positive
    mass (integral of P(candidate|s) below t).

    The asymmetric objective is the point: in shingle->band->verify
    pipelines (dedup_minhash_lsh) every candidate is re-checked with the
    EXACT Jaccard, so a false positive only costs compute, while a false
    negative — a true near-dup pair that never shares a bucket — is
    unrecoverable. Recall is therefore a constraint, not a term to trade
    away; a symmetric error-mass objective would happily buy precision
    with missed duplicates. This reproduces the shipped LSH_BANDS x
    LSH_ROWS = 16x4 at t=0.8 and prescribes wider/shallower bands (32x2)
    for looser thresholds. Pure driver arithmetic — call it once, then
    build the band projection with the chosen shape. Returns
    (bands, rows, recall_at_t, fp_mass). Falls back to the max-recall
    factorization if none meets ``min_recall`` (tiny n_hashes).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    grid = [i / 200.0 for i in range(1, 200)]
    qualifying = None
    fallback = None
    for rows in range(1, n_hashes + 1):
        if n_hashes % rows:
            continue
        bands = n_hashes // rows
        recall = 1.0 - (1.0 - threshold**rows) ** bands
        fp = sum(
            (1.0 - (1.0 - s**rows) ** bands) / 200.0
            for s in grid
            if s < threshold
        )
        if fallback is None or recall > fallback[0]:
            fallback = (recall, bands, rows, fp)
        if recall >= min_recall and (qualifying is None or fp < qualifying[3]):
            qualifying = (recall, bands, rows, fp)
    recall, bands, rows, fp = qualifying or fallback
    return bands, rows, recall, fp
