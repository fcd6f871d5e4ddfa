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
