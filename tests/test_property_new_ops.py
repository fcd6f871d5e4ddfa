"""Hypothesis property nets for the fourth-pass operators: randomized
interval sets against the naive overlap join, randomized weights against
the draw's distribution invariants, and randomized value sets against a
pure-Python HLL register reference. Example counts are small (each
example runs Spark jobs); the properties, not the volume, carry the
coverage."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=5, deadline=None)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 40)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 40)), min_size=1, max_size=12
    ),
    st.sampled_from([1.0, 3.0, 7.5, 50.0]),
)
def test_interval_join_equals_naive(spark, a_iv, b_iv, step):
    from sum_spark.operators.rangejoin import interval_join

    a = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(a_iv)],
        "a_id long, lo double, hi double",
    )
    b = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(b_iv)],
        "b_id long, lo double, hi double",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_join(a, b, step=step).select("a_id", "b_id").collect()
    )
    naive = sorted(
        (i, j)
        for i, (alo, aspan) in enumerate(a_iv)
        for j, (blo, bspan) in enumerate(b_iv)
        if alo < blo + bspan and blo < alo + aspan
    )
    assert got == naive


@settings(**SETTINGS)
@given(st.lists(st.integers(1, 9), min_size=5, max_size=30), st.integers(1, 8))
def test_weighted_draw_matches_python_reference(spark, weights, k):
    """The exact sample is reproducible from the definition alone:
    priority = min over replica md5-60 hashes, k smallest (ties by id)."""
    from sum_spark.operators.sampling import sample_weighted_k

    df = spark.createDataFrame(
        [(i, "s", w) for i, w in enumerate(weights)],
        "doc_id long, source string, weight long",
    )
    got = sorted(
        (r["doc_id"], r["pick"])
        for r in sample_weighted_k(df, k, seed="prop").collect()
    )
    pri = sorted(
        (min(_h60(f"prop:{i}:{r}") for r in range(w)), i)
        for i, w in enumerate(weights)
    )
    want = sorted((i, rank + 1) for rank, (_p, i) in enumerate(pri[:k]))
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200, unique=True))
def test_hll_registers_match_python_reference(spark, values):
    from sum_spark.operators.sketch import HLL_P, hll_sketch

    df = spark.createDataFrame([(v,) for v in values], "x long")
    got = sorted(
        (r["idx"], r["rho"]) for r in hll_sketch(df, "x", seed="prop").collect()
    )
    rem_bits = 60 - HLL_P
    regs: dict[int, int] = {}
    for v in values:
        h = _h60(f"prop:{v}")
        idx, rem = h >> rem_bits, h % (1 << rem_bits)
        rho = rem_bits + 1 if rem == 0 else rem_bits + 1 - rem.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    assert got == sorted(regs.items())


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=400),
    st.sampled_from([2, 4, 8]),
    st.sampled_from([1, 7]),
)
def test_mg_summary_guarantee_randomized(spark, stream, k, parts):
    """Misra-Gries bound under randomized streams, capacities, and
    layouts: est <= true, undercount <= n/(k+1), size <= k, and every
    item above the bound is present."""
    from collections import Counter

    from sum_spark.operators.sketch import mg_summary

    df = spark.createDataFrame(
        [(f"v{x}",) for x in stream], "item string"
    ).repartition(parts)
    got = {
        r["item"]: r["est"] for r in mg_summary(df, "item", k=k).collect()
    }
    exact = Counter(f"v{x}" for x in stream)
    n = len(stream)
    bound = n // (k + 1)
    assert len(got) <= k
    for w, true in exact.items():
        e = got.get(w, 0)
        assert e <= true
        assert true - e <= bound
        if true > bound:
            assert w in got


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(-(2**63), 2**63 - 1) | st.sampled_from(
            [-(2**63), 2**63 - 1, -(2**62), 2**62, 0, 1, -1]
        ),
        min_size=1,
        max_size=30,
        unique=True,
    ),
)
def test_assign_contiguous_ids_equals_rank_on_extreme_keys(spark, keys):
    """Property net for the monotone-bucket placement (round 10): for ANY
    unique int64 key set — INCLUDING the type's extreme values, where
    (mx - mn) exceeds int64 and a BIGINT subtraction overflows (caught by
    this test's first version; the bucketing now subtracts in
    DECIMAL(38,0)) — assign_contiguous_ids must equal the
    row_number-over-global-order rank exactly."""
    from sum_spark.operators.sampling import assign_contiguous_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(5)
    got = {
        r["k"]: r["gid"]
        for r in assign_contiguous_ids(df, ["k"], id_name="gid").collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want
