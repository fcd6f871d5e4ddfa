"""Property-based tests (hypothesis) for the vector kernels: the Catalyst
expressions must agree with a NumPy reference implementation on arbitrary
float32 inputs — a stronger net than golden values for accumulation,
slicing, and edge-case rules."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sum_spark.functions import vector as V

finite_f32 = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, width=32
)
vec = st.lists(finite_f32, min_size=1, max_size=24)
pair = st.integers(1, 24).flatmap(
    lambda n: st.tuples(
        st.lists(finite_f32, min_size=n, max_size=n),
        st.lists(finite_f32, min_size=n, max_size=n),
    )
)


@pytest.fixture(scope="module")
def run_exprs(spark):
    """Evaluate kernel expressions for one (a, b) pair via a 1-row DataFrame."""

    def run(a, b, exprs):
        df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
        return df.select(*[e.alias(f"c{i}") for i, e in enumerate(exprs)]).first()

    return run


@settings(max_examples=25, deadline=None)
@given(pair)
def test_dot_cosine_match_numpy(run_exprs, ab):
    a, b = ab
    row = run_exprs(a, b, [V.dot("a", "b"), V.cosine("a", "b"), V.magnitude("a")])
    na = np.array(a, dtype=np.float32).astype(np.float64)
    nb = np.array(b, dtype=np.float32).astype(np.float64)
    expect_dot = float(np.dot(na, nb))
    assert row["c0"] == pytest.approx(expect_dot, rel=1e-9, abs=1e-9)
    den = float(np.linalg.norm(na) * np.linalg.norm(nb))
    expect_cos = 0.0 if den == 0.0 else expect_dot / den
    assert row["c1"] == pytest.approx(expect_cos, rel=1e-9, abs=1e-9)
    assert row["c2"] == pytest.approx(float(np.linalg.norm(na)), rel=1e-9, abs=1e-9)


@settings(max_examples=15, deadline=None)
@given(pair, st.data())
def test_range_variants_are_slices(run_exprs, ab, data):
    a, b = ab
    n = len(a)
    start = data.draw(st.integers(0, n - 1))
    end = data.draw(st.integers(start + 1, n))
    row = run_exprs(
        a, b, [V.dot_range("a", "b", start, end), V.dot_sub("a", "b", end)]
    )
    na = np.array(a[start:end], dtype=np.float32).astype(np.float64)
    nb = np.array(b[start:end], dtype=np.float32).astype(np.float64)
    assert row["c0"] == pytest.approx(float(np.dot(na, nb)), rel=1e-9, abs=1e-9)
    ma = np.array(a[:end], dtype=np.float32).astype(np.float64)
    mb = np.array(b[:end], dtype=np.float32).astype(np.float64)
    assert row["c1"] == pytest.approx(float(np.dot(ma, mb)), rel=1e-9, abs=1e-9)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 16).flatmap(
    lambda n: st.tuples(
        st.lists(st.integers(0, 1), min_size=n, max_size=n),
        st.lists(st.integers(0, 1), min_size=n, max_size=n),
    )
))
def test_jaccard_binary_definition(run_exprs, ab):
    a = [float(x) for x in ab[0]]
    b = [float(x) for x in ab[1]]
    row = run_exprs(a, b, [V.jaccard("a", "b")])
    m11 = sum(1 for x, y in zip(a, b) if x == 1.0 and y == 1.0)
    m10 = sum(1 for x, y in zip(a, b) if x + y == 1.0)
    expect = 0.0 if m11 + m10 == 0 else m11 / (m11 + m10)
    assert row["c0"] == pytest.approx(expect, abs=1e-12)


@settings(max_examples=10, deadline=None)
@given(vec)
def test_cosine_self_similarity(run_exprs, a):
    row = run_exprs(a, a, [V.cosine("a", "b")])
    mag = math.sqrt(sum(float(np.float32(x)) ** 2 for x in a))
    expect = 0.0 if mag == 0.0 else 1.0
    assert row["c0"] == pytest.approx(expect, rel=1e-9, abs=1e-9)
