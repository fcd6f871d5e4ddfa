"""MLlib interop: VectorUDT converters round-trip, and the estimator-based
LSH dedup forms agree with the engine's exact operators on planted
duplicates (the north-star's stated MLlib route must be reachable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.functions.mllib import (
    dedup_minhash_mllib,
    from_mllib_vectors,
    neardup_cosine_mllib,
    to_mllib_vectors,
)
from sum_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup of 1
        (4, "completely different words entirely unrelated content here now"),
        (5, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vector_roundtrip(spark):
    from pyspark.ml.linalg import DenseVector

    df = spark.createDataFrame(
        [(1, [1.0, 2.5, -3.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    as_vec = to_mllib_vectors(df)
    row = as_vec.orderBy("vec_id").first()
    assert isinstance(row["embedding"], DenseVector)
    back = from_mllib_vectors(as_vec, dtype="float64").orderBy("vec_id").collect()
    assert back[0]["embedding"] == [1.0, 2.5, -3.0]
    assert back[1]["embedding"] == [0.0, 0.0, 0.0]


def test_minhash_mllib_recall_vs_exact(corpus):
    """Every pair the exact operator certifies must be recalled by the
    MLlib estimator at the same threshold on this planted corpus (the
    dups sit at s in {0.5, 1.0} — far above the 16-table miss floor),
    and the estimator must not invent pairs below threshold."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(corpus, threshold=0.5).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_mllib(corpus, threshold=0.5).collect()
    }
    assert set(exact) <= set(ml)
    for pair, j in ml.items():
        assert j >= 0.5 - 1e-9
        if pair in exact:
            # identical Jaccard values (HashingTF collisions are ~0 here)
            assert abs(j - exact[pair]) < 1e-6


def test_brp_cosine_recall_vs_exact(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.random(16)
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base * 2.0]),  # same direction, cos=1
        (3, [float(x) for x in base + 0.01]),  # near dup
        (4, [float(x) for x in rng.random(16)]),
        (5, [0.0] * 16),  # zero vector: never crosses
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup.dedup_embedding_cosine(df, threshold=0.98).collect()
    }
    ml = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in neardup_cosine_mllib(df, threshold=0.98).collect()
    }
    assert set(exact) <= set(ml)  # estimator recalls every certified pair
    for pair in exact:
        assert abs(ml[pair] - exact[pair]) < 1e-3
    assert all(5 not in p for p in ml)
