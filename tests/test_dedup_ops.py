"""Unit tests for dedup operators on synthetic corpora with known
duplicates (the driver tables contain near-dups but no exact dups)."""

from __future__ import annotations

import pytest

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


def test_dedup_exact_groups(corpus):
    out = {r["keep_id"]: r["n_dups"] for r in dedup.dedup_exact(corpus).collect()}
    assert out[1] == 3  # docs 1, 2, 5
    assert out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_exact_and_near(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(corpus, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 5)] == 1.0 and pairs[(2, 5)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_matches_exact(corpus):
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_minhash_lsh(corpus, threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(corpus, threshold=0.5).collect()
    }
    assert lsh == exact  # planted dups sit far above the LSH miss floor


def test_simhash_identical_docs_distance_zero(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in dedup.dedup_simhash(corpus, max_dist=3).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0 and pairs[(2, 5)] == 0
    assert not any(4 in p for p in pairs)
