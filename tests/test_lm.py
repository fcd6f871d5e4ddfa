"""Bigram-LM quality scoring (operators/lm): hand-computed NLLs, the
train/apply split, and degenerate-document contracts. The cross-engine
value check is the text_profile entry's n_bigrams/nll_micro columns."""

from __future__ import annotations

import math

import pytest

from sum_spark.operators import lm


def _nl(p: float) -> int:
    return int(math.floor(-math.log(p) * 1_000_000 + 0.5))


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z"), (4, None)],
        "doc_id long, text string",
    )


def test_self_scored_nll_matches_hand_computation(tiny):
    # Corpus bigrams: (a,b) x3, (b,a) x1. c1: a=3, b=1. V = {a,b,z} = 3.
    # p(b|a) = (3+1)/(3+3), p(a|b) = (1+1)/(1+3).
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro"]) for r in lm.score_self(tiny).collect()}
    pab, pba = 4 / 6, 2 / 4
    assert got[1] == (3, 2 * _nl(pab) + _nl(pba))
    assert got[2] == (1, _nl(pab))
    assert got[3] == (0, 0)  # single word: no bigram
    assert got[4] == (0, 0)  # NULL text
    assert set(got) == {1, 2, 3, 4}


def test_train_apply_split_smooths_unseen(spark, tiny):
    counts, v = lm.bigram_lm(tiny)
    assert v == 3
    probe = spark.createDataFrame(
        [(10, "a b"), (11, "a q"), (12, "q q")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["nll_micro"] for r in lm.lm_score(probe, counts, v).collect()}
    assert got[10] == _nl(4 / 6)  # seen bigram
    assert got[11] == _nl(1 / 6)  # seen w1 'a' (c1=3), unseen bigram: 1/(3+3)
    assert got[12] == _nl(1 / 3)  # unseen w1: 1/V
    # Unseen continuations are less likely than attested ones.
    assert got[11] > got[10]


def test_gibberish_scores_worse_than_formulaic_text(spark):
    formulaic = [(i, "the cat sat on the mat") for i in range(20)]
    gibberish = [(100 + i, f"zq{i}x vbn{i} wpl{i}k qrs{i}t jfd{i}m js{i}w") for i in range(3)]
    df = spark.createDataFrame(formulaic + gibberish, "doc_id long, text string")
    got = {r["doc_id"]: (r["nll_micro"], r["n_bigrams"]) for r in lm.score_self(df).collect()}
    mean = {k: v[0] / v[1] for k, v in got.items() if v[1]}
    worst_formulaic = max(mean[k] for k in mean if k < 100)
    best_gibberish = min(mean[k] for k in mean if k >= 100)
    assert best_gibberish > worst_formulaic


def test_layout_invariance(spark, sf_smoke):
    from sum_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    a = sorted(map(tuple, lm.score_self(docs).collect()))
    b = sorted(map(tuple, lm.score_self(docs.repartition(17)).collect()))
    assert a == b  # integer micro-nat sums are partition-order-proof
