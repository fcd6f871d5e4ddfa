"""BPE train/apply (operators/bpe): the classic textbook example,
determinism, apply==train segmentation, and compression monotonicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import bpe
from sum_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def classic(spark):
    # The Sennrich et al. example corpus as documents with repetition
    # encoded by duplication: low x5, lower x2, newest x6, widest x3.
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")


def test_classic_merges(classic):
    counts = bpe.word_counts(classic)
    got = {r["word"]: r["cnt"] for r in counts.collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(counts, num_merges=4)
    # First merges of the classic example: ('e','s') 9, ('es','t') 9,
    # ('est','▁') 9, then ('l','o') 7.
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.END)
    assert merges[3] == ("l", "o")


def test_encode_matches_training_segmentation(classic):
    counts = bpe.word_counts(classic)
    # After exactly the first 3 merges, 'newest' segments as n e w est▁.
    out3 = bpe.bpe_encode(classic, bpe.train_bpe(counts, num_merges=3)).collect()[0]
    assert " ".join(["n", "e", "w", "est" + bpe.END]) in out3["pieces"]
    merges = bpe.train_bpe(counts, num_merges=10)
    out = bpe.bpe_encode(classic, merges).collect()[0]
    pieces = out["pieces"].split(" ")
    assert out["n_words"] == 16
    # Round-trip: concatenating pieces and splitting on the sentinel
    # reconstructs the original words.
    rebuilt = "".join(pieces).split(bpe.END)[:-1]
    assert rebuilt == ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def test_training_is_deterministic_and_layout_proof(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    c1 = bpe.word_counts(docs)
    c2 = bpe.word_counts(docs.repartition(13))
    m1 = bpe.train_bpe(c1, num_merges=30)
    m2 = bpe.train_bpe(c2, num_merges=30)
    assert m1 == m2 and len(m1) == 30


def test_more_merges_never_increase_piece_count(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    counts = bpe.word_counts(docs)
    totals = []
    for k in (0, 10, 40):
        merges = bpe.train_bpe(counts, num_merges=k)
        t = bpe.bpe_encode(docs, merges).agg(F.sum("n_pieces")).collect()[0][0]
        totals.append(t)
    assert totals[0] >= totals[1] >= totals[2]


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(bpe.word_counts(df), num_merges=5)
    got = {r["doc_id"]: r for r in bpe.bpe_encode(df, merges).collect()}
    assert (got[1]["n_words"], got[1]["n_pieces"]) == (0, 0)
    assert got[2]["n_words"] == 1  # split('') -> [''] -> one sentinel piece
    assert got[3]["pieces"].endswith(bpe.END)


def test_vocab_guard(spark):
    big = spark.range(0, 100).select(
        F.concat(F.lit("w"), F.col("id")).alias("word"), F.lit(1).alias("cnt")
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe.train_bpe(big, num_merges=1, max_vocab_rows=50)


def test_train_bpe_distributed_matches_collected(spark):
    """VERDICT r7 #5: the distributed trainer (per-merge Spark pair
    aggregation + TakeOrdered-1 argmax; the driver never sees the
    vocabulary) produces EXACTLY the collected trainer's merge list —
    same integer counts, same lexicographic tie-break (Spark UTF8
    binary order == Python code-point order), same left-to-right
    non-overlapping apply — and is layout-proof."""
    import sum_spark.operators.bpe as bpe

    docs = spark.createDataFrame(
        [
            (1, "low low low low low lower lower newest newest"),
            (2, "newest newest newest newest widest widest widest"),
            (3, "aaaa aa a baba ba  x"),  # double space -> empty token
            (4, None),
        ],
        "doc_id long, text string",
    )
    counts = bpe.word_counts(docs)
    m_ref = bpe.train_bpe(counts, num_merges=25)
    m_dist = bpe.train_bpe_distributed(counts, num_merges=25)
    assert m_dist == m_ref and len(m_ref) > 5
    # layout-proof: a different partitioning trains the same table
    m_dist13 = bpe.train_bpe_distributed(counts.repartition(13), num_merges=25)
    assert m_dist13 == m_ref


def test_train_bpe_distributed_random_corpora_property(spark):
    """Randomized equality net for the distributed trainer: over several
    seeded corpora with adversarial shapes (repeated chars, shared
    prefixes/suffixes, unicode, empties), the distributed merge list
    must equal the collected one exactly."""
    import random

    import sum_spark.operators.bpe as bpe

    rng = random.Random(61)
    alpha = "abcdeé世"
    for trial in range(3):
        words = []
        for _ in range(40):
            n = rng.randrange(0, 7)
            words.append("".join(rng.choice(alpha) for _ in range(n)))
        words += ["aaaa", "aaa", "abab", "baba", ""]
        docs = spark.createDataFrame(
            [(i, " ".join(rng.choices(words, k=12))) for i in range(8)],
            "doc_id long, text string",
        )
        counts = bpe.word_counts(docs)
        m_ref = bpe.train_bpe(counts, num_merges=15)
        m_dist = bpe.train_bpe_distributed(counts, num_merges=15)
        assert m_dist == m_ref, f"trial {trial}: {m_dist} != {m_ref}"
