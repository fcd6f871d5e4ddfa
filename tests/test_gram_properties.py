"""Property-based tests for the duplicated n-gram operators: on arbitrary
small corpora the distributed explode/groupBy implementation must agree
with a direct Python reference computation — a stronger net than the
fixed-corpus unit tests for shingle-edge cases (short docs, repeated
grams inside one doc, all-identical corpora)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sum_spark.operators import dedup

WORDS = ["a", "b", "c", "d"]

doc = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=6)

N = 2  # shingle width under test (docs above are short)


def _ref_gram_docs(texts: list[str]) -> dict[str, set[int]]:
    """gram -> set of doc ids containing it (distinct per doc)."""
    out: dict[str, set[int]] = {}
    for i, text in enumerate(texts):
        w = text.split(" ")
        grams = {" ".join(w[j : j + N]) for j in range(len(w) - N + 1)}
        if len(w) < N:
            grams = set()
        for g in grams:
            out.setdefault(g, set()).add(i)
    return out


@settings(max_examples=10, deadline=None)
@given(corpus)
def test_duplicate_ngrams_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = dedup.duplicate_ngrams(df, n=N).collect()
    # gram_h is the engine-side portable hash; compare the
    # (first_doc, n_docs) MULTISET (two grams may share both values).
    got = sorted((r["first_doc"], r["n_docs"]) for r in rows)
    ref = sorted(
        (min(ids), len(ids))
        for ids in _ref_gram_docs(texts).values()
        if len(ids) >= 2
    )
    assert got == ref
    assert len({r["gram_h"] for r in rows}) == len(rows)  # one row per gram


@settings(max_examples=10, deadline=None)
@given(corpus)
def test_duplicated_span_stats_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    gram_docs = _ref_gram_docs(texts)
    dup_grams = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    ref = {}
    for i, text in enumerate(texts):
        w = text.split(" ")
        grams = (
            {" ".join(w[j : j + N]) for j in range(len(w) - N + 1)}
            if len(w) >= N
            else set()
        )
        if grams:
            ref[i] = (len(grams), len(grams & dup_grams))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dedup.duplicated_span_stats(df, n=N).collect()
    }
    assert got == ref
