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


def _ref_span_removal(texts: list[str], n: int = N) -> dict[int, str]:
    """Direct Python reference of remove_duplicate_spans."""
    gram_docs = _ref_gram_docs_positional(texts, n)
    dup = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    out = {}
    for i, text in enumerate(texts):
        w = text.split(" ")
        covered = set()
        for j in range(max(0, len(w) - n + 1)):
            if " ".join(w[j : j + n]) in dup:
                covered.update(range(j, j + n))
        out[i] = " ".join(t for j, t in enumerate(w) if j not in covered)
    return out


def _ref_gram_docs_positional(texts: list[str], n: int = N) -> dict[str, set[int]]:
    out: dict[str, set[int]] = {}
    for i, text in enumerate(texts):
        w = text.split(" ")
        for j in range(max(0, len(w) - n + 1)):
            out.setdefault(" ".join(w[j : j + n]), set()).add(i)
    return out


@settings(max_examples=10, deadline=None)
@given(corpus)
def test_remove_duplicate_spans_matches_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.remove_duplicate_spans(df, n=N).collect()
    }
    ref = _ref_span_removal(texts, N)
    assert set(got) == set(range(len(texts)))
    for i, text in enumerate(texts):
        w = text.split(" ")
        nt, nr, clean = got[i]
        assert nt == len(w)
        assert clean == ref[i]
        # conservation: removed + kept == total. ('' is ambiguous between
        # "all removed" and "kept one empty token" — derive kept from the
        # reference's kept-token list instead of re-splitting the string.)
        covered_kept = len(ref[i].split(" ")) if ref[i] != "" else (
            nt - nr  # all-removed or single-empty-token case
        )
        assert nr + covered_kept == nt


line = st.lists(st.sampled_from(WORDS), min_size=1, max_size=4).map(" ".join)
lined_doc = st.lists(line, min_size=1, max_size=5).map("\n".join)
lined_corpus = st.lists(lined_doc, min_size=2, max_size=5)


@settings(max_examples=10, deadline=None)
@given(lined_corpus)
def test_dedup_lines_matches_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["clean_text"])
        for r in dedup.dedup_lines(df, min_df=2).collect()
    }
    # reference: line -> docs containing it
    docs_of: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for ln in set(t.split("\n")):
            docs_of.setdefault(ln, set()).add(i)
    boiler = {ln for ln, ids in docs_of.items() if len(ids) >= 2}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        nl, nd, clean = got[i]
        assert nl == len(lines)
        assert nd == sum(1 for ln in lines if ln in boiler)
        assert clean == "\n".join(kept)


def test_lsh_params_recall_constrained_tuning():
    """Recall at the threshold is a CONSTRAINT (verified pipelines can't
    recover a missed bucket pair), and among qualifying factorizations
    the cheapest candidate set wins. The shipped 16x4 default is exactly
    the t=0.8 choice; looser thresholds get wider, shallower bands."""
    from sum_spark.functions.hashing import LSH_BANDS, LSH_ROWS, lsh_params

    b8, r8, recall8, fp8 = lsh_params(64, 0.8)
    assert (b8, r8) == (LSH_BANDS, LSH_ROWS)
    assert recall8 >= 0.99
    b5, r5, recall5, _ = lsh_params(64, 0.5)
    assert recall5 >= 0.99
    assert b5 > b8 and r5 < r8  # looser threshold -> easier candidacy
    # Every qualifying alternative generates at least as many candidates
    # (fp mass) as the chosen shape.
    for rows in (1, 2):
        bands = 64 // rows
        alt_recall = 1 - (1 - 0.8**rows) ** bands
        alt_fp = sum(
            (1 - (1 - (i / 200) ** rows) ** bands) / 200
            for i in range(1, 200)
            if i / 200 < 0.8
        )
        assert alt_recall >= 0.99 and alt_fp >= fp8
    # Tiny sketches that can't reach the floor fall back to max recall.
    b, r, recall, _ = lsh_params(4, 0.95, min_recall=0.999999)
    assert b * r == 4 and recall == max(
        1 - (1 - 0.95**rr) ** (4 // rr) for rr in (1, 2, 4)
    )
