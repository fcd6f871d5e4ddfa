"""Skew resilience: the max_df hot-shingle guard under a pathological
corpus where EVERY document shares boilerplate (the 100 TB failure mode:
one stop-shingle key turning the candidate self-join quadratic)."""

from __future__ import annotations


from sum_spark.operators import dedup

BOILER = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark, n, twins):
    """n docs, all sharing the 10 boilerplate shingles (J ≈ 0.45 between
    unrelated docs — sub-threshold); `twins` planted near-dup pairs
    (ids n+2i / n+2i+1, J ≈ 0.68) differing in one trailing word."""
    rows = [
        (i, f"{BOILER} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(n)
    ]
    for j in range(twins):
        a, b = n + 2 * j, n + 2 * j + 1
        rows.append((a, f"{BOILER} t{j}a t{j}b t{j}c t{j}d t{j}e delta"))
        rows.append((b, f"{BOILER} t{j}a t{j}b t{j}c t{j}d t{j}e epsilon"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_prefix_order_is_exact_under_skew(spark):
    # The df-ordered prefix (exact PPJoin skew guard) must return the
    # IDENTICAL pair set to the unguarded baseline on a corpus where the
    # hard-drop guard provably loses a pair (next test).
    docs = _corpus(spark, 400, twins=30)
    off = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(docs, threshold=0.6, max_df=None).collect()
    }
    dfo = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(
            docs, threshold=0.6, max_df=None, prefix_order="df"
        ).collect()
    }
    assert dfo == off
    twins = {(400 + 2 * j, 400 + 2 * j + 1) for j in range(30)}
    assert twins <= set(dfo)


def test_hard_drop_guard_documents_its_recall_trade(spark):
    # max_df hard-dropping may miss a true pair whose only shared prefix
    # survivors were hot — never invents pairs, keeps >= 29/30 twins on
    # this corpus (deterministic: md5 ordering). This pins the trade the
    # docstring warns about; prefix_order='df' is the lossless form.
    docs = _corpus(spark, 400, twins=30)
    off = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(docs, threshold=0.6, max_df=None).collect()
    }
    on = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(docs, threshold=0.6, max_df=50).collect()
    }
    assert set(on) <= set(off)
    assert all(on[p] == off[p] for p in on)
    twins = {(400 + 2 * j, 400 + 2 * j + 1) for j in range(30)}
    assert len(twins & set(on)) >= 29


def test_df_prefix_order_scales_past_the_quadratic_wall(spark):
    # 4000 docs sharing the boilerplate: hash-ordered prefixes would put
    # hot shingles in ~every prefix (~8M candidate pairs); df-ordering
    # keeps candidates O(n) — interactive runtime, zero recall loss.
    docs = _corpus(spark, 4000, twins=30).repartition(32)
    got = dedup.dedup_ngram_jaccard(
        docs, threshold=0.6, max_df=None, prefix_order="df"
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    twins = {(4000 + 2 * j, 4000 + 2 * j + 1) for j in range(30)}
    assert twins <= pairs
    # No sub-threshold boilerplate-only pair leaks through the verify.
    assert all(r["jaccard"] >= 0.6 for r in got)


def test_auto_guard_counts_shingle_eligible_docs(spark):
    # Below the 10k cutoff "auto" must resolve to None (guard off):
    # identical results to an explicit max_df=None run.
    docs = _corpus(spark, 200, twins=5)
    auto = dedup.dedup_ngram_jaccard(docs, threshold=0.6, max_df="auto").collect()
    off = dedup.dedup_ngram_jaccard(docs, threshold=0.6, max_df=None).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, off))
