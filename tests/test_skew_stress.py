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


def test_minhash_hot_band_salted_join_is_exact(spark):
    """A mass-duplicated document (90% of the corpus identical) puts 90%
    of every band's rows under ONE band key — the hot-bucket shape that
    funnels a plain band self-join through a single reducer. The salted
    path (plans/scale.salted_join on the band key) must return the
    IDENTICAL verified pair set while splitting the hot key's probe rows
    across salt reducers."""
    from pyspark.sql import functions as F

    hot = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, hot) for i in range(90)]  # 90% identical -> one hot bucket
    rows += [(100 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    plain = dedup.dedup_minhash_lsh(docs, threshold=0.8)
    salted = dedup.dedup_minhash_lsh(docs, threshold=0.8, salt_bands=8)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan  # the candidate join really is salted
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # All C(90, 2) identical-doc pairs found either way (J = 1.0).
    assert len(a) == 90 * 89 // 2
    assert all(r[2] == 1.0 for r in a)


def test_semantic_dedup_hot_cluster_blocks_stay_bounded(spark):
    """90% of vectors land in ONE k-means cluster; the within-cluster
    sub-blocking must keep every GEMM block ~cluster_size/S regardless
    of the skew (per-task input bounded), and the pair output must be
    exactly the planted twins."""
    import numpy as np
    from pyspark.sql import functions as F

    from sum_spark.operators.clustering import assign_clusters, semantic_dedup

    rng = np.random.default_rng(7)
    d = 16
    rows = []
    # 450 random vectors near the origin -> cluster 0 (centroid at 0);
    # pairwise cosine of independent random vectors stays far below 0.999.
    for i in range(450):
        rows.append((i, (rng.standard_normal(d) * 0.1).tolist()))
    # 3 planted exact twins inside the hot cluster (cos = 1.0).
    for j in range(3):
        v = (rng.standard_normal(d) * 0.1).tolist()
        rows.append((1000 + 2 * j, v))
        rows.append((1000 + 2 * j + 1, v))
    # 50 vectors near a far centroid -> cluster 1 (the 10% cluster).
    far = np.zeros(d); far[0] = 100.0
    for i in range(50):
        rows.append((2000 + i, (far + rng.standard_normal(d) * 0.1).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)
    cents = {0: [0.0] * d, 1: far.tolist()}

    S = 8
    # Per-block boundedness: replicate the operator's packing rule
    # (cluster, pmod(hash(id), S)) and assert no block outgrows ~2x the
    # even share of the HOT cluster.
    assigned = assign_clusters(df, cents, "vec_id", "embedding")
    sizes = (
        assigned.groupBy("cluster", F.pmod(F.hash("vec_id"), F.lit(S)).alias("b"))
        .count()
        .collect()
    )
    hot_sizes = [r["count"] for r in sizes if r["cluster"] == 0]
    assert len(hot_sizes) == S  # the hot cluster genuinely split into S blocks
    assert max(hot_sizes) <= 2 * (456 // S + 1)

    out = semantic_dedup(
        df, threshold=0.999, centroids=cents, n_subblocks=S
    ).collect()
    hot_pairs = {(r["id_a"], r["id_b"]) for r in out if r["cluster"] == 0}
    assert hot_pairs == {(1000 + 2 * j, 1000 + 2 * j + 1) for j in range(3)}
    # Cluster-1 vectors all point along the far centroid (cos ~ 1), so
    # their mutual pairs are genuine near-dups — but strictly within
    # cluster 1 (no cross-cluster pair can exist by construction).
    for r in out:
        if r["cluster"] == 1:
            assert r["id_a"] >= 2000 and r["id_b"] >= 2000


def test_minhash_auto_salt_measures_and_splits_only_when_hot(spark, monkeypatch):
    """salt_bands='auto' must (a) measure the hottest band bucket and
    leave the common cool corpus UNSALTED, (b) salt a hot corpus once
    the bucket exceeds the threshold — with the identical verified pair
    set either way (the measured-plan contract of the dedup_lines
    broadcast sizing, applied to the band self-join)."""
    from pyspark.sql import functions as F

    hot = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, hot) for i in range(90)]
    rows += [
        (100 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    # cool decision: the 90-doc hot bucket is under the production
    # threshold, so auto must pick the plain join
    auto_cool = dedup.dedup_minhash_lsh(docs, threshold=0.8, salt_bands="auto")
    assert "__salt" not in auto_cool._jdf.queryExecution().optimizedPlan().toString()

    # hot decision: drop the threshold under the bucket size — auto must
    # salt, split to ceil(90/32) past the cap logic, and stay exact
    monkeypatch.setattr(dedup, "AUTO_SALT_TARGET", 32)
    auto_hot = dedup.dedup_minhash_lsh(docs, threshold=0.8, salt_bands="auto")
    assert "__salt" in auto_hot._jdf.queryExecution().optimizedPlan().toString()
    want = sorted(map(tuple, dedup.dedup_minhash_lsh(docs, threshold=0.8).collect()))
    got = sorted(map(tuple, auto_hot.collect()))
    assert got == want and len(got) == 90 * 89 // 2
