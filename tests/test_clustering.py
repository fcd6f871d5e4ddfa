"""Distributed k-means + SemDeDup semantic dedup (operators/clustering).

The oracle-checked surface is the embed_quantize 'kmeans'/'kcent' legs
(one full Lloyd step vs DuckDB); these tests cover what the oracle
can't: the iterative fit (convergence), backend parity, empty-cluster
survival, and the within-cluster-only contract of semantic_dedup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import clustering, dedup
from sum_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "embeddings")
    df.persist().count()
    yield df
    df.unpersist()


def test_hash_init_is_deterministic_and_in_range(emb):
    a = clustering.hash_init_assign(emb, 8).select("vec_id", "cluster")
    b = clustering.hash_init_assign(emb, 8).select("vec_id", "cluster")
    ra = {r["vec_id"]: r["cluster"] for r in a.collect()}
    rb = {r["vec_id"]: r["cluster"] for r in b.collect()}
    assert ra == rb
    assert set(ra.values()) <= set(range(8))


def test_lloyd_iterations_do_not_increase_inertia(emb):
    # Inertia after each fit depth; non-increasing up to the 1e-6
    # fixed-point centroid quantization (allow that much slack per dim).
    vals = []
    for iters in (1, 2, 4):
        c = clustering.kmeans_fit(emb, k=8, iters=iters)
        vals.append(clustering.inertia(emb, c))
    assert vals[1] <= vals[0] * (1 + 1e-6)
    assert vals[2] <= vals[1] * (1 + 1e-6)


def test_assign_backends_agree(emb):
    cents = clustering.kmeans_fit(emb, k=8, iters=2)
    a = clustering.assign_clusters(emb, cents, backend="catalyst")
    b = clustering.assign_clusters(emb, cents, backend="numpy")
    ra = {r["vec_id"]: r["cluster"] for r in a.select("vec_id", "cluster").collect()}
    rb = {r["vec_id"]: r["cluster"] for r in b.select("vec_id", "cluster").collect()}
    assert ra == rb


def test_assignment_is_map_side(emb):
    cents = clustering.kmeans_fit(emb, k=4, iters=1)
    plan = (
        clustering.assign_clusters(emb, cents, backend="catalyst")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # centroids ride the closure; no shuffle


def test_empty_cluster_keeps_previous_centroid(spark):
    # Two distinct points among 6 ids, k=8: after the first re-assignment
    # at most 2 clusters keep members, yet no cluster may vanish — the
    # emptied ones must carry their previous centroid forward.
    df = spark.createDataFrame(
        [(i, [float(i % 2), 1.0]) for i in range(6)], "vec_id long, embedding array<double>"
    )
    init_keys = set(
        clustering._centroids_from_sums(
            clustering.centroid_sums(
                clustering.hash_init_assign(df, 8), "cluster", "embedding", 6
            ).collect(),
            6,
        )
    )
    cents = clustering.kmeans_fit(df, k=8, iters=3, fixed_point=6)
    assert set(cents) == init_keys  # no loss after init
    assert all(len(c) == 2 for c in cents.values())


def test_semantic_dedup_pairs_are_within_cluster_subset_of_exact(emb):
    # Every emitted pair must be a true >= threshold cosine pair (subset
    # of the exact all-pairs operator) and lie in one cluster.
    thr = 0.5
    sem = clustering.semantic_dedup(emb, threshold=thr, k=4, iters=2)
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in sem.collect()}
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup.dedup_embedding_cosine(emb, threshold=thr).collect()
    }
    assert set(got) <= set(exact)
    assert all(abs(got[p] - exact[p]) < 1e-9 for p in got)
    # Same-cluster planted duplicates are always found: duplicate a row.
    one = emb.limit(1).select(F.lit(99990001).alias("vec_id"), "embedding", "label")
    two = emb.limit(1).select(F.lit(99990002).alias("vec_id"), "embedding", "label")
    aug = emb.unionByName(one).unionByName(two)
    pairs = clustering.semantic_dedup(aug, threshold=0.999, k=4, iters=2).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (99990001, 99990002) in found


def test_semantic_dedup_two_probe_recovers_boundary_pairs(emb):
    """probes=2 (VERDICT r9 #7 mitigation): still a subset of the exact
    all-pairs operator with identical sims, a SUPERSET of single-probe's
    found pairs at the same centroids, and each pair emitted exactly
    once (the recall uplift itself is measured, not asserted — the
    BASELINE round-10 semrecall table)."""
    thr = 0.5
    cents = clustering.kmeans_fit(emb, k=8, iters=2)
    one = clustering.semantic_dedup(emb, threshold=thr, centroids=cents)
    two = clustering.semantic_dedup(emb, threshold=thr, centroids=cents, probes=2)
    p1 = {(r["id_a"], r["id_b"]): r["sim"] for r in one.collect()}
    rows2 = two.collect()
    p2 = {(r["id_a"], r["id_b"]): r["sim"] for r in rows2}
    assert len(rows2) == len(p2)  # no duplicate pair rows
    assert set(p1) <= set(p2)
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup.dedup_embedding_cosine(emb, threshold=thr).collect()
    }
    assert set(p2) <= set(exact)
    assert all(abs(p2[p] - exact[p]) < 1e-9 for p in p2)


def test_assign_topp_backends_agree(emb):
    """Round 11: assign_clusters_topp gained a catalyst backend (the
    oracle-reproducible fold for the hash-checked sem2 leg) and its
    numpy path became a batched GEMM + stable argsort (VERDICT r10 #4).
    Both must produce the same (point -> ordered probe list) on real
    data, and the probe list must start with the single-probe winner."""
    cents = clustering.kmeans_fit(emb, k=8, iters=1)

    def probe_lists(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], []).append(r["cluster"])
        return out

    # explode preserves array order, so grouping by arrival order works;
    # collect per-backend and compare as ordered lists
    a = probe_lists(clustering.assign_clusters_topp(emb, cents, 2, backend="catalyst"))
    b = probe_lists(clustering.assign_clusters_topp(emb, cents, 2, backend="numpy"))
    assert a == b
    single = {
        r["vec_id"]: r["cluster"]
        for r in clustering.assign_clusters(emb, cents, backend="numpy").collect()
    }
    assert all(v[0] == single[k] for k, v in b.items())
    assert all(len(v) == 2 and v[0] != v[1] for v in b.values())


def test_semantic_dedup_partition_invariance(emb):
    cents = clustering.kmeans_fit(emb, k=4, iters=1)
    a = clustering.semantic_dedup(emb, threshold=0.5, centroids=cents)
    b = clustering.semantic_dedup(
        emb.repartition(13), threshold=0.5, centroids=cents, n_subblocks=3
    )
    pa = sorted((r["id_a"], r["id_b"], r["sim"], r["cluster"]) for r in a.collect())
    pb = sorted((r["id_a"], r["id_b"], r["sim"], r["cluster"]) for r in b.collect())
    assert pa == pb


def test_precomputed_centroids_skip_fit(emb):
    # The production pattern: fit on a sample, assign the full corpus.
    sample = emb.where(F.col("vec_id") % 5 == 0)
    cents = clustering.kmeans_fit(sample, k=4, iters=2)
    out = clustering.semantic_dedup(emb, threshold=0.5, centroids=cents)
    assert out.count() >= 0  # executes without touching kmeans_fit


def test_fit_quality_comparable_to_mllib_kmeans(spark, emb):
    # Not a value check (init differs by design: MLlib uses k-means||,
    # we use the oracle-reproducible hash partition) — a quality bound:
    # after a few Lloyd rounds our inertia lands within 1.5x of MLlib's
    # trainingCost at the same k, on the same data.
    from pyspark.ml.clustering import KMeans

    from sum_spark.functions.mllib import to_mllib_vectors

    ours = clustering.kmeans_fit(emb, k=8, iters=6)
    our_cost = clustering.inertia(emb, ours)
    m = KMeans(k=8, seed=1, maxIter=6, featuresCol="embedding").fit(
        to_mllib_vectors(emb.select("vec_id", F.col("embedding").cast("array<double>")))
    )
    assert our_cost <= m.summary.trainingCost * 1.5


def test_semantic_dedup_auto_k(spark):
    """k='auto' sizes the cluster count to the corpus (sem_auto_k) and,
    at small N where auto resolves to the floor of 8, produces exactly
    the fixed-k=8 pair set — the sizing changes placement, not the
    within-cluster exact verification."""
    import numpy as np

    from sum_spark.operators.clustering import sem_auto_k, semantic_dedup

    assert sem_auto_k(100) == 8
    assert sem_auto_k(4096 * 8) == 8
    assert sem_auto_k(4096 * 100) == 100
    assert sem_auto_k(10**12) == 1 << 16  # bounded

    rng = np.random.default_rng(41)
    base = rng.standard_normal((60, 8))
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in base[i]]))
        # planted near-dup twin
        rows.append((1000 + i, [float(x) for x in base[i] + rng.standard_normal(8) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    fixed = sorted(map(tuple, semantic_dedup(emb, threshold=0.9, k=8).collect()))
    auto = sorted(map(tuple, semantic_dedup(emb, threshold=0.9, k="auto").collect()))
    assert fixed == auto
    assert fixed  # planted twins found

    import pytest

    with pytest.raises(ValueError, match="auto"):
        semantic_dedup(emb, k="bogus")
