"""Distributed k-means over embedding columns + SemDeDup-style semantic
dedup (cluster first, near-dup search only WITHIN clusters).

No reference analog (the reference compares vectors pairwise on demand,
node/wrapper/record.go:75-147); this is the corpus-curation extension:
at 100 TB you cannot afford even LSH-pruned near-dup passes over the
whole corpus at once, so the standard play (SemDeDup, Abbas et al. 2023)
is k-means into semantically coherent clusters, then exact cosine
near-dup only inside each cluster — candidate generation becomes an
equi-join on the cluster id, never all-pairs.

Spark shape of one Lloyd iteration:
  - assignment is MAP-SIDE (centroids are a k x d driver-held constant,
    broadcast into the task closure — the same bounded-small-side rule as
    knn_bruteforce's probes);
  - the update is ONE hash-partitioned aggregate of element-wise sums
    (posexplode -> groupBy (cluster, pos)), i.e. mean_pool — partial
    aggregation map-side, k*d rows out.
  Nothing ever funnels through a single task; the only driver traffic is
  the k x d centroid table per iteration.

Reproducibility: centroid sums are FIXED-POINT INTEGERS (mean_pool
fixed_point — summing doubles across rows follows partition order and is
not layout-stable); the derived centroid doubles are the same
m / (n * 10^fp) division in Spark, Python and DuckDB, which is what makes
a full Lloyd step oracle-checkable cross-engine (embed_quantize 'kmeans'
and 'kcent' legs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import hash60
from sum_spark.operators.embeddings import mean_pool


def hash_init_assign(
    df: DataFrame, k: int, id_col: str = "vec_id", cluster_col: str = "cluster"
) -> DataFrame:
    """Deterministic initial partition: cluster = hash60(id) % k.

    Portable (md5-based hash60 has a DuckDB twin) and seed-free: the
    init is a pure function of the ids, so a re-run on any cluster
    layout — or another engine — starts from the identical state. A
    hash-random partition's per-cluster means concentrate near the
    global mean; one Lloyd step already separates them (k-means|| style
    sampling would converge faster but costs extra passes and a
    cross-engine RNG story).
    """
    return df.withColumn(
        cluster_col, hash60(F.col(id_col).cast("string")) % F.lit(int(k))
    )


def centroid_sums(
    df: DataFrame,
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    fixed_point: int = 6,
) -> DataFrame:
    """The update half of a Lloyd step as a stored artifact:
    (group, n_vecs, pooled_fp) — element-wise integer sums in 10^-fp
    units per cluster. Integer, hence bit-reproducible on any layout and
    engine; divide by n_vecs * 10^fp to materialize the centroid.
    """
    return mean_pool(df, cluster_col, vec_col, fixed_point=fixed_point)


def _centroids_from_sums(rows, fixed_point: int) -> dict[int, list[float]]:
    unit = 10**fixed_point
    return {
        int(r["group"]): [m / (int(r["n_vecs"]) * unit) for m in r["pooled_fp"]]
        for r in rows
    }


def assign_clusters(
    df: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    backend: str = "numpy",
) -> DataFrame:
    """Map-side nearest-centroid assignment (squared L2, ties to the
    lowest cluster id). ``centroids`` is the driver-held k x d table —
    bounded by contract, shipped in the task closure; the stage has no
    shuffle and streams through the scan.

    backend='numpy' (default): one Arrow-batched GEMM-style distance per
    batch — the throughput path for the fit loop. backend='catalyst':
    a per-row fold in the JVM whose additions are strictly
    left-to-right, bit-matching DuckDB's list_sum — the oracle-checkable
    path (numpy's pairwise summation can differ in final bits, which
    never matters for argmin on real data but is not provable).
    """
    items = sorted(centroids.items())
    if not items:
        raise ValueError("assign_clusters needs at least one centroid")
    if backend == "catalyst":
        from sum_spark.functions.litsql import darray

        # one expr string == the same literal nodes at ~1/100th the py4j
        # round trips (functions/litsql.py; exactness unit-pinned)
        cent_lit = F.expr(
            "array("
            + ", ".join(
                f"struct({darray(c)} AS c, CAST({int(j)} AS BIGINT) AS j)"
                for j, c in items
            )
            + ")"
        )
        v = F.col(vec_col).cast("array<double>")
        # array_min over (dist, j) structs = lexicographic argmin with the
        # tie broken by the lower cluster id, all inside one expression.
        best = F.array_min(
            F.transform(
                cent_lit,
                lambda s: F.struct(
                    F.aggregate(
                        F.zip_with(v, s["c"], lambda x, c: (x - c) * (x - c)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    s["j"].alias("j"),
                ),
            )
        )
        return df.withColumn(cluster_col, best["j"])

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    keys = np.array([j for j, _ in items], dtype=np.int64)
    cmat = np.array([c for _, c in items], dtype=np.float64)  # k x d

    def _assign(vec):
        # One (rows x k) distance matrix per Arrow batch via the
        # ||x||^2 - 2 x.c + ||c||^2 GEMM identity (VERDICT r10 #4: the
        # per-row (k x d) subtract paid python+allocation overhead per
        # POINT; the GEMM pays one BLAS call per batch). Chunked so the
        # distance matrix stays ~64 MB at k up to 2^16. Ties still break
        # to the LOWEST cluster id: keys is sorted ascending and argmin
        # returns the first minimum.
        D = _batched_sq_dists(vec, cmat)
        return pd.Series(keys[np.argmin(D, axis=1)])

    _assign.__annotations__ = {"vec": pd.Series, "return": pd.Series}
    return df.withColumn(
        cluster_col, pandas_udf(_assign, "long")(F.col(vec_col).cast("array<double>"))
    )


def _batched_sq_dists(vec, cmat):
    """(len(vec) x k) squared-L2 distance matrix from an Arrow batch of
    array cells against centroid matrix ``cmat``, computed as one GEMM
    per ~64 MB row chunk. Shared by assign_clusters / assign_clusters_topp
    (their hot path: the per-point pass every SemDeDup / IVF build pays).
    Distances differ from the per-row subtract form only in float
    rounding — fine for assignment (parity unit-tested on random data);
    oracle-checked legs use the 'catalyst' backends, whose fold order
    DuckDB reproduces bit-for-bit."""
    import numpy as np

    if len(vec) == 0:  # empty Arrow batch: (0 x k), argmin downstream is a no-op
        return np.empty((0, cmat.shape[0]), dtype=np.float64)
    try:
        mats = np.asarray(
            [np.asarray(cell, dtype=np.float64) for cell in vec], dtype=np.float64
        )
    except ValueError:  # inhomogeneous cells raise before any ndim check
        mats = None
    if mats is None or mats.ndim != 2:
        # ragged cells: per-row fallback (never on real data)
        return np.stack(
            [
                ((cmat - np.asarray(m, dtype=np.float64)[None, :]) ** 2).sum(axis=1)
                for m in vec
            ],
            axis=0,
        )
    c_sq = (cmat * cmat).sum(axis=1)[None, :]
    out = np.empty((mats.shape[0], cmat.shape[0]), dtype=np.float64)
    rows_per_chunk = max(1, (64 << 20) // (8 * max(1, cmat.shape[0])))
    for s in range(0, mats.shape[0], rows_per_chunk):
        b = mats[s : s + rows_per_chunk]
        out[s : s + rows_per_chunk] = (
            (b * b).sum(axis=1)[:, None] - 2.0 * (b @ cmat.T) + c_sq
        )
    return out


def assign_clusters_topp(
    df: DataFrame,
    centroids: dict[int, list[float]],
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    backend: str = "numpy",
) -> DataFrame:
    """Multi-probe assignment: one output row per (point, cluster) for
    the point's ``probes`` NEAREST centroids (squared L2, ties to the
    lower cluster id). The SemDeDup boundary-recall mitigation
    (semantic_dedup(probes=2)): a near-dup pair straddling a cluster
    boundary meets in the shared second-nearest cluster. Cost is exactly
    ``probes``x the single-probe candidate mass — still bounded
    per-cluster, never a global pair search.

    ``backend='catalyst'`` mirrors assign_clusters' catalyst path —
    (dist, id) structs sorted lexicographically inside one expression,
    left-to-right fold distances that a SQL oracle reproduces
    bit-for-bit (the hash-checked sem2 leg); 'numpy' is the fast Arrow
    GEMM path for production assignment."""
    items = sorted(centroids.items())
    if not items:
        raise ValueError("assign_clusters_topp needs at least one centroid")
    p = min(int(probes), len(items))

    if backend == "catalyst":
        from sum_spark.functions.litsql import darray

        cent_lit = F.expr(
            "array("
            + ", ".join(
                f"struct({darray(c)} AS c, CAST({int(j)} AS BIGINT) AS j)"
                for j, c in items
            )
            + ")"
        )
        v = F.col(vec_col).cast("array<double>")
        # array_sort on (d, j) structs = lexicographic (distance, id)
        # order; slice keeps the p nearest. Same fold as assign_clusters.
        ranked = F.slice(
            F.array_sort(
                F.transform(
                    cent_lit,
                    lambda s: F.struct(
                        F.aggregate(
                            F.zip_with(v, s["c"], lambda x, c: (x - c) * (x - c)),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        s["j"].alias("j"),
                    ),
                )
            ),
            1,
            p,
        )
        probed = df.withColumn(
            "__cls", F.transform(ranked, lambda s: s["j"])
        )
        return probed.withColumn(cluster_col, F.explode("__cls")).drop("__cls")

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    keys = np.array([j for j, _ in items], dtype=np.int64)
    cmat = np.array([c for _, c in items], dtype=np.float64)

    def _assign(vec):
        # Batched GEMM distances (VERDICT r10 #4), then a stable argsort
        # per row: keys is sorted ascending, so kind='stable' breaks
        # distance ties to the lower cluster id — exactly the old
        # per-row lexsort((keys, d)) order.
        D = _batched_sq_dists(vec, cmat)
        order = np.argsort(D, axis=1, kind="stable")[:, :p]
        return pd.Series(keys[order].tolist())  # one (batch x p) gather

    _assign.__annotations__ = {"vec": pd.Series, "return": pd.Series}
    probed = df.withColumn(
        "__cls", pandas_udf(_assign, "array<long>")(F.col(vec_col).cast("array<double>"))
    )
    return probed.withColumn(cluster_col, F.explode("__cls")).drop("__cls")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fixed_point: int = 6,
    backend: str = "numpy",
    init: dict[int, list[float]] | None = None,
) -> dict[int, list[float]]:
    """Lloyd's algorithm: hash-init partition, then ``iters`` rounds of
    map-side assignment + one-aggregate update. Returns the centroid
    table (cluster id -> list of doubles). ``k`` is an upper bound: a
    hash bucket that receives no ids at init has no centroid (possible
    only when the input has fewer ids than buckets); after init the
    cluster count never shrinks — a cluster that loses all members in
    an iteration keeps its previous centroid.

    ``init`` overrides the hash-partition init with explicit centroids
    (point init): on ZERO-CENTERED data (PQ residuals under a good
    coarse book) every hash-bucket MEAN collapses to ~0 and Lloyd
    cannot escape the degenerate start — seeding from actual data
    points keeps the centroids distinct (the k-means++ concern, solved
    deterministically by the caller's seed choice).

    Per-iteration cost is one scan + one (cluster, pos) aggregate; the
    driver holds only k x d doubles. 100 TB posture: identical — the
    corpus never moves, only k*d*10^fp-unit integers do.
    """
    if init is not None:
        cents = {int(c): [float(x) for x in v] for c, v in init.items()}
    else:
        assigned = hash_init_assign(df, k, id_col)
        cents = _centroids_from_sums(
            centroid_sums(assigned, "cluster", vec_col, fixed_point).collect(),
            fixed_point,
        )
    for _ in range(int(iters)):
        assigned = assign_clusters(
            df, cents, id_col, vec_col, backend=backend
        )
        new = _centroids_from_sums(
            centroid_sums(assigned, "cluster", vec_col, fixed_point).collect(),
            fixed_point,
        )
        cents = {j: new.get(j, c) for j, c in cents.items()}
    return cents


def inertia(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "embedding",
    backend: str = "numpy",
) -> float:
    """Sum of squared distances to each row's nearest centroid — the
    quantity Lloyd iterations are non-increasing in (up to the
    fixed-point centroid quantization); used by tests to verify
    convergence, not part of any checked output (cross-row double sums
    are layout-dependent)."""
    from sum_spark.functions.litsql import darray

    items = sorted(centroids.items())
    # one expr string, not k*dims F.lit round trips (litsql / VERDICT
    # r12 #6) — identical Catalyst literal nodes
    cent_lit = F.expr(
        "array(" + ", ".join(darray(float(x) for x in c) for _, c in items) + ")"
    )
    v = F.col(vec_col).cast("array<double>")
    d = F.array_min(
        F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with(v, c, lambda x, cc: (x - cc) * (x - cc)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    row = df.select(F.sum(d).alias("s")).collect()[0]
    return float(row["s"] or 0.0)


# k='auto' target cluster population: per-cluster pairwise work is
# O(size^2), so holding size ~constant makes TOTAL work ~N * target —
# linear in the corpus. 4096 f64x64 vectors is ~2 MB per cluster-side,
# far under the 64 MB GEMM blocks.
SEM_AUTO_TARGET = 4096
SEM_AUTO_MAX_K = 1 << 16


def sem_auto_k(n: int) -> int:
    """Cluster count for a SemDeDup pass over ``n`` vectors: ~n/4096,
    bounded [8, 65536]. With a FIXED k the per-cluster population grows
    linearly in the corpus and the within-cluster pairwise stage grows
    as N^2/k — measured super-linear at the round-9 30x point (53x for
    30x data, BASELINE round-9 table); scaling k with N holds per-cluster
    work constant, the same sizing philosophy as similarity.auto_cells.
    More clusters narrow each cluster's recall horizon — the standard
    SemDeDup trade (the reference method also scales cluster count with
    corpus size); use dedup_embedding_lsh when global recall matters."""
    return max(8, min(SEM_AUTO_MAX_K, -(-int(n) // SEM_AUTO_TARGET)))


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.7,
    k: int | str = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: dict[int, list[float]] | None = None,
    n_subblocks: int | None = None,
    assign_backend: str = "numpy",
    probes: int = 1,
    ordered: bool = True,
) -> DataFrame:
    """SemDeDup: cluster, then exact cosine near-dup pairs WITHIN each
    cluster only. Output: (id_a, id_b, sim, cluster) with id_a < id_b,
    sim rounded to 4 places, ordered.

    ``probes`` > 1 assigns each point to its ``probes`` nearest clusters
    (assign_clusters_topp) — the standard mitigation for the method's
    boundary-recall trade (a near-dup pair split across a cluster
    boundary meets in a shared second-nearest cluster). Candidate mass
    scales by exactly ``probes``; pairs found in more than one shared
    cluster are emitted once (min cluster id). Measured recall-vs-k/
    probes table: BASELINE.md round-10 semrecall block.

    Scale shape — the reason this beats whole-corpus near-dup at 100 TB:
    after assignment, each cluster splits into S hash sub-blocks sized to
    a bounded float64 matrix (same memory-bound auto-K rule as
    dedup_embedding_cosine, dedup.py:585-600); candidate block pairs meet
    in an equi-join ON THE CLUSTER ID (S*(S+1)/2 pairs per cluster — a
    k-fold reduction of the global block-pair count), and a NumPy GEMM
    per block pair emits only above-threshold pairs. Cross-cluster
    near-dups are out of scope by construction — that recall trade *is*
    the SemDeDup method; use dedup_embedding_lsh when global recall
    matters.

    ``k='auto'`` sizes the cluster count to the corpus (one bounded
    count + :func:`sem_auto_k`) so per-cluster population — and with it
    the within-cluster pairwise stage — stays CONSTANT as the corpus
    grows; a fixed k is only linear until clusters outgrow
    SEM_AUTO_TARGET (the round-9 super-linear finding). Default stays 8
    for small oracle-checked runs.

    Pass ``centroids`` (e.g. from a previous :func:`kmeans_fit` on a
    sample) to skip the fit — the production pattern: fit on 0.1%, assign
    + dedup the full corpus in one pass.
    """
    import numpy as np
    import pandas as pd

    if centroids is None:
        if k == "auto":
            k = sem_auto_k(df.count())
        elif not isinstance(k, int):
            raise ValueError(f"k must be an int or 'auto', got {k!r}")
        centroids = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    if int(probes) > 1:
        assigned = assign_clusters_topp(
            df, centroids, probes, id_col, vec_col, backend=assign_backend
        )
    else:
        assigned = assign_clusters(
            df, centroids, id_col, vec_col, backend=assign_backend
        )

    par = max(2, df.sparkSession.sparkContext.defaultParallelism)
    if n_subblocks:
        S = int(n_subblocks)
    else:
        try:
            est = float(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            est = float(64 << 20)
        # Per-cluster share of the corpus, blocked to ~64 MB f64 matrices.
        S = min(64, max(1, int(2.0 * est / max(1, len(centroids)) / (64 << 20)) + 1))

    rows = assigned.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col("cluster").alias("cl"),
        F.pmod(F.hash(F.col(id_col)), F.lit(S)).alias("b"),
    )
    packed = (
        rows.groupBy("cl", "b")
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
        .select(
            "cl",
            "b",
            F.transform("rows", lambda r: r["id"]).alias("ids"),
            F.flatten(F.transform("rows", lambda r: r["v"])).alias("flat"),
        )
    )
    left = packed.select("cl", F.col("b").alias("ba"), F.col("ids").alias("ia"), F.col("flat").alias("fa"))
    right = packed.select("cl", F.col("b").alias("bb"), F.col("ids").alias("ib"), F.col("flat").alias("fb"))
    # The right side is the ENTIRE packed corpus (every cluster's id+vector
    # blocks) — broadcast only when the size estimate says it fits (test
    # scale); at corpus scale the equi-join on cl must stay a shuffled hash
    # join, which preserves per-cluster locality just as well.
    from sum_spark.plans.scale import is_broadcastable

    right_side = F.broadcast(right) if is_broadcastable(packed, 64 << 20) else right
    pairs = (
        left.join(right_side, ["cl"])
        .where(F.col("ba") <= F.col("bb"))
        .repartition(min(len(centroids) * S * (S + 1) // 2, 2 * par), "cl", "ba", "bb")
    )
    thr = float(threshold)

    def gemm(it):
        def unpack(ids_cell, flat_cell):
            ids = np.asarray(ids_cell, dtype=np.int64)
            mat = np.asarray(flat_cell, dtype=np.float64).reshape(len(ids), -1)
            nrm = np.linalg.norm(mat, axis=1)
            mat = mat / np.where(nrm == 0.0, 1.0, nrm)[:, None]
            return ids, mat

        for pdf in it:
            for cl, ba, ia_c, fa_c, bb, ib_c, fb_c in zip(
                pdf["cl"], pdf["ba"], pdf["ia"], pdf["fa"], pdf["bb"], pdf["ib"], pdf["fb"]
            ):
                ia, ma = unpack(ia_c, fa_c)
                ib, mb = (ia, ma) if ba == bb else unpack(ib_c, fb_c)
                sims = ma @ mb.T
                if ba == bb:
                    mask = (sims >= thr) & (ia[:, None] < ib[None, :])
                    li, rj = np.nonzero(mask)
                    lo, hi = ia[li], ib[rj]
                else:
                    li, rj = np.nonzero(sims >= thr)
                    lo = np.minimum(ia[li], ib[rj])
                    hi = np.maximum(ia[li], ib[rj])
                yield pd.DataFrame(
                    {
                        "id_a": lo,
                        "id_b": hi,
                        "sim": np.round(sims[li, rj], 4),
                        "cluster": np.full(len(lo), cl, dtype=np.int64),
                    }
                )

    out = pairs.mapInPandas(
        gemm, schema="id_a long, id_b long, sim double, cluster long"
    )
    if int(probes) > 1:
        # A pair whose BOTH members share two probed clusters is found
        # twice with identical sim (same exact cosine of the same
        # vectors); emit it once, attributed to the lower cluster id.
        out = out.groupBy("id_a", "id_b").agg(
            F.min("sim").alias("sim"), F.min("cluster").alias("cluster")
        )
    return out.orderBy("id_a", "id_b") if ordered else out
