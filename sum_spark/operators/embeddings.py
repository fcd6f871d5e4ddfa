"""Embedding-preparation operators: int8 scalar quantization (the 4x
storage/bandwidth cut a 100 TB embedding corpus wants before ANN).

No reference analog (the reference stores raw float32 vectors,
node/wrapper/record.go); this is the storage-scale extension. All math is
engine-portable (floor(x + 0.5) instead of ROUND, single divisions) so
the DuckDB oracle checks values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.plans.scale import spread_for_compute


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    ordered: bool = True,
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    q_i = floor(v_i * 127 / amax + 0.5) with amax = max(|v_i|); the
    dequant multiplier is scale = amax / 127. floor(x + 0.5) is used in
    both engines because ROUND half-way semantics differ between Spark
    (HALF_UP on doubles) and DuckDB. Zero vectors quantize to zeros with
    scale 0.

    Map-side column work only — streams through the scan, no shuffle.
    Output: (vec_id, scale, q_str, max_abs_err) where q_str is the
    comma-joined int8 codes (a scalar so the driver harness can
    canonicalize it) and max_abs_err the dequantization error bound
    max(|v_i - q_i * scale|) <= scale/2.
    """
    df = spread_for_compute(df)
    staged = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    # amax staged on its own; it is referenced by the quant lambda per
    # element, and Catalyst re-inlining an aggregate-over-array there
    # would be O(d^2) per row — acceptable at d=64, but the projection
    # boundary keeps the plan readable and the exprs shallow.
    a = staged.select(
        "vec_id",
        "__v",
        F.array_max(F.transform("__v", lambda x: F.abs(x))).alias("__amax"),
    )
    amax = F.col("__amax")
    q = F.when(
        amax > 0,
        F.transform("__v", lambda x: F.floor(x * 127 / amax + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform("__v", lambda x: F.lit(0)))
    b = a.select("vec_id", "__v", "__amax", q.alias("__q"))
    scale = amax / 127
    err = F.array_max(
        F.zip_with("__v", "__q", lambda x, qq: F.abs(x - qq * (amax / 127)))
    )
    return b.select(
        "vec_id",
        scale.alias("scale"),
        F.array_join(F.transform("__q", lambda x: x.cast("string")), ",").alias("q_str"),
        err.alias("max_abs_err"),
    ).transform(lambda d: d.orderBy("vec_id") if ordered else d)


def l2_normalize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    ordered: bool = True,
) -> DataFrame:
    """Unit-norm embeddings (the preprocessing step before cosine-based
    ANN: normalized once, every downstream similarity is a plain dot).
    Zero vectors normalize to zeros, norm 0 — same convention as the
    cosine kernel's zero rule.

    Map-side column work only. The norm is staged in its own projection;
    it is referenced inside the per-element lambda, and (as with
    quantize_int8's amax) re-evaluating an O(d) aggregate per element is
    acceptable at d=64 while the projection boundary keeps the
    expressions shallow.

    Output: (vec_id, norm, unit: array<double>) ordered.
    """
    staged = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    n = F.sqrt(
        F.aggregate(
            F.transform("__v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    a = staged.select("vec_id", "__v", n.alias("__n"))
    unit = F.when(
        F.col("__n") > 0, F.transform("__v", lambda x: x / F.col("__n"))
    ).otherwise(F.transform("__v", lambda x: F.lit(0.0)))
    return a.select(
        "vec_id", F.col("__n").alias("norm"), unit.alias("unit")
    ).transform(lambda d: d.orderBy("vec_id") if ordered else d)


def random_project(
    df: DataFrame,
    out_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss reduction with deterministic ±1/sqrt(k)
    planes (the md5-derived sign scheme of dedup.srp_planes, so the SAME
    projection reproduces on any run, cluster, or engine — no RNG state
    to ship). Output: (vec_id, proj: array<double> of out_dims) ordered.

    Map-side only: the planes are literals folded per row (out_dims
    independent dot products), so the reduction streams through the scan
    — the cheap preprocessing before ANN when the raw dimension makes
    IVF/LSH signatures or GEMM blocks memory-heavy. Distances are
    preserved to the JL epsilon for the chosen out_dims; downstream
    exact verification (the dedup operators' verify stage) should use
    the ORIGINAL vectors.
    """
    from sum_spark.operators.dedup import srp_planes

    staged = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    dims = int(staged.select(F.size("__v")).limit(1).collect()[0][0])
    planes = srp_planes(int(out_dims), dims, seed=seed)
    scale = 1.0 / float(out_dims) ** 0.5

    from sum_spark.functions.litsql import darray, dlit

    # The out_dims x dims plane literals render into ONE F.expr string
    # (litsql / VERDICT r12 #6) instead of out_dims*dims F.lit py4j
    # round trips per plan build — identical Catalyst nodes (dlit/darray
    # doubles are exact; plan-identity pinned in tests/test_plans.py).
    def _dot(p) -> str:
        return (
            f"aggregate(zip_with(__v, {darray(float(x) for x in p)}, "
            "(a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
        )

    proj = F.expr(
        "array(" + ", ".join(f"({_dot(p)} * {dlit(scale)})" for p in planes) + ")"
    )
    return staged.select("vec_id", proj.alias("proj")).orderBy("vec_id")


def mean_pool(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    fixed_point: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Group-wise mean embedding — chunk->document or document->class
    pooling. Distributed shape: posexplode to (group, pos, val), ONE
    hash-partitioned aggregate on (group, pos), then per-group sorted
    re-assembly; no fixed-dimension literals, no single-task operator.

    Float caveat, and why ``fixed_point`` exists: summing doubles ACROSS
    rows happens in partition order, which is not deterministic — the
    same corpus on a different executor layout can differ in the last
    mantissa bit. ``fixed_point=k`` first quantizes every value to
    integer units of 10^-k (floor(x*10^k + 0.5) — the portable midpoint
    rule) and sums exactly: bit-reproducible on any cluster layout and
    across engines, which is what a training pipeline should store.

    Output: (group, n_vecs, pooled array<double>) — or with fixed_point,
    (group, n_vecs, pooled_fp array<bigint>) carrying the integer SUMS
    in 10^-k units (divide by n_vecs downstream; the division is left to
    the consumer so the stored artifact stays integer-exact).
    """
    ex = df.select(
        F.col(group_col).alias("group"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    if fixed_point is not None:
        unit = 10**fixed_point
        v = F.floor(F.col("val") * unit + F.lit(0.5)).cast("long")
        per = ex.groupBy("group", "pos").agg(
            F.sum(v).alias("m"), F.count("*").alias("c")
        )
    else:
        per = ex.groupBy("group", "pos").agg(
            F.avg("val").alias("m"), F.count("*").alias("c")
        )
    out_col = "pooled_fp" if fixed_point is not None else "pooled"
    return (
        per.groupBy("group")
        .agg(
            F.max("c").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias(out_col),
        )
        .transform(lambda d: d.orderBy("group") if ordered else d)
    )


def product_quantize(
    df: DataFrame,
    m: int = 2,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fixed_point: int = 6,
    centroids: dict[int, list[float]] | None = None,
    backend: str = "catalyst",
    ordered: bool = True,
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Product quantization (PQ — Jégou et al. 2011): split each vector
    into ``m`` contiguous subvectors and quantize each against its own
    ``k``-entry codebook, compressing d floats to m small code ids — the
    memory layout IVF-PQ ANN indexes store at corpus scale.

    Codebook training here is ONE Lloyd step from the deterministic
    hash-init partition (the same oracle-checkable recipe as the
    'kmeans'/'kcent' legs): because the init cluster of a vector is a
    function of its id alone, the per-cluster mean of the FULL vector,
    sliced into m parts, IS the per-subspace codebook — so training is
    ONE (cluster, pos) fixed-point aggregate over the corpus, not m of
    them, and the driver holds only k x d integers. Production PQ runs
    more Lloyd iterations per subspace on a sample; this form trades
    codebook quality for a bit-reproducible, cross-engine-checkable
    train step with the identical Spark shape (aggregate + map-side
    assign).

    Assignment is one map-side projection: per subspace, the strictly
    left-to-right Catalyst squared-distance fold (bit-matching DuckDB's
    list_sum) and a lexicographic (dist, code) argmin — ties to the
    lowest code id.

    Returns (codes, codebook): codes = (vec_id, codes array<long>) with
    m entries per row, ordered by vec_id; codebook = the full-vector
    centroid dict (cluster -> d doubles) whose m slices are the
    subspace codebooks. Empty init buckets (possible only with fewer
    ids than k) simply yield no codebook entry, as in kmeans_fit.

    Pass ``centroids`` (a full-vector codebook in the same dict form,
    e.g. from a previous train or shared with a coarse IVF quantizer)
    to skip the train aggregate and only assign codes.

    ``backend='catalyst'`` (default) bakes the codebook into the plan as
    literals — the oracle-checkable strictly-left-to-right fold, but the
    plan size is O(k x d): past ~64 entries the py4j literal build and
    the codegen block dominate. ``backend='numpy'`` assigns via one
    Arrow-batched GEMM argmin per subspace (same ties-to-lowest-id rule;
    float summation order differs in the last bits, so it is
    ENGINE-deterministic — identical reruns, which is what encode
    determinism for deletion-as-negation needs — but not
    oracle-reproducible). The auto-sized coarse quantizer path
    (similarity.write_pq_index n_cells='auto') selects it for large k;
    its output id column is cast to BIGINT (mapInPandas needs a fixed
    schema).
    """
    from sum_spark.operators.clustering import (
        _centroids_from_sums,
        centroid_sums,
        hash_init_assign,
    )

    if m < 1 or k < 1:
        raise ValueError("product_quantize needs m >= 1 and k >= 1")
    if centroids is not None:
        cents = centroids
    else:
        init = hash_init_assign(df, k, id_col)
        cents = _centroids_from_sums(
            centroid_sums(init, "cluster", vec_col, fixed_point).collect(), fixed_point
        )
    items = sorted(cents.items())
    if backend == "numpy":
        _pq_check_dims(items, m)
        return _pq_codes_numpy(df, m, items, id_col, vec_col), cents
    codes = df.select(
        F.col(id_col).alias("vec_id"),
        F.array(*pq_code_cols(items, m, vec_col)).alias("codes"),
    ).transform(lambda d: d.orderBy("vec_id") if ordered else d)
    return codes, cents


def _pq_check_dims(items: list, m: int) -> int:
    d = len(items[0][1])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return d


def pq_code_cols(items: list, m: int, vec_col: str) -> list:
    """The ``m`` catalyst PQ-code Columns over ``vec_col`` for a sorted
    (cluster, centroid) item list — product_quantize's assignment
    expressions factored out so an index build can attach codes in the
    SAME projection that carries the coarse id: the previous
    write/maintain shape re-derived codes in a second frame and JOINED
    it back on id (one shuffle join + its exchanges per build/append/
    retire, guide §2.4 — removed)."""
    d = _pq_check_dims(items, m)
    sd = d // m
    v = F.col(vec_col).cast("array<double>")
    from sum_spark.functions.litsql import darray

    code_cols = []
    for j in range(m):
        sub = F.slice(v, j * sd + 1, sd)
        # one expr string per subspace book (functions/litsql.py): the
        # k x sd literal structs cost ~1 py4j call instead of ~k x sd
        cent_lit = F.expr(
            "array("
            + ", ".join(
                f"struct({darray(c[j * sd : (j + 1) * sd])} AS c,"
                f" CAST({int(cid)} AS BIGINT) AS j)"
                for cid, c in items
            )
            + ")"
        )
        # Factory closure, NOT a default arg: PySpark introspects HOF
        # lambda arity, and `lambda s, sub=sub:` would be called as the
        # two-arg (element, index) form with `sub` bound to the index.
        def _dist_struct(sub_expr):
            return lambda s: F.struct(
                F.aggregate(
                    F.zip_with(sub_expr, s["c"], lambda x, c: (x - c) * (x - c)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                s["j"].alias("j"),
            )

        best = F.array_min(F.transform(cent_lit, _dist_struct(sub)))
        code_cols.append(best["j"])
    return code_cols


def _pq_codes_numpy(
    df: DataFrame,
    m: int,
    items: list,
    id_col: str,
    vec_col: str,
    carry_coarse: bool = False,
) -> DataFrame:
    """Arrow-batched GEMM PQ assignment (the large-k encode): per
    subspace, ||x||^2 - 2 x.c + ||c||^2 over the whole batch, argmin to
    the FIRST minimum = lowest code id (items are sorted). One NumPy
    pass per batch, no plan literals — plan size O(1) in k."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # The schema below carries vec_id as BIGINT; a non-integral id
    # (string ids) would cast to NULL row-by-row and the join back in
    # write_pq_index would silently drop every row — an empty index with
    # no error, while the small-k catalyst path preserves any id type
    # (ADVICE r8). Refuse loudly instead.
    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"product_quantize(backend='numpy') needs an integral id "
            f"column; {id_col!r} is {id_type.simpleString()}. Use the "
            f"catalyst backend, or map ids to BIGINT first (assign_ids)."
        )
    keys = np.array([j for j, _ in items], dtype=np.int64)
    cmat = np.array([c for _, c in items], dtype=np.float64)
    d = cmat.shape[1]
    sd = d // m

    def _codes(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            out = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                xs = x[:, j * sd : (j + 1) * sd]
                cs = cmat[:, j * sd : (j + 1) * sd]
                d2 = (
                    (xs * xs).sum(axis=1)[:, None]
                    - 2.0 * (xs @ cs.T)
                    + (cs * cs).sum(axis=1)[None, :]
                )
                out[:, j] = keys[np.argmin(d2, axis=1)]
            cols = {"vec_id": pdf["__id"].values, "codes": list(out)}
            if carry_coarse:
                cols["coarse"] = pdf["__coarse"].values
            yield pd.DataFrame(cols)

    # carry_coarse ships the precomputed coarse id through the batch so a
    # residual index build/maintain emits (id, coarse, codes) in ONE
    # python pass — the old shape joined a separate codes frame back on
    # id (guide §2.4).
    src = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        *([F.col("coarse").cast("long").alias("__coarse")] if carry_coarse else []),
    )
    schema = (
        "vec_id long, codes array<bigint>, coarse long"
        if carry_coarse
        else "vec_id long, codes array<bigint>"
    )
    return src.mapInPandas(_codes, schema=schema)
