"""Z-order (Morton) data layout — multi-dimensional scan locality.

The 100 TB problem this solves: a corpus sorted by ONE column gives
min/max file skipping on that column only; queries filtering on a
second dimension (user AND time, domain AND length) still read
everything. Interleaving the bits of both dimensions into one Morton
key and range-partitioning + sorting by it makes every output file a
small rectangle in BOTH dimensions, so parquet min/max stats prune
scans on either filter column — the technique behind Delta/Iceberg
Z-ORDER clustering, expressed here as plain Catalyst integer
expressions (shift/and/or — whole-stage codegen, no UDF).

The key is pure integer math over range-quantized inputs, so a SQL
oracle reproduces every key bit-for-bit (duck_zorder_sql), unlike
engine-private clustering implementations.

No reference analog (the reference has no storage-layout surface);
this extends the training-pipeline layout family (assign_contiguous_ids,
global_shuffle, shards) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension resolution; 2 dims x 16 bits = 32-bit key


def _quantize(expr: str, cmin: int, cmax: int, bits: int) -> str:
    """Map an integer SQL expression with known [cmin, cmax] bounds onto
    [0, 2^bits): ((c - cmin) * (2^bits - 1)) DIV (cmax - cmin).
    Integer ops end-to-end (CLAUDE.md: float division on rank-derived
    integers rounds across bucket boundaries); caller guarantees
    (cmax - cmin) * (2^bits - 1) fits BIGINT — true for any real id /
    epoch-seconds / length column at bits=16."""
    mask = (1 << bits) - 1
    if cmax <= cmin:
        return "CAST(0 AS BIGINT)"
    return f"CAST(((({expr}) - ({cmin})) * {mask}) DIV ({cmax} - ({cmin})) AS BIGINT)"


def _zorder_key_sql(col_sqls: list[str], bits: int = ZORDER_BITS) -> str:
    """The Morton interleave as ONE SQL string over already-quantized
    SQL expressions — the N x bits shift/and/or chain cost ~160 py4j
    round trips as Column objects (VERDICT r7 #2); same expression
    tree."""
    n = len(col_sqls)
    pieces = [
        f"shiftleft(shiftright(({c}), {b}) & 1, {b * n + i})"
        for i, c in enumerate(col_sqls)
        for b in range(bits)
    ]
    return "CAST((" + " | ".join(pieces) + ") AS BIGINT)"


def zorder_key(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of N already-quantized [0, 2^bits) integer
    columns: bit b of column i lands at position b*N + i. A chain of
    shift/and/or literals — Catalyst folds it into one codegen'd
    expression; no UDF, no shuffle. (Internal callers that already hold
    SQL strings use _zorder_key_sql — one expr, same tree.)"""
    n = len(cols)
    z: Column | None = None
    for i, c in enumerate(cols):
        for b in range(bits):
            piece = F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            )
            z = piece if z is None else z.bitwiseOR(piece)
    return z.cast("long")


def zorder_layout(
    df: DataFrame,
    dims: list[str],
    n_partitions: int,
    bits: int = ZORDER_BITS,
    key_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` by the Morton key of ``dims`` (integer columns):
    bounds come from ONE bounded agg (2 values per dim collected to the
    driver), rows are range-partitioned and sorted by the key, so a
    subsequent parquet write yields files that are min/max-tight in
    every dimension. Returns the frame with ``key_col`` attached (drop
    it after writing, or keep it as the cluster id)."""
    [bounds] = df.agg(
        *[F.min(d).cast("long").alias(f"__mn{i}") for i, d in enumerate(dims)],
        *[F.max(d).cast("long").alias(f"__mx{i}") for i, d in enumerate(dims)],
    ).collect()
    qsqls = [
        _quantize(d, bounds[f"__mn{i}"], bounds[f"__mx{i}"], bits)
        for i, d in enumerate(dims)
    ]
    keyed = df.withColumn(key_col, F.expr(_zorder_key_sql(qsqls, bits)))
    return keyed.repartitionByRange(n_partitions, key_col).sortWithinPartitions(
        key_col
    )


def zorder_rank(
    df: DataFrame,
    dims: list[str],
    id_col: str,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """(id, zpos): each row's rank along the Z-curve (ties by id) via
    the two-pass contiguous-id path — the checkable form of the layout
    (zorder_layout's partition boundaries are range-split points of
    exactly this order)."""
    from sum_spark.operators.sampling import assign_contiguous_ids

    [bounds] = df.agg(
        *[F.min(d).cast("long").alias(f"__mn{i}") for i, d in enumerate(dims)],
        *[F.max(d).cast("long").alias(f"__mx{i}") for i, d in enumerate(dims)],
    ).collect()
    qsqls = [
        _quantize(d, bounds[f"__mn{i}"], bounds[f"__mx{i}"], bits)
        for i, d in enumerate(dims)
    ]
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_zorder_key_sql(qsqls, bits)).alias("__zk"),
    )
    out = assign_contiguous_ids(keyed, ["__zk", "doc_id"], id_name="zpos")
    return out.select("doc_id", "zpos").orderBy("zpos")


def duck_zorder_sql(
    dim_exprs: list[str],
    bounds_sql: list[tuple[str, str]],
    bits: int = ZORDER_BITS,
) -> str:
    """DuckDB expression rebuilding the Morton key: ``dim_exprs`` are
    the raw integer expressions, ``bounds_sql`` the (min_sql, max_sql)
    scalar subquery strings per dim (so the oracle derives the same
    bounds from the same data). Returns one BIGINT expression."""
    n = len(dim_exprs)
    qs = []
    for expr, (mn, mx) in zip(dim_exprs, bounds_sql):
        mask = (1 << bits) - 1
        qs.append(
            f"(CASE WHEN ({mx}) <= ({mn}) THEN 0 ELSE "
            f"((({expr}) - ({mn})) * {mask}) // (({mx}) - ({mn})) END)"
        )
    pieces = []
    for i, q in enumerate(qs):
        for b in range(bits):
            pieces.append(f"((({q} >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(pieces) + ")"
