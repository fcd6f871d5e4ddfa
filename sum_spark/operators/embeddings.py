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
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
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
    ).orderBy("vec_id")
