"""Range join: match facts to interval rows (lo <= v < hi).

Spark executes a naive `ON v >= lo AND v < hi` as a broadcast nested
loop — fine for a handful of intervals, quadratic death at scale. The
scalable form here discretizes the value domain: each interval explodes
into the fixed-width buckets it covers, facts compute their bucket, and
the match becomes an equi-join on bucket + residual filter. Work is
O(facts + intervals * span/step) with a hash-partitionable key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Equi-join-able range join on float values.

    intervals are half-open [lo, hi). ``step`` is the bucket width: choose
    it near the median interval span so each interval explodes into O(1)
    buckets. Output: facts columns + interval columns.
    """
    b_lo = F.floor(F.col(lo_col) / step).cast("long")
    b_hi = F.floor((F.col(hi_col) - 1e-12) / step).cast("long")
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    f = facts.withColumn("__bucket", F.floor(F.col(value_col) / step).cast("long"))
    out = f.join(iv, "__bucket", how).where(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return out.drop("__bucket")
