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
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Equi-join-able range join on float values.

    intervals are half-open [lo, hi). ``step`` is the bucket width: choose
    it near the median interval span so each interval explodes into O(1)
    buckets. Output: facts columns + interval columns.

    The residual [lo, hi) predicate lives in the join condition (not a
    post-filter), so outer semantics are honest: how='left' keeps
    unmatched facts as NULL-padded rows instead of silently degrading to
    inner. Facts-preserving joins only — an interval exploded into B
    buckets would surface B times as an unmatched right/full row.
    Empty intervals (hi <= lo) are dropped up front; they can match
    nothing, and sequence(b_lo, b_hi) would otherwise descend and emit
    spurious buckets.
    """
    if how not in ("inner", "left", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            f"range_join supports facts-preserving joins only, got how={how!r}"
        )
    b_lo = F.floor(F.col(lo_col) / step).cast("long")
    b_hi = F.floor((F.col(hi_col) - 1e-12) / step).cast("long")
    iv = intervals.where(F.col(hi_col) > F.col(lo_col)).withColumn(
        "__ibucket", F.explode(F.sequence(b_lo, b_hi))
    )
    if broadcast_intervals:
        # Small interval tables (tier maps, calendars) should never force
        # a shuffle of the fact side: ship the exploded buckets to every
        # executor instead.
        iv = F.broadcast(iv)
    f = facts.withColumn("__bucket", F.floor(F.col(value_col) / step).cast("long"))
    cond = (
        (f["__bucket"] == iv["__ibucket"])
        & (f[value_col] >= iv[lo_col])
        & (f[value_col] < iv[hi_col])
    )
    out = f.join(iv, cond, how)
    return out.drop("__bucket", "__ibucket")
