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


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str = "lo",
    a_hi: str = "hi",
    b_lo: str = "lo",
    b_hi: str = "hi",
    step: float = 1.0,
    broadcast_b: bool = False,
) -> DataFrame:
    """Interval-OVERLAP join: pairs where [a_lo, a_hi) ∩ [b_lo, b_hi) is
    non-empty (a.lo < b.hi AND b.lo < a.hi) — the two-interval-table
    generalization of range_join, same discretization strategy.

    Both sides explode into the fixed-width buckets they cover and match
    on bucket equality + the residual overlap predicate. An overlapping
    pair shares MIN(span_a, span_b)/step + 1 buckets; emitting the pair
    once per shared bucket would need a distinct over the full result.
    Instead each candidate pair is claimed by exactly ONE bucket — the
    first bucket both intervals cover, max(bucket(a_lo), bucket(b_lo)) —
    a pure per-row predicate, no dedup shuffle. (The trick every
    spatial-binning join uses; DuckDB/Postgres call it the 'reference
    point' method.)

    Work is O(|a| * spans_a/step + |b| * spans_b/step) with a
    hash-partitionable key; choose ``step`` near the median span so each
    interval explodes into O(1) buckets. Inner join only (an outer
    interval row would surface once per exploded bucket).
    """

    def buckets(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        blo = F.floor(F.col(lo) / step).cast("long")
        bhi = F.floor((F.col(hi) - 1e-12) / step).cast("long")
        return (
            df.where(F.col(hi) > F.col(lo))
            .withColumn(f"__{tag}blo", blo)
            .withColumn(f"__{tag}b", F.explode(F.sequence(blo, bhi)))
        )
    aa = buckets(a, a_lo, a_hi, "a")
    bb = buckets(b, b_lo, b_hi, "b")
    if broadcast_b:
        bb = F.broadcast(bb)
    cond = (
        (aa["__ab"] == bb["__bb"])
        # overlap residual
        & (aa[a_lo] < bb[b_hi])
        & (bb[b_lo] < aa[a_hi])
        # reference-point claim: only the FIRST shared bucket emits
        & (aa["__ab"] == F.greatest(aa["__ablo"], bb["__bblo"]))
    )
    return aa.join(bb, cond, "inner").drop("__ab", "__ablo", "__bb", "__bblo")
