"""As-of join: for each left row, the latest right row of the same key
with right.ts <= left.ts (direction='backward', the default), or the
earliest with right.ts >= left.ts (direction='forward'), optionally
bounded by a tolerance interval — the pandas merge_asof surface on
Spark.

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it); a naive
theta join (`l.key = r.key AND r.ts <= l.ts` + rank) explodes to the full
per-key history per row. The scalable form used here is the classic
union-sort-window trick:

  1. tag right rows, project their carried columns, null-pad the rest;
  2. union with left rows;
  3. one window per key ordered by (ts, right-first-on-ties):
     last(value, ignorenulls) propagates the most recent right value
     forward onto every left row (forward direction flips the sort, so
     the same frame propagates the NEXT right value backward);
  4. keep left rows.

Exactly one shuffle (the window partitioning), no row amplification —
this survives a 100 TB fact table joined against a large dimension
history, which the rank-over-theta-join form does not. Tie semantics:
a right row at the same timestamp IS visible in both directions,
matching DuckDB ASOF.

Tolerance: the as-of pick is by construction the CLOSEST qualifying
right row, so bounding the match is a post-check — if the carried row
is farther than ``tolerance``, no other qualifying row could be closer,
and the carried values null out (same plan, one more projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_ASOF_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    values: dict[str, str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """``values`` maps output-column -> right-column to carry as-of
    (default: every right column except the key and timestamp).
    ``direction``: 'backward' (latest right at or before) or 'forward'
    (earliest right at or after). ``tolerance``: an interval string
    (e.g. '30 minutes'); matches farther than it carry NULLs.
    Output: all left columns + the carried columns (NULL when no right
    row qualifies — left-join semantics)."""
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if values is None:
        values = {c: c for c in right.columns if c not in (on, ts_col)}

    # Carry ONE struct per right row, not per-column lasts: with
    # per-column last(ignorenulls), a genuinely-NULL carried value on the
    # newest right row would be skipped and an OLDER row's value carried
    # in its place — a mixed-row result. The struct is non-NULL for every
    # right row (even when all its fields are NULL), so all carried
    # columns come from the same right row and its NULLs propagate —
    # matching DuckDB ASOF. The right row's own timestamp rides in the
    # struct for the tolerance check.
    vs_type = T.StructType(
        [T.StructField(out, right.schema[src].dataType) for out, src in values.items()]
        + [T.StructField(_ASOF_TS, right.schema[ts_col].dataType)]
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__is_r"),
        F.struct(
            *[F.col(src).alias(out) for out, src in values.items()],
            F.col(ts_col).alias(_ASOF_TS),
        ).alias("__vs"),
    )
    l = left.select(
        "*",
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(vs_type).alias("__vs"),
    )
    # Null-pad the left-only columns on the right side, then align.
    for c in left.columns:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))

    # Right rows sort before left rows at equal ts -> inclusive as-of.
    # Backward walks time ascending (carry the most recent previous
    # right row); forward walks descending (carry the nearest next one).
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        W.partitionBy(on)
        .orderBy(ts_order, F.col("__is_r").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Stage the windowed struct in its own projection so the per-field
    # extraction doesn't re-evaluate the window per output column.
    staged = u.select(
        *left.columns,
        F.col("__is_r"),
        F.last("__vs", ignorenulls=True).over(w).alias("__carry"),
    )
    carry = F.col("__carry")
    if tolerance is not None:
        gap = (
            F.col(ts_col) - carry.getField(_ASOF_TS)
            if direction == "backward"
            else carry.getField(_ASOF_TS) - F.col(ts_col)
        )
        carry = F.when(gap <= F.expr(f"INTERVAL {tolerance}"), carry)
    return (
        staged.where(F.col("__is_r") == 0)
        .select(
            *left.columns,
            *[carry.getField(out).alias(out) for out in values],
        )
    )
