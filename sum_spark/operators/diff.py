"""Corpus snapshot diff — the incremental-processing primitive.

A 100 TB training corpus is rebuilt in versions; reprocessing everything
per version is the cost model snapshot_diff exists to kill: diff two
snapshots into (added, removed, changed) id sets, then run the expensive
stages (dedup signatures, quality scores, embeddings) on added+changed
only and retire removed — the delta feed for dedup_incremental's
``corpus_sig`` path and the shard-resume machinery (sources/shards.py).

Shape at scale: ONE full-outer equi-join on the id, comparing a per-row
content digest computed map-side — no content moves through the shuffle,
only (id, 64-bit digest). The digest is engine-internal equality state
(xxhash64, CLAUDE.md hash-key rule — oracles check the emitted statuses,
which they recompute from their own diff semantics, never the digest).

No reference analog (the reference stores one live dataset, no version
surface); extends the curation family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Diff snapshot ``a`` (old) against ``b`` (new): one row per id
    whose membership or content changed —

    - ``added``:   id in b only
    - ``removed``: id in a only
    - ``changed``: id in both, content digest differs

    Unchanged ids emit nothing (the overwhelmingly common case — the
    output is delta-sized, not corpus-sized). Output: (id, status).
    """

    def digest(df: DataFrame) -> F.Column:
        return F.xxhash64(*[F.col(c) for c in content_cols])

    aa = a.select(F.col(id_col).alias("id"), digest(a).alias("__ha"))
    bb = b.select(F.col(id_col).alias("id"), digest(b).alias("__hb"))
    j = aa.join(bb, "id", "full_outer")
    status = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
    )
    return (
        j.select("id", status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def delta_ids(diff: DataFrame) -> DataFrame:
    """The ids the expensive stages must (re)process: added + changed."""
    return diff.where(F.col("status").isin("added", "changed")).select("id")
