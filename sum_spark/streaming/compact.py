"""Batch-directory compaction for the merge-at-read streaming families
(sketch grids, KMV sketches, histograms, rollup partials).

Those sinks write one tiny parquet dir per micro-batch — the layout that
makes redelivery idempotent — so a stream running for months accumulates
unbounded bookkeeping directories: the merged STATE stays kilobytes, but
the read-side merge opens ever more files and the filesystem holds ever
more metadata. Compaction folds every committed batch directory into one
(the merge functions are exactly the per-family roll-ups the readers
already use), after which reads are O(1) directories again.

Run it OFFLINE — with the stream stopped. Safety argument:
- New batches after restart get ids strictly above every committed id
  (checkpoint monotonicity), and a committed batch is never redelivered,
  so folding committed directories into ``batch_id=<max_id>`` cannot
  collide with a future or replayed batch.
- The merged cells are written under ``<path>/_compacted`` first — an
  underscore directory, INVISIBLE to the family readers — then the old
  batch directories are removed and the compacted one is renamed into
  place. A crash in the window between removal and rename is recoverable
  by re-running: the function detects a completed ``_compacted`` with no
  batch directories and finishes the rename (the merged data was durable
  before anything was deleted).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _batch_dirs(path: str) -> list[tuple[int, str]]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("batch_id="):
            try:
                out.append((int(name.split("=", 1)[1]), os.path.join(path, name)))
            except ValueError:
                continue
    return sorted(out)


def compact_batches(
    spark: SparkSession, path: str, merged: DataFrame | None = None
) -> int:
    """Fold all ``batch_id=N`` directories under ``path`` into the
    highest one. ``merged`` is the family's merged view of ``path`` (e.g.
    ``read_count_min(spark, path)``); when None the rows are unioned
    as-is (correct for families whose reader is a plain cell merge the
    next read re-applies — the sketch/histogram/rollup families all
    re-aggregate at read, so pre-merging is an optimization, not a
    requirement). Returns the surviving batch id, or -1 if there was
    nothing to compact. The stream writing ``path`` must be stopped.
    """
    tmp = os.path.join(path, "_compacted")
    marker = os.path.join(tmp, "_SUCCESS")
    dirs = _batch_dirs(path)
    if os.path.isdir(tmp) and os.path.isfile(marker) and not dirs:
        # Crash-recovery: merged data was durable, old dirs already gone —
        # finish the rename. The id was stashed in the marker.
        with open(marker) as fh:
            max_id = int(fh.read().strip() or 0)
        os.rename(tmp, os.path.join(path, f"batch_id={max_id}"))
        return max_id
    if len(dirs) <= 1:
        return dirs[0][0] if dirs else -1
    max_id = dirs[-1][0]
    rows = merged if merged is not None else spark.read.parquet(path)
    if merged is None:
        rows = rows.drop("batch_id")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    # Stash the target id in the _SUCCESS marker so recovery knows it.
    with open(marker, "w") as fh:
        fh.write(str(max_id))
    for _, d in dirs:
        shutil.rmtree(d)
    os.rename(tmp, os.path.join(path, f"batch_id={max_id}"))
    return max_id
