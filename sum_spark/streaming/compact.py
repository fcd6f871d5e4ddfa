"""Batch-directory compaction for the merge-at-read streaming families
(sketch grids, KMV sketches, histograms, rollup partials, corpus state).

Those sinks write one tiny parquet dir per micro-batch — the layout that
makes redelivery idempotent — so a stream running for months accumulates
unbounded bookkeeping directories: the merged STATE stays kilobytes, but
the read-side merge opens ever more files and the filesystem holds ever
more metadata. Compaction folds every committed batch directory into one
(the merge functions are exactly the per-family roll-ups the readers
already use), after which reads are O(1) directories again.

Run it with NO CONCURRENT WRITER — either offline (stream stopped) or
from inside the stream's own ``foreachBatch`` sink, which Spark
serializes (the auto-compaction hooks in streaming/state.py,
streaming/search.py, streaming/ann.py do exactly that). Safety argument:
- New batches after restart get ids strictly above every committed id
  (checkpoint monotonicity), and a committed batch is never redelivered,
  so folding committed directories into ``batch_id=<max committed id>``
  cannot collide with a future or replayed batch.
- A batch the stream WROTE but never COMMITTED (crash mid-batch) IS
  redelivered, and the sink's idempotent overwrite would replace the
  folded directory with one micro-batch's rows — silent data loss. Pass
  the stream's ``checkpoint`` so such tail dirs are detected
  (``<checkpoint>/commits``); they abort the compaction by default, or
  with ``partial=True`` are left untouched while the committed prefix
  folds (the same contract as operators/search._batch_fold_plan).
- The merged cells are written under ``<path>/_compacted`` first — an
  underscore directory, INVISIBLE to the family readers — then the old
  batch directories are removed and the compacted one is renamed into
  place. A crash in the window between removal and rename is recoverable
  by re-running: the marker records the target id and the folded ids,
  so recovery removes any folded stragglers and finishes the rename
  (the merged data was durable before anything was deleted).
- Concurrent READERS can transiently fail during the remove/rename
  window; reads racing an active stream were never isolation-safe.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def _pending_ids(ids: list[int], checkpoint: str | None, partial: bool) -> list[int]:
    """Ids newer than the stream's last committed micro-batch — unsafe to
    fold (their redelivery would overwrite the fold). Mirrors
    operators/search._batch_fold_plan for the single-frame layout."""
    if partial and checkpoint is None:
        raise ValueError(
            "partial=True needs the stream's checkpoint to know which "
            "batches are committed"
        )
    if checkpoint is None:
        return []
    commits_dir = os.path.join(checkpoint, "commits")
    committed = (
        [int(n) for n in os.listdir(commits_dir) if n.isdigit()]
        if os.path.isdir(commits_dir)
        else []
    )
    top = max(committed, default=-1)
    pending = sorted(i for i in ids if i > top)
    if pending and not partial:
        raise ValueError(
            f"batch dirs {pending} are newer than the last committed "
            f"micro-batch ({top}): the stream stopped mid-batch; resume "
            "it to commit, stop cleanly, then compact — or pass "
            "partial=True to fold the committed prefix and leave the "
            "tail in place"
        )
    return pending


def _parse_marker(marker: str) -> tuple[int, set[int]] | None:
    """Parse a recovery marker: ``(target id, folded ids)``. Two-line
    stash -> non-empty folded set; legacy single-line -> empty set;
    anything unparseable (notably Spark's own EMPTY _SUCCESS from the
    job commit, written before the stash overwrite) -> None."""
    with open(marker) as fh:
        lines = fh.read().splitlines()
    if not lines or not lines[0].strip():
        return None
    try:
        max_id = int(lines[0].strip())
        folded = (
            {int(x) for x in lines[1].split(",") if x.strip()}
            if len(lines) > 1
            else set()
        )
    except ValueError:
        return None
    if len(lines) > 1 and not folded:
        return None
    return max_id, folded


def compact_batches(
    spark: SparkSession,
    path: str,
    merged: DataFrame | None = None,
    checkpoint: str | None = None,
    partial: bool = False,
    n_files: int | None = 1,
) -> int:
    """Fold all ``batch_id=N`` directories under ``path`` into the
    highest COMMITTED one. ``merged`` is the family's merged view of
    ``path`` (e.g. ``read_count_min(spark, path)``); when None the rows
    are unioned as-is (correct for families whose reader is a plain cell
    merge the next read re-applies — the sketch/histogram/rollup/state
    families all re-aggregate at read, so pre-merging is an
    optimization, not a requirement). ``checkpoint``/``partial`` guard
    against folding a written-but-uncommitted tail (see module
    docstring); ``merged`` cannot be combined with a pending tail (the
    caller's merged view would bake the uncommitted rows in). ``n_files``
    coalesces the fold (default 1 — right for kilobyte sketch states);
    pass None to keep the plan's own partitioning for large frames.
    Returns the surviving batch id, or -1 if there was nothing to
    compact. No concurrent WRITER may be active (the stream's own sink
    is fine — foreachBatch serializes)."""
    tmp = os.path.join(path, "_compacted")
    marker = os.path.join(tmp, "_SUCCESS")
    dirs = _batch_dirs(path)
    pending = _pending_ids([i for i, _ in dirs], checkpoint, partial)
    if merged is not None and pending:
        raise ValueError(
            f"batch dirs {pending} are uncommitted and `merged` was "
            "given: the merged view cannot exclude them — pass "
            "merged=None for a partial fold"
        )
    foldable = [(i, d) for i, d in dirs if i not in set(pending)]
    if os.path.isdir(tmp) and os.path.isfile(marker):
        # Crash-recovery — but ONLY when the marker parses to the full
        # two-line stash (target id + folded ids). Spark's parquet job
        # commit creates an EMPTY _SUCCESS inside tmp BEFORE the stash
        # overwrite lands, so a crash in that window leaves an empty
        # marker; and a pre-stash-era single-line marker can't say which
        # dirs were folded. In both cases NO deletion can have happened
        # yet for the empty-marker case (deletions follow the stash
        # write), so the safe move is to redo the fold — the overwrite
        # of tmp is idempotent. A legacy single-line marker finishes the
        # rename only under its original recovery condition (every batch
        # dir already gone); with surviving batch dirs it RAISES instead
        # of refolding — the marker can't prove which dirs were inputs,
        # so an automatic refold could silently drop rows
        # (test_streaming_autocompact pins the refusal).
        stash = _parse_marker(marker)
        if stash is not None:
            max_id, folded = stash
            if folded:
                # Full two-line stash: deletions may have started —
                # remove folded stragglers, then finish the rename.
                for i, d in dirs:
                    if i in folded and os.path.isdir(d):
                        shutil.rmtree(d)
                os.rename(tmp, os.path.join(path, f"batch_id={max_id}"))
                return max_id
            if not dirs:
                # Legacy single-line marker, original self-heal shape.
                os.rename(tmp, os.path.join(path, f"batch_id={max_id}"))
                return max_id
            # Legacy single-line marker WITH surviving batch dirs: the
            # marker can't say which dirs were already folded, so if the
            # legacy crash happened mid-deletion, tmp holds the ONLY
            # complete copy and refolding from the survivors would
            # silently lose the deleted batches' rows (ADVICE r10).
            # Refuse and require a human decision instead of deleting
            # the one durable fold.
            raise RuntimeError(
                f"{tmp} holds a completed fold with a legacy single-line "
                f"marker while batch dirs {sorted(i for i, _ in dirs)} "
                "still exist: the marker cannot prove those dirs were "
                "all inputs to the fold, so neither the fold nor the "
                "dirs can be safely discarded automatically. Inspect "
                "and either remove the _compacted dir (if every batch "
                "dir survived the crash) or rename it to its target "
                "batch_id and delete the dirs it folded."
            )
        shutil.rmtree(tmp)
    if len(foldable) <= 1:
        return foldable[-1][0] if foldable else -1
    max_id = foldable[-1][0]
    rows = merged if merged is not None else spark.read.parquet(path)
    if merged is None:
        if pending:
            rows = rows.where(~F.col("batch_id").isin(pending))
        rows = rows.drop("batch_id")
    if n_files is not None:
        rows = rows.coalesce(n_files)
    rows.write.mode("overwrite").parquet(tmp)
    # Stash the target id and folded ids so recovery can finish the swap.
    with open(marker, "w") as fh:
        fh.write(f"{max_id}\n{','.join(str(i) for i, _ in foldable)}")
    for _, d in foldable:
        shutil.rmtree(d)
    os.rename(tmp, os.path.join(path, f"batch_id={max_id}"))
    return max_id


def maybe_auto_compact(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    auto_compact_after: int | None,
    n_files: int | None = 1,
) -> int | None:
    """Sink-side auto-compaction hook (VERDICT r8 #3): called at the TOP
    of a foreachBatch sink, folds the committed batch-dir prefix once the
    directory count crosses ``auto_compact_after``. partial=True by
    construction — a stale dir from a mid-batch crash is left for its own
    redelivery — and running before the current batch's write means the
    arriving batch is never part of the fold. No-op when the threshold is
    None or not yet reached; returns the surviving batch id when a fold
    ran. Amortized cost: O(state) once every ``auto_compact_after``
    batches."""
    if auto_compact_after is None:
        return None
    if len(_batch_dirs(path)) < auto_compact_after:
        return None
    return compact_batches(
        spark, path, checkpoint=checkpoint, partial=True, n_files=n_files
    )
