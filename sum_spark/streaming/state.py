"""Streaming maintenance of the incremental-prepare corpus state.

pipeline.corpus_state is the artifact set a snapshot leaves behind for
prepare_training_data_incremental (per-doc metadata, MinHash signatures,
the verified near-dup pair set, contamination verdicts). On a live
deployment those artifacts are not rebuilt per snapshot — they are
MAINTAINED AT INGEST: each arriving micro-batch contributes its per-doc
rows plus its pair-set increment, written under idempotent batch-id
directories (the engine's standard redelivery-safe sink layout), and the
state "so far" is assembled at read time.

The pair increment is the only cross-batch piece: within-batch pairs come
from the batch's own LSH pass, and cross-batch pairs from a band join of
the batch's signatures against all PRIOR batches' stored signatures (a
stream-static read filtered on the batch_id partition column — which also
makes redelivery exact: a redelivered batch overwrites its own increment
and never sees its own previous write as "prior"). Every pair is produced
exactly once — by the batch holding its LATER document — so the
assembled pair set equals dedup_minhash_lsh over everything ingested
(parity-tested in tests/test_streaming_state.py).

Streams are append-only; retirement (removed/changed docs) is a SNAPSHOT
operation handled by the batch transition path
(prepare_training_data_incremental's retired_ids), not by the stream.
The same boundary rule serves the stream-grown indexes (inverted index,
PQ vector index): stop the stream, apply batch retirements/appends into
NEGATIVE batch_id dirs (checkpoints only commit ids >= 0), compact —
keep_batch_layout=True to resume the stream, default False to hand off
to flat batch maintenance (flat and batch layouts must never mix; the
read fails). Tested end-to-end in tests/test_streaming_search.py and
tests/test_streaming_ann.py.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from sum_spark.operators.dedup import (
    _bands_from_sig,
    _exact_jaccard_pairs,
    minhash_lsh_from_sig,
    minhash_signatures,
)
from sum_spark.operators.pipeline import _doc_meta

# NOTE (round-10 measurement, BASELINE.md corpus-state section): a
# serve-context cache of the prior sig/band rows (persisted per-batch
# parts, folded after each commit, periodically flattened) was built and
# MEASURED AGAINST the plain stream-static re-read below — and lost:
# per-trigger pairs-write went from a steady ~2.0 s to 2.4-13 s at
# sf0.1/10 batches. Band derivation is one xxhash64 mix per band and the
# prior parquet re-read is a single columnar scan with batch_id pruning,
# while the cache pays 16x exploded band rows through the block manager
# plus one InMemoryRelation per fold on every trigger's plan. The
# re-read IS the right design; what the context DOES cache is the static
# benchmark's shingle-hash set (below), which otherwise re-hashed the
# benchmark text every micro-batch.


class _TerminationCleanup(StreamingQueryListener):
    """One listener per SparkSession: runs (and discards) a registered
    cleanup callback when its streaming query terminates — the stream
    analogue of the dedup operators' weakref-finalizer release pattern
    (ADVICE r10: per-query persisted frames outliving their query
    accumulate in sessions that run many corpus-state streams). A
    callback for a query that never terminates simply stays registered;
    the frame it guards is still in live use."""

    _by_session: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

    def __init__(self) -> None:
        self._cbs: dict[str, object] = {}

    @classmethod
    def register(cls, spark: SparkSession, query_id, cb) -> None:
        inst = cls._by_session.get(spark)
        if inst is None:
            inst = cls()
            spark.streams.addListener(inst)
            cls._by_session[spark] = inst
        inst._cbs[str(query_id)] = cb

    @classmethod
    def unregister(cls, spark: SparkSession, query_id) -> None:
        inst = cls._by_session.get(spark)
        if inst is not None:
            inst._cbs.pop(str(query_id), None)

    def onQueryStarted(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryProgress(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:
        cb = self._cbs.pop(str(event.id), None)
        if cb is not None:
            try:
                cb()
            except Exception:
                # Cleanup is best-effort: the session may already be
                # shutting down when the termination event arrives.
                pass


def streaming_corpus_state(
    doc_stream: DataFrame,
    path: str,
    checkpoint: str,
    benchmark: DataFrame | None = None,
    near_dup_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str = "source",
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain corpus_state over a document stream: per batch, write
    meta/sig rows and the pair-set increment (and contamination verdicts
    when ``benchmark`` is given) under ``path/<frame>/batch_id=N``.

    ``auto_compact_after``: once any frame has accumulated that many
    batch directories, the sink folds the COMMITTED prefix of every
    frame into one directory (streaming/compact.compact_batches with
    partial=True) before writing the arriving batch — the RecordStore
    ``auto_compact_after`` treatment (VERDICT r8 #3), so a long-lived
    stream's read-side merge stays O(1) directories without anyone
    remembering to compact by hand. Running inside the sink is
    writer-safe (foreachBatch serializes) and commit-safe (a stale dir
    from a mid-batch crash is left for its redelivery to overwrite);
    the cost is O(state) once every ``auto_compact_after`` batches.
    The pair increment is unaffected: folded sig rows keep a batch_id
    strictly below every future batch, so the prior-batch filter and
    the produce-once rule still hold."""
    t = float(near_dup_threshold)
    # Per-query serve context (VERDICT r9 #4): when decontaminating, the
    # static benchmark's shingle-hash set is hashed ONCE here, not once
    # per micro-batch (it never changes while the query runs). The
    # prior-sig side deliberately stays a per-trigger re-read — see the
    # module note on the measured-and-rejected prior-state cache.
    ctx: dict = {}

    def _bench_hashes(spark):
        if benchmark is None:
            return None
        if "bench" not in ctx:
            from sum_spark.operators.decontam import SHINGLE_N, _shingle_hashes

            ctx["bench"] = _shingle_hashes(
                benchmark, SHINGLE_N, text_col, None
            ).distinct().persist()
        return ctx["bench"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if auto_compact_after is not None:
            from sum_spark.streaming.compact import _batch_dirs, compact_batches

            frames = ("meta", "sig", "pairs", "contaminated")
            if any(
                len(_batch_dirs(f"{path}/{f}")) >= auto_compact_after
                for f in frames
            ):
                # All four frames fold together (maybe_auto_compact per
                # frame would leave the others fragmented until their own
                # thresholds fire).
                for f in frames:
                    if os.path.isdir(f"{path}/{f}"):
                        compact_batches(
                            spark,
                            f"{path}/{f}",
                            checkpoint=checkpoint,
                            partial=True,
                            n_files=None,
                        )
        # persist: the batch feeds both the signature build and the meta
        # projection — unpersisted, each re-reads the micro-batch source.
        # try/finally: a failing batch body must not strand the cached
        # blocks — the checkpoint redelivers the batch on restart, and
        # each failed attempt would otherwise leak one cached batch. The
        # sig build runs INSIDE the try (ADVICE r8: an exception while
        # constructing/persisting sig leaked the cached batch per retry).
        batch_df.persist()
        sig = None
        try:
            sig = minhash_signatures(batch_df, text_col, id_col).persist()
            _sink_body(spark, batch_df, sig, batch_id)
        finally:
            if sig is not None:
                sig.unpersist()
            batch_df.unpersist()

    def _sink_body(spark, batch_df: DataFrame, sig: DataFrame, batch_id: int) -> None:

        _doc_meta(batch_df, text_col, id_col, strat_col).write.mode(
            "overwrite"
        ).parquet(f"{path}/meta/batch_id={batch_id}")

        # pair increment: within-batch ∪ batch-vs-prior (prior = stored
        # signature batches with a strictly smaller batch_id; the
        # re-read-per-trigger design is MEASUREMENT-backed — see the
        # module note on the rejected prior-state cache).
        pairs = minhash_lsh_from_sig(sig, threshold=t)
        sig_dir = f"{path}/sig"
        if os.path.isdir(sig_dir):
            prior = spark.read.parquet(sig_dir).where(
                F.col("batch_id") < F.lit(batch_id)
            )
            cand = (
                _bands_from_sig(sig)
                .select(F.col("doc_id").alias("__ni"), "band", "key")
                .join(
                    _bands_from_sig(prior).select(
                        F.col("doc_id").alias("__pi"), "band", "key"
                    ),
                    ["band", "key"],
                )
                # a doc_id re-ingested in a LATER batch (an at-least-once
                # producer outside Spark's own checkpoint redelivery, which
                # the batch_id filter already handles) would band-match its
                # earlier self: never emit self-pairs
                .where(F.col("__ni") != F.col("__pi"))
                .select(
                    F.least("__ni", "__pi").alias("doc_a"),
                    F.greatest("__ni", "__pi").alias("doc_b"),
                )
                .distinct()
            )
            all_sig = sig.select("doc_id", "hh").unionByName(
                prior.select("doc_id", "hh")
            )
            pairs = pairs.unionByName(
                _exact_jaccard_pairs(cand, all_sig, t, feat_col="hh")
            )
        pairs.write.mode("overwrite").parquet(f"{path}/pairs/batch_id={batch_id}")

        if benchmark is not None:
            from sum_spark.operators.decontam import decontaminate

            decontaminate(
                None,
                None,
                corpus_hashes=sig.select("doc_id", F.explode("hh").alias("__h")),
                benchmark_hashes=_bench_hashes(spark),
            ).select("doc_id").write.mode("overwrite").parquet(
                f"{path}/contaminated/batch_id={batch_id}"
            )

        # signatures last is not required for correctness (the prior
        # read filters on batch_id), but keeps a crash mid-sink from
        # leaving a sig batch whose pair increment never ran.
        sig.write.mode("overwrite").parquet(f"{path}/sig/batch_id={batch_id}")

    q = (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )

    # The benchmark hash cache lives as long as the query; release it on
    # termination so sessions running many corpus-state queries don't
    # accumulate persisted frames (ADVICE r10).
    def _release_bench(ctx=ctx):
        b = ctx.pop("bench", None)
        if b is not None:
            try:
                b.unpersist()
            except Exception:
                pass

    if benchmark is not None:
        _TerminationCleanup.register(doc_stream.sparkSession, q.id, _release_bench)
        if not q.isActive:
            # The query terminated before the registration landed (tiny
            # window for an empty availableNow stream): its Terminated
            # event reached a listener that didn't know the id yet. Run
            # the cleanup inline — _release_bench pops ctx, so a racing
            # double run is a no-op — and drop the stale entry.
            _TerminationCleanup.unregister(doc_stream.sparkSession, q.id)
            _release_bench()
    return q


def read_streaming_corpus_state(
    spark: SparkSession, path: str
) -> dict[str, DataFrame]:
    """Assemble the state-so-far from the batch directories — the same
    dict shape corpus_state / read_corpus_state produce, usable directly
    by prepare_training_data_incremental as the A-side state.

    Id uniqueness across batches is the caller's contract (exactly as
    with append_to_inverted_index); the pair frame is nevertheless
    deduplicated here, so a violating producer degrades to duplicate
    meta/sig rows rather than duplicated cluster edges."""
    out: dict[str, DataFrame] = {}
    for name in ("meta", "sig", "pairs", "contaminated"):
        p = f"{path}/{name}"
        if os.path.isdir(p):
            df = spark.read.parquet(p).drop("batch_id")
            out[name] = df.distinct() if name == "pairs" else df
    return out
