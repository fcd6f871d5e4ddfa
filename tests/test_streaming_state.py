"""Streaming corpus-state maintenance == batch corpus_state over the same
rows: per-doc frames trivially, and — the cross-batch piece — the
assembled pair set equals dedup_minhash_lsh over everything ingested,
with every pair produced exactly once by the batch holding its later
document. The assembled state then feeds the batch incremental-prepare
path unchanged (the ingest -> snapshot-transition handoff)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.operators import dedup
from sum_spark.operators.pipeline import corpus_state
from sum_spark.sources.tables import load_table
from sum_spark.streaming.state import (
    read_streaming_corpus_state,
    streaming_corpus_state,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def test_streaming_state_equals_batch_state(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )
    bench = docs.where(F.col("doc_id") % 41 == 3).select("doc_id", "text")

    # three drops -> >= 3 micro-batches; near-dup pairs in this corpus
    # are planted as (id, id+offset) so splitting by ranges guarantees
    # CROSS-batch pairs exist (asserted below, so the cross path is
    # genuinely exercised, not vacuously green).
    drop_dir = str(tmp_path / "drops")
    n = docs.count()
    b1, b2 = n // 3, 2 * n // 3
    ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    cuts = (ids[b1], ids[b2])
    docs.where(F.col("doc_id") < cuts[0]).coalesce(1).write.parquet(drop_dir)
    docs.where(
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
    ).coalesce(1).write.mode("append").parquet(drop_dir)
    docs.where(F.col("doc_id") >= cuts[1]).coalesce(1).write.mode("append").parquet(
        drop_dir
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "state")
    q = streaming_corpus_state(
        stream, out, checkpoint=str(tmp_path / "ckpt"), benchmark=bench
    )
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/sig/batch_id=*")) >= 3

    got = read_streaming_corpus_state(spark, out)
    want = corpus_state(docs, benchmark=bench)

    for name in ("meta", "pairs", "contaminated"):
        a = sorted(map(tuple, got[name].collect()))
        b = sorted(map(tuple, want[name].collect()))
        assert a == b, name
        assert a or name == "contaminated"
    key = lambda df: sorted(
        (r["doc_id"], tuple(r["hh"])) for r in df.select("doc_id", "hh").collect()
    )
    assert key(got["sig"]) == key(want["sig"])

    # the cross-batch pair path really fired: at least one pair spans
    # the batch boundaries
    pair_rows = [(r["doc_a"], r["doc_b"]) for r in got["pairs"].collect()]

    def batch_of(i):
        return 0 if i < cuts[0] else (1 if i < cuts[1] else 2)

    assert any(batch_of(a) != batch_of(b) for a, b in pair_rows)

    # and the assembled state drives the batch incremental path: advance
    # it across a synthetic snapshot transition and compare to a full
    # rebuild (the ingest -> snapshot handoff).
    from sum_spark.operators.diff import delta_ids, snapshot_diff
    from sum_spark.operators.pipeline import (
        prepare_training_data,
        prepare_training_data_incremental,
    )

    b_docs = docs.where(F.col("doc_id") % 17 != 5).select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 6, F.concat("text", F.lit(" upd")))
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )
    d = snapshot_diff(docs, b_docs)
    delta = b_docs.join(
        delta_ids(d).select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )
    retired = d.where(F.col("status").isin("removed", "changed")).select("id")
    got_df, _ = prepare_training_data_incremental(
        got, b_docs, delta, retired, benchmark=bench, min_quality=0.3,
        pack_budget=256,
    )
    want_df = prepare_training_data(
        b_docs, benchmark=bench, min_quality=0.3, pack_budget=256
    )
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(tuple, want_df.collect())
    )


def test_bench_hash_cache_released_on_query_termination(spark, sf_smoke, tmp_path):
    """ADVICE r10: the per-query benchmark shingle-hash cache is
    persisted once per streaming query — and used to outlive it, so
    sessions running many corpus-state queries accumulated cached
    frames. A termination listener must release it once the query stops
    (listener events are async; poll briefly)."""
    import time

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )
    bench = docs.where(F.col("doc_id") % 41 == 3).select("doc_id", "text")
    drop_dir = str(tmp_path / "drops")
    docs.coalesce(1).write.parquet(drop_dir)

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    baseline = n_cached()
    stream = spark.readStream.schema(SCHEMA).parquet(drop_dir)
    q = streaming_corpus_state(
        stream,
        str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        benchmark=bench,
    )
    q.awaitTermination()
    for _ in range(100):  # <= 10 s for the async termination event
        if n_cached() <= baseline:
            break
        time.sleep(0.1)
    assert n_cached() <= baseline


def test_failed_sig_build_does_not_strand_cached_batch(spark, tmp_path, monkeypatch):
    """ADVICE r8: an exception raised while CONSTRUCTING/persisting sig
    (before the try block opened) leaked the cached micro-batch on every
    redelivered retry. The sig build now runs inside the try; a failing
    batch must leave no new cached RDDs behind."""
    import pyspark.errors

    import sum_spark.streaming.state as st

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    def boom(*a, **k):
        raise RuntimeError("sig construction failed")

    monkeypatch.setattr(st, "minhash_signatures", boom)

    drop_dir = str(tmp_path / "drops")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "s")], SCHEMA
    ).coalesce(1).write.parquet(drop_dir)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = st.streaming_corpus_state(
        stream, str(tmp_path / "state"), checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.awaitTermination()
        raise AssertionError("expected the sink to fail")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass

    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after - before == set()
