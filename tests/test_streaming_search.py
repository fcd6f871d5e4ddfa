"""Streaming inverted index: documents indexed batch-by-batch answer
BM25 queries exactly as the full-corpus scan path, and the query scan
still prunes on the term bucket across batch directories."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.operators.search import (
    bm25_from_index,
    bm25_search,
    compact_inverted_index,
    retire_from_inverted_index,
)
from sum_spark.sources.tables import load_table
from sum_spark.streaming.search import streaming_index_documents

TERMS = ["the", "data", "zebra"]


def test_stream_indexed_bm25_equals_scan(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "docs")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    idx = str(tmp_path / "ii")
    q = streaming_index_documents(stream, idx, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()

    from_idx = bm25_from_index(spark, idx, TERMS, k=10)
    want = bm25_search(docs, TERMS, k=10).collect()
    assert sorted(map(tuple, from_idx.collect())) == sorted(map(tuple, want))

    # bucket pruning still reaches the scan through the batch_id level
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        from_idx.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters: [" in p
    pf = p.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf

    # --- the snapshot-boundary story (streaming/state.py): stream is
    # append-only; with it stopped, compaction normalizes the nested
    # batch_id layout into write_inverted_index's flat bucketed one
    # (query results unchanged), after which BATCH retirement applies —
    # the retire partials would conflict with batch_id directories.
    import os

    stats = compact_inverted_index(spark, idx)
    assert stats["n_docs"] == docs.count()
    assert not any(
        d.startswith("batch_id=") for d in os.listdir(f"{idx}/postings")
    )
    after = bm25_from_index(spark, idx, TERMS, k=10)
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, want))

    retired = docs.where(F.col("doc_id") % 7 == 0)
    retire_from_inverted_index(retired, idx)
    survived = docs.where(F.col("doc_id") % 7 != 0)
    got = bm25_from_index(spark, idx, TERMS, k=10)
    want2 = bm25_search(survived, TERMS, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want2.collect())
    )


def test_stream_index_retire_compact_resume(spark, sf_smoke, tmp_path):
    """The RESUMABLE snapshot boundary: retire into a negative batch_id
    dir (stream stopped), compact with keep_batch_layout=True, then
    resume the stream with the SAME checkpoint over newly dropped files
    — queries stay exact at every phase. (The default flat compaction is
    the no-resume handoff, covered by the previous test.)"""
    import os

    from sum_spark.operators.search import (
        compact_inverted_index as _compact,
    )
    from sum_spark.operators.search import (
        retire_from_inverted_index as _retire,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    wave1 = docs.where(F.col("doc_id") % 2 == 0)
    wave2 = docs.where(F.col("doc_id") % 2 != 0)
    drop_dir = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    wave1.coalesce(1).write.parquet(drop_dir)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def run_stream(idx):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop_dir)
        )
        streaming_index_documents(stream, idx, checkpoint=ck).awaitTermination()

    idx = str(tmp_path / "ii")
    run_stream(idx)

    def q(path):
        return sorted(map(tuple, bm25_from_index(spark, path, TERMS, k=10).collect()))

    assert q(idx) == sorted(map(tuple, bm25_search(wave1, TERMS, k=10).collect()))

    # snapshot boundary: retire wave1's doc_id%6==0 into batch_id=-1
    retired = wave1.where(F.col("doc_id") % 6 == 0)
    _retire(retired, idx, batch_dir=-1)
    survivors1 = wave1.where(F.col("doc_id") % 6 != 0)
    assert q(idx) == sorted(map(tuple, bm25_search(survivors1, TERMS, k=10).collect()))

    stats = _compact(spark, idx, keep_batch_layout=True, checkpoint=ck)
    assert stats["n_docs"] == survivors1.count()
    post_dirs = os.listdir(f"{idx}/postings")
    assert all(d.startswith("batch_id=") or d.startswith("_") for d in post_dirs)
    assert len([d for d in post_dirs if d.startswith("batch_id=")]) == 1
    assert q(idx) == sorted(map(tuple, bm25_search(survivors1, TERMS, k=10).collect()))

    # resume: new files, same checkpoint — batch ids continue above the
    # folded one, the layout stays consistent, queries stay exact
    wave2.coalesce(1).write.mode("append").parquet(drop_dir)
    run_stream(idx)
    full = survivors1.unionByName(wave2)
    assert q(idx) == sorted(map(tuple, bm25_search(full, TERMS, k=10).collect()))


def test_stream_index_partial_fold_on_crash(spark, sf_smoke, tmp_path):
    """Inverted-index twin of the PQ partial-fold lifecycle (VERDICT r6
    #3): crash mid-batch -> full compaction refuses, partial=True folds
    the committed prefix (per family) and carries the uncommitted tail
    dirs through the swap -> resume redelivers the tail into its own
    dirs -> queries exact throughout."""
    import os

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    wave1 = docs.where(F.col("doc_id") % 3 == 0)
    wave2 = docs.where(F.col("doc_id") % 3 == 1)
    wave3 = docs.where(F.col("doc_id") % 3 == 2)
    drop_dir = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    idx = str(tmp_path / "ii")

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop_dir)
        )
        streaming_index_documents(stream, idx, checkpoint=ck).awaitTermination()

    wave1.coalesce(1).write.parquet(drop_dir)           # -> batch 0
    wave2.coalesce(1).write.mode("append").parquet(drop_dir)  # -> batch 1
    run_stream()

    def q(path):
        return sorted(map(tuple, bm25_from_index(spark, path, TERMS, k=10).collect()))

    assert q(idx) == sorted(
        map(tuple, bm25_search(wave1.unionByName(wave2), TERMS, k=10).collect())
    )

    # crash simulation: batch 1's commit (and its Hadoop crc shadow) gone
    os.remove(os.path.join(ck, "commits", "1"))
    crc = os.path.join(ck, "commits", ".1.crc")
    if os.path.isfile(crc):
        os.remove(crc)

    import pytest

    with pytest.raises(ValueError, match="partial=True"):
        compact_inverted_index(spark, idx, keep_batch_layout=True, checkpoint=ck)
    compact_inverted_index(
        spark, idx, keep_batch_layout=True, checkpoint=ck, partial=True
    )
    for fam in ("postings", "terms", "meta"):
        dirs = sorted(
            n for n in os.listdir(os.path.join(idx, fam)) if n.startswith("batch_id=")
        )
        assert dirs == ["batch_id=0", "batch_id=1"], (fam, dirs)
    assert q(idx) == sorted(
        map(tuple, bm25_search(wave1.unionByName(wave2), TERMS, k=10).collect())
    )

    # resume: batch 1 redelivers into its own dirs, wave3 lands as batch 2
    wave3.coalesce(1).write.mode("append").parquet(drop_dir)
    run_stream()
    full = wave1.unionByName(wave2).unionByName(wave3)
    assert q(idx) == sorted(map(tuple, bm25_search(full, TERMS, k=10).collect()))


def test_batch_fold_plan_contract(tmp_path):
    """Pure-function contract of the fold planner: flat-index guard
    (ADVICE r6 — no batch dirs means the index must use flat
    compaction), refuse-vs-partial split on uncommitted ids, and the
    nothing-committed edge."""
    import os

    import pytest

    from sum_spark.operators.search import _batch_fold_plan, _batch_fold_sub

    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "bucket=0").mkdir()
    with pytest.raises(ValueError, match="flat"):
        _batch_fold_plan(str(flat), None)

    scan = tmp_path / "scan"
    scan.mkdir()
    for i in (-1, 0, 1, 2):
        (scan / f"batch_id={i}").mkdir()
    ck = tmp_path / "ck"
    (ck / "commits").mkdir(parents=True)
    for i in (0, 1):
        (ck / "commits" / str(i)).write_text("{}")

    with pytest.raises(ValueError, match="partial=True"):
        _batch_fold_sub(str(scan), str(ck))
    sub, pending = _batch_fold_plan(str(scan), str(ck), partial=True)
    assert sub == "/batch_id=1" and pending == [2]

    # partial needs a checkpoint to know the committed prefix
    with pytest.raises(ValueError, match="checkpoint"):
        _batch_fold_plan(str(scan), None, partial=True)

    # no checkpoint: caller owns clean termination, everything folds
    assert _batch_fold_plan(str(scan), None) == ("/batch_id=2", [])

    # all ids uncommitted: nothing to fold
    os.remove(ck / "commits" / "0")
    os.remove(ck / "commits" / "1")
    (scan / "batch_id=-1").rmdir()
    with pytest.raises(ValueError, match="nothing committed"):
        _batch_fold_plan(str(scan), str(ck), partial=True)
