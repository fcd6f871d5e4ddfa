"""Auto-compaction on long-lived streams (VERDICT r8 #3): the sinks fold
their committed batch-directory prefix once a threshold is crossed, so
read-side directory counts stay bounded over an arbitrarily long stream
— while redelivery/crash safety and stream==batch parity are unchanged.

Also unit-covers the commit-aware extension of compact_batches: an
uncommitted tail dir (written, never committed — the mid-batch-crash
state) aborts the fold unless partial=True carries it through untouched.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.streaming.compact import compact_batches

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def _fake_checkpoint(tmp_path, committed_ids):
    ck = tmp_path / "fake_ck"
    (ck / "commits").mkdir(parents=True)
    for i in committed_ids:
        (ck / "commits" / str(i)).write_text("{}")
    return str(ck)


def _write_batches(spark, path, ids):
    for i in ids:
        spark.createDataFrame([(i, i * 10)], "k long, v long").coalesce(
            1
        ).write.parquet(f"{path}/batch_id={i}")


def test_compact_batches_refuses_uncommitted_tail(spark, tmp_path):
    path = str(tmp_path / "fam")
    _write_batches(spark, path, [0, 1, 2, 3])
    ck = _fake_checkpoint(tmp_path, [0, 1, 2])  # dir 3 written, not committed

    with pytest.raises(ValueError, match="newer than the last committed"):
        compact_batches(spark, path, checkpoint=ck)

    # partial=True folds the committed prefix, carries the tail untouched
    surviving = compact_batches(spark, path, checkpoint=ck, partial=True)
    assert surviving == 2
    dirs = sorted(glob.glob(path + "/batch_id=*"))
    assert [os.path.basename(d) for d in dirs] == ["batch_id=2", "batch_id=3"]
    got = sorted(
        map(tuple, spark.read.parquet(path).select("k", "v").collect())
    )
    assert got == [(i, i * 10) for i in range(4)]

    # merged view + pending tail cannot be combined (the caller's merge
    # would bake uncommitted rows into the fold)
    _write_batches(spark, path, [4])
    with pytest.raises(ValueError, match="merged"):
        compact_batches(
            spark, path, merged=spark.read.parquet(path),
            checkpoint=_fake_checkpoint(tmp_path / "ck2", [0, 1, 2]),
            partial=True,
        )


def test_compact_batches_crash_recovery_with_pending(spark, tmp_path):
    """Marker written, some folded dirs removed, crash before rename —
    the re-run removes folded stragglers and finishes; the pending tail
    dir is untouched throughout."""
    import shutil

    path = str(tmp_path / "fam")
    _write_batches(spark, path, [0, 1, 2, 3])
    # Stage the fold by hand exactly as compact_batches would for
    # committed={0,1,2}: merged rows to _compacted, marker, remove ONE
    # of the folded dirs, then "crash".
    merged = spark.read.parquet(path).where("batch_id < 3").drop("batch_id")
    tmp = f"{path}/_compacted"
    merged.coalesce(1).write.parquet(tmp)
    with open(f"{tmp}/_SUCCESS", "w") as fh:
        fh.write("2\n0,1,2")
    shutil.rmtree(f"{path}/batch_id=0")

    surviving = compact_batches(spark, path)
    assert surviving == 2
    dirs = sorted(os.path.basename(d) for d in glob.glob(path + "/batch_id=*"))
    assert dirs == ["batch_id=2", "batch_id=3"]
    got = sorted(map(tuple, spark.read.parquet(path).select("k", "v").collect()))
    assert got == [(i, i * 10) for i in range(4)]


def test_compact_batches_recovers_from_empty_success_marker(spark, tmp_path):
    """Spark's parquet job commit creates an EMPTY _SUCCESS under
    _compacted BEFORE compact_batches overwrites it with the stash — a
    crash in that window must NOT wedge recovery (ADVICE r9: lines[0]
    IndexError on every re-run stalled the stream's auto-compaction
    hooks forever). No deletion has happened yet in that state, so the
    re-run simply redoes the fold."""
    path = str(tmp_path / "fam")
    _write_batches(spark, path, [0, 1, 2])
    # Simulate the crash window: tmp written by Spark (empty _SUCCESS),
    # stash overwrite never landed, no batch dir deleted.
    merged = spark.read.parquet(path).drop("batch_id")
    merged.coalesce(1).write.parquet(f"{path}/_compacted")  # empty _SUCCESS

    surviving = compact_batches(spark, path)
    assert surviving == 2
    dirs = sorted(os.path.basename(d) for d in glob.glob(path + "/batch_id=*"))
    assert dirs == ["batch_id=2"]
    got = sorted(map(tuple, spark.read.parquet(path).select("k", "v").collect()))
    assert got == [(i, i * 10) for i in range(3)]
    # And the hook path that was wedging: repeated calls stay idempotent.
    assert compact_batches(spark, path) == 2


def test_compact_batches_legacy_single_line_marker_with_survivors(spark, tmp_path):
    """A pre-stash-era single-line marker can't say which dirs were
    folded. With batch dirs still present there are two possibilities —
    no deletion happened yet (refold is safe) or the crash was
    MID-DELETION (tmp holds the only complete copy; refolding from the
    survivors silently loses the deleted batches' rows). The marker
    can't distinguish them, so compact_batches must refuse and leave
    everything in place for manual inspection (ADVICE r10); the
    all-dirs-gone legacy self-heal is covered in test_streaming_sketch."""
    import shutil

    path = str(tmp_path / "fam")
    _write_batches(spark, path, [0, 1, 2])
    merged = spark.read.parquet(path).drop("batch_id")
    tmp = f"{path}/_compacted"
    merged.coalesce(1).write.parquet(tmp)
    with open(f"{tmp}/_SUCCESS", "w") as fh:
        fh.write("2")  # legacy format: target id only, no folded ids

    with pytest.raises(RuntimeError, match="legacy single-line"):
        compact_batches(spark, path)
    # Nothing was deleted: both the fold and every batch dir survive.
    dirs = sorted(os.path.basename(d) for d in glob.glob(path + "/batch_id=*"))
    assert dirs == ["batch_id=0", "batch_id=1", "batch_id=2"]
    assert os.path.isdir(tmp)
    # Operator resolution path A (no deletion had happened): drop the
    # fold, rerun — compaction completes from the intact batch dirs.
    shutil.rmtree(tmp)
    assert compact_batches(spark, path) == 2
    got = sorted(map(tuple, spark.read.parquet(path).select("k", "v").collect()))
    assert got == [(i, i * 10) for i in range(3)]


def test_corpus_state_auto_compacts_over_long_stream(spark, sf_smoke, tmp_path):
    """30 micro-batches with auto_compact_after=8: directory counts stay
    bounded (compaction fired, repeatedly) and the assembled state still
    equals the batch corpus_state over everything ingested — folding is
    invisible to the read side and to the produce-once pair rule."""
    from sum_spark.operators.pipeline import corpus_state
    from sum_spark.sources.tables import load_table
    from sum_spark.streaming.state import (
        read_streaming_corpus_state,
        streaming_corpus_state,
    )

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    n_batches = 30
    drop_dir = str(tmp_path / "drops")
    # 30 contiguous id-range drops -> 30 micro-batches; planted near-dup
    # pairs are (id, id+offset), so range splits guarantee cross-batch
    # pairs exist across many batch boundaries.
    for b in range(n_batches):
        lo = ids[b * len(ids) // n_batches]
        hi = ids[-1] + 1 if b == n_batches - 1 else ids[(b + 1) * len(ids) // n_batches]
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(drop_dir)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "state")
    q = streaming_corpus_state(
        stream,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        auto_compact_after=8,
    )
    q.awaitTermination()

    # bounded bookkeeping: threshold dirs + the one being written, never
    # the 30 an uncompacted stream would hold
    for fam in ("meta", "sig", "pairs"):
        n_dirs = len(glob.glob(f"{out}/{fam}/batch_id=*"))
        assert 1 <= n_dirs <= 9, (fam, n_dirs)

    got = read_streaming_corpus_state(spark, out)
    want = corpus_state(docs)
    for name in ("meta", "pairs"):
        a = sorted(map(tuple, got[name].collect()))
        b = sorted(map(tuple, want[name].collect()))
        assert a == b, name
        assert a
    key = lambda df: sorted(
        (r["doc_id"], tuple(r["hh"])) for r in df.select("doc_id", "hh").collect()
    )
    assert key(got["sig"]) == key(want["sig"])


def test_index_documents_auto_compacts(spark, sf_smoke, tmp_path):
    """Stream-grown inverted index with auto_compact_after: postings
    batch dirs stay bounded and BM25 from the index equals the scan."""
    from sum_spark.operators.search import bm25_from_index, bm25_search
    from sum_spark.sources.tables import load_table
    from sum_spark.streaming.search import streaming_index_documents

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "docs")
    n_batches = 12
    for b in range(n_batches):
        docs.where(F.col("doc_id") % n_batches == b).coalesce(1).write.mode(
            "append"
        ).parquet(drop_dir)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    idx = str(tmp_path / "ii")
    q = streaming_index_documents(
        stream, idx, checkpoint=str(tmp_path / "ck"), auto_compact_after=5
    )
    q.awaitTermination()

    n_dirs = len(glob.glob(idx + "/postings/batch_id=*"))
    assert 1 <= n_dirs <= 6, n_dirs

    terms = ["the", "data", "zebra"]
    from_idx = bm25_from_index(spark, idx, terms, k=10)
    want = bm25_search(docs, terms, k=10).collect()
    assert sorted(map(tuple, from_idx.collect())) == sorted(map(tuple, want))


def test_index_vectors_auto_compacts(spark, tmp_path):
    """Stream-grown PQ index with auto_compact_after: batch dirs stay
    bounded and from-index search equals the in-flight IVF-PQ over
    everything ingested."""
    from sum_spark.operators.similarity import (
        knn_ivfpq,
        knn_ivfpq_from_index,
        train_pq_codebook,
        write_pq_codebook,
    )
    from sum_spark.streaming.ann import read_embedding_stream, streaming_index_vectors

    rng = np.random.default_rng(93)
    d = 8
    corpus = spark.createDataFrame(
        [(i, rng.standard_normal(d).tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "pq")
    book = train_pq_codebook(corpus, 4, id_col="vec_id", vec_col="embedding")
    write_pq_codebook(spark, book, idx)

    drops = str(tmp_path / "drops")
    n_batches = 12
    for b in range(n_batches):
        corpus.where(F.col("vec_id") % n_batches == b).coalesce(1).write.mode(
            "append"
        ).parquet(drops)
    stream = read_embedding_stream(spark, drops)
    q = streaming_index_vectors(
        stream, idx, checkpoint=str(tmp_path / "ck"), m=2, auto_compact_after=5
    )
    q.awaitTermination()

    n_dirs = len(glob.glob(idx + "/batch_id=*"))
    assert 1 <= n_dirs <= 6, n_dirs

    probes = corpus.where("vec_id <= 2")
    got = sorted(
        map(
            tuple,
            knn_ivfpq_from_index(
                spark, idx, probes, k=6, m=2, id_col="vec_id",
                vec_col="embedding", round_to=4,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            knn_ivfpq(
                corpus, probes, k=6, m=2, id_col="vec_id", vec_col="embedding",
                round_to=4, centroids=book,
            ).collect(),
        )
    )
    assert got == want


def test_sketch_sinks_auto_compact_keep_parity(spark, tmp_path):
    """The merge-at-read sketch family with auto_compact_after: dirs stay
    bounded and the accumulated read equals the single-batch build over
    all ingested rows (the family parity law survives folding because
    readers re-apply their merge at read)."""
    from sum_spark.operators.sketch import count_min_build, hll_sketch
    from sum_spark.streaming.sketch import (
        read_count_min,
        read_hll,
        streaming_count_min,
        streaming_hll,
    )

    rows = spark.createDataFrame(
        [(i, f"item{i % 37}") for i in range(600)], "id long, item string"
    )
    drops = str(tmp_path / "drops")
    n_batches = 12
    for b in range(n_batches):
        rows.where(F.col("id") % n_batches == b).coalesce(1).write.mode(
            "append"
        ).parquet(drops)
    schema = "id long, item string"

    cms_out, hll_out = str(tmp_path / "cms"), str(tmp_path / "hll")
    q = streaming_count_min(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(drops),
        "item", cms_out, str(tmp_path / "ck1"), auto_compact_after=5,
    )
    q.awaitTermination()
    q = streaming_hll(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(drops),
        "item", hll_out, str(tmp_path / "ck2"), auto_compact_after=5,
    )
    q.awaitTermination()

    for out in (cms_out, hll_out):
        n_dirs = len(glob.glob(out + "/batch_id=*"))
        assert 1 <= n_dirs <= 6, (out, n_dirs)

    got_cms = sorted(map(tuple, read_count_min(spark, cms_out).collect()))
    want_cms = sorted(map(tuple, count_min_build(rows, "item").collect()))
    assert got_cms == want_cms

    got_hll = sorted(map(tuple, read_hll(spark, hll_out).collect()))
    want_hll = sorted(
        map(tuple, hll_sketch(rows, "item", ()).select("idx", "rho").collect())
    )
    assert got_hll == want_hll
