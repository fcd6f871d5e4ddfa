"""Streaming ingest dedup: the stream-static band join must flag the
same near-dup pairs as the batch dedup_incremental on identical data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import dedup
from sum_spark.streaming.ingest_dedup import (
    read_document_stream,
    streaming_near_dups,
)
from sum_spark.streaming.windows import run_to_memory

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sleepy badgers watch from a mossy log near the old stone bridge"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE.replace("badgers", "otters")),
        (3, "completely unrelated corpus text about spark catalyst planning "
            "and shuffle partitioning strategies at terabyte scale today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streaming_matches_batch_incremental(spark, corpus, tmp_path):
    new_rows = [
        (101, BASE.replace("bridge", "tower")),  # near-dup of 1 (and 2)
        (102, "fresh novel document with entirely new words nobody wrote "
              "before in this corpus of carefully synthetic sentences"),
    ]
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    path = str(tmp_path / "drops")
    new_df.coalesce(1).write.parquet(path)

    corpus_sig = dedup.minhash_signatures(corpus)

    stream = read_document_stream(spark, path)
    assert stream.isStreaming
    out = run_to_memory(
        streaming_near_dups(stream, corpus_sig, threshold=0.8),
        "ingest_dedup_t1",
        output_mode="append",
    )
    got = {(r["new_id"], r["corpus_id"], r["jaccard"]) for r in out.collect()}

    want = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in dedup.dedup_incremental(new_df, corpus, threshold=0.8).collect()
    }
    assert got == want
    assert got, "expected at least one near-dup pair"
    assert all(nid == 101 for nid, _, _ in got)


def test_streaming_uses_stored_signature_table(spark, corpus, tmp_path):
    """The ingest-artifact path: signatures written at corpus build time,
    read back for the stream query — no corpus text in the plan."""
    sig_path = str(tmp_path / "corpus_sig")
    dedup.minhash_signatures(corpus).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)

    new_df = spark.createDataFrame(
        [(201, BASE + " indeed")], "doc_id long, text string"
    )
    drop_path = str(tmp_path / "drops2")
    new_df.coalesce(1).write.parquet(drop_path)

    out = run_to_memory(
        streaming_near_dups(read_document_stream(spark, drop_path), stored),
        "ingest_dedup_t2",
        output_mode="append",
    )
    pairs = {(r["new_id"], r["corpus_id"]) for r in out.collect()}
    assert (201, 1) in pairs


def test_streaming_state_ttl_same_single_batch_result(spark, corpus, tmp_path):
    """Within one micro-batch the TTL-bounded variant must emit exactly
    the unbounded variant's pairs (the trade-off only appears on pair
    re-emission after the watermark)."""
    new_df = spark.createDataFrame(
        [(301, BASE), (302, "unrelated fresh words " * 5)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "drops3")
    new_df.coalesce(1).write.parquet(path)
    sig = dedup.minhash_signatures(corpus)

    exact = run_to_memory(
        streaming_near_dups(read_document_stream(spark, path), sig),
        "ingest_ttl_a",
        output_mode="append",
    )
    ttl = run_to_memory(
        streaming_near_dups(
            read_document_stream(spark, path), sig, state_ttl="1 hour"
        ),
        "ingest_ttl_b",
        output_mode="append",
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, ttl.collect()))
    assert exact.count() > 0
