"""Streaming ANN: the stream-static coarse-list join must score exactly
what the batch from-index IVF-PQ search scores on identical data (same
stored codebook, same fold order, bit-equal adc)."""

from __future__ import annotations

import numpy as np

from sum_spark.operators.similarity import knn_ivfpq_from_index, write_pq_index
from sum_spark.streaming.ann import read_embedding_stream, streaming_ann_scores
from sum_spark.streaming.windows import run_to_memory


def test_streaming_ann_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(41)
    d = 8
    corpus_rows = [(i, rng.standard_normal(d).tolist()) for i in range(70)]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    idx_path = str(tmp_path / "pqidx")
    book = write_pq_index(
        corpus, idx_path, m=2, n_codes=4, id_col="vec_id", vec_col="embedding"
    )
    index = spark.read.parquet(idx_path)

    probe_rows = [(1000 + i, rng.standard_normal(d).tolist()) for i in range(3)]
    probes = spark.createDataFrame(probe_rows, "vec_id long, embedding array<double>")
    drops = str(tmp_path / "drops")
    probes.coalesce(1).write.parquet(drops)

    stream = read_embedding_stream(spark, drops)
    assert stream.isStreaming
    out = run_to_memory(
        streaming_ann_scores(
            stream, index, book, m=2, round_to=4, index_id_col="vec_id"
        ),
        "ann_scores_t1",
        output_mode="append",
    )
    got = {(r["probe_id"], r["id"]): r["adc"] for r in out.collect()}

    # Batch truth against the SAME stored index and codebook: every
    # coarse-list candidate (k larger than any list).
    want_rows = knn_ivfpq_from_index(
        spark, idx_path, probes, k=100, m=2, id_col="vec_id", vec_col="embedding",
        round_to=4,
    ).collect()
    want = {(r["probe_id"], r["vec_id"]): r["adc"] for r in want_rows}
    assert got == want
    assert got, "expected scored candidates"
