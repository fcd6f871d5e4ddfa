"""Streaming throughput bench for the retrieval-at-ingest and
corpus-state-maintenance sinks (VERDICT r7 #6: both were parity-tested
but had no throughput/latency rows; the round-1 streaming table covers
only the windowed-aggregation pipelines).

Measures, at sf0.1 on the local session:

- ``streaming_ann_rerank``: every sf0.1 embedding replayed as probe
  micro-batches (maxFilesPerTrigger=1 over N parquet drops) against a
  stored trained-book PQ index of the same corpus — exact two-stage
  serve per batch. Reported: probes/s steady-state and per-micro-batch
  trigger wall (median + p90) from the query's own progress events.
- ``streaming_corpus_state``: the sf0.1 documents replayed as document
  micro-batches, each batch writing meta/sig rows plus its pair-set
  increment (within-batch LSH + band join against all prior batches'
  stored signatures). Reported: docs/s and per-batch wall. Per-batch
  cost GROWS with accumulated state (the cross-batch band join reads
  every prior signature batch), so first/last batch walls are reported
  too — the number that tells a deployment when to compact.

Prints ONE JSON line {"metric": "streaming_bench", ...}. Artifacts live
under .benchdata/stream_bench (wiped per run).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata", "stream_bench"
)
N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "10"))


def _drops(df, cols, out_dir: str, n: int, id_col: str) -> None:
    """Write df as n single-file parquet drops (micro-batch replay)."""
    from pyspark.sql import functions as F

    for i in range(n):
        (
            df.where(F.pmod(F.col(id_col), F.lit(n)) == i)
            .select(*cols)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"drop={i}"))
        )
    # flatten: the file source wants a flat dir of files
    flat = out_dir + "_flat"
    os.makedirs(flat, exist_ok=True)
    for i in range(n):
        d = os.path.join(out_dir, f"drop={i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(d, f), os.path.join(flat, f"b{i}_{f}"))


def _progress(q) -> list[dict]:
    return [json.loads(p) if isinstance(p, str) else p for p in q.recentProgress]


def _batch_stats(progress: list[dict], true_rows: int) -> dict:
    """Per-trigger walls from the query's progress events. Throughput
    uses the KNOWN unique input row count, not numInputRows — a
    foreachBatch sink that consumes the batch through several actions
    re-reads the source per action and numInputRows counts every read
    (observed 4x before the sinks cached their batch)."""
    rows = [p for p in progress if p["numInputRows"] > 0]
    walls = [p["durationMs"]["triggerExecution"] / 1000.0 for p in rows]
    return {
        "n_batches": len(rows),
        "rows": true_rows,
        "rows_per_s": round(true_rows / sum(walls), 1) if walls else None,
        "batch_s_median": round(statistics.median(walls), 3) if walls else None,
        "batch_s_p90": round(sorted(walls)[int(0.9 * (len(walls) - 1))], 3)
        if walls
        else None,
        "batch_s_first": round(walls[0], 3) if walls else None,
        "batch_s_last": round(walls[-1], 3) if walls else None,
    }


def growth_main() -> None:
    """Corpus-state per-trigger growth curve (VERDICT r10 #7): the
    cross-batch pair term reads all prior signature batches, so
    per-trigger cost grows with accumulated history BY DESIGN — this
    measures the curve to ~SPARK_GRAFT_STREAM_BATCHES (default 100)
    micro-batches under auto-compaction, the number a months-long
    stream needs before relying on the sink. Reports per-decade median
    trigger walls plus a linear-fit slope (s per batch) over the second
    half, where the compaction steady-state holds.

    Invoke: SPARK_GRAFT_STREAM_GROWTH=1 python bench_streaming.py
    (optional SPARK_GRAFT_STREAM_BATCHES / SPARK_GRAFT_STREAM_COMPACT)."""
    from sum_spark.session import get_spark
    from sum_spark.sources.tables import load_table
    from sum_spark.streaming.state import streaming_corpus_state

    n = N_BATCHES
    compact_after = int(os.environ.get("SPARK_GRAFT_STREAM_COMPACT", "16"))
    spark = get_spark("sum_spark_bench_stream_growth")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(n + 16))
    root = ROOT + "_growth"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    docs = load_table(spark, BASE_SF_DIR, "documents")
    ddrops = os.path.join(root, "doc_drops")
    _drops(docs, ["doc_id", "source", "text"], ddrops, n, "doc_id")
    dstream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(ddrops + "_flat")
    )
    t0 = time.perf_counter()
    q = streaming_corpus_state(
        dstream,
        os.path.join(root, "state"),
        os.path.join(root, "state_ck"),
        auto_compact_after=compact_after,
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    walls = [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in _progress(q)
        if p["numInputRows"] > 0
    ]
    decades = {
        f"b{10 * i:03d}": round(statistics.median(walls[10 * i : 10 * i + 10]), 3)
        for i in range(len(walls) // 10)
    }
    half = walls[len(walls) // 2 :]
    xs = range(len(half))
    mx = sum(xs) / len(half)
    my = sum(half) / len(half)
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, half)) / denom
    print(
        json.dumps(
            {
                "metric": "corpus_state_growth",
                "sf_dir": BASE_SF_DIR,
                "n_batches": len(walls),
                "auto_compact_after": compact_after,
                "wall_s": wall,
                "docs_per_s": round(docs.count() / sum(walls), 1),
                "decade_median_s": decades,
                "second_half_slope_s_per_batch": round(slope, 4),
                "batch_s_first": round(walls[0], 3),
                "batch_s_last": round(walls[-1], 3),
            }
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sum_spark.operators.similarity import write_pq_index
    from sum_spark.session import get_spark
    from sum_spark.sources.tables import load_table
    from sum_spark.streaming.ann import EMB_SCHEMA, streaming_ann_rerank
    from sum_spark.streaming.state import streaming_corpus_state

    spark = get_spark("sum_spark_bench_streaming")
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    result: dict = {"metric": "streaming_bench", "sf_dir": BASE_SF_DIR}

    # --- retrieval-at-ingest ------------------------------------------------
    emb = load_table(spark, BASE_SF_DIR, "embeddings")
    idx = os.path.join(ROOT, "pq_idx")
    write_pq_index(
        emb, idx, m=8, n_codes=64, id_col="vec_id", vec_col="embedding"
    )
    drops = os.path.join(ROOT, "probe_drops")
    _drops(emb, ["vec_id", "embedding"], drops, N_BATCHES, "vec_id")
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops + "_flat")
    )
    t0 = time.perf_counter()
    q = streaming_ann_rerank(
        stream,
        idx,
        emb.select(F.col("vec_id"), F.col("embedding")),
        os.path.join(ROOT, "rr_out"),
        os.path.join(ROOT, "rr_ck"),
        k=10,
        c=100,
        m=8,
        n_probes=8,
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    n_probes_total = emb.count()
    result["ann_rerank"] = {
        "wall_s": wall,
        **_batch_stats(_progress(q), n_probes_total),
    }

    # --- corpus-state maintenance -------------------------------------------
    docs = load_table(spark, BASE_SF_DIR, "documents")
    ddrops = os.path.join(ROOT, "doc_drops")
    _drops(docs, ["doc_id", "source", "text"], ddrops, N_BATCHES, "doc_id")
    dstream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(ddrops + "_flat")
    )
    t0 = time.perf_counter()
    q2 = streaming_corpus_state(
        dstream,
        os.path.join(ROOT, "state"),
        os.path.join(ROOT, "state_ck"),
    )
    q2.awaitTermination()
    wall2 = round(time.perf_counter() - t0, 2)
    result["corpus_state"] = {
        "wall_s": wall2,
        **_batch_stats(_progress(q2), docs.count()),
    }

    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_STREAM_GROWTH", "0") == "1":
        growth_main()
    else:
        main()
