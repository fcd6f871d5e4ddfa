"""Scale-curve benchmark: one order-of-magnitude point above the per-round
bench. Replicates the sf0.1 documents/embeddings tables FACTOR times into
.benchdata/sf<R> (content-disjoint replicas — see below), times the
heaviest registry entries at both scales, and prints ONE JSON line:

    {"metric": "scale_curve", "factor": 10, "entries":
        {"dedup_exact": {"base": s, "scaled": s, "ratio": r}, ...}}

A ratio well above the factor means the entry grows super-linearly — the
100 TB red flag this harness exists to catch (plan shape at one scale
factor proves nothing about the growth exponent).

Replication must not change the WORKLOAD CHARACTER, only the volume:

- documents: replica k > 0 suffixes every token with _rk, so replicas
  share no shingles/lines/grams — each replica reproduces the corpus's
  internal duplicate structure exactly and contributes its own vocabulary.
  Naive copying would instead make every document a 10-way exact dup and
  blow the near-dup pair count up quadratically — a different workload,
  not a bigger one. n_chars is recomputed; doc_id shifts by k * STRIDE.
- embeddings: replica k flips the sign of a deterministic per-replica
  subset of dimensions (md5-derived pattern). Sign flips preserve norms
  and all WITHIN-replica cosines exactly while making cross-replica
  cosines of the same source vector ~N(0, 1/d) — again: same near-dup
  density per replica, no cross-replica near-dup explosion.

Inputs come from the driver-generated sf0.1 tables; the scaled copies are
derived measurement artifacts under the repo (.benchdata/, gitignored).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata", f"sf{FACTOR}x"
)
STRIDE = 1_000_000

# The heaviest entries of BENCH_r04/r05 that read only documents/embeddings
# (the TPC-H-shaped entries are Catalyst-native scans+joins whose scaling
# Spark itself owns; the custom dedup/pipeline operators are where a
# super-linear surprise would hide).
ENTRIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "text_profile",
    "text_chunk",
    "pack_sequences",
    "embed_quantize",
    "decontaminate",  # round-5: exact + Bloom legs share one persisted shingle pass
    "knn_search",  # round-5: brute/filt/ivf/ivfpq legs over embeddings
    # fourth pass (documents-only entries; q20/q38 need unscaled tables):
    "bm25_search",  # scan + posting-list legs: tokenize + index build
    "global_shuffle",  # hash-rank + z-order rank, both two-pass range placement
    "sample_stratified",  # bern + exact-k + weighted replica-minima draw
]


def _sign_pattern(k: int, dim: int) -> list[float]:
    """Deterministic ±1 pattern for replica k: flip dim i iff the i-th
    byte of md5('scale:k:i') is odd. Replica 0 is the identity."""
    if k == 0:
        return [1.0] * dim
    out = []
    for i in range(dim):
        h = hashlib.md5(f"scale:{k}:{i}".encode()).digest()[0]
        out.append(-1.0 if h % 2 else 1.0)
    return out


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from sum_spark.sources.tables import load_table

    docs = load_table(spark, BASE_SF_DIR, "documents")
    emb = load_table(spark, BASE_SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])

    doc_parts = []
    emb_parts = []
    for k in range(FACTOR):
        if k == 0:
            text = F.col("text")
            vec = F.col("embedding")
        else:
            text = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"_r{k}"))
                ),
                " ",
            )
            pat = F.array(*[F.lit(s) for s in _sign_pattern(k, dim)])
            vec = F.zip_with(
                F.col("embedding").cast("array<float>"),
                pat,
                lambda x, s: (x * s).cast("float"),
            )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * STRIDE)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionAll(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionAll(p)
    d.repartition(32).write.mode("overwrite").parquet(os.path.join(OUT_DIR, "documents.parquet"))
    e.repartition(32).write.mode("overwrite").parquet(os.path.join(OUT_DIR, "embeddings.parquet"))


def _time(fn, spark, sf_dir, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from sum_spark.queries import REGISTRY
    from sum_spark.session import get_spark

    spark = get_spark("sum_spark_bench_scale")
    rebuild = os.environ.get("SPARK_GRAFT_SCALE_REBUILD", "0") == "1"
    if rebuild and os.path.isdir(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    if not os.path.isdir(os.path.join(OUT_DIR, "documents.parquet")):
        build_scaled(spark)

    # Warm-up.
    REGISTRY["dedup_exact"].fn(spark, BASE_SF_DIR).count()

    entries: dict[str, dict[str, float]] = {}
    for name in ENTRIES:
        fn = REGISTRY[name].fn
        base = _time(fn, spark, BASE_SF_DIR)
        scaled = _time(fn, spark, OUT_DIR)
        entries[name] = {
            "base": base,
            "scaled": scaled,
            "ratio": round(scaled / base, 2) if base > 0 else None,
        }
    print(
        json.dumps(
            {
                "metric": "scale_curve",
                "factor": FACTOR,
                "base_sf_dir": BASE_SF_DIR,
                "entries": entries,
            }
        )
    )


if __name__ == "__main__":
    main()
