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
OUT_DIR_SKEW = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata", f"sf{FACTOR}x_skew"
)
STRIDE = 1_000_000
# Planted boilerplate length (tokens) for the skew corpus: comparable to
# the ~54-token average document, so hot docs' shingle sets are ~half
# shared — hot LSH band buckets without pushing any pair past the 0.8
# verify threshold (shared/union ≈ 0.33).
BP_TOKENS = 54

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


def build_skewed(spark) -> None:
    """Skew-AMPLIFYING variant of the 10x corpus: same content-disjoint
    replication, but half the documents (doc_id even) are planted into
    ONE hot key per skew axis —

    - domain: their ``source`` is rewritten to 'src0', so one stratum
      holds ~52% of the corpus (vs 5% in the uniform table): the
      cap_domain_tokens prefix-sum, per-stratum sampling, and any
      groupBy-source aggregation all see a hot key;
    - LSH band: a per-replica BP_TOKENS-token boilerplate is prepended,
      so hot docs within a replica share ~half their shingles — their
      MinHash bands collide far above the uniform rate (hot band
      buckets, the salted-join case) while exact Jaccard stays ~0.33,
      far under the 0.8 verify threshold: candidate explosion with NO
      output explosion, the adversarial case line-dedup normally
      removes first.

    Embeddings are reused from the uniform scaled dir — the semantic
    hot-cluster axis is planted via CENTROIDS at measure time (6 of 8
    centroids moved to infinity), which skews assignment without
    touching pairwise similarities (shifting vectors toward a common
    center would manufacture above-threshold pairs and measure output
    explosion, not skew handling)."""
    from pyspark.sql import functions as F

    from sum_spark.sources.tables import load_table

    docs = load_table(spark, BASE_SF_DIR, "documents")
    parts = []
    for k in range(FACTOR):
        if k == 0:
            text = F.col("text")
        else:
            text = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"_r{k}"))
                ),
                " ",
            )
        bp = " ".join(f"bp{j}_r{k}" for j in range(BP_TOKENS))
        hot = F.pmod(F.col("doc_id"), F.lit(2)) == 0
        text = F.when(hot, F.concat(F.lit(bp + " "), text)).otherwise(text)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                F.when(hot, F.lit("src0")).otherwise(F.col("source")).alias("source"),
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionAll(p)
    d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT_DIR_SKEW, "documents.parquet")
    )
    # embeddings: symlink-equivalent copy of the uniform scaled table.
    spark.read.parquet(os.path.join(OUT_DIR, "embeddings.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(OUT_DIR_SKEW, "embeddings.parquet"))


def skew_block(spark) -> dict:
    """The planted-skew ratio table (VERDICT r5 #4): registry entries
    whose hot key lives in the table (domain skew), plus direct
    operator timings for the axes that need a knob (salted vs unsalted
    MinHash on the hot-band corpus; SemDeDup under a 50% cluster)."""
    from pyspark.sql import functions as F

    from sum_spark.operators import clustering, dedup
    from sum_spark.queries import REGISTRY
    from sum_spark.sources.tables import load_table

    out: dict[str, dict] = {}
    # Placement family added round 11 (VERDICT r10 #1): assign_ids
    # orders by n_chars, which the boilerplate plant makes bimodal-lumpy
    # (~half the corpus shifted up by a constant) — exactly the key
    # shape that degenerated the round-10 equi-width buckets into one
    # hot bucket; the skew-adaptive refinement must keep these ratios
    # near the replication factor.
    for name in (
        "corpus_mixture",
        "sample_stratified",
        "assign_ids",
        "pack_sequences",
        "global_shuffle",
    ):
        fn = REGISTRY[name].fn
        base = _time(fn, spark, BASE_SF_DIR)
        skew = _time(fn, spark, OUT_DIR_SKEW)
        out[name] = {
            "base": base,
            "skew": skew,
            "ratio": round(skew / base, 2) if base else None,
        }

    # Adversarial decile plant for placement (VERDICT r10 #1 "done"
    # criterion): HALF the corpus lands in [0, 1000) of a ~1e9 key range
    # — under equi-width buckets that is ONE bucket holding 50% of the
    # rows (a single-task sort); the refinement must hold the 10x ratio
    # near 10.
    from sum_spark.operators.sampling import assign_contiguous_ids

    def decile_ids(docs):
        keyed = docs.select(
            "doc_id",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(2)) == 0,
                F.pmod(F.col("doc_id"), F.lit(1000)),
            )
            .otherwise(F.pmod(F.col("doc_id") * 104729, F.lit(10**9)))
            .alias("k"),
        )
        return lambda s, d: assign_contiguous_ids(keyed, ["k", "doc_id"])

    docs_base = load_table(spark, BASE_SF_DIR, "documents")
    docs_skew10 = load_table(spark, OUT_DIR_SKEW, "documents")
    b_dec = _time(decile_ids(docs_base), spark, None)
    s_dec = _time(decile_ids(docs_skew10), spark, None)
    out["assign_ids_decile"] = {
        "base": b_dec,
        "skew": s_dec,
        "ratio": round(s_dec / b_dec, 2) if b_dec else None,
    }

    docs_skew = docs_skew10
    base_mh = _time(REGISTRY["dedup_minhash_lsh"].fn, spark, BASE_SF_DIR)
    t_uns = _time(lambda s, d: dedup.dedup_minhash_lsh(docs_skew, 0.8), spark, None)
    t_salt = _time(
        lambda s, d: dedup.dedup_minhash_lsh(docs_skew, 0.8, salt_bands=8),
        spark,
        None,
    )
    out["dedup_minhash_lsh"] = {
        "base": base_mh,
        "skew_unsalted": t_uns,
        "skew_salted": t_salt,
        "ratio_salted": round(t_salt / base_mh, 2) if base_mh else None,
    }

    # Semantic hot cluster: 6 of 8 hash-init centroids moved to
    # "infinity" — the survivors split the corpus ~50/50, so one cluster
    # holds ~10k vectors and the blocked within-cluster GEMM is the
    # stress. Similarities are untouched: output stays real-sized.
    emb10 = load_table(spark, OUT_DIR, "embeddings")
    emb1 = load_table(spark, BASE_SF_DIR, "embeddings")

    def cents_for(emb):
        return clustering._centroids_from_sums(
            clustering.centroid_sums(
                clustering.hash_init_assign(emb, 8), "cluster", "embedding",
                fixed_point=6,
            ).collect(),
            6,
        )

    c10, c1 = cents_for(emb10), cents_for(emb1)
    far = {
        i: ([1e9] * len(v) if i >= 2 else v) for i, v in c10.items()
    }

    def sem(emb, cents):
        return lambda s, d: clustering.semantic_dedup(
            emb, threshold=0.45, centroids=cents, assign_backend="catalyst"
        )

    base_sem = _time(sem(emb1, c1), spark, None)
    uni_sem = _time(sem(emb10, c10), spark, None)
    skew_sem = _time(sem(emb10, far), spark, None)
    out["semantic_dedup"] = {
        "base": base_sem,
        "scaled_uniform": uni_sem,
        "scaled_hot_cluster": skew_sem,
        "ratio_hot": round(skew_sem / base_sem, 2) if base_sem else None,
    }
    return out


def assign_block(spark) -> dict:
    """Cluster-assignment throughput (VERDICT r10 #4): the per-point
    pass every SemDeDup / IVF build pays, after the round-11 batched-
    GEMM rewrite of the numpy backend. Times single-probe and top-2
    assignment at k=64 over the base and FACTOR-scaled embeddings;
    linear scaling = ratio ~ FACTOR, and scaled_vecs_per_s is the
    100 TB sizing number (assignment is map-only, so the local[]
    figure multiplies by executor count)."""
    from sum_spark.operators import clustering
    from sum_spark.sources.tables import load_table

    emb1 = load_table(spark, BASE_SF_DIR, "embeddings")
    emb10 = load_table(spark, OUT_DIR, "embeddings")
    cents = clustering._centroids_from_sums(
        clustering.centroid_sums(
            clustering.hash_init_assign(emb1, 64), "cluster", "embedding",
            fixed_point=6,
        ).collect(),
        6,
    )
    n10 = emb10.count()
    out: dict[str, dict] = {}
    for label, make in (
        (
            "assign_k64",
            lambda e: clustering.assign_clusters(e, cents, backend="numpy"),
        ),
        (
            "assign_top2_k64",
            lambda e: clustering.assign_clusters_topp(e, cents, 2, backend="numpy"),
        ),
    ):
        t1 = _time(lambda s, d, e=emb1, m=make: m(e), spark, None)
        t10 = _time(lambda s, d, e=emb10, m=make: m(e), spark, None)
        out[label] = {
            "base": t1,
            "scaled": t10,
            "ratio": round(t10 / t1, 2) if t1 else None,
            "scaled_vecs_per_s": round(n10 / t10) if t10 else None,
        }
    return out


def recall_block(spark, sf_dir: str, k: int = 10) -> dict:
    """Measured ANN recall@k vs the brute-force ground truth (VERDICT r5
    #5): sign-bit IVF at n_probes 1/2/4 and IVF-PQ at m 4/8, over ~20
    deterministic probes."""
    from pyspark.sql import functions as F

    from sum_spark.operators.similarity import knn_bruteforce, knn_ivf, knn_ivfpq
    from sum_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # Scale-independent probe set (20 vectors from replica 0, present at
    # every factor): probe count is the bounded-small-side contract of
    # the PQ LUT-literal path, so it must not grow with the corpus.
    probes = emb.where(
        (F.col("vec_id") < 2000) & (F.pmod(F.col("vec_id"), F.lit(100)) == 0)
    )

    def topk_sets(df):
        sets: dict = {}
        for r in df.collect():
            sets.setdefault(r["probe_id"], set()).add(r["vec_id"])
        return sets

    kw = dict(id_col="vec_id", vec_col="embedding")
    brute_rows = knn_bruteforce(emb, probes, k=k, **kw).collect()
    truth: dict = {}
    near: dict = {}
    for r in brute_rows:
        truth.setdefault(r["probe_id"], set()).add(r["vec_id"])
        # the operational task: retrieve the probe's actual near-dups
        # (sim >= the dedup threshold), not arbitrary rank-10 noise
        if r["sim"] >= 0.45 and r["vec_id"] != r["probe_id"]:
            near.setdefault(r["probe_id"], set()).add(r["vec_id"])

    def recall(df) -> float:
        got = topk_sets(df)
        hits = sum(len(got.get(p, set()) & t) for p, t in truth.items())
        return round(hits / sum(len(t) for t in truth.values()), 3)

    def near_recall(df) -> float | None:
        n_true = sum(len(t) for t in near.values())
        if not n_true:
            return None
        got = topk_sets(df)
        hits = sum(len(got.get(p, set()) & t) for p, t in near.items())
        return round(hits / n_true, 3)

    out = {
        "n_probes": len(truth),
        "k": k,
        "n_neardup_truth": sum(len(t) for t in near.values()),
    }
    for np_ in (1, 2, 4):
        df = knn_ivf(emb, probes, k=k, n_probes=np_, **kw)
        out[f"ivf_p{np_}"] = recall(df)
        out[f"ivf_p{np_}_nd"] = near_recall(df)
    for m in (4, 8):
        df = knn_ivfpq(emb, probes, k=k, m=m, n_codes=8, **kw)
        out[f"ivfpq_m{m}"] = recall(df)
        out[f"ivfpq_m{m}_nd"] = near_recall(df)
    # Trained coarse quantizer (FAISS-IVFFlat shape): one-step
    # fixed-point k-means fit on the data, 64 cells — the index path a
    # 100 TB deployment should use for generic top-k (the data-oblivious
    # sign-bit buckets above are cheap but near-random for non-duplicate
    # neighbors at d=64; the table quantifies that trade).
    from sum_spark.operators import clustering
    from sum_spark.operators.similarity import knn_ivf_kmeans

    cents = clustering._centroids_from_sums(
        clustering.centroid_sums(
            clustering.hash_init_assign(emb, 64), "cluster", "embedding",
            fixed_point=6,
        ).collect(),
        6,
    )
    for np_ in (1, 2, 4, 8):
        df = knn_ivf_kmeans(emb, probes, k=k, centroids=cents, n_probes=np_, **kw)
        out[f"ivfk64_p{np_}"] = recall(df)
        out[f"ivfk64_p{np_}_nd"] = near_recall(df)
    # Exact re-ranking over a STORED trained-codebook PQ index (VERDICT
    # r6 #1): stage 1 = m=8 ADC over the n_probes nearest of 64 coarse
    # lists (scan fraction ~ n_probes/64 of the corpus, codes only);
    # stage 2 = fetch the top-C candidates' raw vectors and re-score
    # exactly. Within the probed lists the ordering is exact once C is
    # large enough, so recall converges to the coverage ceiling (the
    # ivfk64 row at the same n_probes) — the C sweep shows how fast, the
    # n_probes sweep prices the ceiling itself.
    from sum_spark.operators.similarity import knn_ivfpq_rerank, write_pq_index

    idx_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".benchdata",
        "pq_recall_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(idx_path, ignore_errors=True)
    write_pq_index(
        emb, idx_path, m=8, n_codes=64, id_col="vec_id", vec_col="embedding",
        centroids=cents,
    )
    for np_ in (8, 16, 32):
        for c in (100, 500, 3000):
            df = knn_ivfpq_rerank(
                spark, idx_path, emb, probes, k=k, c=c, m=8, n_probes=np_,
                id_col="vec_id", vec_col="embedding",
            )
            out[f"rr_p{np_}_c{c}"] = recall(df)
            out[f"rr_p{np_}_c{c}_nd"] = near_recall(df)
    # Same two-stage serve with a PROPERLY trained coarse quantizer
    # (kmeans_fit, 8 Lloyd iterations — what a production deployment
    # trains offline on a sample): better cell boundaries raise the
    # coverage ceiling rerank converges to, so the same scan fraction
    # buys more recall than the one-step book above.
    cents_t = clustering.kmeans_fit(
        emb, k=64, iters=8, id_col="vec_id", vec_col="embedding"
    )
    idx_t = idx_path + "_t"
    shutil.rmtree(idx_t, ignore_errors=True)
    write_pq_index(
        emb, idx_t, m=8, n_codes=64, id_col="vec_id", vec_col="embedding",
        centroids=cents_t,
    )
    for np_ in (8, 16, 32):
        for c in (500, 3000):
            df = knn_ivfpq_rerank(
                spark, idx_t, emb, probes, k=k, c=c, m=8, n_probes=np_,
                id_col="vec_id", vec_col="embedding",
            )
            out[f"rrt_p{np_}_c{c}"] = recall(df)
            out[f"rrt_p{np_}_c{c}_nd"] = near_recall(df)
    # RESIDUAL encoding on the same trained book (write_pq_index
    # residual=True — the textbook IVF-PQ layout): tighter ADC means the
    # candidate CUT loses fewer true neighbors, so rerank reaches the
    # coverage ceiling at a much smaller fetch C — the number that
    # prices stage 2 (raw-vector fetches per probe) at 100 TB.
    idx_r = idx_path + "_r"
    shutil.rmtree(idx_r, ignore_errors=True)
    write_pq_index(
        emb, idx_r, m=8, n_codes=64, id_col="vec_id", vec_col="embedding",
        centroids=cents_t, residual=True, res_iters=4,
    )
    for np_ in (8, 16, 32):
        for c in (50, 100, 500):
            df = knn_ivfpq_rerank(
                spark, idx_r, emb, probes, k=k, c=c, m=8, n_probes=np_,
                id_col="vec_id", vec_col="embedding",
            )
            out[f"rrr_p{np_}_c{c}"] = recall(df)
            out[f"rrr_p{np_}_c{c}_nd"] = near_recall(df)
    return out


CLUSTERED_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata", "clustered"
)


def build_clustered(spark) -> None:
    """Mixture-of-Gaussians embedding fixture (VERDICT r7 #3): the
    driver's synthetic embeddings are isotropic noise at fine scale, so
    residual PQ coding measures ~= raw coding on them — the one property
    that justifies shipping residual encoding (within-list spread <<
    corpus spread) has nothing to exploit. This fixture is 20k x 64
    vectors from 40 Gaussian clusters with ANISOTROPIC per-cluster,
    per-dimension scales (log-uniform 0.05..0.5 around unit-scale
    centers), deterministic seed — clustered like real text/image
    embeddings, so coarse lists are meaningful and residuals carry the
    local structure residual codes exist to capture."""
    import numpy as np

    n, d, c = 20000, 64, 40
    rng = np.random.default_rng(8)
    centers = rng.standard_normal((c, d))
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.5), size=(c, d)))
    labels = rng.integers(0, c, size=n)
    x = centers[labels] + rng.standard_normal((n, d)) * scales[labels]
    rows = [
        (int(i), [float(v) for v in x[i]], int(labels[i])) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).coalesce(8).write.mode("overwrite").parquet(
        os.path.join(CLUSTERED_DIR, "embeddings.parquet")
    )


def semrecall_block(spark) -> dict:
    """SemDeDup found-pair recall vs cluster count (VERDICT r9 #7): the
    k='auto' sizing keeps per-cluster population constant at scale, but
    more clusters means more near-dup pairs straddling a cluster
    boundary — the method's documented recall trade. This block measures
    it on the clustered fixture: ground truth is the EXACT all-pairs
    cosine (blocked numpy GEMM over the collected 20k x 64 matrix — the
    fixture is driver-sized by design), and since semantic_dedup emits
    only exact-verified within-cluster pairs, found-pairs are a subset
    of truth and recall is a count ratio. Reported per (k, threshold),
    k spanning the old fixed default (8), the auto sizing at this N, the
    fixture's true cluster count (40) and an over-split (80); plus the
    2-nearest-cluster probe mitigation (probes=2) where it matters."""
    import numpy as np

    from pyspark.sql import functions as F

    from sum_spark.operators import clustering

    emb = spark.read.parquet(os.path.join(CLUSTERED_DIR, "embeddings.parquet"))
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    n = len(x)
    thresholds = (0.6, 0.7, 0.8, 0.9)
    truth = {t: 0 for t in thresholds}
    step = 2048
    for i in range(0, n, step):
        sims = xn[i : i + step] @ xn.T
        for t in thresholds:
            hit = sims >= t
            # count j > i-block-global pairs only
            for bi in range(hit.shape[0]):
                truth[t] += int(hit[bi, i + bi + 1 :].sum())
    ks = {"k8_fixed": 8, "k_auto": clustering.sem_auto_k(n), "k40_true": 40, "k80_over": 80}
    out: dict = {"n": n, "truth_pairs": {str(t): truth[t] for t in thresholds},
                 "auto_k_at_n": clustering.sem_auto_k(n)}
    for tag, kk in ks.items():
        cents = clustering.kmeans_fit(
            emb, k=kk, iters=2, id_col="vec_id", vec_col="embedding"
        )
        for probes in (1, 2):
            row = {}
            for t in thresholds:
                found = clustering.semantic_dedup(
                    emb, threshold=t, id_col="vec_id", vec_col="embedding",
                    centroids=cents, probes=probes,
                ).count()
                row[str(t)] = round(found / truth[t], 4) if truth[t] else None
            out[f"{tag}_p{probes}"] = row
    return out


def clustered_block(spark, k: int = 10) -> dict:
    """Recall@k on the clustered fixture: trained-coarse-book rerank
    with RAW vs RESIDUAL PQ codes at equal candidate fetch C (the
    VERDICT r7 #3 separation), plus ADC-only recall (no rerank — pure
    code quality) and the one-step book for the trained-vs-one-step
    spread. Ground truth is brute force over 20 deterministic probes."""
    from pyspark.sql import functions as F

    from sum_spark.operators import clustering
    from sum_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivfpq_from_index,
        knn_ivfpq_rerank,
        write_pq_index,
    )

    emb = spark.read.parquet(os.path.join(CLUSTERED_DIR, "embeddings.parquet"))
    probes = emb.where(F.pmod(F.col("vec_id"), F.lit(1000)) == 0)
    kw = dict(id_col="vec_id", vec_col="embedding")
    truth: dict = {}
    for r in knn_bruteforce(emb, probes, k=k, **kw).collect():
        truth.setdefault(r["probe_id"], set()).add(r["vec_id"])

    def recall(df) -> float:
        got: dict = {}
        for r in df.collect():
            got.setdefault(r["probe_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(p, set()) & t) for p, t in truth.items())
        return round(hits / sum(len(t) for t in truth.values()), 3)

    out: dict = {"n_probes_set": len(truth), "k": k}
    cents_t = clustering.kmeans_fit(
        emb, k=64, iters=8, id_col="vec_id", vec_col="embedding"
    )
    cents_1 = clustering._centroids_from_sums(
        clustering.centroid_sums(
            clustering.hash_init_assign(emb, 64), "cluster", "embedding",
            fixed_point=6,
        ).collect(),
        6,
    )
    idx_raw = os.path.join(CLUSTERED_DIR, "pq_raw")
    idx_res = os.path.join(CLUSTERED_DIR, "pq_res")
    idx_one = os.path.join(CLUSTERED_DIR, "pq_one")
    for p, cents, res in (
        (idx_raw, cents_t, False),
        (idx_res, cents_t, True),
        (idx_one, cents_1, False),
    ):
        shutil.rmtree(p, ignore_errors=True)
        write_pq_index(
            emb, p, m=8, n_codes=64, centroids=cents,
            residual=res, res_iters=4 if res else 0, **kw,
        )
    # ADC-only (no rerank): the candidate ORDERING quality of the codes
    for np_ in (8, 16):
        for tag, p in (("raw", idx_raw), ("res", idx_res)):
            df = knn_ivfpq_from_index(
                spark, p, probes, k=k, m=8, n_probes=np_, **kw
            )
            out[f"adc_{tag}_p{np_}"] = recall(df)
    # Two-stage rerank at equal C: residual's tighter ADC should reach
    # the coverage ceiling at smaller C than raw — the crossover the
    # isotropic testdata could not show.
    for np_ in (8, 16):
        for c in (20, 50, 100, 500):
            for tag, p in (("raw", idx_raw), ("res", idx_res)):
                df = knn_ivfpq_rerank(
                    spark, p, emb, probes, k=k, c=c, m=8, n_probes=np_, **kw
                )
                out[f"rr_{tag}_p{np_}_c{c}"] = recall(df)
    # one-step coarse book at one operating point: the trained-book gap
    df = knn_ivfpq_rerank(
        spark, idx_one, emb, probes, k=k, c=100, m=8, n_probes=16, **kw
    )
    out["rr_onestep_p16_c100"] = recall(df)
    # the PRODUCTION config end-to-end: auto-sized coarse cells
    # (~4*sqrt(20k) = 566 — large-k numpy encode, broadcast-join
    # residualize, numpy probe LUTs) + residual codes + rerank. More
    # cells need more probes for the same coverage; the (probes, C)
    # sweep prices that trade on clustered data.
    idx_auto = os.path.join(CLUSTERED_DIR, "pq_auto_res")
    shutil.rmtree(idx_auto, ignore_errors=True)
    book = write_pq_index(
        emb, idx_auto, m=8, n_codes=64, n_cells="auto",
        residual=True, res_iters=4, **kw,
    )
    out["auto_cells"] = len(book)
    for np_ in (16, 48):
        for c in (100, 500):
            df = knn_ivfpq_rerank(
                spark, idx_auto, emb, probes, k=k, c=c, m=8,
                n_probes=np_, **kw,
            )
            out[f"rr_autores_p{np_}_c{c}"] = recall(df)
    return out


def cells_block(spark, k: int = 10) -> dict:
    """Auto-sized coarse quantizer evidence (VERDICT r7 #4): build the
    n_cells='auto' index on the base and the FACTOR-scaled embeddings,
    report chosen cells, measured rows scanned per probe (sum of the
    probed lists), the scanned FRACTION of the corpus, and recall@k at
    fixed n_probes — more data -> more cells, scanned fraction FALLS
    (~1/sqrt growth in scanned rows), recall holds."""
    from pyspark.sql import functions as F

    from sum_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivfpq_from_index,
        knn_ivfpq_rerank,
        write_pq_index,
    )
    from sum_spark.sources.tables import load_table

    out: dict = {}
    for tag, sf_dir in (("base", BASE_SF_DIR), ("scaled", OUT_DIR)):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        probes = emb.where(
            (F.col("vec_id") < 2000) & (F.pmod(F.col("vec_id"), F.lit(100)) == 0)
        )
        kw = dict(id_col="vec_id", vec_col="embedding")
        truth: dict = {}
        for r in knn_bruteforce(emb, probes, k=k, **kw).collect():
            truth.setdefault(r["probe_id"], set()).add(r["vec_id"])
        p = os.path.join(
            CLUSTERED_DIR, "..", f"pq_auto_{tag}_{FACTOR}x"
        )
        shutil.rmtree(p, ignore_errors=True)
        book = write_pq_index(emb, p, m=8, n_codes=64, n_cells="auto", **kw)
        n_probes = 8
        df = knn_ivfpq_from_index(
            spark, p, probes, k=k, m=8, n_probes=n_probes, **kw
        )
        got: dict = {}
        for r in df.collect():
            got.setdefault(r["probe_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(pp, set()) & t) for pp, t in truth.items())
        rr = knn_ivfpq_rerank(
            spark, p, emb, probes, k=k, c=100, m=8, n_probes=n_probes, **kw
        )
        got_rr: dict = {}
        for r in rr.collect():
            got_rr.setdefault(r["probe_id"], set()).add(r["vec_id"])
        hits_rr = sum(len(got_rr.get(pp, set()) & t) for pp, t in truth.items())
        # measured scan: the probed lists' actual sizes, per probe
        sizes = {
            r["coarse"]: r["cnt"]
            for r in spark.read.parquet(p)
            .groupBy("coarse")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        import numpy as np

        items = sorted(book.items())
        keys = np.array([c for c, _ in items], dtype=np.int64)
        cmat = np.array([c for _, c in items], dtype=np.float64)
        scanned = []
        for r in probes.select("vec_id", "embedding").collect():
            q = np.asarray([float(x) for x in r["embedding"]])
            d2 = ((cmat - q) ** 2).sum(axis=1)
            lists = keys[np.lexsort((keys, d2))][:n_probes]
            scanned.append(int(sum(sizes.get(int(c), 0) for c in lists)))
        n_truth = sum(len(t) for t in truth.values())
        out[tag] = {
            "n": n,
            "cells": len(book),
            "recall_adc": round(hits / n_truth, 3),
            "recall_rerank_c100": round(hits_rr / n_truth, 3),
            "scanned_rows_per_probe": int(sum(scanned) / len(scanned)),
            "scanned_fraction": round(sum(scanned) / len(scanned) / n, 4),
        }
    return out


def pack_skew_block(spark) -> dict:
    """VERDICT r11 #2: per-leg attribution of pack_sequences' planted-skew
    cell. The round-11 entry-level 4.15x at 10x skew could hide either a
    placement regression (pack leg) or the pipeline leg's LSH candidate
    mass; this block times the two legs separately (execution-only — the
    pipe memo holds after the first build, exactly bench.py's leg
    contract) and records the pipeline PREP cost (the eager signature
    persist + LSH pair pass + cluster collect a deployment pays once per
    snapshot) as its own row. It also answers "does salt_bands='auto'
    engage on the planted hot band": the measured hottest band bucket
    and the resulting salt decision on both corpora (over the full
    documents table; the pipeline's %97 corpus filter shifts counts by
    ~1%)."""
    from pyspark.sql import functions as F

    from sum_spark.operators import dedup
    from sum_spark.queries import REGISTRY, llm
    from sum_spark.sources.tables import load_table

    fn = REGISTRY["pack_sequences"].fn
    rows: dict[str, dict[str, float]] = {}
    for label, d in (("base", BASE_SF_DIR), ("skew", OUT_DIR_SKEW)):
        llm._PIPE_MEMO.clear()
        t0 = time.perf_counter()
        keepalive = fn(spark, d)  # cold build: pays the eager pipeline prep
        prep = round(time.perf_counter() - t0, 3)
        rec: dict[str, float] = {"prep_construct": prep}
        for leg in ("pack", "pipeline"):

            def leg_fn(s, _d, leg=leg, d=d):
                w = fn(s, d)
                o = w.where(F.col("mode") == leg)
                o._bench_keepalive = w
                return o

            rec[leg] = _time(leg_fn, spark, d, build_outside=True)
        rows[label] = rec
        del keepalive
    out: dict = {
        "legs": rows,
        "ratio": {
            k: (
                round(rows["skew"][k] / rows["base"][k], 2)
                if rows["base"][k]
                else None
            )
            for k in ("prep_construct", "pack", "pipeline")
        },
    }
    salt: dict[str, dict] = {}
    for label, d in (("base", BASE_SF_DIR), ("skew", OUT_DIR_SKEW)):
        docs = load_table(spark, d, "documents")
        sig = dedup.minhash_signatures(docs, "text", "doc_id").persist()
        bands = dedup._bands_from_sig(sig)
        hottest = (
            bands.groupBy("key")
            .agg(F.count("*").alias("c"))
            .agg(F.max("c").alias("m"))
            .first()["m"]
        )
        salt[label] = {
            "hottest_bucket": int(hottest or 0),
            "auto_salt": dedup._auto_band_salt(bands),
        }
        sig.unpersist()
    out["auto_salt"] = salt
    return out


def _time(fn, spark, sf_dir, runs: int | None = None, build_outside: bool = False) -> float:
    if runs is None:
        runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    best = float("inf")
    for _ in range(runs):
        if build_outside:
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.count()
        else:
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

    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY", "")  # '', 'entries',
    # 'skew', 'recall', 'clustered', 'cells', 'assign', 'semrecall' — or
    # comma-combinations; empty runs everything except semrecall (it is
    # a design-question block, not a per-round regression row).
    want = (
        set(only.split(","))
        if only
        else {"entries", "skew", "recall", "clustered", "cells", "assign"}
    )

    result: dict = {
        "metric": "scale_curve",
        "factor": FACTOR,
        "base_sf_dir": BASE_SF_DIR,
    }
    # SPARK_GRAFT_SCALE_ENTRIES="a,b,c" restricts the entries pass to a
    # subset — the 30x replication (VERDICT r8 #5) re-measures only the
    # steepest-exponent entries rather than paying the whole suite at 3x
    # the 10x data volume.
    subset = os.environ.get("SPARK_GRAFT_SCALE_ENTRIES", "")
    run_entries = [e for e in subset.split(",") if e] or ENTRIES
    # SPARK_GRAFT_SCALE_LEGS=1 times each tagged UNION ALL leg of the
    # subset entries separately (execution-only, the bench.py leg
    # contract) — the growth-exponent question is PER ALGORITHM, and an
    # entry that carries a deliberately-quadratic exact baseline next to
    # its scalable twin (dedup_embedding_cosine) answers it wrongly as a
    # whole: at a high enough factor the baseline leg dominates the
    # entry no matter how well the twins scale.
    time_scale_legs = os.environ.get("SPARK_GRAFT_SCALE_LEGS", "0") == "1"
    if "entries" in want:
        from pyspark.sql import functions as F

        from bench import TAGGED_LEGS

        entries: dict[str, dict[str, float]] = {}
        for name in run_entries:
            fn = REGISTRY[name].fn
            base = _time(fn, spark, BASE_SF_DIR)
            scaled = _time(fn, spark, OUT_DIR)
            entries[name] = {
                "base": base,
                "scaled": scaled,
                "ratio": round(scaled / base, 2) if base > 0 else None,
            }
            if time_scale_legs and name in TAGGED_LEGS:
                tag, values = TAGGED_LEGS[name]
                for v in values:
                    def leg(s, d, fn=fn, tag=tag, v=v):
                        whole = fn(s, d)
                        out = whole.where(F.col(tag) == v)
                        out._bench_keepalive = whole
                        return out

                    lb = _time(leg, spark, BASE_SF_DIR, build_outside=True)
                    ls = _time(leg, spark, OUT_DIR, build_outside=True)
                    entries[f"{name}.{v}"] = {
                        "base": lb,
                        "scaled": ls,
                        "ratio": round(ls / lb, 2) if lb > 0 else None,
                    }
        result["entries"] = entries
        if run_entries is not ENTRIES:
            result["entries_subset"] = run_entries
    if "skew" in want:
        if rebuild and os.path.isdir(OUT_DIR_SKEW):
            shutil.rmtree(OUT_DIR_SKEW)
        if not os.path.isdir(os.path.join(OUT_DIR_SKEW, "documents.parquet")):
            build_skewed(spark)
        result["skew"] = skew_block(spark)
    if "packskew" in want:
        # Attribution block (VERDICT r11 #2), not a per-round row: run
        # with SPARK_GRAFT_SCALE_ONLY=packskew.
        if not os.path.isdir(os.path.join(OUT_DIR_SKEW, "documents.parquet")):
            build_skewed(spark)
        result["pack_skew"] = pack_skew_block(spark)
    if "recall" in want:
        result["recall"] = {
            "base": recall_block(spark, BASE_SF_DIR),
            "scaled": recall_block(spark, OUT_DIR),
        }
    if "clustered" in want:
        if rebuild or not os.path.isdir(
            os.path.join(CLUSTERED_DIR, "embeddings.parquet")
        ):
            build_clustered(spark)
        result["clustered"] = clustered_block(spark)
    if "semrecall" in want:
        if not os.path.isdir(os.path.join(CLUSTERED_DIR, "embeddings.parquet")):
            build_clustered(spark)
        result["semrecall"] = semrecall_block(spark)
    if "assign" in want:
        result["assign"] = assign_block(spark)
    if "cells" in want:
        result["cells"] = cells_block(spark)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
