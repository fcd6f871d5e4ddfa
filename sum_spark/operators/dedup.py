"""Deduplication operators for large-scale training-data pipelines:
exact, n-gram Jaccard (inverted-index join), MinHash+LSH, SimHash, and
embedding-cosine near-dup.

No reference analog (the reference stops at pairwise vector kernels);
these are the scale-path composition of those kernels:

- every candidate-generation step is an *equi-join* (band bucket, simhash
  chunk, shared shingle) so Catalyst can hash-partition it — never an
  all-pairs cross join;
- hashing is the portable md5-based family from functions.hashing, so the
  DuckDB oracle reproduces results value-for-value;
- signatures/simhashes are pure array expressions (no shuffle, no Python)
  computed in one projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    SIMHASH_BITS,
    hash32,
    hash60,
    minhash_signature,
)
from sum_spark.functions.text import SHINGLE_N, tokens, word_shingles
from sum_spark.functions.vector import cosine


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate grouping: one group per distinct text, keeper = min id.

    Output: (keep_id, n_dups). At scale, group on a hash of the text
    (md5 here) so the shuffle key is 16 bytes instead of the document.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingles: array<string> distinct) word-3-shingle sets.

    Staged projections on purpose: tokenizing inline would re-evaluate
    split(text) inside every element_at lambda (~3 x #shingles splits of
    the full text per row — quadratic in document length); materializing
    the words array first makes shingle construction linear.
    """
    spark = df.sparkSession
    # A single-file input arrives as ONE partition (a parquet row group is
    # not splittable), which would serialize all downstream hashing on one
    # core. Redistribute the raw rows first — a tiny shuffle that unlocks
    # full parallelism for the expensive per-document expressions. At real
    # scale the scan has many files and this is a no-op-sized safety net.
    df = df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
    words = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__words"))
    # Filter on the words count (equivalent to size(shingles) > 0 for
    # SHINGLE_N-shingles): filtering on the shingle array would push the
    # whole shingle expression down past the projection and re-inline it.
    words = words.where(F.size("__words") >= SHINGLE_N)
    return words.select(
        "doc_id", F.array_distinct(word_shingles(F.col("__words"))).alias("shingles")
    )


def _exact_jaccard_pairs(
    cand: DataFrame, sets: DataFrame, threshold: float, feat_col: str = "shingles"
) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs against exact feature-set
    Jaccard; emit pairs >= threshold with the rounded score. ``feat_col``
    may be the shingle strings or their sorted hash arrays (identical
    counts up to negligible 60-bit collisions, far cheaper to intersect)."""
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col(feat_col).alias("__sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col(feat_col).alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    j = inter / union
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", j.alias("__j"))
        .where(F.col("__j") >= threshold)
        .select("doc_a", "doc_b", F.round("__j", 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs shingle-Jaccard >= threshold via an inverted-index
    self-join: explode distinct shingles, equi-join on the shingle, count
    common shingles per pair, finish with |A|+|B|-common.

    This is the scalable exact form — the join key is a shingle, so only
    docs *sharing* a shingle ever meet; no cross join. ``max_df`` is the
    skew guard for corpus scale: shingles appearing in more than max_df
    documents (stop-shingles — the hot keys that blow up the self-join)
    are dropped from candidate generation. It changes the computed
    intersection counts, so the oracle-checked default leaves it off.
    Output: (doc_a, doc_b, jaccard) ordered.
    """
    sets = shingle_sets(df, text_col, id_col)
    # Prefix filtering (the PPJoin family's core pruning rule): two sets
    # with Jaccard >= t MUST share an element among their first
    # |A| - ceil(t*|A|) + 1 elements under any fixed global order — here
    # the sorted 60-bit shingle hashes. Exploding only the prefix shrinks
    # the candidate self-join quadratically (~(1-t)^2 of the pairs) with
    # zero loss of exactness; candidates are then verified on the full
    # shingle sets. (60-bit hash collision risk 2^-60 per shingle pair —
    # far below any observable effect.)
    hashed = sets.select(
        "doc_id",
        "shingles",
        F.sort_array(F.transform("shingles", lambda s: hash60(s))).alias("hh"),
    )
    prefix_len = (F.size("hh") - F.ceil(F.size("hh") * F.lit(float(threshold))) + 1).cast(
        "int"
    )
    ex = hashed.select(
        "doc_id", F.explode(F.slice("hh", 1, prefix_len)).alias("s")
    )
    if max_df is not None:
        hot = ex.groupBy("s").agg(F.count("*").alias("df")).where(F.col("df") > max_df)
        ex = ex.join(F.broadcast(hot.select("s")), "s", "left_anti")
    a = ex.select(F.col("doc_id").alias("doc_a"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), "s")
    cand = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Verify on the sorted hash arrays: long-array intersects are ~an order
    # of magnitude cheaper than intersecting ~20-char shingle strings.
    return _exact_jaccard_pairs(
        cand, hashed.select("doc_id", "hh"), threshold, feat_col="hh"
    )


def dedup_minhash_lsh(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-dup detection, exact-verified.

    Pipeline (shingle -> minhash -> band -> bucket-join -> verify):
      1. 64-perm MinHash signature per doc — one array expression, no shuffle;
      2. 16 bands x 4 rows; band key = md5 of the 4 minhashes;
      3. candidate pairs = docs sharing any (band, key) bucket (equi-join);
      4. exact shingle-set Jaccard >= threshold on candidates only.

    P(candidate | s=0.8) ≈ 0.9998, and the corpus's planted near-dups sit
    at s≈0.98 where recall is 1 - 1e-18 — so the verified output equals
    the exact all-pairs result, which is what the oracle checks.
    At 100 TB only steps 3-4 shuffle, and only on O(#near-dup) rows.
    """
    sets = shingle_sets(df, text_col, id_col)
    # Materialize the md5-based shingle hashes in their own projection:
    # the permutation fold references this array many times, and inlining
    # the md5 transform would hash every shingle per permutation.
    hashed = sets.select(
        "doc_id",
        F.sort_array(F.transform("shingles", lambda s: hash60(s))).alias("hh"),
        F.transform("shingles", lambda s: hash32(s)).alias("shash"),
    )
    # Persist the signatures: higher-order-function expressions are
    # evaluated interpreted (outside whole-stage codegen), so letting the
    # band self-join's two branches and the verify stage each recompute
    # the 64-permutation fold costs seconds per branch at sf0.1 (and 64x
    # that at scale). The persisted intermediate is tiny (ids + 64 longs +
    # hash array per doc) and Spark evicts it LRU.
    sig = hashed.select("doc_id", "hh", minhash_signature(F.col("shash")).alias("sig")).persist()
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * LSH_ROWS + r + 1)
                                    for r in range(LSH_ROWS)
                                ],
                            )
                        ).alias("key"),
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        left.join(right, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _exact_jaccard_pairs(
        cand, sig.select("doc_id", "hh"), threshold, feat_col="hh"
    )


def simhash(hashes) -> F.Column:
    """60-bit SimHash over an array<long> of 60-bit feature hashes: per bit
    j, sign of sum over features of (bit j set ? +1 : -1), packed into one
    long.

    Built as ONE fold carrying all 60 bit-votes in the accumulator array
    (indexed transform against a literal powers-of-two array) — 60
    separate aggregate subtrees are evaluated interpreted (HOFs never
    enter whole-stage codegen) and would be recomputed per consumer
    branch. Callers must pass a *materialized* hash-array column so the
    md5 transform is not inlined per vote.
    """
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.transform(
            acc,
            lambda c, j: c
            + F.when(h.bitwiseAND(F.element_at(powers, j + 1)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ),
    )
    packed = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(packed, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dedup_simhash(
    df: DataFrame,
    max_dist: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_dist.

    Candidate generation is the pigeonhole trick: split the 60-bit simhash
    into max_dist+1 chunks — any pair within max_dist must agree on at
    least one chunk — and equi-join per chunk. Exact (not probabilistic):
    output == brute-force cross join, but the join is hash-partitionable.
    Output: (doc_a, doc_b, dist).
    """
    n_chunks = max_dist + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    sets = shingle_sets(df, text_col, id_col)
    hashed = sets.select(
        "doc_id", F.transform("shingles", lambda s: hash60(s)).alias("shash")
    )
    # Persisted for the same reason as the MinHash signatures: the chunk
    # self-join's branches would each re-evaluate the interpreted fold.
    sh = hashed.select("doc_id", simhash(F.col("shash")).alias("sh")).persist()
    mask = (1 << chunk_bits) - 1
    chunks = sh.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("sh", i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("ck"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", "c.chunk", "c.ck")
    a = chunks.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"), "chunk", "ck")
    b = chunks.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"), "chunk", "ck")
    dist = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).cast("long")
    return (
        a.join(b, ["chunk", "ck"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", dist.alias("dist"))
        .distinct()
        .where(F.col("dist") <= max_dist)
        .orderBy("doc_a", "doc_b")
    )


def dedup_embedding_cosine(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold (exact).

    Executed as a blocked broadcast GEMM: the normalized matrix is
    broadcast once (ids + float64 rows), and each partition computes
    block x matrix^T with NumPy inside mapInPandas, emitting only
    above-threshold upper-triangle pairs. This avoids ever materializing
    the O(N²) pair join — a Catalyst cross join recomputes two norms and
    a 64-dim dot per pair and is ~40x slower at 5k vectors.

    Scale posture: exact all-pairs is inherently bounded by the broadcast
    side fitting in executor memory (~1.3 MB per 5k x 64 floats; fine to
    low millions of rows). Beyond that, prune candidates first (knn_ivf
    buckets / LSH) — the reason those operators exist.
    Zero-magnitude rows follow the cosine->0.0 rule (the row is zeroed by
    normalization, so it never crosses a positive threshold).
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # Collect ids+vectors once on the driver for the broadcast side. This
    # is the operator's explicit memory bound, not a hidden driver loop.
    pdf = rows.toPandas()
    ids = pdf["id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.where(norms == 0.0, 1.0, norms)[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_unit = spark.sparkContext.broadcast(unit)

    def block_sims(it):
        all_ids = b_ids.value
        all_unit = b_unit.value
        for block in it:
            bmat = np.stack(block["v"].to_numpy()).astype(np.float64)
            bnorm = np.linalg.norm(bmat, axis=1)
            bunit = bmat / np.where(bnorm == 0.0, 1.0, bnorm)[:, None]
            sims = bunit @ all_unit.T  # (block, N)
            bid = block["id"].to_numpy()
            # Upper triangle by id, threshold on the unrounded value.
            mask = (sims >= threshold) & (bid[:, None] < all_ids[None, :])
            li, rj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": bid[li],
                    "id_b": all_ids[rj],
                    "sim": np.round(sims[li, rj], 4),
                }
            )

    return (
        rows.repartition(max(2, spark.sparkContext.defaultParallelism), "id")
        .mapInPandas(block_sims, schema="id_a long, id_b long, sim double")
        .orderBy("id_a", "id_b")
    )
