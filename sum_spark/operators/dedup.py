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
from sum_spark.functions.text import tokens, word_shingles
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
    """(id, shingles: array<string> distinct) word-3-shingle sets."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(tokens(text_col))).alias("shingles"),
    ).where(F.size("shingles") > 0)


def _exact_jaccard_pairs(cand: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs against exact shingle-set
    Jaccard; emit pairs >= threshold with the rounded score."""
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("__sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("__sb"))
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
) -> DataFrame:
    """Exact all-pairs shingle-Jaccard >= threshold via an inverted-index
    self-join: explode distinct shingles, equi-join on the shingle, count
    common shingles per pair, finish with |A|+|B|-common.

    This is the scalable exact form — the join key is a shingle, so only
    docs *sharing* a shingle ever meet; no cross join. Skew note: at corpus
    scale, cap document frequency per shingle (drop stop-shingles) before
    the join; not applied here because the oracle checks the uncapped
    result. Output: (doc_a, doc_b, jaccard) ordered.
    """
    sets = shingle_sets(df, text_col, id_col)
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    ex = sets.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), "s")
    common = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
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
    sig = sets.select(
        "doc_id",
        "shingles",
        minhash_signature(F.transform("shingles", lambda s: hash32(s))).alias("sig"),
    )
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
    return _exact_jaccard_pairs(cand, sets, threshold)


def simhash(shingles_col) -> F.Column:
    """60-bit SimHash over an array<string> of features, as one Catalyst
    expression: per bit j, sign of sum over features of (bit j of the
    60-bit md5 hash ? +1 : -1).
    """
    hashes = F.transform(shingles_col, lambda s: hash60(s))

    def bit_vote(j: int):
        # Factory closure (pyspark introspects lambda arity).
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        bit_sum = F.aggregate(hashes, F.lit(0), bit_vote(j))
        out = out + F.when(bit_sum > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


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
    sh = sets.select("doc_id", simhash(F.col("shingles")).alias("sh"))
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
    """Embedding near-dup: all pairs with cosine >= threshold.

    Exact form: self cross join with id< ordering — O(N²), correct at test
    scale. The 100 TB path is knn_ivf-style bucketing (join on coarse
    bucket) or MLlib BucketedRandomProjectionLSH; this exact form is kept
    as the oracle-checkable ground truth. Output: (id_a, id_b, sim).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    sim = cosine(F.col("__va"), F.col("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("__s"))
        .where(F.col("__s") >= threshold)
        .select("id_a", "id_b", F.round("__s", 4).alias("sim"))
        .orderBy("id_a", "id_b")
    )
