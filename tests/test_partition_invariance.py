"""Partition-layout invariance: the property that makes an operator safe
on a 1000-executor cluster. Every operator whose algorithm touches
physical partitioning (the two-pass range-partition machinery, hash-based
sampling, LSH band joins, union-find fast paths) must produce IDENTICAL
results regardless of how the input happens to be partitioned — layout is
an executor-count artifact, never a semantic input.

These tests run each operator under two adversarially different layouts
(a skewed low-partition shape vs a scattered high-partition shape) and
assert row-for-row equality. A failure here means results would change
when a cluster scales up — the worst kind of silent corruption.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators import dedup, sampling
from sum_spark.operators.pipeline import prepare_training_data
from sum_spark.sources.tables import load_table


def _docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )


def _layouts(df):
    """Two hostile physical layouts of the same data: everything crammed
    into 1 partition vs scattered across 17 by an unrelated hash key."""
    return df.coalesce(1), df.repartition(17, F.col("text"))


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _assert_layout_invariant(fn, df, order_cols):
    a, b = _layouts(df)
    ra = _rows(fn(a).orderBy(*order_cols))
    rb = _rows(fn(b).orderBy(*order_cols))
    assert ra == rb
    assert len(ra) > 0


def test_pack_sequences_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: sampling.pack_sequences(d, 256),
        _docs(spark, sf_smoke),
        ["doc_id"],
    )


def test_assign_contiguous_ids_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: sampling.assign_contiguous_ids(d.select("doc_id"), ["doc_id"]),
        _docs(spark, sf_smoke),
        ["doc_id"],
    )


def test_global_shuffle_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: sampling.global_shuffle(d, seed="inv-test"),
        _docs(spark, sf_smoke),
        ["shuffle_pos"],
    )


def test_sample_stratified_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: sampling.sample_stratified(
            d, {"src0": 1.0, "src1": 0.5}, default_rate=0.3
        ),
        _docs(spark, sf_smoke),
        ["doc_id"],
    )


def test_sample_exact_k_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: sampling.sample_exact_k(d, 9),
        _docs(spark, sf_smoke),
        ["doc_id"],
    )


def test_dedup_exact_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: dedup.dedup_exact(d),
        _docs(spark, sf_smoke),
        ["keep_id"],
    )


def test_dedup_minhash_lsh_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        lambda d: dedup.dedup_minhash_lsh(d, threshold=0.8),
        _docs(spark, sf_smoke),
        ["doc_a", "doc_b"],
    )


def test_dedup_clusters_invariant(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)

    def run(d):
        pairs = dedup.dedup_ngram_jaccard(d, threshold=0.8, max_df=None)
        return dedup.dedup_clusters(pairs)

    _assert_layout_invariant(run, docs, ["doc_id"])


def test_prepare_training_data_invariant(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    def run(d):
        return prepare_training_data(
            d, benchmark=bench, rates={"src0": 1.0}, default_rate=0.8
        )

    _assert_layout_invariant(run, corpus, ["doc_id"])


def test_dedup_lines_invariant(spark, sf_smoke):
    lined = _docs(spark, sf_smoke).select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text")
    )
    _assert_layout_invariant(dedup.dedup_lines, lined, ["doc_id"])


def test_remove_duplicate_spans_invariant(spark, sf_smoke):
    _assert_layout_invariant(
        dedup.remove_duplicate_spans, _docs(spark, sf_smoke), ["doc_id"]
    )


def test_hash_weight_scoring_invariant(spark, sf_smoke):
    from sum_spark.operators.classifier import score_with_hash_weights

    _assert_layout_invariant(
        score_with_hash_weights, _docs(spark, sf_smoke), ["doc_id"]
    )


def test_product_quantize_invariant(spark, sf_smoke):
    from sum_spark.operators.embeddings import product_quantize

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    a, b = emb.coalesce(1), emb.repartition(17, F.col("vec_id"))
    ra = [tuple([r["vec_id"]] + list(r["codes"])) for r in product_quantize(a)[0].collect()]
    rb = [tuple([r["vec_id"]] + list(r["codes"])) for r in product_quantize(b)[0].collect()]
    assert ra == rb and len(ra) > 0


def test_knn_ivfpq_invariant(spark, sf_smoke):
    from sum_spark.operators.similarity import knn_ivfpq

    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("data")
    )
    probes = emb.where("id <= 3")
    a, b = emb.coalesce(1), emb.repartition(17, F.col("id"))
    ra = [tuple(r) for r in knn_ivfpq(a, probes, k=5, round_to=4).collect()]
    rb = [tuple(r) for r in knn_ivfpq(b, probes, k=5, round_to=4).collect()]
    assert ra == rb and len(ra) > 0


def test_vocab_heavy_hitters_invariant(spark, sf_smoke):
    """The q31 'vocab' leg: TakeOrdered top-k with a total (tf desc,
    token) order must not depend on layout."""
    from sum_spark.functions.text import tokens

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")

    def vocab(d):
        return (
            d.select("doc_id", F.explode(tokens("text")).alias("__w"))
            .groupBy("__w")
            .agg(
                F.count("*").cast("long").alias("tf"),
                F.countDistinct("doc_id").cast("long").alias("df"),
            )
            .orderBy(F.col("tf").desc(), F.col("__w"))
            .limit(30)
        )

    a, b = docs.coalesce(1), docs.repartition(17, F.col("text"))
    ra = [tuple(r) for r in vocab(a).collect()]
    rb = [tuple(r) for r in vocab(b).collect()]
    assert ra == rb and len(ra) == 30


def test_cap_domain_tokens_invariant(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    _assert_layout_invariant(
        lambda d: sampling.cap_domain_tokens(d, 2500), docs, ["doc_id"]
    )
