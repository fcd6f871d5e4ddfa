"""End-to-end tests for the composed training-data preparation flow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import dedup
from sum_spark.operators.pipeline import prepare_training_data
from sum_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def prepared(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    out = prepare_training_data(
        corpus,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
    ).persist()
    yield corpus, bench, out
    out.unpersist()


def test_pipeline_deduplicates(spark, prepared):
    corpus, _, out = prepared
    # No surviving near-dup pair at the threshold: re-running the dedup
    # operator over the output must find nothing.
    survivors = out.select("doc_id", "text")
    assert dedup.dedup_minhash_lsh(survivors, threshold=0.8).count() == 0
    assert dedup.dedup_exact(survivors).where(F.col("n_dups") > 1).count() == 0
    assert 0 < out.count() < corpus.count()


def test_pipeline_decontaminates(spark, prepared):
    _, bench, out = prepared
    from sum_spark.operators.decontam import decontaminate

    assert decontaminate(out.select("doc_id", "text"), bench).count() == 0


def test_pipeline_packs_and_shuffles(prepared):
    _, _, out = prepared
    rows = out.select("doc_id", "n_tokens", "pack_id", "shuffle_pos").collect()
    n = len(rows)
    # shuffle_pos is a permutation of 1..N and not the identity order.
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(1, n + 1))
    by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_pos"])]
    assert by_pos != sorted(by_pos)
    # packs are contiguous in doc_id order and respect the budget rule:
    # pack_id = floor(tokens-before / budget) is non-decreasing in doc_id.
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    packs = [r["pack_id"] for r in by_id]
    assert packs == sorted(packs)
    assert packs[0] == 0


def test_pipeline_reproducible(spark, sf_smoke, prepared):
    corpus, bench, out = prepared
    again = prepare_training_data(
        corpus, benchmark=bench, near_dup_threshold=0.8,
        pack_budget=512, shuffle_seed="epoch-0",
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # a different epoch seed reorders but keeps the same document set
    other = prepare_training_data(
        corpus, benchmark=bench, near_dup_threshold=0.8,
        pack_budget=512, shuffle_seed="epoch-1",
    )
    keep = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())  # noqa: E731
    assert keep(out) == keep(other)
    order = lambda df: [  # noqa: E731
        r["doc_id"] for r in df.select("doc_id", "shuffle_pos").orderBy("shuffle_pos").collect()
    ]
    assert order(out) != order(other)


def test_pipeline_semantic_stage(spark, sf_smoke, prepared):
    corpus, bench, base_out = prepared
    base_ids = {r["doc_id"] for r in base_out.select("doc_id").collect()}
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    # Plant an embedding-space duplicate between two surviving docs with
    # different text: copy doc a's embedding onto doc b.
    a, b = sorted(base_ids)[0], sorted(base_ids)[1]
    va = emb.where(F.col("doc_id") == a).select("embedding")
    planted = emb.where(F.col("doc_id") != b).unionByName(
        va.select(F.lit(b).cast("long").alias("doc_id"), "embedding")
    )
    out = prepare_training_data(
        corpus,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
        embeddings=planted,
        semantic_threshold=0.9999,
        semantic_k=4,
    )
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert a in got and b not in got  # the planted duplicate lost to its keeper
    # Everything else identical near threshold 1: no collateral removals
    # beyond genuine >=0.9999 embedding duplicates.
    removed = base_ids - got
    from sum_spark.operators import clustering

    pairs = clustering.semantic_dedup(
        planted.join(base_out.select("doc_id"), "doc_id", "left_semi"),
        threshold=0.9999,
        k=4,
        id_col="doc_id",
    )
    dup_members = {r["id_b"] for r in pairs.collect()}
    assert removed <= dup_members | {b}


def test_pipeline_perplexity_filter(spark, sf_smoke, prepared):
    corpus, bench, base_out = prepared
    base_ids = {r["doc_id"] for r in base_out.select("doc_id").collect()}
    # Plant detectable gibberish: attested high-frequency words in
    # never-seen transitions ('the' -> novel token), so p degrades to
    # 1/(c1+V) with a LARGE c1. (All-novel-word soup is NOT detectable
    # on this corpus by construction: the synthetic text is uniform over
    # a tiny vocabulary, so every conditional ≈ 1/V ≈ the unseen-w1
    # smoothing floor — mean NLL measured 3.3-3.6 for corpus docs vs
    # ~4.9 for these.)
    gib_text = " ".join(f"the qz{j}x" for j in range(8))
    gib = spark.createDataFrame(
        [(9900001 + i, gib_text.replace("qz", f"q{i}z"), "web") for i in range(3)],
        "doc_id long, text string, source string",
    )
    aug = corpus.select("doc_id", "text", "source").unionByName(gib)
    out = prepare_training_data(
        aug,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
        max_mean_nll=4.2,
    )
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not any(d >= 9900001 for d in got)  # gibberish filtered
    assert len(got & base_ids) > 0.5 * len(base_ids)  # corpus largely kept


def test_pipeline_classifier_gate(spark, sf_smoke, prepared):
    corpus, bench, base_out = prepared
    base_ids = {r["doc_id"] for r in base_out.select("doc_id").collect()}
    from sum_spark.operators.classifier import train_text_classifier

    # Train on a held-out labeled sample: real docs (1) vs character-
    # reversed docs (0) — disjoint hashed vocabularies.
    sample = corpus.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    neg = sample.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.reverse("text").alias("text")
    )
    labeled = sample.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
    weights, b = train_text_classifier(labeled)

    # Plant low-quality (reversed) docs into the corpus; the gate must
    # drop them and keep the ordinary docs.
    planted = (
        corpus.where(F.col("doc_id") % 3 == 1)
        .limit(5)
        .select(
            (F.col("doc_id") + 9_800_000).alias("doc_id"),
            F.reverse("text").alias("text"),
            F.col("source"),
        )
    )
    aug = corpus.select("doc_id", "text", "source").unionByName(planted)
    out = prepare_training_data(
        aug,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
        clf_weights=weights,
        clf_intercept_micro=b,
        min_clf_prob=0.5,
    )
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not any(d >= 9_800_000 for d in got)  # planted low-quality dropped
    assert len(got & base_ids) > 0.8 * len(base_ids)  # corpus largely kept


def test_pipeline_line_dedup_stage(spark, sf_smoke, prepared):
    corpus, bench, _ = prepared
    # Give every 2nd doc a shared boilerplate footer line; line-broken
    # text so the stage has lines to work with.
    lined = corpus.select(
        "doc_id",
        F.concat(
            F.expr(
                "array_join(transform(sequence(0, CAST(floor((size(split(text, ' ')) + 7) / 8) AS INT) - 1), "
                "c -> array_join(slice(split(text, ' '), c * 8 + 1, 8), ' ')), '\n')"
            ),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("\nall rights reserved contact us")
            ).otherwise(F.lit("")),
        ).alias("text"),
        "source",
    )
    out = prepare_training_data(
        lined,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
        line_dedup_min_df=2,
    )
    # The planted footer must not survive in any output text.
    assert out.where(F.col("text").contains("all rights reserved")).count() == 0
    assert out.count() > 0


def test_pipeline_span_dedup_stage(spark, sf_smoke, prepared):
    corpus, bench, _ = prepared
    out = prepare_training_data(
        corpus,
        benchmark=bench,
        near_dup_threshold=0.8,
        pack_budget=512,
        shuffle_seed="epoch-0",
        span_dedup_min_df=8,  # floor binding on this corpus (max gram df = 9)
    )
    from sum_spark.operators.dedup import duplicate_ngrams, remove_duplicate_spans

    assert out.count() > 0
    # The floor is actually binding on this corpus (pervasive grams
    # exist), and the stage genuinely stripped them: the pipeline
    # output's total token mass is below the unstripped pipeline's.
    assert duplicate_ngrams(corpus, min_df=8).count() > 0
    stripped = remove_duplicate_spans(corpus, min_df=8)
    assert stripped.where(F.col("n_removed") > 0).count() > 0
    # The output's text IS the stripped text: every output doc the
    # stripper touched differs from its original corpus text.
    joined = out.select("doc_id", F.col("text").alias("out_text")).join(
        corpus.select("doc_id", "text"), "doc_id"
    ).join(stripped.where(F.col("n_removed") > 0).select("doc_id"), "doc_id", "left_semi")
    assert joined.count() > 0
    assert joined.where(F.col("out_text") == F.col("text")).count() == 0
