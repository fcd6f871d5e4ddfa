"""Hashed linear quality classifier (operators/classifier): feature
extraction contracts, MLlib train -> exported-weights scoring parity,
separation on planted labels, and layout invariance. The cross-engine
value check is the text_profile entry's n_feats/clf_micro columns
(deterministic hash-derived weights through the same scoring path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import classifier


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "a"), (3, None)],
        "doc_id long, text string",
    )


def test_feature_extraction_counts(tiny):
    # doc 1 grams: a, b, a (unigrams) + "a b", "b a" (bigrams) = 5 features;
    # doc 2: single word -> unigram only; doc 3: NULL -> no rows.
    feats = classifier.hashed_ngram_features(tiny)
    per = {r["doc_id"]: r["n"] for r in feats.groupBy("doc_id").agg(F.sum("tf").alias("n")).collect()}
    assert per == {1: 5, 2: 1}
    # 'a' appears twice as a unigram -> one bucket row with tf=2.
    tfs = sorted(r["tf"] for r in feats.where(F.col("doc_id") == 1).collect())
    assert tfs == [1, 1, 1, 2]
    buckets = [r["bucket"] for r in feats.collect()]
    assert all(0 <= b < classifier.N_BUCKETS for b in buckets)


def test_hash_weight_scoring_matches_hand_fold(spark):
    # One doc, known grams: score must equal the sum of per-gram
    # hash-derived weights computed independently in SQL.
    df = spark.createDataFrame([(7, "x y")], "doc_id long, text string")
    got = classifier.score_with_hash_weights(df).collect()[0]
    assert got["n_feats"] == 3  # x, y, "x y"
    w = 0
    for gram in ("x", "y", "x y"):
        row = spark.sql(
            "SELECT CAST(conv(substring(md5('" + gram + "'), 1, 8), 16, 10) AS BIGINT) AS h32"
        ).collect()[0]
        bkt = row["h32"] % classifier.N_BUCKETS
        row = spark.sql(
            f"SELECT CAST(conv(substring(md5('clfw:{bkt}'), 1, 15), 16, 10) AS BIGINT) AS h60"
        ).collect()[0]
        w += row["h60"] % 2000001 - 1000000
    assert got["clf_micro"] == w


@pytest.fixture(scope="module")
def labeled(spark, sf_smoke):
    from sum_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    neg = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.reverse("text").alias("text")
    )
    return (
        docs.withColumn("label", F.lit(1))
        .unionByName(neg.withColumn("label", F.lit(0)))
    )


@pytest.fixture(scope="module")
def fitted(labeled):
    train = labeled.where(F.col("doc_id") % 5 != 0)
    return classifier.train_text_classifier(train)


def test_train_separates_planted_classes(labeled, fitted):
    weights, b = fitted
    test = labeled.where(F.col("doc_id") % 5 == 0)
    scored = classifier.score_text_classifier(test, weights, b).join(
        test.select("doc_id", "label"), "doc_id"
    )
    acc = scored.select(
        F.avg(((F.col("prob") > 0.5).cast("int") == F.col("label")).cast("int")).alias("a")
    ).collect()[0]["a"]
    # Held-out docs: real vs character-reversed text is near-perfectly
    # separable over hashed word features.
    assert acc >= 0.95
    # Weight table stays model-sized (broadcastable at any corpus scale).
    assert weights.count() <= classifier.N_BUCKETS


def test_scoring_matches_mllib_probabilities(labeled, fitted):
    # The exported integer-weight scoring path must reproduce MLlib's own
    # predicted probabilities up to micro-logit quantization.
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT

    weights, b = fitted
    probe = labeled.where(F.col("doc_id") % 5 == 0).limit(40)
    ours = {
        r["doc_id"]: r["prob"]
        for r in classifier.score_text_classifier(probe, weights, b).collect()
    }
    # Rebuild the logit directly from the exported table (driver-side
    # reference fold) — independent of the DataFrame join path.
    wmap = {r["bucket"]: r["w_micro"] for r in weights.collect()}
    feats = classifier.hashed_ngram_features(probe).collect()
    ref: dict[int, int] = {r["doc_id"]: b for r in probe.select("doc_id").collect()}
    for r in feats:
        ref[r["doc_id"]] += r["tf"] * wmap.get(r["bucket"], 0)
    for did, logit_micro in ref.items():
        want = 1.0 / (1.0 + math.exp(-logit_micro / 1e6))
        assert abs(ours[did] - want) < 1e-12


def test_scoring_layout_invariant(labeled, fitted):
    weights, b = fitted
    probe = labeled.where(F.col("doc_id") % 7 == 0)
    a = sorted(map(tuple, classifier.score_text_classifier(probe, weights, b).collect()))
    c = sorted(
        map(
            tuple,
            classifier.score_text_classifier(probe.repartition(13), weights, b).collect(),
        )
    )
    assert a == c


def test_scoring_handles_null_and_unseen(spark, fitted):
    weights, b = fitted
    df = spark.createDataFrame(
        [(1, None), (2, "zzzqqq neverseen")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in classifier.score_text_classifier(df, weights, b).collect()}
    assert got[1]["n_feats"] == 0 and got[1]["logit_micro"] == b
    assert got[2]["n_feats"] == 3


def test_scoring_plan_broadcasts_weights(labeled, fitted):
    weights, b = fitted
    plan = classifier.score_text_classifier(labeled, weights, b)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
