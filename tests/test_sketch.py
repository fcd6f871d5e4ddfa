"""Count-min sketch properties: the one-sided error guarantee (never
under-counts), weighted vs raw-occurrence build equivalence, and
phantom-item behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.functions.text import tokens
from sum_spark.operators.sketch import count_min_build, count_min_estimate
from sum_spark.sources.tables import load_table


def _tok(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokens("text")).alias("w"))


def test_cms_never_undercounts(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    # Tiny grid on purpose: collisions guaranteed, so the assertion
    # est >= tf is exercised where overcount is real, not vacuous.
    sk = count_min_build(tok, "w", width=16, depth=3)
    truth = tok.groupBy("w").agg(F.count("*").cast("long").alias("tf"))
    est = count_min_estimate(sk, truth, "w", width=16, depth=3)
    bad = est.where(F.col("est") < F.col("tf")).count()
    assert bad == 0
    # And the grid genuinely collides at width 16 (some overcount > 0).
    assert est.where(F.col("est") > F.col("tf")).count() > 0


def test_cms_weighted_build_equals_occurrence_build(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    raw = count_min_build(tok, "w", width=64, depth=4)
    per = tok.groupBy("w").agg(F.count("*").cast("long").alias("n"))
    weighted = count_min_build(per, "w", width=64, depth=4, weight_col="n")
    assert raw.exceptAll(weighted).count() == 0
    assert weighted.exceptAll(raw).count() == 0


def test_cms_phantom_item_nonnegative_and_null_skipped(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    sk = count_min_build(tok, "w", width=256, depth=4)
    phantom = spark.createDataFrame(
        [("zz-definitely-not-a-corpus-token-zz",)], "w string"
    )
    [r] = count_min_estimate(sk, phantom, "w", width=256, depth=4).collect()
    assert r["est"] >= 0  # may carry collision mass, never negative
    # NULL items are excluded from the build: total sketch mass per depth
    # row equals the non-null occurrence count.
    with_null = tok.unionByName(
        spark.createDataFrame([(None,)], "w string")
    )
    sk2 = count_min_build(with_null, "w", width=256, depth=4)
    n = tok.count()
    per_depth = sk2.groupBy("depth").agg(F.sum("c").alias("m")).collect()
    assert all(row["m"] == n for row in per_depth)
