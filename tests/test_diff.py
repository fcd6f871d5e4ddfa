"""snapshot_diff properties: exact added/removed/changed partitioning,
delta-sized output (unchanged rows emit nothing), multi-column digests,
and layout invariance of the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.diff import delta_ids, snapshot_diff
from sum_spark.sources.tables import load_table


def test_statuses_exact(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged: absent
    assert sorted(r["id"] for r in delta_ids(snapshot_diff(old, new)).collect()) == [
        3,
        4,
    ]


def test_identical_snapshots_empty_diff(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    assert snapshot_diff(docs, docs).count() == 0
    # layout must not matter (digest is per-row, join is equi on id)
    assert snapshot_diff(docs.repartition(13, "doc_id"), docs).count() == 0


def test_multi_column_content(spark):
    old = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en")], "doc_id long, text string, lang string"
    )
    new = spark.createDataFrame(
        [(1, "a", "de"), (2, "b", "en")], "doc_id long, text string, lang string"
    )
    one = snapshot_diff(old, new, content_cols=("text", "lang")).collect()
    assert {(r["id"], r["status"]) for r in one} == {(1, "changed")}
    # text-only digest ignores the lang edit
    assert snapshot_diff(old, new, content_cols=("text",)).count() == 0


def test_delta_sized_output(spark, sf_smoke):
    """Output row count equals the true delta size, never the corpus."""
    docs = load_table(spark, sf_smoke, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0)
    new = docs.where(F.col("doc_id") % 7 != 0)
    n = docs.count()
    added = docs.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0)).count()
    removed = docs.where(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 11 != 0)
    ).count()
    d = snapshot_diff(old, new)
    assert d.count() == added + removed < n
