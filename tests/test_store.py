"""RecordStore CRUD tests mirroring the reference's storage/service suites
(/root/reference/node/storage/index_test.go, node/service/records_test.go)."""

from __future__ import annotations

import pytest

from sum_spark.store import IdCollision, RecordNotFound, RecordStore


@pytest.fixture()
def store(spark, tmp_path):
    return RecordStore(spark, str(tmp_path / "records"))


def test_create_assigns_sequential_ids(store):
    assert store.create([1.0, 2.0]) == 1
    assert store.create([3.0]) == 2
    assert store.count() == 2


def test_default_shape_rule(store):
    rid = store.create([1.0, 2.0, 3.0])
    row = store.read(rid)
    # shape defaults to [len(data)] (node/storage/records.go:126-129)
    assert row["shape"] == [3]


def test_read_miss_raises(store):
    with pytest.raises(RecordNotFound):
        store.read(666)


def test_create_with_id_and_collision(store):
    store.create_with_id(666, [0.6, 0.6, 0.6], meta={"666": "666"})
    with pytest.raises(IdCollision):
        store.create_with_id(666, [1.0])
    # next sequential id continues after the explicit one
    assert store.create([1.0]) == 667


def test_bulk_create_all_or_nothing(store):
    store.create_with_id(2, [1.0])
    with pytest.raises(IdCollision):
        store.create_many_with_id({1: [1.0], 2: [2.0], 3: [3.0]})
    # nothing from the failed batch got written (index.go:188-218)
    assert store.count() == 1


def test_update_overwrites(store):
    rid = store.create([1.0, 2.0], meta={"a": "1"})
    store.update(rid, data=[9.0], meta={"b": "2"})
    row = store.read(rid)
    assert row["data"] == [9.0]
    assert row["meta"] == {"b": "2"}
    assert store.count() == 1


def test_delete(store):
    rid = store.create([1.0])
    store.delete(rid)
    assert store.count() == 0
    with pytest.raises(RecordNotFound):
        store.delete(rid)


def test_list_pagination(store):
    for i in range(25):
        store.create([float(i)])
    total, rows = store.list(page=2, per_page=10)
    assert total == 25
    assert [r["id"] for r in rows] == list(range(11, 21))


def test_find_by_meta(store):
    store.create([1.0], meta={"label": "malware"})
    store.create([2.0], meta={"label": "clean"})
    store.create([3.0], meta={"label": "malware"})
    hits = store.find_by_meta("label", "malware")
    assert [r["id"] for r in hits] == [1, 3]


def test_find_by_meta_bounded_and_lazy(store):
    """The meta path never does an unbounded collect (VERDICT r2 #5):
    the DataFrame surface stays lazy and the Row surface paginates."""
    from pyspark.sql import DataFrame

    for i in range(25):
        store.create([float(i)], meta={"label": "hot"})
    assert isinstance(store.find_by_meta_df("label", "hot"), DataFrame)
    page1 = store.find_by_meta("label", "hot", page=1, per_page=10)
    page2 = store.find_by_meta("label", "hot", page=2, per_page=10)
    assert len(page1) == 10 and len(page2) == 10
    assert [r["id"] for r in page1] + [r["id"] for r in page2] == list(range(1, 21))


def test_reopen_preserves_next_id(spark, tmp_path):
    path = str(tmp_path / "records")
    s1 = RecordStore(spark, path)
    s1.create([1.0])
    s1.create([2.0])
    s2 = RecordStore(spark, path)  # startup scan (loader.go:20-46)
    assert s2.create([3.0]) == 3


def test_update_rewrites_only_the_ids_bucket(spark, tmp_path):
    """O(delta) contract: mutating one id must leave every other bucket's
    files byte-identical (same paths, same mtimes) — no full-table
    snapshot rewrite."""
    import os

    path = str(tmp_path / "records")
    store = RecordStore(spark, path)
    for i in range(18):
        store.create([float(i)])

    def files_outside(bucket: int) -> dict[str, float]:
        out = {}
        for root, _dirs, files in os.walk(path):
            if f"b={bucket}" in root.split(os.sep)[-1]:
                continue
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    target = 7
    bucket = target % store.num_buckets
    before = files_outside(bucket)
    store.update(target, data=[99.0])
    assert files_outside(bucket) == before  # untouched buckets: untouched
    assert store.read(target)["data"] == [99.0]
    assert store.count() == 18

    before = files_outside(bucket)
    store.delete(target)
    assert files_outside(bucket) == before
    assert store.count() == 17


def test_compact_merges_small_files(spark, tmp_path):
    import glob

    path = str(tmp_path / "records")
    store = RecordStore(spark, path, num_buckets=2)
    for i in range(10):
        store.create([float(i)])  # 10 one-row files across 2 buckets
    n_before = len(glob.glob(f"{path}/b=*/part-*.parquet"))
    assert n_before >= 10
    store.compact()
    n_after = len(glob.glob(f"{path}/b=*/part-*.parquet"))
    assert n_after == 2  # one file per bucket
    assert store.count() == 10
    assert [r["id"] for r in store.list(per_page=3)[1]] == [1, 2, 3]


def test_point_read_prunes_to_one_bucket(spark, tmp_path):
    """The physical scan for read(rid) must touch only the id's bucket
    directory (partition pruning on the Hive partition column)."""
    from pyspark.sql import functions as F

    store = RecordStore(spark, str(tmp_path / "records"))
    for i in range(4):
        store.create([float(i)])
    rid = 3
    plan = (
        store._df_or_empty()
        .where((F.col("b") == store._bucket(rid)) & (F.col("id") == rid))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
