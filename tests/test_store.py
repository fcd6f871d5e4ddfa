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


def test_reopen_preserves_next_id(spark, tmp_path):
    path = str(tmp_path / "records")
    s1 = RecordStore(spark, path)
    s1.create([1.0])
    s1.create([2.0])
    s2 = RecordStore(spark, path)  # startup scan (loader.go:20-46)
    assert s2.create([3.0]) == 3
