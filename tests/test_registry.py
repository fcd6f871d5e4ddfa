"""QueryRegistry tests: oracle CRUD, error contract, and the defaultMerger
semantics (/root/reference/master/service_test.go:447-683,
master/mux_runner.go:195-232)."""

from __future__ import annotations

import pytest

from sum_spark.registry import MergeError, OracleError, QueryRegistry, default_merge


@pytest.fixture()
def reg():
    return QueryRegistry()


def test_create_find_run(reg):
    qid = reg.create(lambda x, y: x + y, name="add")
    assert reg.find("add").id == qid
    assert reg.run("add", 1, 2) == 3


def test_missing_args_padded_with_none(reg):
    # ≡ null padding (node/service/compiled.go:52-55)
    reg.create(lambda x, y: (x, y), name="pair")
    assert reg.run("pair", 1) == (1, None)


def test_broken_source_fails_registration(reg):
    # (node/service/oracles_test.go:12-18)
    with pytest.raises(ValueError):
        reg.create_source("this is not python {")
    with pytest.raises(ValueError):
        reg.create_source("x = 1")  # no function definition


def test_source_first_def_is_entry_and_merge_detected(reg):
    code = (
        "def findSimilar(threshold):\n"
        "    return {1: threshold}\n"
        "def mergeResults(results):\n"
        "    out = {}\n"
        "    for r in results:\n"
        "        out.update(r)\n"
        "    return out\n"
    )
    qid = reg.create_source(code)
    q = reg.read(qid)
    assert q.name == "findSimilar"
    assert q.merger is not None
    assert reg.run(qid, 0.5) == {1: 0.5}


def test_run_error_contract(reg):
    def boom():
        raise RuntimeError("Vector 666 not found.")

    reg.create(boom, name="boom")
    with pytest.raises(OracleError, match="666"):
        reg.run("boom")


def test_crud_lifecycle(reg):
    qid = reg.create(lambda: 1, name="a")
    reg.update(qid, lambda: 2)
    assert reg.run(qid) == 2
    total, items = reg.list()
    assert total == 1 and items[0].name == "a"
    reg.delete(qid)
    with pytest.raises(KeyError):
        reg.read(qid)


# -- defaultMerger contract (mux_runner.go:195-232) -------------------------


def test_merge_maps_key_union():
    assert default_merge([{1: "a"}, {2: "b"}]) == {1: "a", 2: "b"}


def test_merge_maps_duplicate_key_error():
    with pytest.raises(MergeError, match="duplicate key"):
        default_merge([{1: "a"}, {1: "b"}])


def test_merge_arrays_concatenate():
    assert default_merge([[1, 2], [3]]) == [1, 2, 3]


def test_merge_scalar_requires_merger():
    with pytest.raises(MergeError, match="scalar"):
        default_merge([1, 2])


def test_merge_heterogeneous_error():
    with pytest.raises(MergeError, match="heterogeneous"):
        default_merge([{1: "a"}, [2]])


def test_custom_merger_used_and_throwing_merger_errors(reg):
    reg.create(lambda x: x, name="echo", merger=lambda results: sum(results))
    assert reg.run_merged("echo", [(1,), (2,), (3,)]) == 6

    def bad_merge(results):
        raise RuntimeError("merge exploded")

    reg.create(lambda x: x, name="echo2", merger=bad_merge)
    with pytest.raises(MergeError, match="exploded"):
        reg.run_merged("echo2", [(1,)])


def test_run_merged_default_merge(reg):
    reg.create(lambda lo, hi: {i: i * i for i in range(lo, hi)}, name="squares")
    out = reg.run_merged("squares", [(0, 2), (2, 4)])
    assert out == {0: 0, 1: 1, 2: 4, 3: 9}


def test_save_load_round_trip(reg, tmp_path):
    """≡ the reference's on-disk oracle store reload (storage/index.go:
    72-102, service.go:51-98): register from source, save, load into a
    NEW session's registry, run — same result, same ids, and the id
    sequence continues past the reloaded entries."""
    from sum_spark.registry import QueryRegistry

    qid = reg.create_source("def double(x):\n    return x * 2\n")
    reg.create_source(
        "def tally(xs):\n    return {x: 1 for x in xs}\n"
        "def merge_tallies(parts):\n"
        "    out = {}\n"
        "    for p in parts:\n"
        "        out.update(p)\n"
        "    return out\n",
        name="tally",
    )
    p = str(tmp_path / "oracles.json")
    assert reg.save(p) == 2

    fresh = QueryRegistry()  # "new session"
    assert fresh.load(p) == 2
    assert fresh.run("double", 21) == 42
    assert fresh.find("double").id == qid
    # Merger survives the round trip (merge-prefix single-arg rule).
    assert fresh.run_merged("tally", [(["a"],), (["b"],)]) == {"a": 1, "b": 1}
    # New registrations continue past the persisted id space.
    nid = fresh.create(lambda: 0, name="post_reload")
    assert nid > fresh.find("tally").id


def test_save_strict_rejects_sourceless(reg, tmp_path):
    reg.create(lambda x: x, name="opaque")
    with pytest.raises(ValueError, match="opaque"):
        reg.save(str(tmp_path / "o.json"))
    assert reg.save(str(tmp_path / "o.json"), strict=False) == 0


def test_load_collision_raises(reg, tmp_path):
    reg.create_source("def f(x):\n    return x\n", name="f")
    p = str(tmp_path / "o.json")
    reg.save(p)
    with pytest.raises(ValueError, match="already registered"):
        reg.load(p)
