"""Suite-level events-shape regression guard (VERDICT r2 #6).

The test data's ``events.ts`` physical type has already flipped once
(TIMESTAMP(NANOS) -> timestamp[us]) and silently broke 10 driver queries,
25 tests, and the bench. This guard rewrites the smoke-SF events table in
BOTH storage shapes and asserts every events-consuming registry query
produces identical results on each — so data drift can't do this twice.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sum_spark.queries import REGISTRY

# Every registry query that reads the events table.
EVENTS_QUERIES = [
    "q11_event_analytics",
    "q15_grouping_sets",
    "q27_tumbling_window",
    "q28_sliding_window",
    "q29_session_window",
    "q30_pivot_unpivot",
    "q31_distinct_projection",
    "q39_asof_join",
    "q43_two_level_rollup",
    "q44_range_join",
]


@pytest.fixture(scope="module")
def dual_shape_dirs(sf_smoke, tmp_path_factory):
    """Two full copies of the smoke SF dir differing only in the physical
    type of events.ts: timestamp[us] (as shipped today) and
    TIMESTAMP(NANOS) (as shipped in rounds 1-2)."""
    table = pq.read_table(f"{sf_smoke}/events.parquet")
    ts = table.column("ts")
    assert pa.types.is_timestamp(ts.type)
    dirs = {}
    for shape, ts_arr in {
        "us": ts.cast(pa.timestamp("us")),
        "nanos": ts.cast(pa.timestamp("ns")),
    }.items():
        d = tmp_path_factory.mktemp(f"sf_{shape}")
        for f in (
            "region nation customer supplier part orders lineitem "
            "documents embeddings".split()
        ):
            shutil.copy(f"{sf_smoke}/{f}.parquet", d / f"{f}.parquet")
        rewritten = table.set_column(
            table.schema.get_field_index("ts"), "ts", ts_arr
        )
        pq.write_table(rewritten, str(d / "events.parquet"), version="2.6")
        dirs[shape] = str(d)
    return dirs


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_queries_identical_across_storage_shapes(spark, dual_shape_dirs, name):
    fn = REGISTRY[name].fn
    key = lambda r: tuple((x is None, str(x)) for x in r)  # noqa: E731 — NULL-safe
    us_rows = sorted(map(tuple, fn(spark, dual_shape_dirs["us"]).collect()), key=key)
    ns_rows = sorted(map(tuple, fn(spark, dual_shape_dirs["nanos"]).collect()), key=key)
    assert us_rows == ns_rows
    assert len(us_rows) > 0
