"""End-to-end declared-query tests: every registered query with an oracle
is executed through Spark AND DuckDB at sf0.001 and compared value-for-
value — a local replica of the driver's t2 gate (which runs at sf0.01).
"""

from __future__ import annotations

import pytest

from sum_spark.queries import REGISTRY
from tests.oracle_check import compare, duck_connection

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connection(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_smoke, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_smoke)
    from sum_spark.queries.base import render_oracle

    ddf = duck.execute(render_oracle(q.oracle)).df()
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)
