"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship findSimilar query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-runnable
twin for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from any working directory; make the
# sibling sum_spark package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from sum_spark.queries import REGISTRY  # noqa: E402
from sum_spark.queries.base import render_oracle  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: findSimilar (SURVEY Q25) on sf0.001."""
    return REGISTRY["q25_find_similar"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted -> rows-only check)."""
    return {
        name: render_oracle(q.oracle)
        for name, q in sorted(REGISTRY.items())
        if q.oracle
    }
