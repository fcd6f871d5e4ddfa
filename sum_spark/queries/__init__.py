"""Declared query inventory (SURVEY.md §2.F) — every operator the engine
claims is registered here with (a) a Spark implementation and (b) when
SQL-expressible, an exact DuckDB oracle the driver hash-checks at sf0.01.

Import side effects register the queries.
"""

from sum_spark.queries.base import REGISTRY, Query, query

# Registration side effects:
from sum_spark.queries import relational  # noqa: F401  (Q01-Q23, Q26)
from sum_spark.queries import vector  # noqa: F401  (Q24, Q25)
from sum_spark.queries import windows  # noqa: F401  (Q27-Q29)
from sum_spark.queries import llm  # noqa: F401  (dedup / ANN / text ops)
from sum_spark.queries import extra  # noqa: F401  (Q30-Q38 extended coverage)

__all__ = ["REGISTRY", "Query", "query"]
