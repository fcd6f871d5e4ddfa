"""Query registry: named queries with paired DuckDB oracles.

This is the engine's analog of the reference's oracle registry
(/root/reference/node/service/oracles.go) — except a "stored query" here
is a Python function producing a DataFrame (a Catalyst logical plan),
not interpreted JavaScript.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Late-bound oracle substitutions: a registered oracle may carry a
# placeholder token (e.g. a per-process stored-artifact path the query
# fn writes and DuckDB must READ — the trained-codebook serve leg,
# VERDICT r8 #1) that cannot be a static string at import time. Every
# oracle consumer (oracle_sql(), the oracle test suites, driver_sim via
# oracle_sql) renders through render_oracle; the resolver runs in the
# SAME process that ran the query fn, so pid-keyed artifact paths match.
ORACLE_SUBS: dict[str, Callable[[], str]] = {}


def render_oracle(sql: str) -> str:
    """Substitute registered placeholder tokens into an oracle string."""
    for token, resolve in ORACLE_SUBS.items():
        if token in sql:
            sql = sql.replace(token, resolve())
    return sql


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
