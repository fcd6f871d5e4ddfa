"""Exact SQL-literal formatting for BATCHED expression construction.

Plan-literal codebooks/params built as Column objects cost one py4j
socket round trip per node (~0.16 ms each on this host — a 64 x 64
codebook array was ~0.5 s of pure driver latency per plan build,
VERDICT r7 #2). Rendering the same literals into ONE ``F.expr`` string
costs a handful of round trips and resolves to the identical Catalyst
literal nodes.

Doubles are EXACT: Python ``repr`` emits the shortest decimal that
round-trips, and Spark's literal parser is correctly rounded, so
``F.expr(dlit(x))`` equals ``F.lit(x)`` bit-for-bit (unit-pinned in
tests/test_sql_functions.py) — which is what keeps the
oracle-hash-checked codebook paths byte-identical after batching.
"""

from __future__ import annotations

import math
from collections.abc import Iterable


def qid(name: str) -> str:
    """Backtick-quoted Spark SQL identifier for an arbitrary caller
    string (a backtick doubles inside backticks). Every caller-supplied
    COLUMN NAME entering an expr/selectExpr string goes through this —
    the Column API handled any name for free; batched strings must
    escape (ADVICE r8: kmv_sketch/corpus_fingerprint interpolated raw)."""
    return "`" + str(name).replace("`", "``") + "`"


def qstr(s: str) -> str:
    """Single-quoted Spark SQL string literal for an arbitrary caller
    value (default parser: backslash escapes active, so backslashes and
    quotes are backslash-escaped). Every caller-supplied VALUE (seed,
    tag) entering an expr string goes through this."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def qstr_duck(s: str) -> str:
    """Single-quoted DuckDB string literal (standard SQL: quotes double,
    backslashes are literal). The oracle-side twin of ``qstr`` — the two
    engines escape differently, so seeded-hash oracles must route the
    same seed through this, not through ``qstr``."""
    return "'" + str(s).replace("'", "''") + "'"


def dlit(x: float) -> str:
    """An exact DOUBLE literal for ``x`` (finite only)."""
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"dlit needs a finite double, got {v!r}")
    return repr(v) + "D"


def darray(xs: Iterable[float]) -> str:
    """``array(<doubles>)`` with every element exact."""
    return "array(" + ", ".join(dlit(x) for x in xs) + ")"
