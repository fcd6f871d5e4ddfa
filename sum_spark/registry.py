"""QueryRegistry — the stored-procedure ("oracle") surface re-expressed
for Spark: named Python queries over the records DataFrame, with the
reference's registration, error, and merge contracts.

Reference mapping:
- CreateOracle/UpdateOracle/... CRUD with sequential ids and name lookup
  (/root/reference/node/service/oracles.go:23-126);
- registration validates the code and takes the FIRST function definition
  as the entry point (node/service/compiler.go:19-52) — here ``register_source``
  compiles Python source and picks the first def;
- execution errors surface as exceptions (≡ ctx.Error / recovered JS panic,
  node/wrapper/context.go:21-48, node/service/compiled.go:29-42);
- the distributed merge contract of defaultMerger
  (/root/reference/master/mux_runner.go:195-232): dict results -> key-union
  with duplicate-key error; list results -> concatenation; scalars -> error
  unless a custom merger is supplied; heterogeneous types -> error. In
  Spark the scatter/gather itself is the engine's job — the merge contract
  survives as the API for combining partial results of stored queries.
"""

from __future__ import annotations

import ast
import inspect
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


class OracleError(RuntimeError):
    """≡ ctx.Error(msg): a stored query aborted with a message."""


class MergeError(ValueError):
    """defaultMerger contract violation (mux_runner.go:195-232)."""


@dataclass
class StoredQuery:
    id: int
    name: str
    fn: Callable
    code: str = ""
    merger: Callable[[list], Any] | None = None
    params: tuple[str, ...] = field(default_factory=tuple)


def default_merge(results: list):
    """Combine per-node/per-partition results by the reference's rules
    (mux_runner.go:195-232): maps key-union (duplicate key = error),
    arrays concatenate, scalars require an explicit merger, heterogeneous
    result types are an error."""
    if not results:
        return None
    kinds = {(dict if isinstance(r, dict) else list if isinstance(r, list) else object) for r in results}
    if len(kinds) > 1:
        raise MergeError(f"heterogeneous result types: {sorted(k.__name__ for k in kinds)}")
    kind = kinds.pop()
    if kind is dict:
        out: dict = {}
        for r in results:
            for k, v in r.items():
                if k in out:
                    raise MergeError(f"duplicate key in merge: {k!r}")
                out[k] = v
        return out
    if kind is list:
        out_l: list = []
        for r in results:
            out_l.extend(r)
        return out_l
    raise MergeError("scalar results need an explicit merger")


class QueryRegistry:
    """CRUD registry of named stored queries (the oracle catalog)."""

    def __init__(self):
        self._by_id: dict[int, StoredQuery] = {}
        self._next_id = 1

    # -- CRUD (oracles.go:23-126) ------------------------------------------

    def create(self, fn: Callable, name: str | None = None, merger=None) -> int:
        name = name or fn.__name__
        if any(q.name == name for q in self._by_id.values()):
            raise ValueError(f"query {name!r} already registered")
        qid = self._next_id
        self._next_id += 1
        params = tuple(inspect.signature(fn).parameters)
        self._by_id[qid] = StoredQuery(id=qid, name=name, fn=fn, params=params, merger=merger)
        return qid

    def create_source(self, code: str, name: str | None = None) -> int:
        """Register from source text; the FIRST function definition is the
        entry point and a ``merge*``-named single-arg function (if present)
        is the merger — the astRaccoon rules (master/ast_raccoon.go:52-90:
        merge-prefix at 77, 1-arg at 81). Broken code fails registration
        (node/service/oracles_test.go:12-18)."""
        try:
            tree = ast.parse(code)
        except SyntaxError as e:
            raise ValueError(f"invalid query code: {e}") from e
        defs = [n for n in tree.body if isinstance(n, ast.FunctionDef)]
        if not defs:
            raise ValueError("no function definition in query code")
        ns: dict[str, Any] = {}
        exec(compile(tree, "<stored-query>", "exec"), ns)  # noqa: S102 — the
        # oracle surface is arbitrary user code by design (ES5 JS in the
        # reference); sandboxing is a deployment concern, parity is the point.
        entry = ns[defs[0].name]
        merger = None
        for d in defs[1:]:
            if d.name.startswith("merge") and len(d.args.args) == 1:
                merger = ns[d.name]
                break
        qid = self.create(entry, name=name or defs[0].name, merger=merger)
        self._by_id[qid].code = code
        return qid

    def read(self, qid: int) -> StoredQuery:
        if qid not in self._by_id:
            raise KeyError(f"query {qid} not found")
        return self._by_id[qid]

    def find(self, name: str) -> StoredQuery:
        for q in self._by_id.values():  # linear scan, like oracles.go:58-71
            if q.name == name:
                return q
        raise KeyError(f"query {name!r} not found")

    def update(self, qid: int, fn: Callable, name: str | None = None) -> None:
        q = self.read(qid)
        q.fn, q.params = fn, tuple(inspect.signature(fn).parameters)
        if name:
            q.name = name

    def delete(self, qid: int) -> None:
        self.read(qid)
        del self._by_id[qid]

    def list(self, page: int = 1, per_page: int = 10) -> tuple[int, list[StoredQuery]]:
        qs = sorted(self._by_id.values(), key=lambda q: q.id)
        return len(qs), qs[(page - 1) * per_page : (page - 1) * per_page + per_page]

    # -- persistence (storage/index.go:72-102 via LoadOracles,
    #    node/service/service.go:51-98: oracles persist to disk and
    #    reload at startup) --------------------------------------------------

    def save(self, path: str, strict: bool = True) -> int:
        """Persist the catalog as a JSON file of (id, name, code) rows —
        the engine's analog of the reference's on-disk oracle store.
        Only SOURCE-registered queries round-trip (the reference's
        oracles are always source; a bare Python callable has no
        serializable form): with ``strict`` (default) a code-less entry
        raises, else it is skipped. Returns the number of rows written.
        The file is driver-sized by nature (a stored-query catalog, not
        data) — plain JSON, no Spark session needed to reload it."""
        import json

        rows = []
        skipped = []
        for q in sorted(self._by_id.values(), key=lambda q: q.id):
            if q.code:
                rows.append({"id": q.id, "name": q.name, "code": q.code})
            else:
                skipped.append(q.name)
        if skipped and strict:
            raise ValueError(
                f"queries without source cannot persist: {skipped} "
                "(register them with create_source, or save(strict=False))"
            )
        payload = {"version": 1, "next_id": self._next_id, "queries": rows}
        with open(path, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)
        return len(rows)

    def load(self, path: str) -> int:
        """Reload a saved catalog into THIS registry (startup reload,
        ≡ service.go:51-98): each entry re-compiles through
        create_source — the same validation as live registration — and
        keeps its persisted id and name. Collides (by id or name) with
        already-registered queries rather than silently overwriting.
        Returns the number of queries loaded."""
        import json

        with open(path, encoding="utf-8") as f:
            payload = json.load(f)
        for row in payload["queries"]:
            if row["id"] in self._by_id:
                raise ValueError(f"query id {row['id']} already registered")
            qid = self.create_source(row["code"], name=row["name"])
            if qid != row["id"]:
                # Re-seat under the persisted id (create assigns serially).
                q = self._by_id.pop(qid)
                q.id = row["id"]
                self._by_id[row["id"]] = q
        self._next_id = max(
            self._next_id, int(payload.get("next_id", 1)),
            *(q.id + 1 for q in self._by_id.values()),
        )
        return len(payload["queries"])

    # -- execution (service.go:128-154) ------------------------------------

    def run(self, qid_or_name: int | str, *args):
        """Execute a stored query. Missing args are padded with None
        (≡ 'null' padding, node/service/compiled.go:52-55); exceptions
        surface as OracleError with the message."""
        q = self.read(qid_or_name) if isinstance(qid_or_name, int) else self.find(qid_or_name)
        padded = list(args) + [None] * (len(q.params) - len(args))
        try:
            return q.fn(*padded[: len(q.params)])
        except OracleError:
            raise
        except Exception as e:  # noqa: BLE001 — ≡ recovered JS panic -> error
            raise OracleError(str(e)) from e

    def run_merged(self, qid_or_name: int | str, partials_args: list[tuple]) -> Any:
        """Run the query once per args-tuple (≡ per node) and merge with the
        custom merger if registered, else default_merge — the master's
        gather step (mux_runner.go:136-232)."""
        q = self.read(qid_or_name) if isinstance(qid_or_name, int) else self.find(qid_or_name)
        results = [self.run(q.id, *a) for a in partials_args]
        if q.merger is not None:
            try:
                return q.merger(results)
            except Exception as e:  # throwing merger -> error (test case)
                raise MergeError(str(e)) from e
        return default_merge(results)
