"""RecordStore — CRUD parity with the reference's record service
(/root/reference/node/service/records.go + node/storage/index.go), built
on a Parquet-backed canonical ``records`` DataFrame.

Data model (SURVEY §1.3): one table with schema
    id BIGINT, data ARRAY<FLOAT>, shape ARRAY<BIGINT>, meta MAP<STRING,STRING>

Semantics preserved from the reference:
- sequential id allocation: next id = max(id)+1, computed at open and
  advanced per create (nextID, node/storage/index.go:39-43, 154-172);
- default shape = [len(data)] when absent (node/storage/records.go:126-129);
- create-with-id fails on collision; bulk create rolls back on partial
  failure (node/storage/index.go:174-218);
- find-by-meta is exact key=value equality (node/storage/records.go:103-123)
  — served here by a pushed-down predicate instead of an inverted index;
- list is ordered by id with page/per_page + total (node/service/records.go:66-114).

Storage engine: Parquet snapshots. Creates append a new file; update/
delete rewrite (copy-on-write, the MERGE-emulation pattern — a table
format like Delta/Iceberg would make these O(delta), noted in docstrings).
The reference rewrites one protobuf file per record under a global lock
(node/storage/saver.go:12-20); at 100 TB neither per-record files nor a
global lock survive, a transactional table format does.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("data", ArrayType(FloatType()), True),
        StructField("shape", ArrayType(LongType()), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)


class RecordNotFound(KeyError):
    """Read/update/delete of an absent id (≡ 'record not found' RPC error)."""


class IdCollision(ValueError):
    """CreateWithId on an existing id (node/storage/index.go:183-186)."""


class RecordStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._next_id = int(self._df_or_empty().agg(F.max("id")).first()[0] or 0) + 1

    # -- internals ----------------------------------------------------------

    def _df_or_empty(self) -> DataFrame:
        try:
            return self.spark.read.schema(RECORD_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], RECORD_SCHEMA)

    def _append(self, rows: list[Row]) -> None:
        self.spark.createDataFrame(rows, RECORD_SCHEMA).write.mode("append").parquet(
            self.path
        )

    def _rewrite(self, df: DataFrame) -> None:
        """Copy-on-write snapshot rewrite (collect-free): stage to a temp
        dir, then swap. With Delta this would be a transactional MERGE."""
        tmp = self.path.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = self.path.rstrip("/") + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        import shutil

        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _normalize(data, shape, meta) -> tuple[list, list, dict]:
        data = [float(x) for x in (data or [])]
        shape = [int(s) for s in shape] if shape else [len(data)]
        return data, shape, dict(meta or {})

    # -- API ----------------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """The canonical records DataFrame (the 'records' an oracle sees)."""
        return self._df_or_empty()

    def create(self, data, meta=None, shape=None) -> int:
        """Assign the next sequential id and persist (records.go:26-31)."""
        rid = self._next_id
        self._next_id += 1
        d, s, m = self._normalize(data, shape, meta)
        self._append([Row(id=rid, data=d, shape=s, meta=m)])
        return rid

    def create_with_id(self, rid: int, data, meta=None, shape=None) -> None:
        if self.df.where(F.col("id") == rid).limit(1).count() > 0:
            raise IdCollision(f"record {rid} exists")
        d, s, m = self._normalize(data, shape, meta)
        self._append([Row(id=int(rid), data=d, shape=s, meta=m)])
        self._next_id = max(self._next_id, int(rid) + 1)

    def create_many_with_id(self, records: dict[int, list]) -> None:
        """Bulk create; all-or-nothing like CreateRecordsWithId
        (node/storage/index.go:188-218): collisions are checked for the
        whole batch before any write."""
        ids = [int(i) for i in records]
        hits = (
            self.df.where(F.col("id").isin(ids)).select("id").limit(1).collect()
        )
        if hits:
            raise IdCollision(f"record {hits[0]['id']} exists")
        rows = []
        for rid, data in records.items():
            d, s, m = self._normalize(data, None, None)
            rows.append(Row(id=int(rid), data=d, shape=s, meta=m))
        self._append(rows)
        self._next_id = max(self._next_id, max(ids) + 1)

    def read(self, rid: int) -> Row:
        rows = self.df.where(F.col("id") == rid).collect()
        if not rows:
            raise RecordNotFound(rid)
        return rows[0]

    def update(self, rid: int, data=None, meta=None, shape=None) -> None:
        """Overwrite data/meta/shape by id (record_driver.go:32-45):
        anti-join out the old row, append the new one — the Delta-less
        MERGE WHEN MATCHED UPDATE."""
        old = self.read(rid)
        d, s, m = self._normalize(
            data if data is not None else old["data"],
            shape if shape is not None else old["shape"],
            meta if meta is not None else old["meta"],
        )
        rest = self.df.where(F.col("id") != rid)
        new = self.spark.createDataFrame([Row(id=int(rid), data=d, shape=s, meta=m)], RECORD_SCHEMA)
        self._rewrite(rest.unionByName(new))

    def delete(self, rid: int) -> None:
        self.read(rid)  # raises RecordNotFound on miss (records.go:117-121)
        self._rewrite(self.df.where(F.col("id") != rid))

    def delete_many(self, rids: list[int]) -> None:
        self._rewrite(self.df.where(~F.col("id").isin([int(r) for r in rids])))

    def list(self, page: int = 1, per_page: int = 10) -> tuple[int, list[Row]]:
        """Ordered pagination returning (total, rows)
        (node/service/records.go:66-114; sort by id at 96-99)."""
        df = self.df
        total = df.count()
        rows = (
            df.orderBy("id").offset(max(0, (page - 1) * per_page)).limit(per_page).collect()
        )
        return total, rows

    def find_by_meta(self, key: str, value: str) -> list[Row]:
        """Exact meta equality (records.go:103-123). The reference keeps an
        inverted index; here the predicate pushes into the parquet scan
        (partition-prunable if the table is partitioned by hot meta keys)."""
        return self.df.where(F.col("meta")[key] == value).orderBy("id").collect()

    def count(self) -> int:
        return self.df.count()
