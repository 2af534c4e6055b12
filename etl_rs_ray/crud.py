"""CRUD surface over the lake table — change events as the write path.

Mirrors lib-core's Bmc CRUD layer (lib-core/src/model/base/crud_fns.rs):
``create``/``create_many`` (op=I, :18-70), ``update`` (op=U, 0-rows ->
EntityNotFound, :191-220), ``delete``/``delete_many`` (op=D tombstone,
:222-279), and ``get``/``first``/``list``/``count`` snapshot reads with
filters, order_bys, limit/offset (:72-189, 281-308; LIST_LIMIT_DEFAULT /
LIST_LIMIT_MAX from base.rs:14-15). The audit mtime ≙ the event LSN.

Writes append to the event log; ``flush()`` replays into the lake — the
transactional boundary (dbx.rs TxnHolder ≙ one replay epoch's atomic
manifest commit).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .datagen import EVENT_SCHEMA
from .pipelines.cdc import replay
from .sources.event_log import EventLogWriter, read_event_log_table
from .sources.lake import LakeTable

LIST_LIMIT_DEFAULT = 1000
LIST_LIMIT_MAX = 5000


class EntityNotFound(Exception):
    pass


class CrudStore:
    def __init__(self, log_dir: str, table_dir: str, num_partitions: int = 4, num_buckets: int = 8):
        self.log_dir = log_dir
        self.table_dir = table_dir
        self.writer = EventLogWriter(log_dir, num_partitions)
        self.num_buckets = num_buckets
        self._next_lsn = self._recover_next_lsn()

    def _recover_next_lsn(self) -> int:
        t = read_event_log_table(self.log_dir)
        if t.num_rows == 0:
            return 0
        return pc.max(t.column("lsn")).as_py() + 1

    def _emit(self, rows: list[dict]) -> list[int]:
        lsns = []
        for r in rows:
            r["lsn"] = self._next_lsn
            lsns.append(self._next_lsn)
            self._next_lsn += 1
        self.writer.write(pa.Table.from_pylist(rows, schema=EVENT_SCHEMA))
        return lsns

    # --- writes (change events) ---------------------------------------------

    def create(self, row: dict) -> int:
        return self.create_many([row])[0]

    def create_many(self, rows: list[dict]) -> list[int]:
        return self._emit([dict(r, op="I") for r in rows])

    def update(self, key: tuple[str, str, str], **fields) -> int:
        cur = self.get(key)
        if cur is None:
            raise EntityNotFound(key)
        row = {**cur, **fields, "repo": key[0], "path": key[1], "commit": key[2], "op": "U"}
        row.pop("lsn", None)
        return self._emit([row])[0]

    def delete(self, key: tuple[str, str, str]) -> int:
        if self.get(key) is None:
            raise EntityNotFound(key)
        return self.delete_many([key])[0]

    def delete_many(self, keys: list[tuple[str, str, str]]) -> list[int]:
        return self._emit(
            [
                {"repo": k[0], "path": k[1], "commit": k[2], "lang": None, "content": None, "op": "D"}
                for k in keys
            ]
        )

    def flush(self) -> None:
        """Apply pending events to the lake (one atomic epoch)."""
        replay(self.log_dir, self.table_dir, num_buckets=self.num_buckets)

    # --- snapshot reads ------------------------------------------------------

    def _snapshot(self) -> pa.Table:
        return LakeTable(self.table_dir).snapshot_table()

    def get(self, key: tuple[str, str, str]) -> dict | None:
        """Point read: the key hash routes to its single owning bucket, so
        only that bucket's file set is opened — with a parquet predicate
        (row-group stats pushdown; bucket files are key-sorted) — instead
        of materializing the table (crud_fns.rs:72-97 ≙ WHERE id = $1)."""
        import pyarrow.parquet as pq

        from .sources.event_log import fast_hash_bucket
        from .stages.merge_apply import lww_reduce

        lake = LakeTable(self.table_dir)
        b = fast_hash_bucket(
            pa.array([key[0]]), pa.array([key[1]]), lake.num_buckets
        )[0].as_py()
        files = lake.bucket_file_sets().get(b)
        if not files:
            return None
        flt = [("repo", "==", key[0]), ("path", "==", key[1]), ("commit", "==", key[2])]
        parts = [pq.read_table(f, filters=flt) for f in files]
        t = pa.concat_tables(parts, promote_options="permissive")
        if t.num_rows == 0:
            return None
        # bucket may hold base + delta files: fold LWW, drop tombstones
        t = lww_reduce(t, ("repo", "path", "commit"), drop_tombstones=True)
        return t.to_pylist()[0] if t.num_rows else None

    def first(self, filters: dict | None = None, order_bys: list[str] | None = None) -> dict | None:
        rows = self.list(filters=filters, order_bys=order_bys, limit=1)
        return rows[0] if rows else None

    @staticmethod
    def _apply_filters(t: pa.Table, filters: dict | None) -> pa.Table:
        if not filters or t.num_rows == 0:
            return t
        expr = None
        for col, val in filters.items():
            e = pads.field(col) == val
            expr = e if expr is None else expr & e
        return pads.dataset(t).to_table(filter=expr)

    def list(
        self,
        filters: dict | None = None,
        order_bys: list[str] | None = None,
        limit: int | None = None,
        offset: int = 0,
    ) -> list[dict]:
        limit = LIST_LIMIT_DEFAULT if limit is None else min(limit, LIST_LIMIT_MAX)
        t = self._apply_filters(self._snapshot(), filters)
        if t.num_rows == 0:
            return []
        if order_bys:
            keys = []
            for ob in order_bys:
                if ob.startswith("!"):  # "!col" = descending, the reference's syntax
                    keys.append((ob[1:], "descending"))
                else:
                    keys.append((ob, "ascending"))
            t = t.sort_by(keys)
        return t.slice(offset, limit).to_pylist()

    def count(self, filters: dict | None = None) -> int:
        """TRUE row count of the filtered snapshot — NOT limited by the
        list cap (crud_fns.rs:281-308 counts the full filtered set)."""
        return self._apply_filters(self._snapshot(), filters).num_rows
