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


class NoTxn(Exception):
    """rollback/commit with no open transaction (dbx.rs Error::NoTxn)."""


class UnknownFilterOp(Exception):
    pass


def _op_expr(col: str, op: str, val):
    """One typed filter operator -> a pyarrow.dataset expression.

    The operator names are modql's OpVal surface (the filter language the
    reference's ListOptions accepts, e.g. agent.rs:45-54 OpValsString /
    OpValsInt64): comparison, set membership, string search, null tests.
    pc.* kernels applied to a field expression stay expressions, so every
    operator is row-group-prunable where parquet stats allow."""
    f = pads.field(col)
    if op in ("$eq", "$e"):
        return f == val
    if op in ("$not", "$ne"):
        return f != val
    if op == "$gt":
        return f > val
    if op == "$gte":
        return f >= val
    if op == "$lt":
        return f < val
    if op == "$lte":
        return f <= val
    if op == "$in":
        return f.isin(list(val))
    if op == "$notIn":
        return ~f.isin(list(val))
    if op == "$null":
        return f.is_null() if val else f.is_valid()
    if op == "$contains":
        return pc.match_substring(f, val)
    if op == "$notContains":
        return ~pc.match_substring(f, val)
    if op == "$containsAny":
        e = None
        for v in val:
            m = pc.match_substring(f, v)
            e = m if e is None else e | m
        return e if e is not None else pads.scalar(False)
    if op == "$startsWith":
        return pc.starts_with(f, val)
    if op == "$endsWith":
        return pc.ends_with(f, val)
    raise UnknownFilterOp(op)


def filters_to_expr(filters) -> "pads.Expression | None":
    """Compile a modql-style filter into one dataset expression.

    ``filters`` is a dict (one AND group) or a list of dicts (OR of AND
    groups — modql's FilterGroups). A field's value is either a scalar
    (implicit $eq) or a {"$op": operand, ...} dict (every op must hold)."""
    if filters is None:
        return None
    groups = filters if isinstance(filters, (list, tuple)) else [filters]
    or_expr = None
    for group in groups:
        g_expr = None
        for col, val in group.items():
            if isinstance(val, dict):
                for op, operand in val.items():
                    e = _op_expr(col, op, operand)
                    g_expr = e if g_expr is None else g_expr & e
            else:
                e = pads.field(col) == val
                g_expr = e if g_expr is None else g_expr & e
        if g_expr is None:
            continue
        or_expr = g_expr if or_expr is None else or_expr | g_expr
    return or_expr


class CrudStore:
    def __init__(self, log_dir: str, table_dir: str, num_partitions: int = 4, num_buckets: int = 8):
        self.log_dir = log_dir
        self.table_dir = table_dir
        self.writer = EventLogWriter(log_dir, num_partitions)
        self.num_buckets = num_buckets
        self._next_lsn = self._recover_next_lsn()
        self._txn_depth = 0  # TxnHolder.counter (dbx.rs:31-49)
        self._staged: list[dict] = []  # rows buffered while a txn is open

    def _recover_next_lsn(self) -> int:
        t = read_event_log_table(self.log_dir)
        if t.num_rows == 0:
            return 0
        return pc.max(t.column("lsn")).as_py() + 1

    def _emit(self, rows: list[dict]) -> list[int]:
        if self._txn_depth > 0:
            # inside a commit group: stage; LSNs are assigned but nothing
            # reaches the log until the OUTERMOST commit (dbx.rs:118-138)
            lsns = []
            for r in rows:
                r["lsn"] = self._next_lsn
                lsns.append(self._next_lsn)
                self._next_lsn += 1
            self._staged.extend(rows)
            return lsns
        lsns = []
        for r in rows:
            r["lsn"] = self._next_lsn
            lsns.append(self._next_lsn)
            self._next_lsn += 1
        self.writer.write(pa.Table.from_pylist(rows, schema=EVENT_SCHEMA))
        return lsns

    # --- transactions (commit groups) ----------------------------------------
    #
    # Ref-counted nesting exactly like the reference's TxnHolder
    # (lib-core/src/model/store/dbx.rs:31-114): begin on depth 0 opens the
    # group, nested begins only increment the counter; only the LAST commit
    # appends the staged rows to the event log (one atomic segment write);
    # rollback at depth 1 discards everything staged, at depth >1 it just
    # decrements (the reference keeps the txn open, so staged work from
    # outer scopes survives an inner rollback's dec).

    def begin_txn(self) -> None:
        self._txn_depth += 1

    def commit_txn(self) -> None:
        if self._txn_depth == 0:
            raise NoTxn("commit_txn")
        self._txn_depth -= 1
        if self._txn_depth == 0:
            staged, self._staged = self._staged, []
            if staged:
                self.writer.write(pa.Table.from_pylist(staged, schema=EVENT_SCHEMA))

    def rollback_txn(self) -> None:
        if self._txn_depth == 0:
            raise NoTxn("rollback_txn")
        if self._txn_depth > 1:
            self._txn_depth -= 1
            return
        self._txn_depth = 0
        n = len(self._staged)
        self._staged = []
        self._next_lsn -= n  # staged LSNs never reached the log: reuse them

    def txn(self):
        """``with store.txn(): ...`` — commit on clean exit, rollback on
        exception. Nests (inner groups fold into the outermost)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            self.begin_txn()
            try:
                yield self
            except BaseException:
                self.rollback_txn()
                raise
            else:
                self.commit_txn()

        return _cm()

    def _overlay(self) -> list[dict]:
        return self._staged if self._txn_depth > 0 else []

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
        if self._txn_depth > 0:
            raise NoTxn("flush() inside an open transaction — commit or roll back first")
        replay(self.log_dir, self.table_dir, num_buckets=self.num_buckets)

    # --- snapshot reads ------------------------------------------------------

    def _snapshot(self) -> pa.Table:
        return LakeTable(self.table_dir).snapshot_table()

    def get(self, key: tuple[str, str, str]) -> dict | None:
        """Point read: the key hash routes to its single owning bucket, so
        only that bucket's file set is opened — with a parquet predicate
        (row-group stats pushdown; bucket files are key-sorted) — instead
        of materializing the table (crud_fns.rs:72-97 ≙ WHERE id = $1).
        Inside a txn, staged writes overlay the committed row (the
        reference reads through the open transaction)."""
        import pyarrow.parquet as pq

        for r in reversed(self._overlay()):
            if (r["repo"], r["path"], r["commit"]) == key:
                return None if r["op"] == "D" else dict(r)

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

    def first(self, filters=None, order_bys: list[str] | None = None) -> dict | None:
        # the reference's first() defaults order_bys to the id so the row
        # picked is deterministic (crud_fns.rs:110-121); key order here
        rows = self.list(
            filters=filters, order_bys=order_bys or ["repo", "path", "commit"], limit=1
        )
        return rows[0] if rows else None

    @staticmethod
    def _apply_filters(t: pa.Table, filters) -> pa.Table:
        """Filter with the typed-operator language (see filters_to_expr);
        a plain {col: scalar} dict keeps its original equality meaning."""
        if not filters or t.num_rows == 0:
            return t
        return pads.dataset(t).to_table(filter=filters_to_expr(filters))

    def _snapshot_with_overlay(self) -> pa.Table:
        t = self._snapshot()
        staged = self._overlay()
        if not staged:
            return t
        from .stages.merge_apply import lww_reduce

        o = pa.Table.from_pylist(staged, schema=EVENT_SCHEMA)
        t = pa.concat_tables([t, o], promote_options="permissive") if t.num_rows else o
        return lww_reduce(t, ("repo", "path", "commit"), drop_tombstones=True)

    def list(
        self,
        filters=None,
        order_bys: list[str] | None = None,
        limit: int | None = None,
        offset: int = 0,
    ) -> list[dict]:
        limit = LIST_LIMIT_DEFAULT if limit is None else min(limit, LIST_LIMIT_MAX)
        t = self._apply_filters(self._snapshot_with_overlay(), filters)
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

    def count(self, filters=None) -> int:
        """TRUE row count of the filtered snapshot — NOT limited by the
        list cap (crud_fns.rs:281-308 counts the full filtered set)."""
        return self._apply_filters(self._snapshot_with_overlay(), filters).num_rows
