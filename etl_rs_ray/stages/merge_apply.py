"""Last-writer-wins merge kernels — vectorized Arrow, no Python row loops.

Generalizes the reference's key-based dedup ("collapse duplicate contacts
per Nom partition", examples/transform_hdd_deduplication.rs) to "collapse
event history per primary key, ordered by LSN, with tombstones" — the
CRUD create/update/delete semantics of lib-core/src/model/base/crud_fns.rs
(create:18-70, update:191-220, delete:222-279) under a total LSN order
instead of wall-clock audit stamps (base/utils.rs:29-46).

Two layers:

- :func:`lww_reduce` — within one Arrow table: keep, per key, the row with
  the greatest LSN (exact-dup LSNs keep the first-seen row). Used both as
  the per-batch pre-aggregation (combiner before the shuffle) and as the
  per-bucket reducer after it.
- :func:`merge_bucket_tables` — fold incoming winners into an existing
  bucket's stored state with schema unification; drops tombstoned keys
  from the stored state (safe because replay reads are HWM-bounded, so an
  already-applied LSN is never re-delivered).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..state.schema_evolution import unify_tables

DEFAULT_KEY = ("repo", "path", "commit")


def _first_per_key_mask(table: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """Boolean mask keeping the first row of each consecutive key run.

    Assumes ``table`` is sorted by ``key_cols``. Vectorized neighbor
    comparison — no Python loop.
    """
    n = table.num_rows
    if n == 0:
        return pa.array([], pa.bool_())
    mask = None
    for k in key_cols:
        col = table.column(k).combine_chunks()
        cur = col.slice(1)
        prev = col.slice(0, n - 1)
        # not_equal yields null where either side is null: null-vs-value is a
        # difference, null-vs-null is equality
        both_null = pc.and_(pc.is_null(cur), pc.is_null(prev))
        neq = pc.if_else(both_null, pa.scalar(False), pc.fill_null(pc.not_equal(cur, prev), True))
        mask = neq if mask is None else pc.or_(mask, neq)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return pa.concat_arrays([pa.array([True]), mask])


@dataclass
class LwwStats:
    events_in: int = 0
    rows_out: int = 0
    superseded_dropped: int = 0
    ops: dict = field(default_factory=dict)


def lww_reduce(
    table: pa.Table,
    key_cols: tuple[str, ...] = DEFAULT_KEY,
    lsn_col: str = "lsn",
    op_col: str = "op",
    drop_tombstones: bool = False,
    stats: LwwStats | None = None,
) -> pa.Table:
    """Keep, per key, the single row with the greatest LSN (stable for ties:
    the first-delivered duplicate wins — exact dedup of replayed LSNs)."""
    if table.num_rows == 0:
        return table
    sort_keys = [(k, "ascending") for k in key_cols] + [(lsn_col, "descending")]
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    t = table.take(idx)
    mask = _first_per_key_mask(t, key_cols)
    out = t.filter(mask)
    if stats is not None:
        stats.events_in += table.num_rows
        stats.superseded_dropped += table.num_rows - out.num_rows
        if op_col in out.column_names:
            vc = out.column(op_col).combine_chunks().value_counts()
            for item in vc:
                op = item["values"].as_py()
                stats.ops[op] = stats.ops.get(op, 0) + item["counts"].as_py()
    if drop_tombstones and op_col in out.column_names:
        out = out.filter(
            pc.fill_null(pc.not_equal(out.column(op_col), "D"), True)
        )
    if stats is not None:
        stats.rows_out += out.num_rows
    return out


def merge_bucket_tables(
    existing: pa.Table | None,
    incoming: pa.Table,
    key_cols: tuple[str, ...] = DEFAULT_KEY,
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> pa.Table:
    """Fold incoming (already LWW-reduced) winners into the stored bucket
    state. Stored rows carry their applied LSN and op='I'/'U'; incoming
    tombstones delete. Schema evolution: permissive unification."""
    if existing is None or existing.num_rows == 0:
        merged = incoming
    else:
        merged = unify_tables([existing, incoming])
        merged = lww_reduce(merged, key_cols, lsn_col, op_col)
    # final state: tombstoned keys disappear
    if op_col in merged.column_names:
        merged = merged.filter(
            pc.fill_null(pc.not_equal(merged.column(op_col), "D"), True)
        )
    return merged
