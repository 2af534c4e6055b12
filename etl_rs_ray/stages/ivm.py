"""Incremental view maintenance (IVM) over the lake change feed.

A grouped aggregate view (count / sum per group) over a 100 TB upsert
table must not be recomputed from a full snapshot on every epoch — the
change feed already names exactly the rows whose contribution changed.
``maintain_grouped_agg`` consumes ``LakeTable.changes(...,
include_old=True)`` and applies retractions/additions:

    I: +new row        U: -old row, +new row        D: -old row

Increments are partial-aggregated per feed batch (the shuffle-free
bucket diff tasks), folded once, and merged into the stored view — the
epoch cost tracks |changes|, never |table|. The view is a plain Arrow
table (group, n, sum_cols...) persisted by the caller; groups whose
count reaches 0 are dropped, so maintained == recomputed always holds
(tests pin it across multi-epoch replays with deletes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _increments(b: pa.Table, group_col: str, sum_cols: list[str]) -> pa.Table:
    """Per-batch (+new / -old) contributions folded per group."""
    op = b.column("op")
    has_new = pc.not_equal(op, "D")
    has_old = pc.not_equal(op, "I")

    parts = []
    new_side = b.filter(has_new)
    if new_side.num_rows:
        parts.append(
            pa.table(
                {
                    "g": new_side.column(group_col),
                    "dn": pa.array([1] * new_side.num_rows, pa.int64()),
                    **{f"ds_{c}": new_side.column(c).cast(pa.int64()) for c in sum_cols},
                }
            )
        )
    old_side = b.filter(has_old)
    if old_side.num_rows:
        parts.append(
            pa.table(
                {
                    "g": old_side.column("old_" + group_col),
                    "dn": pa.array([-1] * old_side.num_rows, pa.int64()),
                    **{
                        f"ds_{c}": pc.multiply(
                            old_side.column("old_" + c).cast(pa.int64()), -1
                        )
                        for c in sum_cols
                    },
                }
            )
        )
    if not parts:
        gtype = b.schema.field(group_col).type
        return pa.table(
            {"g": pa.array([], gtype), "dn": pa.array([], pa.int64()),
             **{f"ds_{c}": pa.array([], pa.int64()) for c in sum_cols}}
        )
    t = pa.concat_tables(parts, promote_options="permissive")
    g = pa.TableGroupBy(t, "g").aggregate(
        [("dn", "sum")] + [(f"ds_{c}", "sum") for c in sum_cols]
    )
    return g.rename_columns(["g", "dn"] + [f"ds_{c}" for c in sum_cols])


def maintain_grouped_agg(
    view: pa.Table | None,
    feed,
    group_col: str,
    sum_cols: list[str] | None = None,
) -> pa.Table:
    """Fold a change feed (``include_old=True``) into a stored
    (group, n, sum_<col>...) view. ``view=None`` starts empty (bootstrap
    feed). Returns the new view, sorted by group for deterministic
    persistence."""
    sum_cols = list(sum_cols or [])

    inc = feed.map_batches(
        lambda b: _increments(b, group_col, sum_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(1)

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "g").aggregate(
            [("dn", "sum")] + [(f"ds_{c}", "sum") for c in sum_cols]
        )
        return g.rename_columns(["g", "dn"] + [f"ds_{c}" for c in sum_cols])

    import ray

    all_blocks = ray.get(
        inc.map_batches(
            fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).to_arrow_refs()
    )
    blocks = [t for t in all_blocks if t.num_rows]
    # even empty increment blocks carry the typed (g, dn, ds_*) schema
    typed = blocks or [t for t in all_blocks if t.num_columns]
    if not typed:
        return view if view is not None else pa.schema([]).empty_table()
    delta = pa.concat_tables(typed, promote_options="permissive")

    if view is None:
        gtype = delta.schema.field("g").type
        view = pa.table(
            {group_col: pa.array([], gtype), "n": pa.array([], pa.int64()),
             **{f"sum_{c}": pa.array([], pa.int64()) for c in sum_cols}}
        )
    merged = pa.concat_tables(
        [
            view,
            pa.table(
                {group_col: delta.column("g"), "n": delta.column("dn"),
                 **{f"sum_{c}": delta.column(f"ds_{c}") for c in sum_cols}}
            ),
        ],
        promote_options="permissive",
    )
    g = pa.TableGroupBy(merged, group_col).aggregate(
        [("n", "sum")] + [(f"sum_{c}", "sum") for c in sum_cols]
    )
    g = g.rename_columns([group_col, "n"] + [f"sum_{c}" for c in sum_cols])
    g = g.filter(pc.greater(g.column("n"), 0))
    return g.take(pc.sort_indices(g, sort_keys=[(group_col, "ascending")]))
