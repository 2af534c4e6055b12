"""Small shared Ray Data helpers."""

from __future__ import annotations

import pyarrow as pa


def drop_empty_blocks(ds, schema: "pa.Schema | None" = None):
    """Materialize and strip zero-row blocks.

    Hash-shuffled stages can emit empty blocks with an EMPTY schema;
    map_batches skips empty blocks (so a UDF can't re-schema them) and
    the next keyed shuffle then fails to find its key column. Blocks stay
    in the object store (from_arrow_refs is zero-copy). ``schema`` is the
    fallback for an entirely empty dataset."""
    import ray
    import ray.data

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow((schema or pa.schema([])).empty_table())
    return ray.data.from_arrow_refs(refs)


def _block_sums_impl(block, cols):
    import pyarrow.compute as pc

    return [block.num_rows] + [pc.sum(block.column(c)).as_py() or 0 for c in cols]


_block_sums_task = None  # lazily wrapped so importing util never touches ray


def blocks_stats(mat_ds, cols: "list[str]") -> tuple:
    """(num_rows, sum(cols[0]), ...) over a MATERIALIZED dataset, computed
    by one tiny remote task per block against the already-materialized
    block refs — no extra dataset execution (the convergence checksum of
    the CC loops used to cost a full pass per round)."""
    import ray

    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return (0,) + (0,) * len(cols)
    global _block_sums_task
    if _block_sums_task is None:
        _block_sums_task = ray.remote(num_cpus=0.25)(_block_sums_impl)
    parts = ray.get([_block_sums_task.remote(r, cols) for r in refs])
    return tuple(int(sum(p[i] for p in parts)) for i in range(len(cols) + 1))
