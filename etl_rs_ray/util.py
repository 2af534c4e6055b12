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
