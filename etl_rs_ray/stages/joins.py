"""Reusable broadcast joins: the map-side join family for small
dimension tables.

The dimension is collected once on the driver, shipped to the object
store with ``ray.put`` (read zero-copy by every task — never re-shipped
per batch), and each fact batch resolves it with one vectorized
``pc.index_in`` + ``take`` per lookup. No shuffle; the fact side never
moves. This generalizes the pattern the query suite uses
(nation_region_join, supplier_nation_region, customers_without_orders)
into one stage the way the reference's is_in reconciliation generalizes
its anti join (transform_hdd_deduplication.rs:241-252).

Use when the dimension fits comfortably in the object store (rule of
thumb: <~1 GB). For two big sides, use the tagged-union grouped merge
(pipelines/queries.customer_order_revenue) or Dataset.join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _as_table(dim) -> pa.Table:
    import ray.data

    if isinstance(dim, pa.Table):
        return dim
    if isinstance(dim, ray.data.Dataset):
        return pa.Table.from_pylist(dim.take_all())
    raise TypeError(type(dim))


def broadcast_lookup_join(
    ds,
    dim,
    on: str,
    dim_key: str,
    take_cols: dict[str, str],
    how: str = "left",
):
    """Attach dimension columns to every fact row.

    ``take_cols`` maps dim column -> output column name. ``how``:
    "left" keeps unmatched fact rows (nulls), "inner" drops them.
    """
    import ray

    t = _as_table(dim)
    payload = (
        t.column(dim_key).combine_chunks(),
        {out: t.column(src).combine_chunks() for src, out in take_cols.items()},
    )
    ref = ray.put(payload)

    def join_fn(batch: pa.Table) -> pa.Table:
        keys, cols = ray.get(ref)
        pos = pc.index_in(batch.column(on), value_set=keys)
        if how == "inner":
            keep = pc.is_valid(pos)
            batch = batch.filter(keep)
            pos = pos.filter(keep)
        for out, arr in cols.items():
            batch = batch.append_column(out, arr.take(pos))
        return batch

    return ds.map_batches(join_fn, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Keep fact rows whose key is (semi) / is not (anti) in ``keys`` —
    the reference's is_in membership filter as a broadcast stage.
    ``keys``: pa.Array / list, or a Dataset of one column (distinct
    aggregated dataset-side before the driver ever sees it)."""
    import ray
    import ray.data

    if isinstance(keys, ray.data.Dataset):
        name = keys.schema().names[0]
        keys = keys.map_batches(
            lambda b, _n=name: pa.table({_n: pc.unique(b.column(_n))}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).unique(name)
        keys = pa.array(sorted(keys))
    elif not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pa.array(sorted(keys))
    ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(batch.column(on), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
