"""Skew-safe keyed aggregation via hot-key salting.

A hash-shuffle groupby sends ALL rows of a key to one reducer; a hot key
(one user with half the stream) serializes the job on that reducer.
The salting playbook:

1. detect hot keys (stages/heavy.heavy_hitters pass 1 — candidates only,
   no shuffle);
2. append a salt column: hot keys get salt = row_index % fanout so their
   rows spread over ``fanout`` reducers, cold keys get salt 0;
3. aggregate by (key, salt) — the hot key's work is now parallel;
4. re-aggregate the per-salt partials by key (tiny: fanout rows per hot
   key).

Decomposable aggregates only (sum/count/min/max — mean via sum+count).
This composes with the per-batch combiner the engine already applies
everywhere: the combiner bounds batch-local duplication, salting bounds
reducer-side concentration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def salted_sum_count(
    ds,
    key_col: str,
    value_col: str,
    hot_keys: list | None = None,
    fanout: int = 8,
    num_partitions: int = 8,
    auto_detect: int | None = None,
):
    """Skew-safe ``SELECT key, sum(v) AS sum_value, count(*) AS n FROM ds
    GROUP BY key``. ``hot_keys`` spreads those keys over ``fanout``
    reducers; ``auto_detect=k`` finds the top-k candidates itself via
    the Misra-Gries pass. Returns a Dataset (key, sum_value, n)."""
    import ray

    if auto_detect and hot_keys is None:
        from .heavy import heavy_hitters

        hot_keys = heavy_hitters(ds, key_col, k=auto_detect).column("key").to_pylist()
    hot_ref = ray.put(pa.array(hot_keys or []))

    def partial(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        is_hot = pc.is_in(b.column(key_col), value_set=hot).to_numpy(zero_copy_only=False)
        salt = np.zeros(b.num_rows, dtype=np.int32)
        n_hot = int(is_hot.sum())
        if n_hot:
            salt[is_hot] = np.arange(n_hot, dtype=np.int32) % fanout
        t = pa.table(
            {
                key_col: b.column(key_col),
                "_salt": pa.array(salt),
                "_v": b.column(value_col),
            }
        )
        # per-batch combiner: fold to one row per (key, salt) before the move
        g = pa.TableGroupBy(t, [key_col, "_salt"]).aggregate(
            [("_v", "sum"), ("_v", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns([key_col, "_salt", "sum_value", "n"])

    def merge_salt(group: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(group, [key_col]).aggregate([("sum_value", "sum"), ("n", "sum")])
        return g.rename_columns([key_col, "sum_value", "n"])

    from ray.data.aggregate import Sum

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # shuffle by (key, salt): the hot key's partials spread across reducers
    per_salt = (
        _hash_shuffle(p)
        .groupby([key_col, "_salt"], num_partitions=num_partitions)
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )
    # merge_salt folds via TableGroupBy — one whole-block call per hash
    # partition instead of one python call per key
    return (
        _hash_shuffle(per_salt)
        .repartition(num_blocks=num_partitions, keys=[key_col])
        .map_batches(merge_salt, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
