"""Multi-level aggregation: GROUPING SETS / ROLLUP / CUBE and pivot —
the warehouse operators Ray Data has no native verbs for, built
combiner-first so every level shares ONE keyed shuffle.

``grouping_sets`` replicates each input row logically once per grouping
set, but the replication happens AFTER a per-batch partial aggregate:
each batch folds to at most Σ_s |groups_s(batch)| tiny partial rows
(set id + keys with aggregated-away dimensions pinned to a sentinel +
partial sums), and one hash shuffle on (set id, keys) merges them. The
data volume entering the shuffle is the number of distinct group cells
per batch, not rows × sets. Sentinels (not nulls) keep the shuffle keys
non-null and the driver hash stable; the SQL mirror is
``GROUP BY ROLLUP(...)`` with the same COALESCE sentinels.

``pivot_wide`` turns a long (key, category, value) stream into one wide
row per key with a column per category — per-batch partial (key,
category) sums first, one keyed shuffle, then a vectorized long→wide
scatter per group block. The category domain must be bounded and known
(pass it explicitly — at 100 TB you do not want a full pre-pass to
discover it; mirror is ``SUM(CASE WHEN ...)``).

Values must be integers (quantize currency to cents first) so partial
sums are exact under any fold order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _num_partitions(cap: int = 32) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cap, cpus))


ALL_SENTINEL = "(all)"
ALL_SENTINEL_INT = -1


def rollup_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """ROLLUP(a, b, c) = [(a,b,c), (a,b), (a,), ()]."""
    return [tuple(keys[:i]) for i in range(len(keys), -1, -1)]


def cube_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """CUBE(a, b) = every subset, fixed order."""
    out = []
    n = len(keys)
    for mask in range((1 << n) - 1, -1, -1):
        out.append(tuple(k for i, k in enumerate(keys) if mask & (1 << i)))
    return out


def grouping_sets(
    ds: ray.data.Dataset,
    sets: Sequence[Sequence[str]],
    sum_cols: Sequence[str],
    *,
    count_col: str = "n",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Aggregate ``sum_cols`` (int64) + a row count over every grouping
    set in one shuffle. Output: one row per group cell per set, with
    aggregated-away string keys pinned to ``"(all)"`` and integer keys
    to ``-1`` (the SQL mirror coalesces the same sentinels)."""
    all_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in all_keys:
                all_keys.append(k)
    sets = [tuple(s) for s in sets]
    schema = ds.schema()
    key_types = {n: t for n, t in zip(schema.names, schema.types)}
    for k in all_keys:
        if not (pa.types.is_string(key_types[k]) or pa.types.is_integer(key_types[k])):
            raise TypeError(f"grouping key {k!r} must be string or integer")

    def sentinel(k: str, n: int) -> pa.Array:
        if pa.types.is_string(key_types[k]):
            return pa.array([ALL_SENTINEL] * n, pa.string())
        return pa.array([ALL_SENTINEL_INT] * n, pa.int64())

    out_cols = all_keys + list(sum_cols) + [count_col]

    def partial(b: pa.Table) -> pa.Table:
        pieces = []
        for s in sets:
            aggs = [(c, "sum") for c in sum_cols] + [
                (sum_cols[0] if sum_cols else all_keys[0], "count", pc.CountOptions(mode="all"))
            ]
            if s:
                g = pa.TableGroupBy(b.select(list(s) + list(sum_cols)), list(s)).aggregate(aggs)
                g = g.rename_columns(list(s) + list(sum_cols) + [count_col])
            else:
                vals = {c: pa.array([pc.sum(b.column(c)).as_py() or 0], pa.int64())
                        for c in sum_cols}
                vals[count_col] = pa.array([b.num_rows], pa.int64())
                g = pa.table(vals)
            n = g.num_rows
            cols = {}
            for k in all_keys:
                cols[k] = g.column(k) if k in s else sentinel(k, n)
            for c in sum_cols:
                cols[c] = g.column(c)
            cols[count_col] = g.column(count_col)
            pieces.append(pa.table(cols).select(out_cols))
        return pa.concat_tables(pieces)

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, all_keys).aggregate(
            [(c, "sum") for c in sum_cols] + [(count_col, "sum")]
        )
        return g.rename_columns(all_keys + list(sum_cols) + [count_col])

    nparts = num_partitions or _num_partitions()
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # hash-repartition + whole-block merge (one TableGroupBy per
    # partition), not per-group map_groups calls
    return (
        _hash_shuffle(partials)
        .repartition(num_blocks=nparts, keys=all_keys)
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def pivot_wide(
    ds: ray.data.Dataset,
    key: str,
    pivot_col: str,
    value_col: str,
    categories: Sequence[str],
    *,
    total_col: str | None = "total",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Long→wide pivot: one output row per ``key`` with a
    ``{category}_sum`` column per category (int64, 0 when absent) and an
    optional grand total. Rows whose category is not in ``categories``
    are ignored (the domain is a declared input, not discovered)."""
    cats = list(categories)
    cat_idx = {c: i for i, c in enumerate(cats)}

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            b.select([key, pivot_col, value_col]), [key, pivot_col]
        ).aggregate([(value_col, "sum")])
        return g.rename_columns([key, pivot_col, value_col])

    def widen(t: pa.Table) -> pa.Table:
        ks = t.column(key)
        uniq = pc.unique(ks)
        kpos = pc.index_in(ks, value_set=uniq).to_numpy(zero_copy_only=False)
        cpos_arr = pc.index_in(t.column(pivot_col), value_set=pa.array(cats, pa.string()))
        cpos = cpos_arr.to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        known = ~np.isnan(cpos) if cpos.dtype.kind == "f" else np.ones(len(cpos), bool)
        mat = np.zeros((len(uniq), len(cats)), dtype=np.int64)
        np.add.at(mat, (kpos[known].astype(np.int64), cpos[known].astype(np.int64)),
                  vals[known])
        cols = {key: uniq}
        for c in cats:
            cols[f"{c}_sum"] = pa.array(mat[:, cat_idx[c]], pa.int64())
        if total_col:
            cols[total_col] = pa.array(mat.sum(axis=1), pa.int64())
        return pa.table(cols)

    nparts = num_partitions or _num_partitions()
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # widen() is multi-key-aware: one call per partition block
    return (
        _hash_shuffle(partials)
        .repartition(num_blocks=nparts, keys=[key])
        .map_batches(widen, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def grouped_quantiles_discrete(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    *,
    prefix: str = "p",
    count_col: str = "n",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT per-group quantiles (``percentile_disc`` semantics: the
    smallest value whose cumulative count reaches ``ceil(q*n)``) for a
    DISCRETE value domain — prices in cents, token counts, scores.

    Per-batch partials fold to distinct (group, value) cells before
    anything moves (the shuffle carries at most |groups|x|domain| rows
    per block, not the input), one keyed shuffle co-locates each group,
    and a sorted-cumsum kernel reads the order statistics. For an
    unbounded/continuous domain use sketches.exact_quantiles (iterative
    refinement) or tdigest_quantiles per group instead — this operator's
    cost is proportional to distinct values, not rows.

    ``value_col`` must be integer (quantize first). Output: one row per
    group: ``group_col, {prefix}{q}..., n``."""
    qs = [float(q) for q in qs]
    out_names = [f"{prefix}{str(q).replace('.', '')}" for q in qs]

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([group_col, value_col]), [group_col, value_col]).aggregate(
            [(value_col, "count")]
        )
        return g.rename_columns([group_col, value_col, "_cnt"])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (value_col, "ascending")]
        ))
        garr = t.column(group_col)
        keys = garr.to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        cnts = t.column("_cnt").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            cols = {group_col: garr}
            for name in out_names:
                cols[name] = pa.array([], pa.int64())
            cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        first = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:], [len(keys)]))
        out = {group_col: garr.take(pa.array(starts))}
        qcols = {name: np.empty(len(starts), dtype=np.int64) for name in out_names}
        ns = np.empty(len(starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
            cum = np.cumsum(cnts[s:e])
            n = int(cum[-1])
            ns[i] = n
            for q, name in zip(qs, out_names):
                target = max(1, int(np.ceil(q * n)))
                j = int(np.searchsorted(cum, target, side="left"))
                qcols[name][i] = vals[s + j]
        for name in out_names:
            out[name] = pa.array(qcols[name], pa.int64())
        out[count_col] = pa.array(ns, pa.int64())
        return pa.table(out)

    nparts = num_partitions or _num_partitions()
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # merge duplicate (group, value) cells from different blocks, then
    # run the order-statistic kernel over each group's sorted cells
    def merge_cells(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, [group_col, value_col]).aggregate([("_cnt", "sum")])
        return kernel(g.rename_columns([group_col, value_col, "_cnt"]))

    return (
        _hash_shuffle(partials)
        .repartition(num_blocks=nparts, keys=[group_col])
        .map_batches(merge_cells, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def grouped_quantiles_cont(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    *,
    prefix: str = "p",
    count_col: str = "n",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT per-group continuous quantiles (``percentile_cont`` /
    DuckDB ``quantile_cont`` semantics: linear interpolation between the
    order statistics at rank ``h = (n-1)*q``) over a DISCRETE integer
    value domain. Same distributed shape as grouped_quantiles_discrete —
    per-batch distinct-cell partials, one keyed shuffle, a sorted-cumsum
    kernel — but the final read interpolates in float64 with the exact
    expression SQL uses (``lo + (h - floor(h)) * (hi - lo)``), so both
    sides agree bit-for-bit on integer inputs."""
    qs = [float(q) for q in qs]
    out_names = [f"{prefix}{str(q).replace('.', '')}" for q in qs]

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            b.select([group_col, value_col]), [group_col, value_col]
        ).aggregate([(value_col, "count")])
        return g.rename_columns([group_col, value_col, "_cnt"])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (value_col, "ascending")]
        ))
        garr = t.column(group_col)
        keys = garr.to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        cnts = t.column("_cnt").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            cols = {group_col: garr}
            for name in out_names:
                cols[name] = pa.array([], pa.float64())
            cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        first = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(first)
        seg_ends = np.concatenate((starts[1:], [len(keys)]))
        out = {group_col: garr.take(pa.array(starts))}
        qcols = {name: np.empty(len(starts), dtype=np.float64) for name in out_names}
        ns = np.empty(len(starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts.tolist(), seg_ends.tolist())):
            cum = np.cumsum(cnts[s:e])
            n = int(cum[-1])
            ns[i] = n
            for q, name in zip(qs, out_names):
                h = (n - 1) * q
                lo_rank = int(np.floor(h))
                hi_rank = min(lo_rank + 1, n - 1)
                # value at 0-based rank r = first cell whose cumcount > r
                lo_v = float(vals[s + int(np.searchsorted(cum, lo_rank, side="right"))])
                hi_v = float(vals[s + int(np.searchsorted(cum, hi_rank, side="right"))])
                qcols[name][i] = lo_v + (h - np.floor(h)) * (hi_v - lo_v)
        for name in out_names:
            out[name] = pa.array(qcols[name], pa.float64())
        out[count_col] = pa.array(ns, pa.int64())
        return pa.table(out)

    def merge_cells(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, [group_col, value_col]).aggregate([("_cnt", "sum")])
        return kernel(g.rename_columns([group_col, value_col, "_cnt"]))

    nparts = num_partitions or _num_partitions()
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        _hash_shuffle(partials)
        .repartition(num_blocks=nparts, keys=[group_col])
        .map_batches(merge_cells, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def mad_outliers(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    keep_cols: Sequence[str],
    *,
    k: int = 3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Robust per-group outlier detection: rows with
    ``|value - median(group)| > k * MAD(group)`` where MAD is the median
    absolute deviation (``percentile_disc`` order statistics, so every
    comparison is integer-exact — no float mean/stddev to drift under
    parallel fold order).

    Scale shape: two ``grouped_quantiles_discrete`` passes (each one
    keyed shuffle whose volume is distinct (group, value) CELLS, not
    rows), per-group stats broadcast via ``ray.put`` (one row per group
    — the group domain must be bounded, e.g. event types / languages /
    shards; for unbounded groups swap the broadcast for a keyed
    shuffle join), then ONE streaming filter pass over the input.
    ``value_col`` must be integer (quantize first)."""
    import ray

    med_rows = grouped_quantiles_discrete(
        ds, group_col, value_col, [0.5], prefix="m", num_partitions=num_partitions
    ).take_all()
    med = {r[group_col]: int(r["m05"]) for r in med_rows}
    med_ref = ray.put(med)

    def _per_row(b: pa.Table, m: dict, pick) -> np.ndarray:
        # dictionary-encode the group column so the python dict lookup
        # runs once per DISTINCT group in the block, not once per row
        genc = b.column(group_col).combine_chunks().dictionary_encode()
        idx = genc.indices.to_numpy(zero_copy_only=False)
        per_group = np.array([pick(m[g]) for g in genc.dictionary.to_pylist()], dtype=np.int64)
        return per_group[idx]

    def absdev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        meds = _per_row(b, m, lambda x: x)
        return pa.table(
            {group_col: b.column(group_col), "_absdev": pa.array(np.abs(v - meds), pa.int64())}
        )

    mad_rows = grouped_quantiles_discrete(
        ds.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True),
        group_col,
        "_absdev",
        [0.5],
        prefix="m",
        num_partitions=num_partitions,
    ).take_all()
    mad = {r[group_col]: int(r["m05"]) for r in mad_rows}
    stats_ref = ray.put({g: (med[g], mad[g]) for g in med})

    out_cols = list(keep_cols)

    def flag(b: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        meds = _per_row(b, st, lambda x: x[0])
        mads = _per_row(b, st, lambda x: x[1])
        keep = np.abs(v - meds) > k * mads
        return b.select(out_cols).filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
