"""Temporal operators Ray Data lacks natively: as-of join and tumbling
window aggregation.

Both follow the engine's standard shapes:

- ``asof_join`` co-partitions the two sides by key with ONE tagged-union
  hash shuffle (partitioning assumption: all rows of a key fit one
  group), then does a vectorized backward binary search per group — the
  per-group cost is O((l + r) log r), no pairwise scan.
- ``tumbling_window_agg`` is a pure two-level aggregation: the window
  start is computed vectorized per batch, partial aggregates fold each
  batch to one row per (window, key), and the final merge is a gather
  when the window x key domain is bounded or a hash-shuffle groupby when
  it isn't — the same gate the query suite uses everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    time_col: str,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_r",
    num_partitions: int = 8,
):
    """For every left row, attach the LATEST right row of the same key
    with right.time <= left.time (backward as-of; unmatched left rows get
    nulls — LEFT semantics, like DuckDB's ASOF LEFT JOIN).

    Output columns: ``left_cols`` plus each of ``right_cols`` suffixed.
    ``time_col`` must appear in both; it is matched on and (suffixed)
    carried from the right side too."""

    # resolve the unified schema once from dataset metadata so each tag fn
    # can emit correctly-typed nulls for the other side's columns
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    out_fields = [(c, lsch[c]) for c in left_cols] + [
        (f"{c}{right_suffix}", rsch[c]) for c in right_cols
    ]

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_cols}
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = pa.nulls(b.num_rows, rsch[c])
        cols["_side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            cols[c] = b.column(c) if c in (key_col, time_col) else pa.nulls(b.num_rows, lsch[c])
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = b.column(c)
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    out_cols = [c for c, _t in out_fields]

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        left = group.filter(pa.array(lmask))
        right = group.filter(pa.array(~lmask))
        if left.num_rows == 0:
            return pa.schema(
                [(c, group.schema.field(c).type) for c in out_cols]
            ).empty_table()
        lt = left.column(time_col).to_numpy(zero_copy_only=False)
        if right.num_rows == 0:
            return left.select(out_cols)
        rt_idx = pc.sort_indices(right, sort_keys=[(time_col, "ascending")])
        right = right.take(rt_idx)
        rt = right.column(time_col).to_numpy(zero_copy_only=False)
        # latest right index with rt <= lt, -1 = no match
        pos = np.searchsorted(rt, lt, side="right") - 1
        matched = pos >= 0
        take_idx = pa.array(
            np.where(matched, pos, 0), pa.int64()
        )  # dummy 0 for unmatched, nulled below
        cols = {c: left.column(c) for c in left_cols}
        for c in right_cols:
            src = right.column(f"{c}{right_suffix}").take(take_idx)
            cols[f"{c}{right_suffix}"] = pc.if_else(
                pa.array(matched), src, pa.scalar(None, src.type)
            )
        return pa.table(cols)

    u = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        _hash_shuffle(u)
        .groupby(key_col, num_partitions=num_partitions)
        .map_groups(merge, batch_format="pyarrow")
    )


def tumbling_window_agg(
    ds,
    time_col: str,
    keys: list[str],
    value_col: str,
    width_seconds: int = 3600,
    small_domain: bool = True,
    num_partitions: int = 8,
):
    """Tumbling event-time windows: floor(ts / width) per row (vectorized),
    then count + sum + mean of ``value_col`` per (window_start, *keys).
    Output columns: window_start, *keys, n_events, sum_value, avg_value.

    ``small_domain=True`` gathers the per-batch partials into one merge
    block (windows x keys bounded — e.g. hourly x event types); False runs
    the same partials through a hash-shuffle groupby (unbounded keys)."""
    gkeys = ["window_start", *keys]

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column(time_col)
        win = pc.floor_temporal(ts, multiple=width_seconds, unit="second")
        t = pa.table(
            {"window_start": win, **{k: b.column(k) for k in keys}, "_v": b.column(value_col)}
        )
        g = pa.TableGroupBy(t, gkeys).aggregate(
            [("_v", "sum"), ("_v", "count"), ("_v", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(gkeys + ["sum_value", "n_valid", "n_events"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, gkeys).aggregate(
            [("sum_value", "sum"), ("n_valid", "sum"), ("n_events", "sum")]
        )
        return pa.table(
            {
                **{k: g.column(k) for k in gkeys},
                "n_events": g.column("n_events_sum"),
                "sum_value": g.column("sum_value_sum"),
                "avg_value": pc.divide(
                    g.column("sum_value_sum"), pc.cast(g.column("n_valid_sum"), pa.float64())
                ),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if small_domain:
        return p.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    return (
        _hash_shuffle(p)
        .groupby(gkeys, num_partitions=num_partitions)
        .map_groups(merge, batch_format="pyarrow")
    )


def hopping_window_agg(
    ds,
    time_col: str,
    keys: list[str],
    value_col: str,
    width_seconds: int = 3600,
    hop_seconds: int = 900,
    small_domain: bool = True,
    num_partitions: int = 8,
):
    """Hopping (sliding) event-time windows: width W advancing every H.
    Each row lands in W/H windows — emitted VECTORIZED by looping the
    small constant W/H per batch (column slices, no per-row Python),
    then the same two-level aggregation as the tumbling case.
    Output: window_start, *keys, n_events, sum_value."""
    if width_seconds % hop_seconds:
        raise ValueError("width_seconds must be a multiple of hop_seconds")
    hops = width_seconds // hop_seconds
    gkeys = ["window_start", *keys]

    def partial(b: pa.Table) -> pa.Table:
        base = pc.floor_temporal(b.column(time_col), multiple=hop_seconds, unit="second")
        parts = []
        for j in range(hops):
            start = pc.add(
                pc.cast(base, pa.timestamp("us")),
                pa.scalar(-j * hop_seconds * 1_000_000, pa.duration("us")),
            )
            parts.append(
                pa.table(
                    {
                        "window_start": start,
                        **{k: b.column(k) for k in keys},
                        "_v": b.column(value_col),
                    }
                )
            )
        t = pa.concat_tables(parts)
        g = pa.TableGroupBy(t, gkeys).aggregate(
            [("_v", "sum"), ("_v", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(gkeys + ["sum_value", "n_events"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, gkeys).aggregate([("sum_value", "sum"), ("n_events", "sum")])
        return pa.table(
            {
                **{k: g.column(k) for k in gkeys},
                "n_events": g.column("n_events_sum"),
                "sum_value": g.column("sum_value_sum"),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if small_domain:
        return p.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    return (
        _hash_shuffle(p)
        .groupby(gkeys, num_partitions=num_partitions)
        .map_groups(merge, batch_format="pyarrow")
    )


def session_window_agg(
    ds,
    time_col: str,
    key_col: str,
    value_col: str,
    gap_seconds: int = 1800,
    num_partitions: int = 8,
):
    """Session windows: per key, maximal runs of events whose successive
    gaps are < gap. One hash shuffle by key, then a vectorized
    gaps-and-islands pass per group (sort + diff + cumsum — no per-row
    Python). Output: key, session_start, session_end, n_events, sum_value.

    Partitioning assumption: all events of one key fit one group (session
    state cannot span partitions)."""
    gap_us = gap_seconds * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(time_col, "ascending")])
        g = group.take(idx)
        ts = g.column(time_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        key = g.column(key_col)[0].as_py()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) >= gap_us
        sid = np.cumsum(new_session) - 1
        n_sessions = int(sid[-1]) + 1 if len(ts) else 0
        starts = ts[new_session]
        ends = np.maximum.reduceat(ts, np.flatnonzero(new_session))
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.bincount(sid, weights=np.nan_to_num(vals), minlength=n_sessions)
        return pa.table(
            {
                key_col: pa.array([key] * n_sessions, group.schema.field(key_col).type),
                "session_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(ends, pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    return (
        _hash_shuffle(ds)
        .groupby(key_col, num_partitions=num_partitions)
        .map_groups(sessions, batch_format="pyarrow")
    )
