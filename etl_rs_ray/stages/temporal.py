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

    def merge(t: pa.Table) -> pa.Table:
        # segment-aware whole-block kernel: a block holds MANY keys. Sort
        # by (key, time, _side DESC) so a right row ties-before a left row
        # at equal time (backward as-of is inclusive), then compute each
        # row's latest preceding right-row position within its key segment
        # with ONE global cummax — the per-segment reset falls out of
        # offsetting positions by gidx * (n + 1).
        if t.num_rows == 0:
            return pa.schema([(c, t.schema.field(c).type) for c in out_cols]).empty_table()
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (key_col, "ascending"),
                (time_col, "ascending"),
                ("_side", "descending"),
            ],
        )
        t = t.take(idx)
        from .merge_apply import _first_per_key_mask

        n = t.num_rows
        first = _first_per_key_mask(t, (key_col,)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        is_right = t.column("_side").to_numpy(zero_copy_only=False) == 1
        pos = np.where(is_right, np.arange(n, dtype=np.int64), -1)
        big = np.int64(n + 1)
        last_right = np.maximum.accumulate(pos + gidx * big) - gidx * big
        lpos = np.flatnonzero(~is_right)
        if len(lpos) == 0:
            return pa.schema([(c, t.schema.field(c).type) for c in out_cols]).empty_table()
        matched = last_right[lpos] >= 0
        src_pos = np.where(matched, last_right[lpos], 0)  # dummy 0, nulled below
        left = t.take(pa.array(lpos))
        cols = {c: left.column(c) for c in left_cols}
        right_rows = t.take(pa.array(src_pos))
        m = pa.array(matched)
        for c in right_cols:
            src = right_rows.column(f"{c}{right_suffix}")
            cols[f"{c}{right_suffix}"] = pc.if_else(m, src, pa.scalar(None, src.type))
        return pa.table(cols)

    u = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    # hash-repartition by key + ONE whole-block kernel call per partition
    # (map_groups would pay one python call per key)
    return (
        _hash_shuffle(u)
        .repartition(num_blocks=num_partitions, keys=[key_col])
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
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
    # merge folds via TableGroupBy — whole-block calls per hash partition
    return (
        _hash_shuffle(p)
        .repartition(num_blocks=num_partitions, keys=gkeys)
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
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
    # merge folds via TableGroupBy — whole-block calls per hash partition
    return (
        _hash_shuffle(p)
        .repartition(num_blocks=num_partitions, keys=gkeys)
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
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

    def sessions(block: pa.Table) -> pa.Table:
        # multi-key gaps-and-islands: sort by (key, ts); a session break
        # is a key change OR a gap >= the timeout — the whole block folds
        # in one vectorized pass no matter how many keys it holds
        if block.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], block.schema.field(key_col).type),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        idx = pc.sort_indices(
            block, sort_keys=[(key_col, "ascending"), (time_col, "ascending")]
        )
        g = block.take(idx)
        ts = g.column(time_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        from ..stages.merge_apply import _first_per_key_mask

        first = _first_per_key_mask(g, (key_col,)).to_numpy(zero_copy_only=False)
        new_session = first.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) >= gap_us
        sid = np.cumsum(new_session) - 1
        n_sessions = int(sid[-1]) + 1
        starts_idx = np.flatnonzero(new_session)
        starts = ts[starts_idx]
        ends = np.maximum.reduceat(ts, starts_idx)
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.bincount(sid, weights=np.nan_to_num(vals), minlength=n_sessions)
        return pa.table(
            {
                key_col: g.column(key_col).take(pa.array(starts_idx)),
                "session_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(ends, pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    return (
        _hash_shuffle(ds)
        .repartition(num_blocks=num_partitions, keys=[key_col])
        .map_batches(sessions, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def funnel_counts(
    ds,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: "list[str]",
    num_partitions: int = 8,
) -> pa.Table:
    """Ordered conversion funnel: for each user, walk ``steps`` in order,
    each step matched by the EARLIEST event of that type strictly after
    the previous step's match. Returns one row per step:
    (step_idx, step, n_users) where n_users = users who completed the
    prefix through that step (non-increasing).

    Scale shape: pre-filter to the step types at the read (tiny
    projection), ONE hash-shuffle groupby on user, per-group numpy walk
    (sort once, one boolean filter per step), then per-user max-step rows
    fold to |steps| counters via per-batch partials — no second shuffle.
    """
    step_set = pa.array(steps)

    def prefilter(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column(type_col), value_set=step_set)).select(
            [user_col, type_col, ts_col]
        )

    def walk(t: pa.Table) -> pa.Table:
        # whole-block kernel over MANY users: one vectorized pass per step
        # (|steps| is tiny) — for each user segment, the step matches at
        # the EARLIEST event of that type strictly after the previous
        # step's match (np.minimum.reduceat per segment).
        if t.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], t.schema.field(user_col).type),
                    "_max_step": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t, sort_keys=[(user_col, "ascending"), (ts_col, "ascending")]
        )
        g = t.take(idx)
        from .merge_apply import _first_per_key_mask

        first = _first_per_key_mask(g, (user_col,)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        gidx = np.cumsum(first) - 1
        nseg = len(starts)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        inf = np.iinfo(np.int64).max
        cur = np.full(nseg, -(1 << 62), dtype=np.int64)
        alive = np.ones(nseg, dtype=bool)
        reached = np.full(nseg, -1, dtype=np.int64)
        for i, step in enumerate(steps):
            is_step = pc.equal(g.column(type_col), pa.scalar(step)).to_numpy(
                zero_copy_only=False
            )
            cand = np.where(is_step & (ts > cur[gidx]) & alive[gidx], ts, inf)
            seg_min = np.minimum.reduceat(cand, starts)
            alive &= seg_min < inf
            cur = np.where(alive, seg_min, cur)
            reached = np.where(alive, i, reached)
            if not alive.any():
                break
        return pa.table(
            {
                user_col: g.column(user_col).take(pa.array(starts)),
                "_max_step": pa.array(reached, pa.int64()),
            }
        )

    per_user = (
        _hash_shuffle(ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(num_blocks=num_partitions, keys=[user_col])
        .map_batches(walk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )

    def partial_counts(b: pa.Table) -> pa.Table:
        import numpy as np

        m = b.column("_max_step").to_numpy(zero_copy_only=False)
        # completed step i  <=>  max_step >= i
        counts = [(m >= i).sum() for i in range(len(steps))]
        return pa.table(
            {
                "step_idx": pa.array(range(len(steps)), pa.int64()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    agg: dict[int, int] = {i: 0 for i in range(len(steps))}
    for r in per_user.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        agg[r["step_idx"]] += int(r["n_users"])
    return pa.table(
        {
            "step_idx": pa.array(range(len(steps)), pa.int64()),
            "step": pa.array(steps, pa.string()),
            "n_users": pa.array([agg[i] for i in range(len(steps))], pa.int64()),
        }
    )


def retention_cohorts(
    ds,
    user_col: str,
    ts_col: str,
    num_partitions: int = 8,
):
    """Cohort retention: cohort each user by their FIRST active day, then
    count users active at each (cohort_day, day_offset) cell — the
    classic warehouse retention triangle.

    Scale shape: per-batch partial folds events to distinct
    (user, epoch_day) rows BEFORE anything moves; ONE keyed shuffle on
    user co-locates each user's days; the segment kernel reads
    cohort = min(day) and emits (cohort, day - cohort) rows (each user
    contributes at most one row per cell by construction, so the final
    count needs no DISTINCT); a second tiny shuffle on the bounded
    (cohort, offset) domain sums the partial counts.

    Output: cohort_day (int64 epoch days), day_offset, n_users."""

    def partial(b: pa.Table) -> pa.Table:
        # floor-div in numpy (arrow divide truncates toward zero)
        us = b.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        t = pa.table({user_col: b.column(user_col), "_day": pa.array(day, pa.int64())})
        g = pa.TableGroupBy(t, [user_col, "_day"]).aggregate([([], "count_all")])
        return g.select([user_col, "_day"])

    def per_user(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], pa.int64()),
                    "day_offset": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        # merge duplicate (user, day) rows from different blocks first
        t = pa.TableGroupBy(t, [user_col, "_day"]).aggregate([([], "count_all")])
        idx = pc.sort_indices(t, sort_keys=[(user_col, "ascending"), ("_day", "ascending")])
        t = t.take(idx)
        from .merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, (user_col,)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        gidx = np.cumsum(first) - 1
        day = t.column("_day").to_numpy(zero_copy_only=False)
        cohort = day[starts][gidx]
        cells = pa.table(
            {
                "cohort_day": pa.array(cohort, pa.int64()),
                "day_offset": pa.array(day - cohort, pa.int64()),
            }
        )
        g = pa.TableGroupBy(cells, ["cohort_day", "day_offset"]).aggregate([([], "count_all")])
        return g.rename_columns(["cohort_day", "day_offset", "n_users"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = pa.TableGroupBy(t, ["cohort_day", "day_offset"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["cohort_day", "day_offset", "n_users"])

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cells = (
        _hash_shuffle(p)
        .repartition(num_blocks=num_partitions, keys=[user_col])
        .map_batches(per_user, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return (
        _hash_shuffle(cells)
        .repartition(num_blocks=min(num_partitions, 4), keys=["cohort_day", "day_offset"])
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def gapfill_hourly_locf(
    ds,
    time_col: str,
    key_col: str,
    value_col: str,
    *,
    width_seconds: int = 3600,
    num_partitions: int = 8,
):
    """Time-series resample with gap filling: bucket events into
    fixed-width windows per key, then emit EVERY bucket of the global
    [min, max] timeline for every key — missing buckets get
    ``n_events = 0`` and a last-observation-carried-forward running
    value (null before the key's first observed bucket).

    Scale shape: per-batch partials fold rows to (key, bucket) cells;
    the tiny cell table is materialized ONCE (bounded: keys × buckets),
    bounds come off it with a driver min/max, and one keyed shuffle
    gives each key's segment to a dense-scatter + cummax-LOCF numpy
    kernel. The raw input streams through exactly one pass.
    ``value_col`` must be int64 (quantize first). Output: key,
    bucket_start (int64 bucket index), n_events, sum_locf."""
    width_us = width_seconds * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column(time_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key_col: b.column(key_col),
                "_h": pa.array(us // width_us, pa.int64()),
                "_v": b.column(value_col),
            }
        )
        g = pa.TableGroupBy(t, [key_col, "_h"]).aggregate([("_v", "sum"), ([], "count_all")])
        return g.rename_columns([key_col, "_h", "_s", "_n"])

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).materialize()
    bounds = cells.map_batches(
        lambda b: pa.table(
            {
                "lo": pa.array([pc.min(b.column("_h")).as_py()], pa.int64()),
                "hi": pa.array([pc.max(b.column("_h")).as_py()], pa.int64()),
            }
        )
        if b.num_rows
        else pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    import ray

    if not bounds:
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], cells.schema().types[0]),
                    "bucket_start": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_locf": pa.array([], pa.int64()),
                }
            )
        )
    lo = min(r["lo"] for r in bounds)
    hi = max(r["hi"] for r in bounds)
    span = int(hi - lo + 1)

    def fill(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                "bucket_start": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_locf": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # merge duplicate cells from different blocks, then per key:
        # dense-scatter observed buckets onto the global timeline, LOCF
        # via index cummax
        t = pa.TableGroupBy(t, [key_col, "_h"]).aggregate([("_s", "sum"), ("_n", "sum")])
        t = t.rename_columns([key_col, "_h", "_s", "_n"])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending"), ("_h", "ascending")]))
        from .merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, (key_col,)).to_numpy(zero_copy_only=False)
        bounds_idx = np.flatnonzero(first).tolist() + [t.num_rows]
        hs = t.column("_h").to_numpy(zero_copy_only=False)
        ss = t.column("_s").to_numpy(zero_copy_only=False)
        ns = t.column("_n").to_numpy(zero_copy_only=False)
        keys_out, bucket_out, n_out, s_out, smask_out = [], [], [], [], []
        for i, (s0, s1) in enumerate(zip(bounds_idx[:-1], bounds_idx[1:])):
            pos = (hs[s0:s1] - lo).astype(np.int64)
            n_dense = np.zeros(span, dtype=np.int64)
            n_dense[pos] = ns[s0:s1]
            src = np.full(span, -1, dtype=np.int64)
            src[pos] = np.arange(s0, s1)
            src = np.maximum.accumulate(src)
            have = src >= 0
            sums = np.where(have, ss[np.maximum(src, 0)], 0)
            keys_out.append(t.column(key_col).slice(s0, 1))
            bucket_out.append(np.arange(lo, hi + 1, dtype=np.int64))
            n_out.append(n_dense)
            s_out.append(sums)
            smask_out.append(~have)
        key_arr = pa.concat_arrays(
            [k.combine_chunks().take(pa.array(np.zeros(span, np.int64))) for k in keys_out]
        )
        return pa.table(
            {
                key_col: key_arr,
                "bucket_start": pa.array(np.concatenate(bucket_out), pa.int64()),
                "n_events": pa.array(np.concatenate(n_out), pa.int64()),
                "sum_locf": pa.array(
                    np.concatenate(s_out), pa.int64(), mask=np.concatenate(smask_out)
                ),
            }
        )

    return (
        _hash_shuffle(cells)
        .repartition(num_blocks=num_partitions, keys=[key_col])
        .map_batches(fill, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def hopping_distinct_users(
    ds,
    time_col: str,
    user_col: str,
    width_seconds: int = 3600,
    hop_seconds: int = 900,
    small_domain: bool = True,
    num_partitions: int = 8,
):
    """Windowed COUNT DISTINCT over hopping event-time windows — the op
    plain aggregation can't fold (distincts don't sum): each batch first
    reduces to its DISTINCT (window, user) pairs (the heavy reduction —
    duplicates never leave the task), the window shuffle co-locates each
    window's survivors, and one grouped pass resolves cross-batch
    duplicates and counts. Output: window_start, n_users."""
    if width_seconds % hop_seconds:
        raise ValueError("width_seconds must be a multiple of hop_seconds")
    hops = width_seconds // hop_seconds

    def partial(b: pa.Table) -> pa.Table:
        base = pc.floor_temporal(b.column(time_col), multiple=hop_seconds, unit="second")
        parts = []
        for j in range(hops):
            start = pc.add(
                pc.cast(base, pa.timestamp("us")),
                pa.scalar(-j * hop_seconds * 1_000_000, pa.duration("us")),
            )
            parts.append(pa.table({"window_start": start, "u": b.column(user_col)}))
        t = pa.concat_tables(parts)
        g = pa.TableGroupBy(t, ["window_start", "u"]).aggregate([])
        return g

    def merge(t: pa.Table) -> pa.Table:
        d = pa.TableGroupBy(t, ["window_start", "u"]).aggregate([])
        g = pa.TableGroupBy(d, "window_start").aggregate([([], "count_all")])
        return pa.table(
            {
                "window_start": g.column("window_start"),
                "n_users": g.column("count_all"),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if small_domain:
        return p.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    return (
        _hash_shuffle(p)
        .repartition(num_blocks=num_partitions, keys=["window_start"])
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def first_touch_curve(
    ds,
    time_col: str,
    user_col: str,
    small_domain: bool = True,
    num_partitions: int = 8,
):
    """Cumulative adoption curve: per day, how many users appeared for
    the FIRST time and the running total. Per-batch min-timestamp-per-
    user partials (the |rows| -> |users| reduction), one fold to resolve
    each user's true first day, then the tiny day domain is counted and
    prefix-summed in one block. Output: day, new_users,
    cumulative_users."""

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"u": b.column(user_col), "t": b.column(time_col)}), "u"
        ).aggregate([("t", "min")])
        return g.rename_columns(["u", "t"])

    def fold_users(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "u").aggregate([("t", "min")])
        day = pc.floor_temporal(g.column("t_min"), unit="day")
        d = pa.TableGroupBy(pa.table({"day": day}), "day").aggregate([([], "count_all")])
        return pa.table({"day": d.column("day"), "new_users": d.column("count_all")})

    def curve(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "day").aggregate([("new_users", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("day", "ascending")]))
        import numpy as np

        cum = np.cumsum(g.column("new_users_sum").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "day": g.column("day"),
                "new_users": g.column("new_users_sum"),
                "cumulative_users": pa.array(cum, pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if small_domain:
        folded = p.repartition(1).map_batches(
            fold_users, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:
        folded = (
            _hash_shuffle(p)
            .repartition(num_blocks=num_partitions, keys=["u"])
            .map_batches(fold_users, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        )
    # day domain is tiny: one final block builds the prefix sum
    return folded.repartition(1).map_batches(
        curve, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def coalesce_intervals(
    ds,
    key_col: str,
    start_col: str,
    end_col: str,
    *,
    num_partitions: int | None = None,
):
    """Merge overlapping/touching intervals per key into maximal islands
    (union of time ranges — the interval-coalescing half of
    gaps-and-islands). ONE keyed shuffle; per block the kernel computes
    a segmented exclusive running max of interval ends (offset-trick
    cummax, no per-group Python), breaks an island where a start
    exceeds it, and reduces each island with reduceat. Interval ties on
    start are order-insensitive: an equal-start interval can never open
    a new island. Output: key, island (1-based per key), island_start,
    island_end, n_intervals. Integer start/end only (quantize first);
    values must fit below 2^53 so the segment-offset trick stays exact.
    Equivalent SQL: max(e) OVER (... ROWS ... AND 1 PRECEDING) + the
    classic sum-of-breaks island id."""
    from .ordered import per_key_ordered

    C = np.int64(1) << 53

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        s = t.column(start_col).to_numpy(zero_copy_only=False)
        e = t.column(end_col).to_numpy(zero_copy_only=False)
        if not (np.issubdtype(s.dtype, np.integer) and np.issubdtype(e.dtype, np.integer)):
            raise TypeError("coalesce_intervals needs integer bounds; quantize first")
        if len(e) and (np.abs(e).max() >= C or np.abs(s).max() >= C):
            raise ValueError("interval bounds must be < 2^53")
        g64 = gidx.astype(np.int64)
        inc = np.maximum.accumulate(e + g64 * C) - g64 * C  # segmented cummax
        prev = np.empty_like(inc)
        if len(inc):
            prev[1:] = inc[:-1]
        prev[first] = np.iinfo(np.int64).min
        brk = first | (s > prev)
        istarts = np.flatnonzero(brk)
        # 1-based island id per key: breaks since the segment's first row
        cum_brk = np.cumsum(brk)
        seg_base = cum_brk[np.flatnonzero(first)] - 1
        island_at_start = (cum_brk - seg_base[gidx])[istarts]
        return pa.table(
            {
                key_col: t.column(key_col).take(pa.array(istarts)),
                "island": pa.array(island_at_start, pa.int64()),
                "island_start": pa.array(s[istarts], pa.int64()),
                "island_end": pa.array(np.maximum.reduceat(e, istarts), pa.int64()),
                "n_intervals": pa.array(
                    np.diff(np.append(istarts, len(s))).astype(np.int64)
                ),
            }
        )

    return per_key_ordered(ds, key_col, start_col, kernel, num_partitions=num_partitions)
