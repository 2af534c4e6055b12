"""Ordered window operators: per-key SCD2 / running aggregates and a
distributed global prefix scan.

Ray Data has no native ordered window functions (LEAD / LAG / cumulative
aggregates / ROW_NUMBER); these implement the two shapes that cover
them, both shuffle-minimal:

- **per-key ordered kernels** (`per_key_ordered` + the kernels built on
  it): ONE keyed hash shuffle (`groupby().map_groups`), then a single
  vectorized numpy pass over each group block sorted by the order
  column — segment boundaries come from the first-per-key mask, so one
  block may hold many groups and no Python row loop ever runs. Covers
  SCD2 interval materialization (the classic CDC history table),
  per-key running totals, lag deltas, and row numbers.

- **global ordered prefix scan** (`prefix_scan`): running min/max/sum
  over ONE total order (an LSN / event-id axis) without a global sort.
  Two passes: (1) a bounded-domain partial pass folds each batch to at
  most R per-range partial aggregates (R = number of order ranges, the
  same no-shuffle gather shape as the Q1 aggregate), the driver
  exclusive-scans the R carries; (2) one keyed shuffle on the range id
  co-locates each range, and a vectorized fold applies the carry-in.
  Per-task state is O(rows/R); driver state is O(R). This is the
  watermark primitive: the exclusive running max of event-time over
  arrival (LSN) order IS the stream's low watermark, and late rows are
  `ts < watermark - allowed_lateness`.

Semantics are pinned to the equivalent ANSI SQL window functions — the
oracle queries in pipelines/queries.py state them explicitly. Reference
parity: the reference engine exposes no window functions (its CDC state
is last-writer-wins only, crates/libs/lib-etl — see stages/merge_apply
for that path); SCD2 extends the same event envelope (key, lsn, op)
to full history, deletes closing intervals without opening new ones.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min

from .merge_apply import _first_per_key_mask


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _num_partitions(cap: int = 32) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cap, cpus))


# --- per-key ordered kernels --------------------------------------------------


def per_key_ordered(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_col: str,
    kernel: Callable[[pa.Table, np.ndarray, np.ndarray], pa.Table],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """ONE keyed shuffle, then ``kernel(sorted_block, first_mask, gidx)``
    over each group block sorted by ``(key_cols..., order_col)`` asc.
    ``first_mask[i]`` is True on the first row of each key run and
    ``gidx`` maps rows to 0-based group indices — everything a
    vectorized window kernel needs. A block may hold many groups."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sort_keys = [(k, "ascending") for k in keys] + [(order_col, "ascending")]

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        return kernel(t, first, gidx)

    nparts = num_partitions or _num_partitions()
    # hash-repartition + ONE whole-block kernel call per partition — NOT
    # groupby().map_groups, which invokes the UDF once per group (500k
    # keys = 500k python calls; measured 6x slower at 10M rows). The
    # kernel is segment-aware, so a block holding many groups is the
    # designed-for case. batch_size=None keeps partition blocks whole.
    return (
        _hash_shuffle(ds)
        .repartition(num_blocks=nparts, keys=keys)
        .map_batches(fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _lead_within(arr: np.ndarray, first: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEAD(arr) within segments: value of the next row, null (mask True)
    on each segment's last row."""
    n = len(arr)
    out = np.empty(n, dtype=arr.dtype)
    nullmask = np.empty(n, dtype=bool)
    if n:
        out[:-1] = arr[1:]
        out[-1] = arr[-1]
        nullmask[:-1] = first[1:]
        nullmask[-1] = True
    return out, nullmask


def _lag_within(arr: np.ndarray, first: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LAG(arr) within segments: value of the previous row, null on each
    segment's first row."""
    n = len(arr)
    out = np.empty(n, dtype=arr.dtype)
    if n:
        out[1:] = arr[:-1]
        out[0] = arr[0]
    return out, first.copy()


def _segment_positions(first: np.ndarray, gidx: np.ndarray) -> np.ndarray:
    """0-based position of each row within its segment."""
    starts = np.flatnonzero(first)
    return np.arange(len(first)) - starts[gidx]


def scd2_history(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    lsn_col: str,
    attr_cols: Sequence[str],
    *,
    op_col: str | None = None,
    delete_op: str = "D",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 history from an ordered change
    stream: every change event opens a version valid from its own LSN
    until the key's NEXT event (exclusive); the key's last event leaves
    an open (null ``valid_to``) current version. With ``op_col``, rows
    whose op equals ``delete_op`` close the preceding version without
    opening one (the delete row itself is not a version).

    Equivalent SQL: ``LEAD(lsn) OVER (PARTITION BY key ORDER BY lsn)``
    as ``valid_to``, filtering out delete rows after the LEAD.

    One keyed shuffle; the per-group kernel is pure numpy. Output
    columns: ``key_cols..., valid_from, valid_to, is_current,
    attr_cols...``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        lsn = t.column(lsn_col).to_numpy(zero_copy_only=False)
        lead, nullmask = _lead_within(lsn, first)
        cols = {k: t.column(k) for k in keys}
        cols["valid_from"] = t.column(lsn_col)
        cols["valid_to"] = pa.array(lead, pa.int64(), mask=nullmask)
        cols["is_current"] = pa.array(nullmask)
        for a in attr_cols:
            cols[a] = t.column(a)
        out = pa.table(cols)
        if op_col is not None:
            keep = pc.not_equal(t.column(op_col), pa.scalar(delete_op))
            out = out.filter(pc.fill_null(keep, True))
        return out

    return per_key_ordered(ds, keys, lsn_col, kernel, num_partitions=num_partitions)


def running_per_key(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_col: str,
    value_col: str,
    *,
    sum_col: str | None = "run_sum",
    lag_col: str | None = None,
    rownum_col: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key ordered running aggregates in one keyed shuffle:
    cumulative sum of ``value_col`` (int64 — quantize floats to integer
    units first so the fold is exact and order-proof), LAG(value) (null
    on each key's first row), and 1-based ROW_NUMBER. Equivalent SQL:
    ``SUM(v) OVER (PARTITION BY key ORDER BY ord)``, ``LAG(v) OVER
    (...)``, ``ROW_NUMBER() OVER (...)``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"running_per_key needs an integer {value_col!r}; quantize floats first"
            )
        cols = dict(zip(t.column_names, t.columns))
        if sum_col:
            cs = np.cumsum(v)
            starts = np.flatnonzero(first)
            base = np.where(starts == 0, 0, cs[np.maximum(starts - 1, 0)])
            cols[sum_col] = pa.array(cs - base[gidx], pa.int64())
        if lag_col:
            lagged, nullmask = _lag_within(v, first)
            cols[lag_col] = pa.array(lagged, pa.int64(), mask=nullmask)
        if rownum_col:
            cols[rownum_col] = pa.array(_segment_positions(first, gidx) + 1, pa.int64())
        return pa.table(cols)

    return per_key_ordered(ds, keys, order_col, kernel, num_partitions=num_partitions)


# --- global ordered prefix scan ----------------------------------------------

_OPS = {
    "max": (np.maximum, np.iinfo(np.int64).min),
    "min": (np.minimum, np.iinfo(np.int64).max),
    "sum": (np.add, 0),
}


def prefix_scan(
    ds: ray.data.Dataset,
    order_col: str,
    specs: Sequence[tuple[str, str, str, bool]],
    *,
    ranges: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed prefix scan over ONE total order. Each spec is
    ``(value_col, op, out_col, inclusive)`` with op in {max,min,sum};
    value columns must be non-null int64 (quantize first). Exclusive
    scans emit null on the global first row (no prior value).

    Two passes: (1) bounded-domain partials — each batch folds to ≤R
    rows keyed by the order range (uniform split of [min,max]; an LSN
    axis is dense so ranges are balanced — for a skewed order column
    pick boundaries from a histogram), gathered and exclusive-scanned
    on the driver (O(R) state); (2) one keyed shuffle on ``_range_id``
    and a numpy accumulate per range with the carry-in applied. No
    global sort at any scale.

    Equivalent SQL: ``AGG(v) OVER (ORDER BY ord ROWS UNBOUNDED
    PRECEDING [AND 1 PRECEDING for exclusive])``. Requires distinct
    ``order_col`` values (an LSN); ties within one range would scan in
    sort order but ties ACROSS a range boundary would see a carry that
    includes only the earlier range — an LSN axis has no ties."""
    for _, op, _, _ in specs:
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r}")

    stats = ds.aggregate(Min(order_col), Max(order_col), Count())
    lo, hi = stats[f"min({order_col})"], stats[f"max({order_col})"]
    n_rows = stats["count()"]
    if n_rows == 0:
        return ds
    nparts = num_partitions or _num_partitions()
    r = int(ranges or min(64, max(2, n_rows // 10_000 + 1), nparts * 2))
    span = max(1, (int(hi) - int(lo) + 1))

    def _range_ids(order: np.ndarray) -> np.ndarray:
        return ((order.astype(np.int64) - int(lo)) * r // span).astype(np.int64)

    value_cols = sorted({s[0] for s in specs})
    agg_ops = sorted({(s[0], s[1]) for s in specs if s[1] != "sum"}) + sorted(
        {(s[0], "sum") for s in specs if s[1] == "sum"}
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("_range_id", pa.array(
            _range_ids(b.column(order_col).to_numpy(zero_copy_only=False))))
        g = pa.TableGroupBy(b.select(["_range_id", *value_cols]), "_range_id").aggregate(
            [(c, op) for c, op in agg_ops]
        )
        return g.rename_columns(["_range_id"] + [f"{c}_{op}" for c, op in agg_ops])

    partials = (
        ds.select_columns([order_col, *value_cols])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()  # ≤ R rows per input block — tiny by construction
    )

    # fold partials per range, then exclusive-scan the R carries
    folded: dict[int, dict[tuple[str, str], int]] = {}
    for row in partials:
        d = folded.setdefault(int(row["_range_id"]), {})
        for c, op in agg_ops:
            v = int(row[f"{c}_{op}"])
            fn, _ = _OPS[op]
            d[(c, op)] = int(fn(d[(c, op)], v)) if (c, op) in d else v
    carries: dict[int, dict[tuple[str, str], int | None]] = {}
    acc: dict[tuple[str, str], int | None] = {k: None for k in agg_ops}
    for rid in range(r):
        carries[rid] = dict(acc)
        if rid in folded:
            for k, v in folded[rid].items():
                fn, _ = _OPS[k[1]]
                acc[k] = v if acc[k] is None else int(fn(acc[k], v))
    carries_ref = ray.put(carries)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_range_id", pa.array(
            _range_ids(b.column(order_col).to_numpy(zero_copy_only=False))))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_range_id"])
        t = t.take(pc.sort_indices(t, sort_keys=[(order_col, "ascending")]))
        carry = ray.get(carries_ref)[int(t.column("_range_id")[0].as_py())]
        cols = dict(zip(t.column_names, t.columns))
        for value_col, op, out_col, inclusive in specs:
            v = t.column(value_col).to_numpy(zero_copy_only=False)
            if v.dtype != np.int64:
                raise TypeError(f"prefix_scan needs int64 {value_col!r}")
            fn, ident = _OPS[op]
            c = carry[(value_col, op)]
            inc = getattr(fn, "accumulate")(
                np.concatenate(([c if c is not None else ident], v))
            )
            if inclusive:
                cols[out_col] = pa.array(inc[1:], pa.int64())
            else:
                nullmask = np.zeros(t.num_rows, dtype=bool)
                nullmask[0] = c is None
                cols[out_col] = pa.array(inc[:-1], pa.int64(), mask=nullmask)
        return pa.table(cols).drop_columns(["_range_id"])

    return (
        _hash_shuffle(ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("_range_id", num_partitions=min(nparts, r))
        .map_groups(fold, batch_format="pyarrow")
    )


def rolling_per_key(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_col: str,
    value_col: str,
    window: int,
    *,
    sum_col: str = "roll_sum",
    count_col: str | None = "roll_n",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key ROLLING sum over the last ``window`` rows in order —
    ``SUM(v) OVER (PARTITION BY key ORDER BY ord ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)`` — via cumsum differencing inside each
    sorted segment (one keyed shuffle, no per-row loop). ``value_col``
    must be int64 (quantize first); ``count_col`` emits the actual
    window size (< window near each segment's start), so a rolling
    average derives exactly as sum/n downstream."""
    if window < 1:
        raise ValueError("window must be >= 1")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(f"rolling_per_key needs an integer {value_col!r}")
        n = len(v)
        cs = np.cumsum(v)
        starts = np.flatnonzero(first)
        base = np.where(starts == 0, 0, cs[np.maximum(starts - 1, 0)])
        run = cs - base[gidx]  # inclusive per-segment cumsum
        pos = _segment_positions(first, gidx)
        # rolling = run[i] - run[i - window] within the segment (0 when
        # the window reaches past the segment start)
        idx = np.arange(n) - window
        valid = pos >= window
        prior = np.where(valid, run[np.maximum(idx, 0)], 0)
        roll = run - prior
        cols = dict(zip(t.column_names, t.columns))
        cols[sum_col] = pa.array(roll, pa.int64())
        if count_col:
            cols[count_col] = pa.array(np.minimum(pos + 1, window), pa.int64())
        return pa.table(cols)

    return per_key_ordered(ds, keys, order_col, kernel, num_partitions=num_partitions)


def _multi_key_hash(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """One stable 64-bit hash per row over a composite key."""
    from .joins import _key_hash64
    from ..sources.event_log import _splitmix64

    h, _ = _key_hash64(t.column(keys[0]))
    for k in keys[1:]:
        hk, _ = _key_hash64(t.column(k))
        h = _splitmix64(h + hk)
    return h


def scd2_apply_increment(
    history: ray.data.Dataset,
    increment: ray.data.Dataset,
    key_cols: str | Sequence[str],
    lsn_col: str,
    attr_cols: Sequence[str],
    *,
    op_col: str | None = None,
    delete_op: str = "D",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Incremental SCD2 maintenance: fold a new LSN window into an
    existing history WITHOUT touching unaffected keys — the daily-delta
    shape. Only each touched key's OPEN version re-enters the shuffle:
    it is re-formed as an event (lsn = valid_from), unioned with the
    increment, and re-derived by ``scd2_history``; every closed version
    and every untouched key passes through map-only.

    The touched-key filter is a broadcast set of 64-bit key hashes — a
    hash collision only routes an untouched key through the (idempotent)
    recompute, never changes the result. Requires the increment to be
    strictly NEWER than the history (every increment LSN above the
    touched key's open ``valid_from``); violations raise inside the
    kernel rather than silently rewriting closed history.

    Invariant (pinned by tests): ``apply_increment(scd2(e[:k]), e[k:])
    == scd2(e)`` for any split point k."""
    import ray

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def hash_partial(b: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(np.unique(_multi_key_hash(b, keys)), pa.uint64())})

    touched = np.unique(
        np.concatenate(
            [
                np.asarray(r["h"], dtype=np.uint64).reshape(-1)
                for r in increment.map_batches(
                    hash_partial, batch_format="pyarrow", zero_copy_batch=True
                ).take_all()
            ]
            or [np.empty(0, dtype=np.uint64)]
        )
    )
    touched_ref = ray.put(touched)

    hist_cols = keys + ["valid_from", "valid_to", "is_current"] + list(attr_cols)

    def split(keep_untouched: bool):
        def fn(b: pa.Table) -> pa.Table:
            t = ray.get(touched_ref)
            h = _multi_key_hash(b, keys)
            hot = (
                np.isin(h, t)
                & b.column("is_current").to_numpy(zero_copy_only=False)
            )
            return b.select(hist_cols).filter(pa.array(~hot if keep_untouched else hot))

        return fn

    pass_through = history.map_batches(
        split(True), batch_format="pyarrow", zero_copy_batch=True
    )

    def to_events(b: pa.Table) -> pa.Table:
        cols = {k: b.column(k) for k in keys}
        cols[lsn_col] = b.column("valid_from")
        for a in attr_cols:
            cols[a] = b.column(a)
        if op_col is not None:
            # an open version is live state: re-form it as a non-delete
            cols[op_col] = pa.array(["I"] * b.num_rows, pa.string())
        cols["_hist"] = pa.array(np.ones(b.num_rows, dtype=bool))
        return pa.table(cols)

    ev_cols = keys + [lsn_col] + list(attr_cols) + ([op_col] if op_col else [])

    def tag_increment(b: pa.Table) -> pa.Table:
        b = b.select(ev_cols)
        return b.append_column("_hist", pa.array(np.zeros(b.num_rows, dtype=bool)))

    reopened = history.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    union = reopened.map_batches(
        to_events, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: b.select(ev_cols + ["_hist"]), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        increment.map_batches(tag_increment, batch_format="pyarrow", zero_copy_batch=True)
    )

    # history already passed through a hash shuffle, so its empty blocks
    # carry no schema; strip them before the next keyed shuffle (see
    # util.drop_empty_blocks). The union is touched-open rows + the
    # increment — the small side of the operation by construction.
    from ..util import drop_empty_blocks

    # flip the shuffle strategy BEFORE count() executes the plan — the
    # context is snapshotted at first execution, and the downstream
    # keyed groupby needs HASH_SHUFFLE
    union = _hash_shuffle(drop_empty_blocks(union))
    if union.count() == 0:
        # empty increment (and no touched keys): the history IS the result.
        # Ray's hash shuffle cannot aggregate a fully-empty dataset (every
        # partition comes back schema-less), so skip the recompute.
        return pass_through

    recomputed = scd2_history(
        union,
        keys,
        lsn_col,
        list(attr_cols) + ["_hist"],
        op_col=op_col,
        delete_op=delete_op,
        num_partitions=num_partitions,
    )

    def check_and_strip(b: pa.Table) -> pa.Table:
        if b.num_rows:
            # a history-sourced open version must be its key's OLDEST row
            # in the recompute — an increment LSN below it would rewrite
            # closed history. Blocks come straight from map_groups
            # (batch_size=None below keeps them whole), so every key's
            # rows are complete within one block and the check is sound.
            t = b.take(pc.sort_indices(
                b,
                sort_keys=[(k, "ascending") for k in keys] + [("valid_from", "ascending")],
            ))
            first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
            hist = t.column("_hist").to_numpy(zero_copy_only=False)
            if (hist & ~first).any():
                raise ValueError(
                    "scd2_apply_increment: increment contains an LSN at or "
                    "below a key's open valid_from — refusing to rewrite "
                    "closed history"
                )
        return b.drop_columns(["_hist"]).select(hist_cols)

    recomputed = recomputed.map_batches(
        check_and_strip, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # the OUTERMOST dataset's context governs the whole plan at execution
    # time — without this the union would run the inner groupby under the
    # default sort-shuffle strategy and fail
    return _hash_shuffle(pass_through.union(recomputed))


def path_per_key(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    *,
    limit_k: int = 8,
    sep: str = "->",
    path_col: str = "path",
    len_col: str = "path_len",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Ordered ``string_agg`` per key: the first ``limit_k`` values of
    each key in ``order_cols`` order, joined with ``sep`` — session /
    journey paths (``string_agg(v, sep ORDER BY ...)`` over
    ``row_number() <= k``).

    ONE keyed shuffle; the segment kernel filters to each key's first k
    rows, rebuilds segment offsets, and joins the strings with a single
    vectorized ``pc.binary_join`` over a ListArray view — no per-key
    python."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sort_keys = [(k, "ascending") for k in keys] + [(o, "ascending") for o in order_cols]

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: pa.array([], t.schema.field(k).type) for k in keys}
            cols[path_col] = pa.array([], pa.string())
            cols[len_col] = pa.array([], pa.int64())
            return pa.table(cols)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        pos = _segment_positions(first, gidx)
        t = t.filter(pa.array(pos < limit_k))
        first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        offsets = np.append(starts, t.num_rows).astype(np.int32)
        vals = t.column(value_col).combine_chunks().cast(pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        joined = pc.binary_join(lists, sep)
        cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
        cols[path_col] = joined
        cols[len_col] = pa.array(np.diff(offsets).astype(np.int64), pa.int64())
        return pa.table(cols)

    nparts = num_partitions or _num_partitions()
    return (
        _hash_shuffle(ds)
        .repartition(num_blocks=nparts, keys=keys)
        .map_batches(kernel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def rank_stats_per_key(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    value_col: str,
    id_col: str,
    *,
    ntile_k: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Ranking window functions per key over ``value_col`` DESC (ties
    broken by ``id_col`` ASC): ``row_number``, ``dense_rank`` (over the
    value alone), integer-exact ``percent_rank`` in micros
    (``(rn-1)*1e6/(n-1)`` rounded half-away — 0 for single-row keys) and
    ``ntile(ntile_k)``.

    ONE keyed shuffle; every rank derives from segment positions and
    cumulative new-value markers — pure numpy, no per-key python.
    ``value_col`` must be integer (quantize first)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sort_keys = [(k, "ascending") for k in keys] + [
        (value_col, "descending"),
        (id_col, "ascending"),
    ]

    def kernel(t: pa.Table) -> pa.Table:
        cols_empty = {
            **{k: pa.array([], t.schema.field(k).type) for k in keys},
            id_col: pa.array([], t.schema.field(id_col).type),
            value_col: pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "dense_rank": pa.array([], pa.int64()),
            "pct_rank_micros": pa.array([], pa.int64()),
            "ntile": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(cols_empty)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        seg_len = np.append(starts[1:], t.num_rows) - starts
        n = seg_len[gidx]  # segment size per row
        r0 = _segment_positions(first, gidx)  # 0-based row_number - 1
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        is_new = first.copy()
        is_new[1:] |= v[1:] != v[:-1]
        c = np.cumsum(is_new)
        dense = c - c[starts][gidx] + 1
        # integer-exact percent_rank micros: round-half-away of
        # (r0 * 1e6) / (n-1); 0 when n == 1
        d = np.maximum(n - 1, 1)
        pct = (r0 * 2_000_000 + d) // (2 * d)
        pct[n == 1] = 0
        # SQL-standard ntile: the first n % k buckets get one extra row
        size_small = n // ntile_k
        n_big = n % ntile_k
        size_big = size_small + 1
        in_big = r0 < n_big * size_big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big,
                r0 // np.maximum(size_big, 1),
                n_big + (r0 - n_big * size_big) // np.maximum(size_small, 1),
            )
        return pa.table(
            {
                **{k: t.column(k) for k in keys},
                id_col: t.column(id_col),
                value_col: t.column(value_col),
                "rn": pa.array(r0 + 1, pa.int64()),
                "dense_rank": pa.array(dense, pa.int64()),
                "pct_rank_micros": pa.array(pct, pa.int64()),
                "ntile": pa.array(tile + 1, pa.int64()),
            }
        )

    nparts = num_partitions or _num_partitions()
    return (
        _hash_shuffle(ds)
        .repartition(num_blocks=nparts, keys=keys)
        .map_batches(kernel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def column_lww_per_key(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Column-level last-writer-wins (the PARTIAL-UPDATE merge of Mongo
    oplog / Debezium patch semantics): per key, each value column
    resolves independently to its value on the latest row WHERE THAT
    COLUMN IS NON-NULL — a null means "field not touched by this
    change", not "set to null". Row-level LWW (merge_apply.lww_reduce)
    would lose earlier fields; this kernel keeps each field's latest
    write. Output: one row per key with ``{order_col}_last`` = the
    key's overall latest order value.

    ONE keyed shuffle; per partition a single sorted pass: for each
    column, the last valid row per segment is an unbuffered
    ``np.maximum.at`` scatter (order-independent by construction), no
    per-key python."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    value_cols = list(value_cols)

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        n = t.num_rows
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        n_groups = len(starts)
        out = {k: t.column(k).take(pa.array(starts)) for k in keys}
        for c in value_cols:
            col = t.column(c)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            rows = np.flatnonzero(valid)
            pick = np.full(n_groups, -1, dtype=np.int64)
            if len(rows):
                np.maximum.at(pick, gidx[rows], rows)  # max row index = latest
            mask = pick < 0
            idx = pa.array(np.where(mask, 0, pick), pa.int64())
            vals = col.take(idx)
            if mask.any():
                vals = pc.if_else(pa.array(~mask), vals, pa.scalar(None, col.type))
            out[c] = vals
        out[f"{order_col}_last"] = t.column(order_col).take(pa.array(ends - 1))
        return pa.table(out)

    return per_key_ordered(
        ds, keys, order_col, kernel, num_partitions=num_partitions
    )


def sessionize(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    ts_col: str,
    *,
    gap_us: int = 1_800_000_000,
    order_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Assign per-row session ids: within each key (ordered by ``ts_col``
    then ``order_cols``) a new session starts at the first row and
    whenever the gap to the previous row exceeds ``gap_us``
    (microseconds). Appends ``session_seq`` (1-based per key) and
    ``event_seq`` (1-based position within the session) — the row-level
    companion to the session-window AGGREGATE (temporal.session_window_agg).

    ONE keyed shuffle; session boundaries, ids and positions all derive
    from one lag + two cumsums over the sorted block — no per-key python."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sort_keys = [(k, "ascending") for k in keys] + [(ts_col, "ascending")] + [
        (o, "ascending") for o in order_cols
    ]

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("session_seq", pa.array([], pa.int64())).append_column(
                "event_seq", pa.array([], pa.int64())
            )
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        prev, _ = _lag_within(ts, first)
        new_session = first | (ts - prev > gap_us)
        c = np.cumsum(new_session)
        starts = np.flatnonzero(first)
        session_seq = c - c[starts][gidx] + 1
        # event_seq: position within the (key, session) run
        s2 = np.flatnonzero(new_session)
        event_seq = np.arange(t.num_rows) - s2[c - 1] + 1
        return t.append_column("session_seq", pa.array(session_seq, pa.int64())).append_column(
            "event_seq", pa.array(event_seq, pa.int64())
        )

    nparts = num_partitions or _num_partitions()
    return (
        _hash_shuffle(ds)
        .repartition(num_blocks=nparts, keys=keys)
        .map_batches(kernel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def state_diff(
    ds: ray.data.Dataset,
    key_cols: str | Sequence[str],
    order_col: str,
    cut1,
    cut2,
    state_cols: Sequence[str],
    deleted_col: str | None = None,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Change-data-feed between two points of a change stream — the
    table_changes() surface of lakehouse CDC: for each key, compare its
    last-writer-wins state at ``order < cut1`` against ``order < cut2``
    and emit one row per CHANGED key with op I (absent -> live),
    U (live -> live but a newer version), or D (live -> absent). A key
    is "absent" when it has no event yet or its latest event has
    ``deleted_col`` true (tombstone). Emits the new-state columns (the
    old state is recoverable by running the feed at cut1).

    ONE keyed shuffle; per group the two LWW states are resolved in the
    same sorted pass (segment-max of masked indices), so history is
    never re-read per cut.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def kernel(t: pa.Table, first: np.ndarray, gidx: np.ndarray) -> pa.Table:
        n = t.num_rows
        order = t.column(order_col).combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        idx = np.arange(n, dtype=np.int64)
        NONE = np.int64(-1)

        def last_leq(cut) -> np.ndarray:
            masked = np.where(order < cut, idx, NONE)
            return np.maximum.reduceat(masked, starts) if n else np.array([], np.int64)

        l1 = last_leq(cut1)
        l2 = last_leq(cut2)
        if deleted_col is not None:
            dead = t.column(deleted_col).combine_chunks().to_numpy(zero_copy_only=False)
            live1 = (l1 != NONE) & ~dead[np.maximum(l1, 0)]
            live2 = (l2 != NONE) & ~dead[np.maximum(l2, 0)]
        else:
            live1 = l1 != NONE
            live2 = l2 != NONE

        is_i = live2 & ~live1
        is_d = live1 & ~live2
        is_u = live1 & live2 & (l1 != l2)
        changed = is_i | is_d | is_u
        rows = np.where(live2, l2, np.where(l1 != NONE, l1, 0))[changed]
        op = np.where(is_i, "I", np.where(is_d, "D", "U"))[changed]

        picked = t.take(pa.array(rows))
        cols = {k: picked.column(k) for k in keys}
        cols["op"] = pa.array(op, pa.string())
        for c in state_cols:
            cols[c] = picked.column(c)
        # D rows carry the DELETED state's columns; mask them to null so
        # the feed only asserts the new state
        if is_d[changed].any():
            dmask = pa.array(op == "D")
            for c in state_cols:
                cols[c] = pc.if_else(dmask, pa.nulls(len(rows), picked.schema.field(c).type), cols[c])
        out_order = t.column(order_col).combine_chunks().take(pa.array(rows))
        cols["new_" + order_col] = pc.if_else(
            pa.array(op == "D"), pa.nulls(len(rows), out_order.type), out_order
        )
        return pa.table(cols)

    pre = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(order_col), pa.scalar(cut2))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return per_key_ordered(pre, keys, order_col, kernel, num_partitions=num_partitions)
