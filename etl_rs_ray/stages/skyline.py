"""Distributed 2-D skyline (Pareto frontier) over a Dataset.

A row survives when no other row is at-least-as-good on both criteria
and strictly better on one (minimize ``x``, maximize ``y``). The
distributed shape exploits the classic decomposition: the skyline of a
union equals the skyline of the union of per-partition skylines, so one
vectorized local pass per block reduces each block to its (tiny)
frontier and a single final block computes the exact global answer —
no shuffle at all, and the gathered candidate set is bounded by
(#blocks x frontier size), not the input.

Dominance generalizes the reference's subset-elimination idea
(transform_hdd_deduplication.rs:164-200 drops a cluster whose Ids set
is contained in another's) from set containment to numeric dominance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto frontier (minimize x, maximize y).

    O(n log n): sort by (x asc, y desc); a row is dominated iff some row
    with strictly smaller x has y >= its own (strict-in-x dominance), or
    a row with equal x has strictly larger y. Duplicate (x, y) points do
    not dominate each other and are all kept when the point is on the
    frontier — matching the SQL NOT EXISTS definition.
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, x))
    xs, ys = x[order], y[order]
    grp_start = np.empty(n, dtype=bool)
    grp_start[0] = True
    grp_start[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(grp_start) - 1
    first = np.flatnonzero(grp_start)
    # within an equal-x group (sorted y desc) the group max is its first y
    gmax = ys[first][gidx]
    # best y among strictly-smaller x = running max up to the previous
    # group's end; -inf for the cheapest group
    cummax = np.maximum.accumulate(ys.astype(np.float64))
    prev_best = np.concatenate(([-np.inf], cummax[first[1:] - 1]))[gidx]
    keep_sorted = (ys == gmax) & (ys.astype(np.float64) > prev_best)
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def _local(batch: pa.Table, x_col: str, y_col: str) -> pa.Table:
    x = batch.column(x_col).combine_chunks().to_numpy(zero_copy_only=False)
    y = batch.column(y_col).combine_chunks().to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(_skyline_mask(x, y)))


def skyline_2d(ds, x_col: str, y_col: str):
    """Exact global skyline: per-block frontier reduction, then one
    final exact pass over the gathered candidates. Both passes run the
    same kernel; the final block sees only per-block survivors."""

    def local(b: pa.Table) -> pa.Table:
        return _local(b, x_col, y_col)

    cand = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return cand.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
