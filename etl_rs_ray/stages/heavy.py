"""Heavy hitters (top-k frequent keys) over an unbounded key domain —
EXACT output from two streaming passes, no shuffle.

Pass 1 — candidates: each batch folds to its exact per-key counts
(value_counts, vectorized), trims them to a batch-local Misra-Gries
summary of m counters (so at most m rows per block reach the driver),
and the driver merges the summaries. Every decrement — batch-local and
driver-side — accumulates into an undercount bound: any key absent from
the final summary has true count <= that bound.

Pass 2 — exact: the candidate set (m keys) broadcasts into a filtered
count pass; the emitted top-k counts are exact. If the k-th candidate's
exact count does not clear the undercount bound the top-k CANNOT be
certified (near-uniform keys) and the stage escalates to an exact
one-shuffle groupby top-k instead of answering wrong. Null keys are
excluded from the domain by definition.

At 100 TB this replaces a full groupby shuffle of every key with
2 map-only passes + O(m) driver state. Also useful operationally: run
pass 1 alone to DETECT hot keys before choosing a salting strategy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mg_trim(summary: dict, m: int) -> int:
    """Trim a counter dict to at most m entries (subtract the (m+1)-th
    largest weight from all, drop non-positive — the standard mergeable
    Misra-Gries step). Returns the amount subtracted, which bounds the
    undercount this trim introduced."""
    if len(summary) <= m:
        return 0
    kth = sorted(summary.values(), reverse=True)[m]
    for k in [k for k, v in summary.items() if v - kth <= 0]:
        del summary[k]
    for k in summary:
        summary[k] -= kth
    return kth


def _mg_merge(summary: dict, keys, counts, m: int) -> int:
    """Merge (key, count) pairs into a Misra-Gries summary of at most m
    counters. Returns the amount subtracted from every counter this
    merge: the cumulative sum over merges AND over the per-batch trims
    that produced the inputs bounds any key's undercount, so it also
    bounds the true count of any key ABSENT from the summary."""
    for k, c in zip(keys, counts):
        summary[k] = summary.get(k, 0) + int(c)
    return _mg_trim(summary, m)


def heavy_hitters(ds, col: str, k: int = 10, m: int | None = None) -> pa.Table:
    """Exact top-k keys by count. ``m`` (candidate budget, default 20*k)
    controls the MG guarantee: exactness of the final top-k requires the
    true top-k keys to each have frequency > N/m (holds for any
    realistically skewed distribution at m=20k; raise m for near-uniform
    data). Output: (key, n) sorted by n desc, key asc."""
    m = m or 20 * k
    # NULL keys are EXCLUDED from the top-k domain (documented semantics:
    # a null is "no key", not a key) — counting them under the accounting
    # row's null sentinel would corrupt the exactness certificate instead.

    def batch_counts(b: pa.Table) -> pa.Table:
        # exact per-batch counts, then a batch-local MG trim so AT MOST m
        # rows per block reach the driver (a 100-TB block can hold millions
        # of distinct keys — shipping them all was the old behavior). The
        # trim's decrement rides along in `_dec` (first row): it is part of
        # the global undercount bound, keeping the certificate exact.
        vc = b.column(col).drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        local = dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))
        dec = _mg_trim(local, m)
        keys = list(local)
        if not keys and dec:
            # the trim can evict EVERY counter (near-uniform batch) — the
            # decrement must still reach the driver or the undercount
            # bound silently shrinks: carry it on a null-key row
            return pa.table(
                {
                    "key": pa.array([None], b.column(col).type),
                    "n": pa.array([0], pa.int64()),
                    "_dec": pa.array([dec], pa.int64()),
                }
            )
        return pa.table(
            {
                "key": pa.array(keys, b.column(col).type),
                "n": pa.array([local[k] for k in keys], pa.int64()),
                "_dec": pa.array([dec] + [0] * (len(keys) - 1), pa.int64())
                if keys
                else pa.array([], pa.int64()),
            }
        )

    partials = ds.map_batches(batch_counts, batch_format="pyarrow", zero_copy_batch=True)
    summary: dict = {}
    err_bound = 0
    for r in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        err_bound += sum(r.column("_dec").to_pylist())
        pairs = [
            (kk, nn)
            for kk, nn in zip(r.column("key").to_pylist(), r.column("n").to_pylist())
            if kk is not None  # null key = accounting-only row
        ]
        err_bound += _mg_merge(summary, [p[0] for p in pairs], [p[1] for p in pairs], m)
    candidates = list(summary)
    if not candidates:
        if err_bound > 0:
            # near-uniform data can evict EVERY counter (all weights fall
            # below the k-th decrement) — an empty summary with a nonzero
            # decrement history means "nothing certified", not "no keys"
            return _exact_topk_shuffle(ds, col, k)
        return pa.table({"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    import ray

    cand_ref = ray.put(pa.array(candidates))

    def count_candidates(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        colv = b.column(col)
        hit = b.filter(pc.is_in(colv, value_set=cand))
        vc = hit.column(col).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"key": vc.field("values"), "n": vc.field("counts")})

    exact: dict = {}
    for r in ds.map_batches(
        count_candidates, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for kk, nn in zip(r.column("key").to_pylist(), r.column("n").to_pylist()):
            exact[kk] = exact.get(kk, 0) + int(nn)

    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    # Guarantee check: every key ABSENT from the summary has true count
    # <= err_bound (it was decremented to zero), so the exact top-k is
    # provably inside the candidate set iff the k-th candidate count
    # clears err_bound. Near-uniform data (nothing crosses N/m) fails
    # this — silently returning a wrong top-k is not acceptable, so
    # escalate to an exact one-shuffle groupby top-k instead.
    # (<= not <: an absent key with count == err_bound could still tie
    # into the k-th slot and win on key order)
    if err_bound > 0 and (len(top) < k or top[-1][1] <= err_bound):
        return _exact_topk_shuffle(ds, col, k)
    key_type = ds.schema().types[ds.schema().names.index(col)]
    return pa.table(
        {
            "key": pa.array([t[0] for t in top], key_type),
            "n": pa.array([t[1] for t in top], pa.int64()),
        }
    )


def _exact_topk_shuffle(ds, col: str, k: int) -> pa.Table:
    """Exact fallback when the MG guarantee cannot hold (near-uniform
    keys): per-batch value_counts partials, ONE hash-shuffle groupby sum,
    per-group partial top-k, tiny driver merge. O(distinct keys) moves —
    the price of exactness on data where no sketch can certify."""
    from ray.data.aggregate import Sum

    from .dedup import _group_partitions, _hash_shuffle

    def batch_counts(b: pa.Table) -> pa.Table:
        vc = b.column(col).drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"key": vc.field("values"), "n": vc.field("counts")})

    partials = ds.map_batches(batch_counts, batch_format="pyarrow", zero_copy_batch=True)
    totals = (
        _hash_shuffle(partials)
        .groupby("key", num_partitions=_group_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )

    def group_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("n", "descending"), ("key", "ascending")])
        return b.take(idx[: min(k, b.num_rows)])

    cand = totals.map_batches(group_topk, batch_format="pyarrow", zero_copy_batch=True).take_all()
    top = sorted(((r["key"], int(r["n"])) for r in cand), key=lambda kv: (-kv[1], kv[0]))[:k]
    key_type = ds.schema().types[ds.schema().names.index(col)]
    return pa.table(
        {
            "key": pa.array([t[0] for t in top], key_type),
            "n": pa.array([t[1] for t in top], pa.int64()),
        }
    )
