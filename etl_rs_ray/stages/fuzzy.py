"""Fuzzy (edit-distance) self-join over a string column.

The scalable shape is blocking by symmetric-delete signatures (the
SymSpell idea): two strings at Levenshtein distance <= 1 necessarily
share a key in each other's {self} ∪ delete-one-character neighborhood
— a substitution deletes the differing position from both, an
insert/delete makes one string a member of the other's neighborhood.
So the join never compares all pairs: distinct values are counted
first (the heavy reduction — |rows| -> |domain|), signatures fan out
(len+1 per distinct value), candidate pairs form only inside shared-
signature buckets, and exact verification runs once per DISTINCT
candidate pair (O(len) each — candidate counts are bucket-bounded,
never |domain|^2). Generalizes the reference's attribute-equality pair
detection (transform_hdd_deduplication.rs:24-66 joins on exact
PCE/Email/Telephone matches) to approximate string equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len) — no DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _del1_signatures(s: str) -> list[str]:
    """{s} ∪ all one-character deletions, UNprefixed: a substitution
    pair shares the deletion of the differing position, an insert/delete
    pair shares the shorter string itself (its identity key == the
    longer one's deletion key). False collisions are cheap — exact
    verification filters them."""
    sigs = {s}
    for i in range(len(s)):
        sigs.add(s[:i] + s[i + 1 :])
    return sorted(sigs)


def _count_partial(b: pa.Table, name_col: str) -> pa.Table:
    g = pa.TableGroupBy(b.select([name_col]), name_col).aggregate([([], "count_all")])
    return pa.table({"name": g.column(name_col), "n": g.column("count_all")})


def _count_fold(t: pa.Table) -> pa.Table:
    g = pa.TableGroupBy(t, "name").aggregate([("n", "sum")])
    return pa.table({"name": g.column("name"), "n": g.column("n_sum")})


def _expand(t: pa.Table) -> pa.Table:
    sigs, names, ns = [], [], []
    for s, n in zip(t.column("name").to_pylist(), t.column("n").to_pylist()):
        for sig in _del1_signatures(s):
            sigs.append(sig)
            names.append(s)
            ns.append(n)
    return pa.table(
        {
            "sig": pa.array(sigs, pa.string()),
            "name": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def _bucket_pairs(t: pa.Table) -> pa.Table:
    """All (a < b) name pairs sharing a signature, with n_a * n_b."""
    empty = pa.table(
        {
            "name_a": pa.array([], pa.string()),
            "name_b": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    t = t.combine_chunks()
    idx = pc.sort_indices(t, sort_keys=[("sig", "ascending"), ("name", "ascending")])
    t = t.take(idx)
    sig = t.column("sig").combine_chunks()
    n = t.num_rows
    starts = np.flatnonzero(
        np.concatenate(
            ([True], pc.not_equal(sig.slice(1), sig.slice(0, n - 1)).to_numpy(zero_copy_only=False))
        )
    )
    ends = np.concatenate((starts[1:], [n]))
    ai, bi = [], []
    for s0, e0 in zip(starts, ends):
        m = e0 - s0
        if m < 2:
            continue
        iu, ju = np.triu_indices(m, k=1)
        ai.append(iu + s0)
        bi.append(ju + s0)
    if not ai:
        return empty
    ai = np.concatenate(ai)
    bi = np.concatenate(bi)
    name = t.column("name").combine_chunks()
    cnt = t.column("n").combine_chunks()
    a = name.take(pa.array(ai))
    b = name.take(pa.array(bi))
    prod = pc.multiply(cnt.take(pa.array(ai)), cnt.take(pa.array(bi)))
    out = pa.table({"name_a": a, "name_b": b, "n_pairs": prod}).filter(pc.not_equal(a, b))
    return out


def _distinct_verify(t: pa.Table) -> pa.Table:
    """Distinct candidate pairs (a pair can share several signatures;
    every copy carries the same product) then exact verification."""
    if t.num_rows == 0:
        return t
    g = pa.TableGroupBy(t, ["name_a", "name_b"]).aggregate([("n_pairs", "min")])
    A = g.column("name_a").to_pylist()
    B = g.column("name_b").to_pylist()
    keep = pa.array([_ed_le1(x, y) for x, y in zip(A, B)])
    g = g.filter(keep)
    return pa.table(
        {
            "name_a": g.column("name_a"),
            "name_b": g.column("name_b"),
            "n_pairs": g.column("n_pairs_min"),
        }
    )


def fuzzy_name_pairs(ds, name_col: str, gather: bool = True, nparts: int = 16):
    """All distinct-value pairs (a < b) at Levenshtein distance exactly 1
    with the number of row pairs they represent (count_a * count_b).

    ``gather=True`` folds the (bounded) distinct domain in one final
    block; ``gather=False`` is the unbounded-domain path — the same
    kernels under keyed hash repartitions (fold on name, pair on sig,
    distinct+verify on the pair key), so no stage ever sees more than
    its partition's share.
    """
    counts = ds.map_batches(
        lambda b: _count_partial(b, name_col), batch_format="pyarrow", zero_copy_batch=True
    )
    from ..util import drop_empty_blocks

    if gather:
        def one_shot(t: pa.Table) -> pa.Table:
            return _distinct_verify(_bucket_pairs(_expand(_count_fold(t))))

        return drop_empty_blocks(
            counts.repartition(1).map_batches(
                one_shot, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
        )

    from ray.data.context import ShuffleStrategy

    counts.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    folded = counts.repartition(num_blocks=nparts, keys=["name"]).map_batches(
        _count_fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    sigs = folded.map_batches(_expand, batch_format="pyarrow", zero_copy_batch=True)
    pairs = sigs.repartition(num_blocks=nparts, keys=["sig"]).map_batches(
        _bucket_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    out = pairs.repartition(num_blocks=nparts, keys=["name_a", "name_b"]).map_batches(
        _distinct_verify, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    out = drop_empty_blocks(out)
    # the OUTERMOST dataset's DataContext governs the whole plan at
    # execution — re-pin after the map_batches wrappers
    out.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return out
