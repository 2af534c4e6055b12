"""Order-insensitive table content digests (anti-entropy).

Two replicas of a 100 TB table cannot compare rows; they exchange one
XOR-of-row-hashes digest per group/partition and ship rows only for the
groups whose digests diverge (the Merkle-exchange idea collapsed to one
level). XOR is commutative, associative and overflow-free, so per-batch
partials fold with the same operation in any order — a digest is one
map pass plus a tiny fold, no shuffle of row data.

``hash="md5"`` mirrors DuckDB ``bit_xor(md5_number_lower(...))`` for the
SQL oracle (per-row Python, oracle tier); ``hash="fast"`` is the
vectorized stable_hash64 production path — same divergence-detection
power, no SQL mirror.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def xor_by_group(group, h: np.ndarray, weights: np.ndarray | None = None):
    """(keys, xor-of-h, counts-or-weight-sums) per group in ONE stable
    sort + reduceat pass. Null group values form one null-keyed group
    (SQL GROUP BY semantics)."""
    g = group.combine_chunks() if isinstance(group, pa.ChunkedArray) else group
    if len(g) == 0:
        return (
            pa.array([], g.type),
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.int64),
        )
    enc = g.dictionary_encode()
    nd = len(enc.dictionary)
    idx = enc.indices.fill_null(nd).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    sh = h[order]
    starts = np.flatnonzero(np.concatenate(([True], si[1:] != si[:-1])))
    xors = np.bitwise_xor.reduceat(sh, starts)
    if weights is None:
        agg = np.diff(np.append(starts, len(si))).astype(np.int64)
    else:
        agg = np.add.reduceat(weights[order], starts).astype(np.int64)
    keys = pa.concat_arrays([enc.dictionary, pa.array([None], enc.dictionary.type)]).take(
        pa.array(si[starts])
    )
    return keys, xors, agg


def _row_keys(b: pa.Table, cols: list[str]) -> pa.Array:
    parts = [pc.cast(b.column(c), pa.string()) for c in cols]
    return pc.binary_join_element_wise(*parts, "|")


def row_hashes(b: pa.Table, cols: list[str], hash: str = "fast") -> np.ndarray:
    """Canonical per-row uint64 hashes over ``cols`` — THE row encoding
    every digest consumer must share (a divergence here silently breaks
    the very primitive that detects divergence). Null row keys hash to 0
    (the XOR identity, mirroring SQL bit_xor skipping md5(NULL))."""
    key = _row_keys(b, cols)
    k = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
    if hash == "fast":
        from ..sources.event_log import stable_hash64

        h = stable_hash64(pc.fill_null(k, "")).astype(np.uint64)
        if k.null_count:
            h[np.asarray(pc.is_null(k).to_numpy(zero_copy_only=False))] = 0
        return h
    from .dedup import md5_u64

    return np.array(
        [0 if x is None else md5_u64(x) for x in k.to_pylist()], dtype=np.uint64
    )


def table_digest(ds, group_col: str, cols: list[str], hash: str = "fast"):
    """Per-group (digest, n) over the canonical encoding of ``cols``.
    A single differing row flips its group's digest. Null row keys XOR
    as identity (mirrors bit_xor skipping md5(NULL)); null group values
    digest under a null key."""

    def partial(b: pa.Table) -> pa.Table:
        h = row_hashes(b, list(cols), hash=hash)
        keys, xors, counts = xor_by_group(b.column(group_col), h)
        return pa.table(
            {
                group_col: keys,
                "h": pa.array(xors.view(np.int64)),
                "n": pa.array(counts),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        n = t.column("n").to_numpy(zero_copy_only=False)
        keys, xors, counts = xor_by_group(t.column(group_col), h, weights=n)
        return pa.table(
            {
                group_col: keys,
                "digest": pa.array([str(x) for x in xors], pa.string()),
                "n": pa.array(counts),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
