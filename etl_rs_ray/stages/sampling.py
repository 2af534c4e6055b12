"""Deterministic sampling for training-data mixing.

Random sampling at 100 TB must be REPRODUCIBLE (the same seed selects
the same rows on every re-run, on any cluster layout) and must not
shuffle: each row decides its own fate from a hash of (seed, id). The
hash is DuckDB's md5_number_lower, so a SQL oracle can recompute the
exact selected set — sampling is hash-checkable, not just
statistically plausible.

- ``deterministic_sample``: keep a fraction of rows.
- ``weighted_mixture``: per-source fractions (the data-mixing recipe:
  "30% of source A, 100% of source B"), one pass, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_U64 = 1 << 64


def _select_mask(ids, seed: str, frac: float, hash: str = "md5") -> pa.Array:
    """Row kept iff hash(seed || ':' || id) < frac * 2^64.

    ``hash="md5"`` matches DuckDB md5_number_lower (SQL-checkable, but a
    per-row Python call); ``hash="fast"`` uses the engine's vectorized
    stable 64-bit hash — same statistical/nesting/layout-independence
    properties, ~100x faster, for production sampling where a SQL oracle
    isn't needed."""
    threshold = int(frac * _U64)
    keys = pc.binary_join_element_wise(
        pa.array([seed] * len(ids), pa.string()),
        pc.cast(ids, pa.string()),
        ":",
    )
    if hash == "fast":
        import numpy as np

        from ..sources.event_log import stable_hash64

        k = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        return pa.array(stable_hash64(k) < np.uint64(min(threshold, _U64 - 1)))
    from .dedup import md5_u64

    vals = [md5_u64(k) < threshold for k in keys.to_pylist()]
    return pa.array(vals, pa.bool_())


def deterministic_sample(ds, id_col: str, frac: float, seed: str = "s0", hash: str = "md5"):
    """Keep ~frac of rows, selected by hash of (seed, id): reproducible
    across runs and cluster layouts, zero shuffle. hash="md5" is
    SQL-mirrorable; hash="fast" is the vectorized scale path."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(frac)

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(_select_mask(b.column(id_col).combine_chunks(), seed, frac, hash))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def weighted_mixture(ds, source_col: str, id_col: str, fractions: dict[str, float],
                     seed: str = "s0", default_frac: float = 0.0, hash: str = "md5"):
    """Per-source sampling fractions in ONE pass: row kept iff its hash
    clears its source's threshold. Sources absent from ``fractions`` get
    ``default_frac``. hash="md5" (default — kept so existing recipes keep
    selecting the SAME rows across releases; the whole point of the
    function is reproducibility) mirrors DuckDB md5_number_lower;
    hash="fast" is the fully vectorized scale path — one stable_hash64
    over the keys, per-row thresholds via a dictionary index_in + take —
    opt in for production mixing where a SQL oracle isn't needed."""
    for f in fractions.values():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f)

    def flt(b: pa.Table) -> pa.Table:
        import numpy as np

        keys = pc.binary_join_element_wise(
            pa.array([seed] * b.num_rows, pa.string()),
            pc.cast(b.column(id_col).combine_chunks(), pa.string()),
            ":",
        )
        # per-row threshold: map source -> index into a small threshold
        # vector (null index = source not in the recipe -> default_frac)
        known = list(fractions)
        thresholds = np.array(
            [min(int(fractions[s] * _U64), _U64 - 1) for s in known]
            + [min(int(default_frac * _U64), _U64 - 1)],
            dtype=np.uint64,
        )
        idx = pc.index_in(b.column(source_col), pa.array(known, pa.string()))
        idx_np = idx.combine_chunks().fill_null(len(known)).to_numpy(zero_copy_only=False)
        row_thresh = thresholds[idx_np]
        if hash == "fast":
            from ..sources.event_log import stable_hash64

            hashes = stable_hash64(keys)
        else:
            from .dedup import md5_u64

            hashes = np.array([md5_u64(k) % _U64 for k in keys.to_pylist()], dtype=np.uint64)
        return b.filter(pa.array(hashes < row_thresh))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def assign_split(ds, id_col: str, splits: "dict[str, float]", seed: str = "s0",
                 hash: str = "fast", split_col: str = "split"):
    """Deterministic train/val/test assignment: each row's hash of
    (seed, id) falls into one cumulative-fraction interval, so the split
    is reproducible across runs and cluster layouts, disjoint, total,
    and zero-shuffle (one map pass appends ``split_col``).

    ``splits`` maps name -> fraction; fractions must sum to 1 (±1e-9).
    Interval order follows the dict's insertion order, so
    {"train": .9, "val": .05, "test": .05} puts train first — and
    shrinking a later split never reassigns rows between earlier ones
    (threshold sampling's nesting property). hash="md5" mirrors DuckDB
    md5_number_lower for SQL oracles; hash="fast" is the vectorized
    production path."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = list(splits)
    cuts = []
    acc = 0.0
    for name in names:
        acc += splits[name]
        cuts.append(min(int(acc * _U64), _U64 - 1))
    cuts[-1] = _U64 - 1  # float rounding must not leave a row unassigned

    def tag(b: pa.Table) -> pa.Table:
        import numpy as np

        keys = pc.binary_join_element_wise(
            pa.array([seed] * b.num_rows, pa.string()),
            pc.cast(b.column(id_col).combine_chunks(), pa.string()),
            ":",
        )
        if hash == "fast":
            from ..sources.event_log import stable_hash64

            hashes = stable_hash64(keys)
        else:
            from .dedup import md5_u64

            hashes = np.array([md5_u64(k) % _U64 for k in keys.to_pylist()], dtype=np.uint64)
        idx = np.searchsorted(np.array(cuts, dtype=np.uint64), hashes, side="left")
        labels = np.array(names, dtype=object)[idx]
        return b.append_column(split_col, pa.array(labels.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample_n(ds, group_col: str, id_col: str, n_per_group: int,
                        seed: str = "s0", num_partitions: int = 8):
    """EXACTLY min(n, group size) rows per group, selected by hash rank:
    within each group keep the n rows with the smallest
    md5(seed || ':' || id) — deterministic, layout-independent, and
    SQL-mirrorable as row_number() OVER (PARTITION BY g ORDER BY
    md5_number_lower(...), id) <= n. One hash-shuffle groupby; per-group
    work is one sort + head. The balanced-subset primitive fraction
    sampling can't give (deterministic_sample only hits fractions)."""
    import pyarrow.compute as _pc

    from .dedup import md5_u64, _group_partitions, _hash_shuffle

    def pick(t: pa.Table) -> pa.Table:
        # whole-block kernel over MANY groups: hash-rank every row, sort by
        # (group, _h, id), keep the first n rows of each group segment
        import numpy as np

        if t.num_rows == 0:
            return t
        ids = _pc.cast(t.column(id_col).combine_chunks(), pa.string()).to_pylist()
        h = np.array([md5_u64(f"{seed}:{i}") for i in ids], dtype=np.uint64)
        t = t.append_column("_h", pa.array(h))
        idx = _pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending"), ("_h", "ascending"), (id_col, "ascending")],
        )
        t = t.take(idx)
        from .merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, (group_col,)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        gidx = np.cumsum(first) - 1
        pos = np.arange(t.num_rows) - starts[gidx]
        return t.filter(pa.array(pos < n_per_group)).drop_columns(["_h"])

    return (
        _hash_shuffle(ds)
        .repartition(
            num_blocks=min(num_partitions, _group_partitions()), keys=[group_col]
        )
        .map_batches(pick, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def priority_sample(ds, id_col: str, weight_col: str, n: int, seed: str = "s0",
                    hash: str = "md5", key_col: str = "priority_key"):
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup, JACM '07): each row gets an integer
    priority key = (hash >> 1) // weight and the n smallest keys win —
    P(selected) is ~proportional to weight for n << rows. Everything
    stays in exact integer arithmetic (no ln/pow), so a SQL oracle
    recomputes the IDENTICAL key and the IDENTICAL selected set: no
    libm-ulp risk at the rank-n boundary. Distributed shape: each block
    reduces to its local n smallest keys, one final block picks the
    global n — no shuffle, driver-free.

    Weights must be positive integers. hash="md5" mirrors DuckDB
    md5_number_lower (per-row, oracle tier); hash="fast" is the
    vectorized stable_hash64 scale path.
    """
    import numpy as np

    if n <= 0:
        raise ValueError(n)

    def keyed(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array([seed] * b.num_rows, pa.string()),
            pc.cast(b.column(id_col).combine_chunks(), pa.string()),
            ":",
        )
        if hash == "fast":
            from ..sources.event_log import stable_hash64

            h = stable_hash64(keys)
        else:
            from .dedup import md5_u64

            h = np.array([md5_u64(k) for k in keys.to_pylist()], dtype=np.uint64)
        wc = b.column(weight_col)
        if wc.null_count:
            # NaN/null slips through the <=0 check and .astype(uint64)
            # on NaN is undefined — a silent bogus key, not an error
            raise ValueError("weights must be non-null")
        w = wc.combine_chunks().to_numpy(zero_copy_only=False)
        if np.issubdtype(w.dtype, np.floating) and np.isnan(w).any():
            raise ValueError("weights must be non-null")
        if (w <= 0).any():
            raise ValueError("weights must be positive")
        key = ((h >> np.uint64(1)) // w.astype(np.uint64)).astype(np.int64)
        return b.append_column(key_col, pa.array(key))

    def topn(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (id_col, "ascending")]
        )
        return t.take(idx[:n])

    cand = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        topn, batch_format="pyarrow", zero_copy_batch=True
    )
    return cand.repartition(1).map_batches(
        topn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
