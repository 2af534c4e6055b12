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
                     seed: str = "s0", default_frac: float = 0.0):
    """Per-source sampling fractions in ONE pass: row kept iff its hash
    clears its source's threshold. Sources absent from ``fractions`` get
    ``default_frac``."""
    for f in fractions.values():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f)

    def flt(b: pa.Table) -> pa.Table:
        import numpy as np

        from .dedup import md5_u64

        srcs = b.column(source_col).to_pylist()
        ids = pc.cast(b.column(id_col), pa.string()).to_pylist()
        keep = [
            md5_u64(f"{seed}:{i}") < int(fractions.get(s, default_frac) * _U64)
            for s, i in zip(srcs, ids)
        ]
        return b.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
