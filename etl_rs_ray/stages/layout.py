"""Z-order (Morton) data layout for multi-dimensional file pruning.

At 100 TB, a table laid out by ONE key prunes range queries on that key
only; interleaving the bits of two bucketized dimensions (the
OPTIMIZE ZORDER of Delta/Iceberg) makes files rectangular in BOTH
dimensions, so a 2-D box predicate touches O(perimeter) partitions
instead of all of them. Everything is exact integer bit math, so a SQL
oracle reproduces the identical keys (pipelines/queries.py generates
the interleave expression the same way _minhash_sql mirrors bands).

- ``morton2d``: vectorized bit interleave (one shift/mask pass per bit,
  never per row).
- ``zorder_layout``: zkey + coarse partition id per row — feed the
  partition id to a partitioned write (sources/export.py or
  write_parquet(partition_cols=...)).
- ``box_partitions``: the exact set of partition ids a 2-D box query
  can touch — the pruning contract a reader uses to skip files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def morton2d(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Interleave the low ``bits`` of x (even positions) and y (odd
    positions) into a single uint64 z-key."""
    if bits < 1 or bits > 32:
        raise ValueError(bits)
    x = x.astype(np.uint64)
    y = y.astype(np.uint64)
    lim = np.uint64(1) << np.uint64(bits)
    if (x >= lim).any() or (y >= lim).any():
        raise ValueError(f"inputs must be < 2^{bits}")
    z = np.zeros(len(x), dtype=np.uint64)
    for i in range(bits):
        z |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z


def zorder_layout(ds, x_col: str, y_col: str, bits: int, part_bits: int,
                  zkey_col: str = "zkey", part_col: str = "zpart"):
    """Append the z-key and its coarse partition id (top ``part_bits``
    of the 2*bits-wide key) to every row. Both input columns must
    already be bucketized to [0, 2^bits). No shuffle — the partition id
    is what a partitioned writer clusters on."""
    if not 0 < part_bits <= 2 * bits:
        raise ValueError(part_bits)
    shift = np.uint64(2 * bits - part_bits)

    def add(b: pa.Table) -> pa.Table:
        x = b.column(x_col).combine_chunks().to_numpy(zero_copy_only=False)
        y = b.column(y_col).combine_chunks().to_numpy(zero_copy_only=False)
        z = morton2d(x, y, bits)
        b = b.append_column(zkey_col, pa.array(z.astype(np.int64)))
        return b.append_column(part_col, pa.array((z >> shift).astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def box_partitions(bits: int, part_bits: int,
                   x_range: tuple[int, int], y_range: tuple[int, int]) -> np.ndarray:
    """Exact sorted set of partition ids whose z-range intersects the
    inclusive box [x0,x1] x [y0,y1] — enumerate the box's cells
    (O(area), cells are cheap integers) and project to partition ids.
    A reader that opens only these partitions sees every box row."""
    x0, x1 = x_range
    y0, y1 = y_range
    xs = np.arange(x0, x1 + 1, dtype=np.uint64)
    ys = np.arange(y0, y1 + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    z = morton2d(gx.ravel(), gy.ravel(), bits)
    return np.unique(z >> np.uint64(2 * bits - part_bits)).astype(np.int64)
