"""Z-order layout: morton kernel, and the pruning contract — a reader
opening only box_partitions() files sees exactly the box rows."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_rs_ray.stages.layout import box_partitions, morton2d, zorder_layout


def test_morton_roundtrip_bits():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, 1000).astype(np.uint64)
    y = rng.integers(0, 256, 1000).astype(np.uint64)
    z = morton2d(x, y, 8)
    # de-interleave and compare
    xd = np.zeros_like(x)
    yd = np.zeros_like(y)
    for i in range(8):
        xd |= ((z >> np.uint64(2 * i)) & np.uint64(1)) << np.uint64(i)
        yd |= ((z >> np.uint64(2 * i + 1)) & np.uint64(1)) << np.uint64(i)
    assert (xd == x).all() and (yd == y).all()
    # locality: adjacent cells share high bits more often than random pairs
    assert morton2d(np.array([0]), np.array([0]), 8)[0] == 0


def test_morton_rejects_out_of_range():
    with pytest.raises(ValueError):
        morton2d(np.array([256], np.uint64), np.array([0], np.uint64), 8)


def test_box_partition_pruning_end_to_end(ray_session, tmp_path):
    """Write a z-ordered table partitioned by zpart; a 2-D box query
    that reads ONLY box_partitions() must (a) skip most partitions and
    (b) return exactly the rows the box predicate selects."""
    import ray.data

    rng = np.random.default_rng(42)
    n = 20_000
    t = pa.table(
        {
            "id": np.arange(n),
            "xb": rng.integers(0, 256, n),
            "yb": rng.integers(0, 256, n),
        }
    )
    ds = zorder_layout(ray.data.from_arrow(t).repartition(4), "xb", "yb", bits=8, part_bits=6)
    out = str(tmp_path / "zt")
    ds.write_parquet(out, partition_cols=["zpart"])

    box_x, box_y = (40, 80), (100, 140)
    cand = set(box_partitions(8, 6, box_x, box_y).tolist())
    all_parts = {int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("zpart=")}
    assert cand < all_parts and len(cand) <= len(all_parts) // 2, (len(cand), len(all_parts))

    got = []
    for p in sorted(cand):
        path = os.path.join(out, f"zpart={p}")
        if not os.path.isdir(path):
            continue
        tt = pq.read_table(path, columns=["id", "xb", "yb"])
        m = (
            (np.array(tt["xb"]) >= box_x[0]) & (np.array(tt["xb"]) <= box_x[1])
            & (np.array(tt["yb"]) >= box_y[0]) & (np.array(tt["yb"]) <= box_y[1])
        )
        got.extend(np.array(tt["id"])[m].tolist())

    m = (
        (np.array(t["xb"]) >= box_x[0]) & (np.array(t["xb"]) <= box_x[1])
        & (np.array(t["yb"]) >= box_y[0]) & (np.array(t["yb"]) <= box_y[1])
    )
    want = np.array(t["id"])[m].tolist()
    assert sorted(got) == sorted(want)
    assert len(want) > 0
