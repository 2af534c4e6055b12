"""Skyline kernel: vectorized mask vs brute-force dominance, plus the
distributed local-then-global decomposition."""

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.skyline import _skyline_mask, skyline_2d


def brute(x, y):
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (
                x[j] <= x[i]
                and y[j] >= y[i]
                and (x[j] < x[i] or y[j] > y[i])
            ):
                keep[i] = False
                break
    return keep


@pytest.mark.parametrize("seed", range(6))
def test_mask_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 200
    # small integer domains force plenty of ties and exact duplicates
    x = rng.integers(0, 12, n).astype(np.float64)
    y = rng.integers(0, 12, n).astype(np.int64)
    assert (_skyline_mask(x, y) == brute(x, y)).all()


def test_mask_edge_cases():
    assert _skyline_mask(np.array([]), np.array([])).tolist() == []
    assert _skyline_mask(np.array([1.0]), np.array([5])).tolist() == [True]
    # exact duplicate frontier points are all kept
    x = np.array([1.0, 1.0, 2.0])
    y = np.array([5, 5, 1])
    assert _skyline_mask(x, y).tolist() == [True, True, False]


def test_distributed_equals_single_block(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n = 5000
    x = rng.integers(0, 1000, n).astype(np.float64)
    y = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"id": np.arange(n), "x": x, "y": y})
    ds = ray.data.from_arrow(t).repartition(8)
    got = skyline_2d(ds, "x", "y").to_pandas().sort_values("id").reset_index(drop=True)
    want = t.filter(pa.array(_skyline_mask(x, y))).to_pandas().reset_index(drop=True)
    assert got.equals(want)
