"""Distributed connected components vs a reference union-find."""

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.cc import connected_components, removal_set_distributed
from etl_rs_ray.stages.dedup import _UnionFind, _removal_set


def _uf_roots(edges):
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],
        [(5, 1), (1, 9), (9, 5), (2, 7)],  # cycle + pair
        [(i, i + 1) for i in range(0, 20, 2)],  # disjoint pairs
        [(i, i + 1) for i in range(7)],  # one path (multi-round diameter test)
    ],
)
def test_cc_matches_union_find(edges):
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = {r["node"]: r["root"] for r in connected_components(t, num_partitions=4).take_all()}
    want = _uf_roots(edges)
    assert got == want


def test_cc_random_graph():
    rng = np.random.default_rng(4)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2)) if a != b]
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = {r["node"]: r["root"] for r in connected_components(t, num_partitions=4).take_all()}
    want = _uf_roots(edges)
    assert got == want


def test_removal_set_matches_driver_union_find():
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    assert removal_set_distributed(t, num_partitions=3) == _removal_set(edges)
