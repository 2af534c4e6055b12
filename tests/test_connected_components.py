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


def test_distributed_cc_dedup_no_driver_edge_collection(monkeypatch):
    """minhash_lsh_dedup(distributed_cc=True) must not collect edges or
    the removal set to the driver: the whole pipeline builds (and CC
    iterates) with Dataset.take_all forbidden; only the final consumer
    collects."""
    import ray.data

    from etl_rs_ray.stages.dedup import minhash_lsh_dedup

    rows = [
        {"doc_id": i, "text": f"totally unique document number {i} with its own words {i*7}"}
        for i in range(20)
    ]
    # near-dup cluster 100,101,102 (chain) + exact pair 200/201
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows += [
        {"doc_id": 100, "text": base},
        {"doc_id": 101, "text": base + " extra"},
        {"doc_id": 102, "text": base + " extra words"},
        {"doc_id": 200, "text": "copy copy copy of the same interesting text about shuffles"},
        {"doc_id": 201, "text": "copy copy copy of the same interesting text about shuffles"},
    ]
    ds = ray.data.from_items(rows)

    calls = {"n": 0}
    orig = ray.data.Dataset.take_all

    def counting_take_all(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "take_all", counting_take_all)
    out_ds = minhash_lsh_dedup(ds, "text", "doc_id", distributed_cc=True)
    assert calls["n"] == 0, "distributed_cc path collected a dataset to the driver"
    monkeypatch.setattr(ray.data.Dataset, "take_all", orig)

    got = {r["doc_id"] for r in out_ds.take_all()}
    want = {r["doc_id"] for r in minhash_lsh_dedup(ds, "text", "doc_id").take_all()}
    assert got == want  # matches the driver union-find result
    assert 201 not in got and 200 in got
