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


# --- large-star / small-star -------------------------------------------------


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],
        [(5, 1), (1, 9), (9, 5), (2, 7)],
        [(i, i + 1) for i in range(0, 20, 2)],
        [(i, i + 1) for i in range(7)],
        [(0, 1), (0, 2), (1, 2), (3, 4)],  # triangle + pair (dup-edge paths)
    ],
)
def test_star_matches_union_find(edges):
    from etl_rs_ray.stages.cc import connected_components_star

    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = {r["node"]: r["root"] for r in connected_components_star(t, num_partitions=4).take_all()}
    assert got == _uf_roots(edges)


def test_star_long_chain_beats_label_round_budget():
    """A 32-node path has diameter 31: min-label cannot converge in its
    default 12 rounds (labels walk one hop per round), but the star
    algorithm contracts in O(log d) rounds and still resolves to root 0."""
    from etl_rs_ray.stages.cc import connected_components_star

    edges = [(i, i + 1) for i in range(31)]
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = {r["node"]: r["root"] for r in connected_components_star(t, num_partitions=4, max_rounds=10).take_all()}
    assert got == {i: 0 for i in range(32)}
    # label propagation with the same graph does NOT finish in 12 rounds
    partial = {r["node"]: r["root"] for r in connected_components(t, num_partitions=4, max_rounds=3).take_all()}
    assert partial != got


def test_star_random_graph_and_removal():
    from etl_rs_ray.stages.cc import removal_set_distributed as rsd

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 50, (70, 2)) if a != b]
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    want = {n for n, r in _uf_roots(edges).items() if n != r}
    assert rsd(t, 4, algorithm="star") == want
    assert rsd(t, 4, algorithm="label") == want
