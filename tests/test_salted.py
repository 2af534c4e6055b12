"""Skew-safe salted aggregation (stages/salted.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.stages.salted import salted_sum_count


def _skewed(n=20_000, hot_frac=0.6, seed=4):
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    keys = np.concatenate(
        [np.full(n_hot, 7, dtype=np.int64), rng.integers(100, 200, n - n_hot)]
    )
    rng.shuffle(keys)
    vals = rng.uniform(0, 10, n)
    return pa.table({"k": pa.array(keys), "v": pa.array(vals)})


def _oracle(t):
    import collections

    sums: dict = collections.defaultdict(float)
    counts: dict = collections.defaultdict(int)
    for k, v in zip(t.column("k").to_pylist(), t.column("v").to_pylist()):
        sums[k] += v
        counts[k] += 1
    return sums, counts


def test_salted_agg_matches_plain_with_explicit_hot_keys():
    t = _skewed()
    sums, counts = _oracle(t)
    out = salted_sum_count(
        ray.data.from_arrow(t).repartition(6), "k", "v",
        hot_keys=[7], fanout=4, num_partitions=4,
    ).take_all()
    assert len(out) == len(sums)
    for r in out:
        assert r["n"] == counts[r["k"]]
        assert abs(r["sum_value"] - sums[r["k"]]) < 1e-6


def test_salted_agg_auto_detect():
    t = _skewed()
    sums, counts = _oracle(t)
    out = salted_sum_count(
        ray.data.from_arrow(t).repartition(6), "k", "v",
        auto_detect=3, fanout=4, num_partitions=4,
    ).take_all()
    assert len(out) == len(sums)
    got = {r["k"]: (r["n"], r["sum_value"]) for r in out}
    assert got[7][0] == counts[7]
    assert abs(got[7][1] - sums[7]) < 1e-6


def test_salted_agg_no_hot_keys_is_plain_groupby():
    t = _skewed(n=2000, hot_frac=0.0)
    sums, counts = _oracle(t)
    out = salted_sum_count(
        ray.data.from_arrow(t).repartition(3), "k", "v", hot_keys=[], num_partitions=3
    ).take_all()
    got = {r["k"]: (r["n"], round(r["sum_value"], 6)) for r in out}
    assert got == {k: (counts[k], round(sums[k], 6)) for k in sums}
