"""Mergeable sketches: HyperLogLog + fixed-histogram quantiles."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.sources.event_log import stable_hash64
from etl_rs_ray.stages.sketches import (
    FixedHistogram,
    HyperLogLog,
    approx_distinct,
    approx_quantiles,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    keys = [f"user-{i}" for i in range(20_000)]
    h_all = HyperLogLog(p=12)
    h_all.add_hashed(stable_hash64(pa.array(keys)))
    est = h_all.estimate()
    assert abs(est - 20_000) / 20_000 < 0.05

    # merge of disjoint halves == sketch of the union
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.add_hashed(stable_hash64(pa.array(keys[:10_000])))
    h2.add_hashed(stable_hash64(pa.array(keys[10_000:])))
    assert h1.merge(h2).estimate() == est

    # duplicates don't inflate
    h3 = HyperLogLog(12)
    h3.add_hashed(stable_hash64(pa.array(keys * 3)))
    assert h3.estimate() == est


def test_hll_small_range_linear_counting():
    h = HyperLogLog(p=12)
    h.add_hashed(stable_hash64(pa.array([f"k{i}" for i in range(50)])))
    assert abs(h.estimate() - 50) < 5


def test_hll_serialization_roundtrip():
    h = HyperLogLog(p=10)
    h.add_hashed(stable_hash64(pa.array(["a", "b", "c"])))
    h2 = HyperLogLog.from_bytes(h.to_bytes(), p=10)
    assert h2.estimate() == h.estimate()


def test_fixed_histogram_quantiles():
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 100, 50_000)
    h = FixedHistogram(0, 100, buckets=1000)
    h.add(vals)
    for q in (0.1, 0.5, 0.9):
        assert abs(h.quantile(q) - np.quantile(vals, q)) <= 0.2  # 2 bucket widths

    # merge equals union
    h1, h2 = FixedHistogram(0, 100, 1000), FixedHistogram(0, 100, 1000)
    h1.add(vals[:25_000])
    h2.add(vals[25_000:])
    h1.merge(h2)
    assert (h1.counts == h.counts).all()

    # out-of-range values clamp to the end buckets
    h3 = FixedHistogram(0, 1, 10)
    h3.add(np.array([-5.0, 0.5, 99.0]))
    assert h3.counts[0] == 1 and h3.counts[-1] == 1


def test_dataset_level_sketches():
    rng = np.random.default_rng(11)
    n = 30_000
    t = pa.table(
        {
            "k": pa.array([f"id-{int(v)}" for v in rng.integers(0, 5_000, n)]),
            "v": pa.array(rng.uniform(0, 10, n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 5_000) / 5_000 < 0.05
    p50, p90 = approx_quantiles(ds, "v", [0.5, 0.9], lo=0.0, hi=10.0, buckets=1000)
    v = t.column("v").to_numpy()
    assert abs(p50 - np.quantile(v, 0.5)) <= 0.02
    assert abs(p90 - np.quantile(v, 0.9)) <= 0.02


def test_tdigest_quantiles_accuracy():
    from etl_rs_ray.stages.sketches import TDigest

    rng = np.random.default_rng(9)
    vals = rng.lognormal(0, 1, 60_000)  # skewed, unknown range
    t = TDigest(delta=100)
    for chunk in np.array_split(vals, 13):
        t.add(chunk)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        want = np.quantile(vals, q)
        got = t.quantile(q)
        assert abs(got - want) / max(want, 1e-9) < 0.05, (q, got, want)


def test_tdigest_merge_equals_union():
    from etl_rs_ray.stages.sketches import TDigest

    rng = np.random.default_rng(2)
    a, b = rng.normal(0, 1, 20_000), rng.normal(5, 2, 20_000)
    t1, t2 = TDigest(100), TDigest(100)
    t1.add(a)
    t2.add(b)
    t1.merge(t2)
    allv = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        assert abs(t1.quantile(q) - np.quantile(allv, q)) < 0.1


def test_tdigest_dataset_level():
    from etl_rs_ray.stages.sketches import tdigest_quantiles

    rng = np.random.default_rng(5)
    vals = rng.exponential(3.0, 40_000)
    t = pa.table({"v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(7)
    p50, p95 = tdigest_quantiles(ds, "v", [0.5, 0.95])
    assert abs(p50 - np.quantile(vals, 0.5)) / np.quantile(vals, 0.5) < 0.05
    assert abs(p95 - np.quantile(vals, 0.95)) / np.quantile(vals, 0.95) < 0.05


def test_tdigest_empty_and_serialization():
    from etl_rs_ray.stages.sketches import TDigest

    t = TDigest(50)
    assert np.isnan(t.quantile(0.5))
    t.add(np.array([1.0, 2.0, 3.0]))
    m, w = t.to_arrays()
    t2 = TDigest.from_arrays(m, w, 50)
    assert t2.quantile(0.5) == t.quantile(0.5)


def test_exact_quantiles_matches_numpy_with_refinement():
    from etl_rs_ray.stages.sketches import exact_quantiles

    rng = np.random.default_rng(13)
    vals = rng.lognormal(0, 2, 50_000)  # skewed so bins are uneven
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    # gather_max << n forces several histogram-refinement passes
    got = exact_quantiles(ds, "v", qs, buckets=64, gather_max=500)
    want = [float(np.quantile(vals, q)) for q in qs]
    assert got == want, list(zip(qs, got, want))


def test_exact_quantiles_heavy_duplicates_and_constant():
    from etl_rs_ray.stages.sketches import exact_quantiles

    rng = np.random.default_rng(4)
    # 90% of mass on one value: the candidate interval pins on duplicates
    vals = np.where(rng.uniform(size=20_000) < 0.9, 7.0, rng.uniform(0, 100, 20_000))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)
    got = exact_quantiles(ds, "v", [0.5, 0.95], buckets=32, gather_max=1_000)
    want = [float(np.quantile(vals, q)) for q in (0.5, 0.95)]
    assert got == want

    const = ray.data.from_arrow(pa.table({"v": pa.array([3.25] * 1000)})).repartition(3)
    assert exact_quantiles(const, "v", [0.1, 0.9], gather_max=10) == [3.25, 3.25]


def test_hll_small_m_alpha_constants():
    # p=4 -> m=16 must use the measured 0.673, not the asymptotic formula
    h = HyperLogLog(p=4)
    assert h._SMALL_M_ALPHA[16] == 0.673
    h.add_hashed(stable_hash64(pa.array([f"x{i}" for i in range(2_000)])))
    assert abs(h.estimate() - 2_000) / 2_000 < 0.35  # ~26% stderr at m=16


def test_exact_quantiles_spread_ranks_bounded_gather():
    """Regression (r3 review): spread quantiles used to pin one interval
    spanning min..max rank, gathering ~40% of all rows to the driver.
    Per-rank intervals must stay exact under a tiny gather budget, and a
    100k-duplicate run must resolve via interval collapse, not gather."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.sketches import exact_quantiles

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(0, 100, 80_000), np.full(20_000, 42.0)])
    rng.shuffle(v)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(6)
    for qs in ([0.5, 0.9], [0.01, 0.25, 0.5, 0.75, 0.99], [0.0, 1.0]):
        got = exact_quantiles(ds, "x", qs, gather_max=1024)
        want = [float(np.quantile(v, q)) for q in qs]
        assert got == want, (qs, got, want)


def test_cms_never_underestimates_and_bounds():
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.sources.event_log import stable_hash64
    from etl_rs_ray.stages.sketches import CountMinSketch, cms_frequencies

    rng = np.random.default_rng(9)
    # zipf-ish key stream: heavy keys + long tail
    keys = np.concatenate(
        [np.repeat(np.arange(20), 500), rng.integers(100, 5000, 10_000)]
    ).astype(np.int64)
    rng.shuffle(keys)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    width, depth = 8192, 4
    sketch = cms_frequencies(ds, "k", width=width, depth=depth)
    assert sketch.total() == len(keys)

    uniq, exact = np.unique(keys, return_counts=True)
    est = sketch.estimate(stable_hash64(pa.array([str(u) for u in uniq])))
    assert (est >= exact).all()  # structural: min of non-negative adds
    bound = math.ceil(math.e / width * len(keys))
    assert (est - exact <= bound).all()

    # merge associativity: two half-sketches == one full sketch
    half_a = cms_frequencies(
        ray.data.from_arrow(pa.table({"k": keys[: len(keys) // 2]})), "k", width, depth
    )
    half_b = cms_frequencies(
        ray.data.from_arrow(pa.table({"k": keys[len(keys) // 2:]})), "k", width, depth
    )
    assert (half_a.merge(half_b).counts == sketch.counts).all()

    # serialization roundtrip
    rt = CountMinSketch.from_bytes(sketch.to_bytes(), width, depth)
    assert (rt.counts == sketch.counts).all()


def test_grouped_approx_distinct():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.sketches import grouped_approx_distinct

    rng = np.random.default_rng(10)
    groups = rng.choice(["a", "b", "c"], 30_000)
    # distinct domains of very different sizes per group
    vals = np.where(
        groups == "a",
        rng.integers(0, 5_000, 30_000),
        np.where(groups == "b", rng.integers(0, 200, 30_000), rng.integers(0, 17, 30_000)),
    )
    t = pa.table({"g": groups, "x": vals.astype(np.int64)})
    ds = ray.data.from_arrow(t).repartition(6)
    est = grouped_approx_distinct(ds, "g", "x", p=12)
    import pandas as pd

    exact = pd.DataFrame({"g": groups, "x": vals}).groupby("g")["x"].nunique()
    for g in ["a", "b", "c"]:
        assert abs(est[g] - exact[g]) / exact[g] <= 0.05, (g, est[g], exact[g])
