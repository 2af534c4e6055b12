"""Two-pass exact heavy hitters (Misra-Gries candidates + exact count)."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.stages.heavy import _mg_merge, heavy_hitters


def test_mg_summary_guarantee():
    # N=1000 over a zipf-ish stream; any key with freq > N/m must survive
    rng = np.random.default_rng(1)
    keys = [f"k{int(v)}" for v in rng.zipf(1.5, 1000) % 500]
    summary = {}
    vals, counts = np.unique(keys, return_counts=True)
    _mg_merge(summary, vals.tolist(), counts.tolist(), m=50)
    from collections import Counter

    true = Counter(keys)
    n = len(keys)
    for k, c in true.items():
        if c > n / 50:
            assert k in summary, (k, c)


def test_heavy_hitters_exact_topk():
    rng = np.random.default_rng(4)
    # skewed: key i gets ~ 1000/(i+1) rows
    rows = []
    for i in range(200):
        rows.extend([f"user-{i:03d}"] * max(1, 1000 // (i + 1)))
    rng.shuffle(rows)
    t = pa.table({"uid": pa.array(rows)})
    ds = ray.data.from_arrow(t).repartition(5)
    out = heavy_hitters(ds, "uid", k=5)
    got = list(zip(out.column("key").to_pylist(), out.column("n").to_pylist()))
    from collections import Counter

    true = sorted(Counter(rows).items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == true


def test_heavy_hitters_int_keys_and_ties():
    t = pa.table({"k": pa.array([1, 1, 2, 2, 3], pa.int64())})
    out = heavy_hitters(ray.data.from_arrow(t), "k", k=3)
    assert out.column("key").to_pylist() == [1, 2, 3]  # tie broken by key asc
    assert out.column("n").to_pylist() == [2, 2, 1]
    assert out.column("key").type == pa.int64()


def test_heavy_hitters_empty():
    t = pa.table({"k": pa.array([], pa.string())})
    out = heavy_hitters(ray.data.from_arrow(t), "k", k=3)
    assert out.num_rows == 0


def test_top_ngrams_unigrams_and_trigrams():
    import ray.data

    from etl_rs_ray.stages.text_stats import top_ngrams

    docs = (
        ["alpha beta gamma"] * 30
        + ["beta gamma delta"] * 20
        + ["gamma delta epsilon"] * 10
        + [None]
    )
    ds = ray.data.from_items([{"text": t} for t in docs]).repartition(4)
    uni = top_ngrams(ds, "text", n=1, k=3).to_pylist()
    # counts: gamma 60, beta 50, alpha 30, delta 30 (tie broken key asc)
    assert [(r["key"], r["n"]) for r in uni] == [("gamma", 60), ("beta", 50), ("alpha", 30)]
    tri = top_ngrams(ds, "text", n=3, k=2).to_pylist()
    assert [(r["key"], r["n"]) for r in tri] == [
        ("alpha beta gamma", 30),
        ("beta gamma delta", 20),
    ]


def test_heavy_hitters_escalates_on_near_uniform_keys():
    """When no key clears the Misra-Gries N/m bound (near-uniform data),
    the certification check must escalate to the exact shuffle instead of
    silently returning a wrong top-k — the sf0.1 regression this guards:
    2000 distinct keys, tiny m, counts 1..2000 known exactly."""
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.heavy import heavy_hitters

    rows = []
    for key in range(2000):
        rows.extend([{"k": f"key{key:04d}"}] * (1 + key % 5))
    ds = ray.data.from_items(rows).repartition(8)
    out = heavy_hitters(ds, "k", k=5, m=20)  # m << distinct: MG can't certify
    got = [(r["key"], r["n"]) for r in out.to_pylist()]
    # exact truth: every key with key%5==4 has count 5; smallest ids win ties
    want = [(f"key{i:04d}", 5) for i in (4, 9, 14, 19, 24)]
    assert got == want
