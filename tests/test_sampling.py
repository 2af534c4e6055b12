"""Deterministic sampling / weighted mixture (stages/sampling.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_rs_ray.stages.sampling import deterministic_sample, weighted_mixture


def _docs(n=2000):
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "src": pa.array(["web" if i % 3 else "books" for i in range(n)]),
        }
    )


def test_sample_reproducible_and_layout_independent():
    t = _docs()
    a = sorted(r["doc_id"] for r in deterministic_sample(
        ray.data.from_arrow(t).repartition(2), "doc_id", 0.25).take_all())
    b = sorted(r["doc_id"] for r in deterministic_sample(
        ray.data.from_arrow(t).repartition(7), "doc_id", 0.25).take_all())
    assert a == b  # partition layout doesn't change the selected set
    assert abs(len(a) / 2000 - 0.25) < 0.05


def test_sample_seed_changes_selection_and_nesting():
    t = _docs()
    ds = ray.data.from_arrow(t)
    a = {r["doc_id"] for r in deterministic_sample(ds, "doc_id", 0.3, seed="s0").take_all()}
    b = {r["doc_id"] for r in deterministic_sample(ds, "doc_id", 0.3, seed="s1").take_all()}
    assert a != b
    # threshold sampling nests: a 10% sample is a subset of the 30% one
    small = {r["doc_id"] for r in deterministic_sample(ds, "doc_id", 0.1, seed="s0").take_all()}
    assert small <= a


def test_sample_bounds():
    ds = ray.data.from_arrow(_docs(100))
    assert deterministic_sample(ds, "doc_id", 0.0).count() == 0
    assert deterministic_sample(ds, "doc_id", 1.0).count() == 100
    with pytest.raises(ValueError):
        deterministic_sample(ds, "doc_id", 1.5)


def test_weighted_mixture():
    t = _docs(3000)
    ds = ray.data.from_arrow(t).repartition(4)
    out = weighted_mixture(ds, "src", "doc_id", {"web": 0.2, "books": 1.0}).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], set()).add(r["doc_id"])
    n_books = sum(1 for i in range(3000) if i % 3 == 0)
    assert len(by_src["books"]) == n_books  # frac 1.0 keeps everything
    assert abs(len(by_src["web"]) / (3000 - n_books) - 0.2) < 0.06
    # sources not listed default to dropped
    out2 = weighted_mixture(ds, "src", "doc_id", {"books": 0.5}).take_all()
    assert all(r["src"] == "books" for r in out2)


def test_fast_hash_sampling_properties():
    t = _docs(4000)
    ds = ray.data.from_arrow(t)
    a = sorted(r["doc_id"] for r in deterministic_sample(
        ds, "doc_id", 0.25, hash="fast").take_all())
    b = sorted(r["doc_id"] for r in deterministic_sample(
        ray.data.from_arrow(t).repartition(5), "doc_id", 0.25, hash="fast").take_all())
    assert a == b  # layout-independent
    assert abs(len(a) / 4000 - 0.25) < 0.04
    small = set(r["doc_id"] for r in deterministic_sample(ds, "doc_id", 0.1, hash="fast").take_all())
    assert small <= set(a)  # nesting
    assert deterministic_sample(ds, "doc_id", 1.0, hash="fast").count() == 4000
    assert deterministic_sample(ds, "doc_id", 0.0, hash="fast").count() == 0


def test_weighted_mixture_fast_and_md5_paths_agree_statistically():
    t = _docs(4000)
    ds = ray.data.from_arrow(t).repartition(3)
    recipe = {"web": 0.3, "books": 0.8}
    fast = weighted_mixture(ds, "src", "doc_id", recipe, hash="fast").take_all()
    md5 = weighted_mixture(ds, "src", "doc_id", recipe, hash="md5").take_all()

    def rates(rows):
        by = {}
        for r in rows:
            by[r["src"]] = by.get(r["src"], 0) + 1
        n_books = sum(1 for i in range(4000) if i % 3 == 0)
        return by.get("web", 0) / (4000 - n_books), by.get("books", 0) / n_books

    fw, fb = rates(fast)
    mw, mb = rates(md5)
    assert abs(fw - 0.3) < 0.05 and abs(mw - 0.3) < 0.05
    assert abs(fb - 0.8) < 0.05 and abs(mb - 0.8) < 0.05


def test_weighted_mixture_md5_matches_rowwise_formula():
    from etl_rs_ray.stages.dedup import md5_u64
    from etl_rs_ray.stages.sampling import _U64

    t = _docs(500)
    ds = ray.data.from_arrow(t).repartition(2)
    recipe = {"web": 0.4, "books": 0.9}
    got = sorted(r["doc_id"] for r in weighted_mixture(
        ds, "src", "doc_id", recipe, hash="md5").take_all())
    want = sorted(
        i for i in range(500)
        if md5_u64(f"s0:{i}") < int(recipe["books" if i % 3 == 0 else "web"] * _U64)
    )
    assert got == want


def test_weighted_mixture_layout_independent_fast():
    t = _docs(3000)
    recipe = {"web": 0.25, "books": 0.5}
    a = sorted(r["doc_id"] for r in weighted_mixture(
        ray.data.from_arrow(t).repartition(2), "src", "doc_id", recipe).take_all())
    b = sorted(r["doc_id"] for r in weighted_mixture(
        ray.data.from_arrow(t).repartition(9), "src", "doc_id", recipe).take_all())
    assert a == b


def test_assign_split_total_disjoint_layout_independent():
    from etl_rs_ray.stages.sampling import assign_split

    t = _docs(5000)
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in assign_split(
        ray.data.from_arrow(t).repartition(2), "doc_id", splits).take_all()}
    b = {r["doc_id"]: r["split"] for r in assign_split(
        ray.data.from_arrow(t).repartition(9), "doc_id", splits).take_all()}
    assert a == b  # layout-independent
    assert len(a) == 5000  # total: every row assigned exactly once
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02


def test_assign_split_md5_matches_rowwise_formula():
    from etl_rs_ray.stages.dedup import md5_u64
    from etl_rs_ray.stages.sampling import _U64, assign_split

    t = _docs(400)
    got = {r["doc_id"]: r["split"] for r in assign_split(
        ray.data.from_arrow(t), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        hash="md5").take_all()}
    c0, c1 = int(0.9 * _U64), int(0.95 * _U64)
    for i in range(400):
        h = md5_u64(f"s0:{i}")
        want = "train" if h <= c0 else ("val" if h <= c1 else "test")
        assert got[i] == want, i


def test_assign_split_validates_fractions():
    from etl_rs_ray.stages.sampling import assign_split

    ds = ray.data.from_arrow(_docs(10))
    with pytest.raises(ValueError):
        assign_split(ds, "doc_id", {"train": 0.9, "val": 0.2})


def test_stratified_sample_n_exact_and_layout_independent():
    from etl_rs_ray.stages.sampling import stratified_sample_n

    t = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "src": pa.array([("a", "b", "c")[i % 3] for i in range(300)]),
    })
    a = sorted((r["src"], r["doc_id"]) for r in stratified_sample_n(
        ray.data.from_arrow(t).repartition(2), "src", "doc_id", 7).take_all())
    b = sorted((r["src"], r["doc_id"]) for r in stratified_sample_n(
        ray.data.from_arrow(t).repartition(9), "src", "doc_id", 7).take_all())
    assert a == b
    from collections import Counter
    c = Counter(s for s, _ in a)
    assert c == {"a": 7, "b": 7, "c": 7}
    # groups smaller than n keep everything
    small = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "src": pa.array(["x", "x"])})
    out = stratified_sample_n(ray.data.from_arrow(small), "src", "doc_id", 10).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_priority_sample_exact_and_weighted(ray_session):
    """Priority keys match the md5 formula exactly; selection is the n
    smallest (key, id); heavier rows are sampled more often."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.dedup import md5_u64
    from etl_rs_ray.stages.sampling import priority_sample

    rng = np.random.default_rng(11)
    n = 4000
    ids = np.arange(n)
    w = np.where(ids < 200, 1000, 1).astype(np.int64)  # 200 heavy rows
    t = pa.table({"id": ids, "w": w})
    ds = ray.data.from_arrow(t).repartition(8)
    got = priority_sample(ds, "id", "w", n=100, seed="s7").to_pandas()
    assert len(got) == 100

    keys = np.array(
        [(md5_u64(f"s7:{i}") >> 1) // int(wi) for i, wi in zip(ids, w)], dtype=np.uint64
    ).astype(np.int64)
    order = np.lexsort((ids, keys))
    want = set(ids[order][:100].tolist())
    assert set(got["id"]) == want
    got_sorted = got.sort_values("id")
    assert (
        got_sorted["priority_key"].to_numpy() == keys[np.sort(list(want))]
    ).all()
    # heavy rows are ~1000x more likely: expect the sample to be mostly heavy
    assert (got["w"] == 1000).sum() > 60


def test_priority_sample_fast_hash_agrees_statistically(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.sampling import priority_sample

    n = 5000
    t = pa.table({"id": np.arange(n), "w": np.where(np.arange(n) % 10 == 0, 50, 1)})
    ds = ray.data.from_arrow(t)
    heavy_frac = []
    for h in ("md5", "fast"):
        got = priority_sample(ds, "id", "w", n=200, seed="s1", hash=h).to_pandas()
        heavy_frac.append((got["w"] == 50).mean())
    # both hashes should strongly prefer heavy rows
    assert min(heavy_frac) > 0.5


def test_priority_sample_rejects_bad_weights(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from etl_rs_ray.stages.sampling import priority_sample

    t = pa.table({"id": [1, 2], "w": [0, 3]})
    with pytest.raises(Exception):
        priority_sample(ray.data.from_arrow(t), "id", "w", n=1).to_pandas()


def test_priority_sample_rejects_null_weights(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from etl_rs_ray.stages.sampling import priority_sample

    t = pa.table({"id": [1, 2, 3], "w": pa.array([5, None, 7], pa.int64())})
    with pytest.raises(Exception, match="non-null"):
        priority_sample(ray.data.from_arrow(t), "id", "w", n=2).to_pandas()
