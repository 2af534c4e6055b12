"""Broadcast join stages (stages/joins.py)."""

import pyarrow as pa
import ray.data

from etl_rs_ray.stages.joins import broadcast_lookup_join, broadcast_semi_join


def _facts():
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "dim_id": pa.array([10, 20, 99, 10, None], pa.int64()),
        }
    )


def _dim():
    return pa.table(
        {
            "k": pa.array([10, 20, 30], pa.int64()),
            "name": pa.array(["a", "b", "c"]),
            "extra": pa.array([1.0, 2.0, 3.0]),
        }
    )


def test_lookup_join_left():
    out = broadcast_lookup_join(
        ray.data.from_arrow(_facts()).repartition(2),
        _dim(),
        on="dim_id",
        dim_key="k",
        take_cols={"name": "dim_name", "extra": "dim_extra"},
    )
    rows = {r["id"]: r for r in out.take_all()}
    assert len(rows) == 5
    assert rows[1]["dim_name"] == "a" and rows[1]["dim_extra"] == 1.0
    assert rows[2]["dim_name"] == "b"
    assert rows[3]["dim_name"] is None  # 99 not in dim
    assert rows[5]["dim_name"] is None  # null key


def test_lookup_join_inner():
    out = broadcast_lookup_join(
        ray.data.from_arrow(_facts()).repartition(2),
        _dim(),
        on="dim_id",
        dim_key="k",
        take_cols={"name": "dim_name"},
        how="inner",
    )
    rows = sorted(r["id"] for r in out.take_all())
    assert rows == [1, 2, 4]


def test_lookup_join_dim_as_dataset():
    out = broadcast_lookup_join(
        ray.data.from_arrow(_facts()),
        ray.data.from_arrow(_dim()),
        on="dim_id",
        dim_key="k",
        take_cols={"name": "nm"},
    )
    assert {r["nm"] for r in out.take_all()} == {"a", "b", None}


def test_semi_and_anti_join():
    ds = ray.data.from_arrow(_facts()).repartition(2)
    semi = broadcast_semi_join(ds, [10, 20], on="dim_id")
    assert sorted(r["id"] for r in semi.take_all()) == [1, 2, 4]
    anti = broadcast_semi_join(ds, [10, 20], on="dim_id", anti=True)
    assert sorted(r["id"] for r in anti.take_all()) == [3, 5]


def test_semi_join_keys_from_dataset():
    keys = ray.data.from_arrow(pa.table({"dim_id": pa.array([10, 10, 20], pa.int64())}))
    ds = ray.data.from_arrow(_facts())
    semi = broadcast_semi_join(ds, keys, on="dim_id")
    assert sorted(r["id"] for r in semi.take_all()) == [1, 2, 4]


def test_range_join_matches_nested_loop_oracle():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import range_join

    rng = np.random.default_rng(5)
    pvals = np.round(rng.uniform(-50, 150, 400), 3)
    points = pa.table({"pid": pa.array(range(400), pa.int64()),
                       "v": pa.array(pvals, pa.float64())})
    lo = np.round(rng.uniform(-60, 140, 30), 3)
    span = rng.uniform(1, 40, 30)
    ivs = pa.table({"iid": pa.array(range(30), pa.int64()),
                    "lo": pa.array(lo, pa.float64()),
                    "hi": pa.array(np.round(lo + span, 3), pa.float64())})
    out = range_join(
        ray.data.from_arrow(points).repartition(4),
        ray.data.from_arrow(ivs).repartition(2),
        "v", "lo", "hi", bucket_width=20.0,
    ).take_all()
    got = sorted((r["pid"], r["iid"]) for r in out)
    want = sorted(
        (int(p), int(i))
        for p in range(400)
        for i in range(30)
        if ivs.column("lo")[i].as_py() <= pvals[p] < ivs.column("hi")[i].as_py()
    )
    assert got == want and len(want) > 100


def test_range_join_derived_width_and_boundaries():
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import range_join

    points = pa.table({"pid": pa.array([0, 1, 2, 3], pa.int64()),
                       "v": pa.array([0.0, 10.0, 19.999, 20.0], pa.float64())})
    ivs = pa.table({"iid": pa.array([0], pa.int64()),
                    "lo": pa.array([0.0], pa.float64()),
                    "hi": pa.array([20.0], pa.float64())})
    out = range_join(ray.data.from_arrow(points), ray.data.from_arrow(ivs),
                     "v", "lo", "hi").take_all()
    # hi exclusive: 20.0 not matched; lo inclusive: 0.0 matched
    assert sorted(r["pid"] for r in out) == [0, 1, 2]


def test_range_join_bucket_guard():
    import pyarrow as pa
    import pytest
    import ray.data

    from etl_rs_ray.stages.joins import range_join

    points = pa.table({"pid": pa.array(range(1000), pa.int64()),
                       "v": pa.array([float(i % 10) for i in range(1000)], pa.float64())})
    ivs = pa.table({"iid": pa.array(range(100), pa.int64()),
                    "lo": pa.array([0.0] * 100, pa.float64()),
                    "hi": pa.array([10.0] * 100, pa.float64())})
    with pytest.raises(Exception, match="candidate pairs"):
        range_join(ray.data.from_arrow(points), ray.data.from_arrow(ivs),
                   "v", "lo", "hi", bucket_width=10.0, max_bucket_pairs=1000).take_all()


def test_bloom_semi_join_exact_semi_and_anti():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(11)
    fact_keys = rng.integers(0, 10_000, 20_000).astype(np.int64)
    dim_keys = np.unique(rng.integers(0, 10_000, 800).astype(np.int64))
    fact = ray.data.from_arrow(
        pa.table({"fk": fact_keys, "payload": np.arange(20_000)})
    ).repartition(6)
    dim = ray.data.from_arrow(pa.table({"dk": dim_keys})).repartition(3)

    member = np.isin(fact_keys, dim_keys)
    counters = {}
    semi = bloom_semi_join(fact, dim, on="fk", dim_key="dk", counters=counters)
    got = sorted(r["payload"] for r in semi.take_all())
    assert got == sorted(np.flatnonzero(member).tolist())
    # the bloom pruned: survivors ≈ true members + tiny FP margin
    assert counters["bloom_survivors"] >= int(member.sum())
    assert counters["bloom_survivors"] <= int(member.sum()) + 0.01 * len(fact_keys)

    anti = bloom_semi_join(fact, dim, on="fk", dim_key="dk", anti=True)
    got_anti = sorted(r["payload"] for r in anti.take_all())
    assert got_anti == sorted(np.flatnonzero(~member).tolist())


def test_bloom_semi_join_string_keys_and_prefilter_superset():
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import bloom_semi_join

    fact = ray.data.from_arrow(
        pa.table({"k": [f"key-{i}" for i in range(500)]})
    ).repartition(4)
    dim = ray.data.from_arrow(pa.table({"k": [f"key-{i}" for i in range(0, 500, 7)]}))
    exact = {f"key-{i}" for i in range(0, 500, 7)}
    got = {r["k"] for r in bloom_semi_join(fact, dim, on="k").take_all()}
    assert got == exact
    # verify=None: probabilistic prefilter output supersets the truth
    approx = {r["k"] for r in bloom_semi_join(fact, dim, on="k", verify=None).take_all()}
    assert exact <= approx


def test_bloom_anti_requires_verification():
    import pyarrow as pa
    import pytest
    import ray.data

    from etl_rs_ray.stages.joins import bloom_semi_join

    ds = ray.data.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="verification"):
        bloom_semi_join(ds, ds, on="k", anti=True, verify=None)


def test_audience_overlap_counts():
    import duckdb as _duck
    import numpy as np

    from etl_rs_ray.stages.joins import audience_overlap

    rng = np.random.default_rng(23)
    n = 6000
    t = pa.table(
        {
            "u": rng.integers(0, 300, n).astype(np.int64),
            "ty": rng.choice(["a", "b", "c", "d"], n, p=[0.1, 0.1, 0.4, 0.4]),
        }
    )
    got = audience_overlap(
        ray.data.from_arrow(t).repartition(5), "u", "ty", "a", "b"
    ).to_pandas()
    want = _duck.sql(
        """
        WITH f AS (SELECT u, max(CASE WHEN ty='a' THEN 1 ELSE 0 END) ha,
                          max(CASE WHEN ty='b' THEN 1 ELSE 0 END) hb
                   FROM t WHERE ty IN ('a','b') GROUP BY u)
        SELECT count(*) FILTER (ha=1 AND hb=1) AS n_both,
               count(*) FILTER (ha=1 AND hb=0) AS n_only_a,
               count(*) FILTER (ha=0 AND hb=1) AS n_only_b,
               count(*) AS n_either FROM f
        """
    ).df()
    assert got.astype("int64").equals(want.astype("int64"))
    r = got.iloc[0]
    assert r["n_both"] + r["n_only_a"] + r["n_only_b"] == r["n_either"]


def test_cooccurrence_pairs_matches_self_join():
    import duckdb as _duck
    import numpy as np

    from etl_rs_ray.stages.joins import cooccurrence_pairs

    rng = np.random.default_rng(29)
    n = 5000
    t = pa.table(
        {
            "basket": rng.integers(0, 400, n).astype(np.int64),
            "item": rng.choice(["w", "x", "y", "z", "q"], n),
        }
    )
    got = (
        cooccurrence_pairs(ray.data.from_arrow(t).repartition(6), "basket", "item")
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    want = _duck.sql(
        """
        WITH d AS (SELECT DISTINCT basket, item FROM t)
        SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_baskets
        FROM d a JOIN d b ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    want["n_baskets"] = want["n_baskets"].astype("int64")
    assert got.equals(want.reset_index(drop=True))
    assert (got["item_a"] < got["item_b"]).all()


def test_keyed_lookup_join_modes(ray_session):
    """Shuffle-tier lookup join: inner/left/anti semantics, including
    null fact keys (never match) and unmatched rows."""
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import keyed_lookup_join

    fact = pa.table(
        {
            "k": pa.array([1, 2, 3, None, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    dim = pa.table(
        {"dk": pa.array([1, 2], pa.int64()), "name": pa.array(["a", "b"])}
    )
    f = ray.data.from_arrow(fact).repartition(3)
    d = ray.data.from_arrow(dim)

    inner = keyed_lookup_join(f, d, on="k", dim_key="dk",
                              take_cols={"name": "k_name"}, how="inner",
                              num_partitions=2).to_pandas().sort_values("v")
    assert list(inner["v"]) == [10, 20, 50]
    assert list(inner["k_name"]) == ["a", "b", "b"]

    anti = keyed_lookup_join(f, d, on="k", dim_key="dk", take_cols={},
                             how="anti", num_partitions=2).to_pandas()
    assert sorted(anti["v"]) == [30, 40]  # unmatched + null key

    left = keyed_lookup_join(f, d, on="k", dim_key="dk",
                             take_cols={"name": "k_name"}, how="left",
                             num_partitions=2).to_pandas().sort_values("v")
    assert len(left) == 5 and left["k_name"].isna().sum() == 2


def test_bloom_semi_join_null_fact_keys(ray_session):
    """A null integer key in one batch must not corrupt the other rows'
    hashes (the float64+NaN reinterpret hazard) — and nulls never join."""
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.joins import bloom_semi_join

    fact = pa.table(
        {"k": pa.array([1, None, 2, 3, 4], pa.int64()),
         "v": pa.array([1, 2, 3, 4, 5], pa.int64())}
    )
    dim = pa.table({"k": pa.array([1, 2, 4], pa.int64())})
    f = ray.data.from_arrow(fact)  # one block -> null shares the batch
    d = ray.data.from_arrow(dim)
    semi = bloom_semi_join(f, d, on="k").to_pandas()
    assert sorted(semi["v"]) == [1, 3, 5]
    anti = bloom_semi_join(f, d, on="k", anti=True).to_pandas()
    assert sorted(anti["v"]) == [2, 4]
    # shuffle-tier verify gives the same exact result
    semi2 = bloom_semi_join(f, d, on="k", verify="shuffle").to_pandas()
    assert sorted(semi2["v"]) == [1, 3, 5]
    anti2 = bloom_semi_join(f, d, on="k", anti=True, verify="shuffle").to_pandas()
    assert sorted(anti2["v"]) == [2, 4]
