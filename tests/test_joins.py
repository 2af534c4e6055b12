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
