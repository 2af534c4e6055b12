"""grouping_sets / rollup / cube / pivot_wide (stages/grouping.py) —
cross-checked against DuckDB GROUP BY ROLLUP / CUBE / conditional
aggregation on randomized inputs."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.stages.grouping import (
    cube_sets,
    grouped_quantiles_discrete,
    grouping_sets,
    pivot_wide,
    rollup_sets,
)


def _data(n=5000, seed=5) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "a": rng.choice(["x", "y", "z"], n).astype(object),
            "b": rng.integers(0, 4, n).astype(np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )


def _ints(df):
    return df.astype({c: "int64" for c in df.columns if c != "a"})


def test_rollup_matches_duckdb():
    t = _data()
    got = (
        grouping_sets(ray.data.from_arrow(t).repartition(6), rollup_sets(["a", "b"]), ["v"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT COALESCE(a,'(all)') AS a, COALESCE(b,-1) AS b,
                  SUM(v) AS v, COUNT(*) AS n
           FROM t GROUP BY ROLLUP(a,b) ORDER BY a,b"""
    ).fetchdf()
    assert _ints(got[["a", "b", "v", "n"]]).equals(_ints(want))


def test_cube_matches_duckdb():
    t = _data(seed=6)
    got = (
        grouping_sets(ray.data.from_arrow(t).repartition(4), cube_sets(["a", "b"]), ["v"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT COALESCE(a,'(all)') AS a, COALESCE(b,-1) AS b,
                  SUM(v) AS v, COUNT(*) AS n
           FROM t GROUP BY CUBE(a,b) ORDER BY a,b"""
    ).fetchdf()
    assert _ints(got[["a", "b", "v", "n"]]).equals(_ints(want))


def test_grouping_sets_count_only():
    t = _data(seed=7)
    got = (
        grouping_sets(ray.data.from_arrow(t).repartition(3), [("a",), ()], [])
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT COALESCE(a,'(all)') AS a, COUNT(*) AS n
           FROM t GROUP BY GROUPING SETS ((a), ()) ORDER BY a"""
    ).fetchdf()
    assert got["a"].tolist() == want["a"].tolist()
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()


def test_pivot_wide_matches_conditional_agg():
    t = _data(seed=8)
    got = (
        pivot_wide(ray.data.from_arrow(t).repartition(5), "b", "a", "v", ["x", "y", "z"])
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT b,
             SUM(CASE WHEN a='x' THEN v ELSE 0 END) AS x_sum,
             SUM(CASE WHEN a='y' THEN v ELSE 0 END) AS y_sum,
             SUM(CASE WHEN a='z' THEN v ELSE 0 END) AS z_sum,
             SUM(v) AS total
           FROM t GROUP BY b ORDER BY b"""
    ).fetchdf()
    assert got.astype("int64").equals(want.astype("int64"))


def test_pivot_wide_ignores_undeclared_categories():
    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "c": pa.array(["x", "unknown", "x"], pa.string()),
            "v": pa.array([10, 99, 20], pa.int64()),
        }
    )
    got = (
        pivot_wide(ray.data.from_arrow(t), "k", "c", "v", ["x"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["x_sum"].tolist() == [10, 20]
    assert got["total"].tolist() == [10, 20]  # undeclared rows excluded


def test_grouped_quantiles_discrete_matches_percentile_disc():
    rng = np.random.default_rng(12)
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c", "d"], 20_000).astype(object),
            # heavy duplicate mass + skewed tail, the discrete-domain case
            "v": np.concatenate(
                [np.repeat(np.int64(7), 5_000), rng.integers(0, 500, 15_000)]
            ).astype(np.int64),
        }
    )
    got = (
        grouped_quantiles_discrete(
            ray.data.from_arrow(t).repartition(7), "g", "v", [0.0, 0.5, 0.9, 1.0]
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT g,
             percentile_disc(0.0) WITHIN GROUP (ORDER BY v) AS p00,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p05,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS p09,
             percentile_disc(1.0) WITHIN GROUP (ORDER BY v) AS p10,
             count(*) AS n
           FROM t GROUP BY g ORDER BY g"""
    ).fetchdf()
    for c_got, c_want in [("p00", "p00"), ("p05", "p05"), ("p09", "p09"),
                          ("p10", "p10"), ("n", "n")]:
        assert got[c_got].astype("int64").tolist() == want[c_want].astype("int64").tolist(), c_got


def test_mad_outliers_matches_percentile_disc():
    from etl_rs_ray.stages.grouping import mad_outliers

    rng = np.random.default_rng(13)
    n = 6000
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "id": np.arange(n, dtype=np.int64),
            # heavy-tailed so outliers exist
            "v": (rng.standard_cauchy(n) * 100).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    got = (
        mad_outliers(ds, "g", "v", ["id", "g", "v"], k=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        WITH med AS (SELECT g, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) med
                     FROM t GROUP BY g),
        mad AS (SELECT t.g, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(t.v - med.med)) AS BIGINT) mad
                FROM t JOIN med USING (g) GROUP BY t.g)
        SELECT id, t.g, v FROM t JOIN med USING (g) JOIN mad USING (g)
        WHERE abs(v - med.med) > 3 * mad.mad ORDER BY id
        """
    ).df()
    want.columns = ["id", "g", "v"]
    for c in ["id", "v"]:
        want[c] = want[c].astype("int64")
    assert len(got) > 0  # cauchy tails guarantee outliers
    assert got.equals(want.reset_index(drop=True))


def test_mad_outliers_zero_mad_group():
    from etl_rs_ray.stages.grouping import mad_outliers

    # constant group: MAD = 0, so ANY deviation flags — the lone spike
    t = pa.table(
        {
            "g": pa.array(["x"] * 9 + ["x"], pa.string()),
            "id": pa.array(range(10), pa.int64()),
            "v": pa.array([5] * 9 + [6], pa.int64()),
        }
    )
    got = mad_outliers(ray.data.from_arrow(t), "g", "v", ["id"], k=3).to_pandas()
    assert got["id"].tolist() == [9]
