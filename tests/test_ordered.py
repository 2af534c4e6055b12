"""Ordered window operators (stages/ordered.py): SCD2 interval
materialization, per-key running aggregates, and the distributed global
prefix scan — each cross-checked against DuckDB window functions on
randomized inputs (the same SQL shapes the driver oracles state)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_rs_ray.stages.ordered import (
    per_key_ordered,
    prefix_scan,
    running_per_key,
    scd2_history,
)


def _rand_stream(n: int, keys: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    lsn = rng.permutation(n).astype(np.int64)  # distinct, shuffled arrival
    return pa.table(
        {
            "k": rng.integers(0, keys, n).astype(np.int64),
            "lsn": lsn,
            "op": rng.choice(["I", "U", "D"], n, p=[0.3, 0.55, 0.15]),
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
        }
    )


def _sorted_df(df, by):
    return df.sort_values(by).reset_index(drop=True)


def test_scd2_matches_lead_window():
    t = _rand_stream(5000, 40, seed=1)
    ds = ray.data.from_arrow(t).repartition(7)
    got = scd2_history(ds, "k", "lsn", ["v"]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT k, lsn AS valid_from,
                  LEAD(lsn) OVER w AS valid_to,
                  LEAD(lsn) OVER w IS NULL AS is_current, v
           FROM t WINDOW w AS (PARTITION BY k ORDER BY lsn)"""
    ).fetchdf()
    got = _sorted_df(got[want.columns.tolist()], ["k", "valid_from"])
    want = _sorted_df(want, ["k", "valid_from"])
    assert got["valid_from"].tolist() == want["valid_from"].tolist()
    assert got["valid_to"].fillna(-1).tolist() == want["valid_to"].fillna(-1).tolist()
    assert got["is_current"].tolist() == want["is_current"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_scd2_delete_closes_without_opening():
    t = pa.table(
        {
            "k": [1, 1, 1, 1, 2],
            "lsn": [10, 20, 30, 40, 5],
            "op": ["I", "D", "I", "U", "D"],
            "v": [1, 2, 3, 4, 5],
        }
    )
    got = (
        scd2_history(ray.data.from_arrow(t).repartition(3), "k", "lsn", ["v"], op_col="op")
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    # k=1: I@10 closed by D@20 (no version for the delete), I@30 closed
    # by U@40, U@40 open. k=2: only a delete -> NO versions at all.
    assert got["valid_from"].tolist() == [10, 30, 40]
    assert got["valid_to"].fillna(-1).tolist() == [20, 40, -1]
    assert got["is_current"].tolist() == [False, False, True]
    assert (got["k"] == 1).all()


def test_running_per_key_matches_window_sql():
    t = _rand_stream(5000, 25, seed=2)
    ds = ray.data.from_arrow(t).repartition(5)
    got = running_per_key(
        ds, "k", "lsn", "v", sum_col="rs", lag_col="prev", rownum_col="rn"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT k, lsn, v,
                  SUM(v) OVER w AS rs, LAG(v) OVER w AS prev,
                  ROW_NUMBER() OVER w AS rn
           FROM t WINDOW w AS (PARTITION BY k ORDER BY lsn)"""
    ).fetchdf()
    got = _sorted_df(got[["k", "lsn", "v", "rs", "prev", "rn"]], ["k", "lsn"])
    want = _sorted_df(want, ["k", "lsn"])
    assert got["rs"].tolist() == want["rs"].tolist()
    assert got["prev"].fillna(-9).tolist() == want["prev"].fillna(-9).tolist()
    assert got["rn"].tolist() == want["rn"].tolist()


def test_running_per_key_rejects_floats():
    t = pa.table({"k": [1], "lsn": [1], "v": [1.5]})
    with pytest.raises(Exception):  # TypeError inside the task -> RayTaskError
        running_per_key(ray.data.from_arrow(t), "k", "lsn", "v").materialize()


@pytest.mark.parametrize("nparts,ranges", [(1, 2), (6, 5), (13, 16)])
def test_prefix_scan_matches_numpy(nparts, ranges):
    rng = np.random.default_rng(3)
    n = 4000
    order = rng.permutation(np.arange(100, 100 + 2 * n, 2)[:n]).astype(np.int64)
    v = rng.integers(-500, 500, n).astype(np.int64)
    t = pa.table({"o": order, "v": v})
    ds = ray.data.from_arrow(t).repartition(nparts)
    got = (
        prefix_scan(
            ds,
            "o",
            [
                ("v", "max", "rmax", True),
                ("v", "max", "xmax", False),
                ("v", "min", "rmin", True),
                ("v", "sum", "rsum", True),
            ],
            ranges=ranges,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    srt = np.argsort(order)
    vs = v[srt]
    assert got["rmax"].tolist() == np.maximum.accumulate(vs).tolist()
    assert got["rmin"].tolist() == np.minimum.accumulate(vs).tolist()
    assert got["rsum"].tolist() == np.cumsum(vs).tolist()
    xm = got["xmax"].to_numpy()
    assert np.isnan(xm[0])
    np.testing.assert_array_equal(xm[1:], np.maximum.accumulate(vs)[:-1])


def test_prefix_scan_single_row_and_empty():
    t = pa.table({"o": pa.array([7], pa.int64()), "v": pa.array([3], pa.int64())})
    got = prefix_scan(
        ray.data.from_arrow(t), "o", [("v", "max", "m", True), ("v", "sum", "x", False)]
    ).to_pandas()
    assert got["m"].tolist() == [3]
    assert got["x"].isna().all()
    empty = ray.data.from_arrow(t.slice(0, 0))
    assert prefix_scan(empty, "o", [("v", "max", "m", True)]).count() == 0


def test_per_key_ordered_multikey():
    t = pa.table(
        {
            "a": [1, 1, 1, 2],
            "b": ["x", "x", "y", "x"],
            "lsn": [3, 1, 2, 9],
            "v": [30, 10, 20, 90],
        }
    )

    def kernel(tt, first, gidx):
        import numpy as np

        pos = np.arange(len(first)) - np.flatnonzero(first)[gidx]
        return tt.append_column("pos", pa.array(pos, pa.int64()))

    got = (
        per_key_ordered(ray.data.from_arrow(t).repartition(2), ["a", "b"], "lsn", kernel)
        .to_pandas()
        .sort_values(["a", "b", "lsn"])
    )
    assert got["pos"].tolist() == [0, 1, 0, 0]


def test_rolling_per_key_matches_window_sql():
    from etl_rs_ray.stages.ordered import rolling_per_key

    t = _rand_stream(4000, 15, seed=4)
    got = rolling_per_key(
        ray.data.from_arrow(t).repartition(5), "k", "lsn", "v", 7
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT k, lsn,
                  SUM(v) OVER (PARTITION BY k ORDER BY lsn
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_sum,
                  LEAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY lsn), 7) AS roll_n
           FROM t"""
    ).fetchdf()
    got = _sorted_df(got[["k", "lsn", "roll_sum", "roll_n"]], ["k", "lsn"])
    want = _sorted_df(want, ["k", "lsn"])
    assert got["roll_sum"].tolist() == want["roll_sum"].tolist()
    assert got["roll_n"].tolist() == want["roll_n"].tolist()


def test_rolling_window_one_is_identity():
    from etl_rs_ray.stages.ordered import rolling_per_key

    t = _rand_stream(500, 5, seed=5)
    got = rolling_per_key(ray.data.from_arrow(t), "k", "lsn", "v", 1).to_pandas()
    assert got["roll_sum"].tolist() == got["v"].tolist()
    assert (got["roll_n"] == 1).all()


def _scd2_frame(ds):
    df = ds.to_pandas()
    df["valid_to"] = df["valid_to"].fillna(-1)
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].itertuples(index=False)), key=repr)


@pytest.mark.parametrize("split_at,with_ops", [(2000, False), (2500, True), (0, False), (3999, True)])
def test_scd2_apply_increment_equals_full_recompute(split_at, with_ops):
    from etl_rs_ray.stages.ordered import scd2_apply_increment

    t = _rand_stream(4000, 30, seed=6)
    # make LSN order == split order so increments are strictly newer
    t = t.take(pa.array(np.argsort(t.column("lsn").to_numpy(zero_copy_only=False))))
    op = "op" if with_ops else None
    base, inc = t.slice(0, split_at), t.slice(split_at)
    if split_at == 0:
        # empty history: Ray's hash shuffle can't aggregate a fully empty
        # dataset, so an empty SCD2 table arrives as a typed empty block
        history = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "valid_from": pa.array([], pa.int64()),
                    "valid_to": pa.array([], pa.int64()),
                    "is_current": pa.array([], pa.bool_()),
                    "v": pa.array([], pa.int64()),
                }
            )
        )
    else:
        history = scd2_history(
            ray.data.from_arrow(base).repartition(4), "k", "lsn", ["v"], op_col=op
        )
    got = scd2_apply_increment(
        history,
        ray.data.from_arrow(inc).repartition(3),
        "k",
        "lsn",
        ["v"],
        op_col=op,
    )
    want = scd2_history(ray.data.from_arrow(t).repartition(5), "k", "lsn", ["v"], op_col=op)
    assert _scd2_frame(got) == _scd2_frame(want)


def test_scd2_apply_increment_refuses_stale_lsn():
    from etl_rs_ray.stages.ordered import scd2_apply_increment

    base = pa.table({"k": [1, 1], "lsn": [10, 20], "v": [1, 2]})
    history = scd2_history(ray.data.from_arrow(base), "k", "lsn", ["v"])
    stale = pa.table({"k": [1], "lsn": [15], "v": [9]})  # below open valid_from=20
    with pytest.raises(Exception, match="rewrite|closed history"):
        scd2_apply_increment(
            history, ray.data.from_arrow(stale), "k", "lsn", ["v"]
        ).materialize()


def test_scd2_apply_empty_increment_is_identity():
    from etl_rs_ray.stages.ordered import scd2_apply_increment

    t = _rand_stream(1000, 10, seed=7)
    history = scd2_history(ray.data.from_arrow(t).repartition(3), "k", "lsn", ["v"])
    empty = ray.data.from_arrow(t.slice(0, 0))
    got = scd2_apply_increment(history, empty, "k", "lsn", ["v"])
    want = scd2_history(ray.data.from_arrow(t), "k", "lsn", ["v"])
    assert _scd2_frame(got) == _scd2_frame(want)


def test_path_per_key_matches_string_agg():
    from etl_rs_ray.stages.ordered import path_per_key

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table(
        {
            "k": rng.integers(0, 60, n).astype(np.int64),
            "ord": rng.permutation(n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.choice(["a", "bb", "ccc", "d", "ee"], n),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    got = _sorted_df(
        path_per_key(ds, "k", ["ord", "id"], "v", limit_k=6, sep="|").to_pandas(), ["k"]
    )
    want = duckdb.sql(
        """
        WITH r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY ord, id) rn FROM t)
        SELECT k, string_agg(v, '|' ORDER BY rn) AS path, count(*) AS path_len
        FROM r WHERE rn <= 6 GROUP BY k ORDER BY k
        """
    ).df()
    want["path_len"] = want["path_len"].astype("int64")
    assert got.equals(want.reset_index(drop=True))


def test_path_per_key_limit_exceeds_segments():
    from etl_rs_ray.stages.ordered import path_per_key

    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "ord": pa.array([2, 1, 5], pa.int64()),
            "id": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array(["x", "y", "z"]),
        }
    )
    got = _sorted_df(
        path_per_key(
            ray.data.from_arrow(t), "k", ["ord", "id"], "v", limit_k=100
        ).to_pandas(),
        ["k"],
    )
    assert got["path"].tolist() == ["y->x", "z"]
    assert got["path_len"].tolist() == [2, 1]


def test_rank_stats_matches_window_functions():
    from etl_rs_ray.stages.ordered import rank_stats_per_key

    rng = np.random.default_rng(11)
    n = 5000
    # small value domain forces plenty of dense_rank ties
    t = pa.table(
        {
            "k": rng.integers(0, 7, n).astype(np.int64),
            "v": rng.integers(0, 40, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    got = _sorted_df(
        rank_stats_per_key(ds, "k", "v", "id", ntile_k=4).to_pandas(), ["k", "rn"]
    )
    want = duckdb.sql(
        """
        WITH r AS (
          SELECT k, id, v,
                 row_number() OVER w AS rn,
                 dense_rank() OVER (PARTITION BY k ORDER BY v DESC) AS dense_rank,
                 count(*) OVER (PARTITION BY k) AS n,
                 ntile(4) OVER w AS ntile
          FROM t WINDOW w AS (PARTITION BY k ORDER BY v DESC, id)
        )
        SELECT k, id, v, rn, dense_rank,
               CASE WHEN n = 1 THEN 0
                    ELSE ((rn-1)*2000000 + (n-1)) // (2*(n-1)) END AS pct_rank_micros,
               ntile
        FROM r ORDER BY k, rn
        """
    ).df()
    for c in ["rn", "dense_rank", "pct_rank_micros", "ntile", "id", "v"]:
        want[c] = want[c].astype("int64")
    assert got[want.columns.tolist()].equals(want.reset_index(drop=True))


def test_rank_stats_single_row_key():
    from etl_rs_ray.stages.ordered import rank_stats_per_key

    t = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "v": pa.array([5], pa.int64()),
            "id": pa.array([0], pa.int64()),
        }
    )
    got = rank_stats_per_key(ray.data.from_arrow(t), "k", "v", "id").to_pandas()
    row = got.iloc[0]
    assert (row["rn"], row["dense_rank"], row["pct_rank_micros"], row["ntile"]) == (1, 1, 0, 1)


def test_sessionize_matches_gaps_and_islands():
    from etl_rs_ray.stages.ordered import sessionize

    rng = np.random.default_rng(17)
    n = 4000
    base = 1_700_000_000_000_000  # us
    t = pa.table(
        {
            "u": rng.integers(0, 80, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            # mixed gaps around the 60s threshold, including exact-equal ts
            "ts": pa.array(
                base + np.sort(rng.integers(0, 10_000, n)).astype(np.int64) * 7_000_000,
                pa.timestamp("us"),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    got = (
        sessionize(ds, "u", "ts", gap_us=60_000_000, order_cols=["id"])
        .to_pandas()[["u", "id", "session_seq", "event_seq"]]
        .sort_values(["u", "id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        WITH o AS (
          SELECT u, id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 60000000
                      THEN 1 ELSE 0 END AS ns
          FROM t WINDOW w AS (PARTITION BY u ORDER BY ts, id)),
        s AS (SELECT *, SUM(ns) OVER (PARTITION BY u ORDER BY ts, id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq FROM o)
        SELECT u, id, session_seq,
               row_number() OVER (PARTITION BY u, session_seq ORDER BY ts, id) AS event_seq
        FROM s ORDER BY u, id
        """
    ).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    assert got.equals(want.reset_index(drop=True))
    # exactly-at-gap boundary must NOT split (strictly greater starts a session)
    b = pa.table(
        {
            "u": pa.array([1, 1], pa.int64()),
            "id": pa.array([0, 1], pa.int64()),
            "ts": pa.array([0, 60_000_000], pa.timestamp("us")),
        }
    )
    g2 = sessionize(ray.data.from_arrow(b), "u", "ts", gap_us=60_000_000).to_pandas()
    assert g2["session_seq"].tolist() == [1, 1]


def test_state_diff_ops(ray_session):
    """I/U/D classification incl. tombstones, re-inserts, and unchanged
    keys (which must emit nothing)."""
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.ordered import state_diff

    rows = [
        # key 1: insert before cut1, unchanged after -> no row
        dict(k=1, o=1, v="a", dead=False),
        # key 2: insert before cut1, updated between cuts -> U
        dict(k=2, o=2, v="b", dead=False),
        dict(k=2, o=12, v="b2", dead=False),
        # key 3: inserted between cuts -> I
        dict(k=3, o=13, v="c", dead=False),
        # key 4: live at cut1, tombstoned between -> D
        dict(k=4, o=4, v="d", dead=False),
        dict(k=4, o=14, v="", dead=True),
        # key 5: tombstoned before cut1, re-inserted between -> I
        dict(k=5, o=3, v="e", dead=False),
        dict(k=5, o=5, v="", dead=True),
        dict(k=5, o=15, v="e2", dead=False),
        # key 6: dead at both cuts -> no row
        dict(k=6, o=6, v="", dead=True),
        # key 7: created after cut2 -> no row
        dict(k=7, o=30, v="g", dead=False),
        # key 8: updated between cuts then tombstoned before cut2 -> D
        dict(k=8, o=7, v="h", dead=False),
        dict(k=8, o=16, v="h2", dead=False),
        dict(k=8, o=17, v="", dead=True),
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = (
        state_diff(ds, "k", "o", 10, 20, ["v"], deleted_col="dead", num_partitions=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = {int(r.k): (r.op, None if r.v is None or r.v != r.v else r.v) for r in out.itertuples(index=False)}
    assert got == {
        2: ("U", "b2"),
        3: ("I", "c"),
        4: ("D", None),
        5: ("I", "e2"),
        8: ("D", None),
    }
    d_rows = out[out["op"] == "D"]
    assert d_rows["new_o"].isna().all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_state_diff_random_streams_vs_bruteforce(seed, ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.ordered import state_diff

    rng = np.random.default_rng(seed)
    n = 3000
    t = pa.table(
        {
            "k": rng.integers(0, 80, n),
            "o": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 5, n),
            "dead": rng.random(n) < 0.2,
        }
    )
    cut1, cut2 = n // 3, (2 * n) // 3

    def brute(cut):
        state = {}
        for r in t.to_pylist():
            if r["o"] < cut:
                state[r["k"]] = r
        return {k: r for k, r in state.items() if not r["dead"]}

    s1, s2 = brute(cut1), brute(cut2)
    want = {}
    for k, r in s2.items():
        if k not in s1:
            want[k] = ("I", r["o"])
        elif s1[k]["o"] != r["o"]:
            want[k] = ("U", r["o"])
    for k in s1:
        if k not in s2:
            want[k] = ("D", None)

    out = state_diff(
        ray.data.from_arrow(t).repartition(5), "k", "o", cut1, cut2, ["v"],
        deleted_col="dead", num_partitions=3,
    ).to_pandas()
    got = {
        int(r.k): (r.op, None if r.op == "D" else int(r.new_o))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_column_lww_partial_updates(ray_session):
    """Column-level LWW: each field keeps its own latest non-null write;
    row-level LWW would lose field A's value when a later event touched
    only field B."""
    import numpy as np
    import ray.data

    from etl_rs_ray.stages.ordered import column_lww_per_key

    t = pa.table(
        {
            "k": ["x", "x", "x", "y", "y", "z"],
            "seq": [1, 2, 3, 1, 2, 1],
            "a": pa.array([10, None, None, 7, None, None], pa.int64()),
            "b": pa.array([None, 20, None, None, 8, None], pa.int64()),
        }
    )
    out = pa.Table.from_pylist(
        column_lww_per_key(
            ray.data.from_arrow(t).repartition(3), "k", "seq", ["a", "b"]
        ).take_all()
    ).sort_by("k")
    assert out.column("k").to_pylist() == ["x", "y", "z"]
    # x: a written at seq 1 survives the b-only write at seq 2
    assert out.column("a").to_pylist() == [10, 7, None]
    assert out.column("b").to_pylist() == [20, 8, None]
    assert out.column("seq_last").to_pylist() == [3, 2, 1]

    # randomized cross-check vs a python oracle
    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.integers(0, 40, n)
    seq = rng.permutation(n)
    a = np.where(rng.random(n) < 0.3, rng.integers(0, 100, n), -1)
    b = np.where(rng.random(n) < 0.3, rng.integers(0, 100, n), -1)
    big = pa.table(
        {
            "k": pa.array([f"k{v}" for v in keys], pa.string()),
            "seq": pa.array(seq, pa.int64()),
            "a": pa.array(np.where(a < 0, None, a), pa.int64()),
            "b": pa.array(np.where(b < 0, None, b), pa.int64()),
        }
    )
    got = pa.Table.from_pylist(
        column_lww_per_key(
            ray.data.from_arrow(big).repartition(8), "k", "seq", ["a", "b"], num_partitions=4
        ).take_all()
    ).sort_by("k")
    want = {}
    order = np.argsort(seq)
    for i in order:
        key = f"k{keys[i]}"
        cur = want.setdefault(key, {"a": None, "b": None, "seq": None})
        if a[i] >= 0:
            cur["a"] = int(a[i])
        if b[i] >= 0:
            cur["b"] = int(b[i])
        cur["seq"] = int(seq[i])
    for krow, arow, brow, srow in zip(
        got.column("k").to_pylist(), got.column("a").to_pylist(),
        got.column("b").to_pylist(), got.column("seq_last").to_pylist(),
    ):
        assert want[krow] == {"a": arow, "b": brow, "seq": srow}
