"""As-of join and tumbling window aggregation (stages/temporal.py)."""

import datetime as dt

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from etl_rs_ray.stages.temporal import asof_join, tumbling_window_agg


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _left():
    return pa.table(
        {
            "lid": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([10, 10, 20, 30], pa.int64()),
            "ts": pa.array([_ts(5), _ts(9), _ts(7), _ts(8)], pa.timestamp("us")),
            "lv": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )


def _right():
    return pa.table(
        {
            "rid": pa.array([100, 101, 102, 103], pa.int64()),
            "k": pa.array([10, 10, 10, 20], pa.int64()),
            "ts": pa.array([_ts(4), _ts(6), _ts(9), _ts(7, 30)], pa.timestamp("us")),
            "rv": pa.array([9.0, 8.0, 7.0, 6.0]),
        }
    )


def test_asof_join_backward_latest_and_nulls():
    out = asof_join(
        ray.data.from_arrow(_left()).repartition(2),
        ray.data.from_arrow(_right()).repartition(2),
        key_col="k",
        time_col="ts",
        left_cols=["lid", "k", "ts", "lv"],
        right_cols=["rid", "ts", "rv"],
        num_partitions=2,
    )
    rows = {r["lid"]: r for r in out.take_all()}
    assert rows[1]["rid_r"] == 100  # ts 5 -> latest right at 4
    assert rows[2]["rid_r"] == 102  # ts 9 -> right AT 9 matches (<=)
    assert rows[3]["rid_r"] is None  # right k=20 is at 7:30 > 7: no match
    assert rows[4]["rid_r"] is None  # no right rows for k=30 at all
    assert rows[1]["rv_r"] == 9.0 and rows[2]["rv_r"] == 7.0


def test_asof_join_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    con.register("l", _left())
    con.register("r", _right())
    want = con.sql(
        """SELECT l.lid, r.rid AS rid_r FROM l
           ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
           ORDER BY l.lid"""
    ).fetchall()
    out = asof_join(
        ray.data.from_arrow(_left()),
        ray.data.from_arrow(_right()),
        key_col="k",
        time_col="ts",
        left_cols=["lid", "k", "ts", "lv"],
        right_cols=["rid", "ts", "rv"],
        num_partitions=2,
    )
    got = sorted((r["lid"], r["rid_r"]) for r in out.take_all())
    assert got == [tuple(w) for w in want]


def _events():
    rows = []
    for i in range(100):
        rows.append(
            {
                "ts": dt.datetime(2024, 1, 1, i % 12, (i * 7) % 60),
                "typ": "a" if i % 2 == 0 else "b",
                "v": float(i),
            }
        )
    return pa.Table.from_pylist(rows).cast(
        pa.schema([("ts", pa.timestamp("us")), ("typ", pa.string()), ("v", pa.float64())])
    )


def _window_oracle(width_s):
    import duckdb

    con = duckdb.connect()
    con.register("e", _events())
    return {
        (w, t): (n, s)
        for w, t, n, s in con.sql(
            f"""SELECT time_bucket(INTERVAL {width_s} SECOND, ts), typ,
                       count(*), sum(v)
                FROM e GROUP BY 1, 2"""
        ).fetchall()
    }


def test_tumbling_window_agg_both_paths():
    want = _window_oracle(3600)
    for small in (True, False):
        out = tumbling_window_agg(
            ray.data.from_arrow(_events()).repartition(3),
            "ts",
            ["typ"],
            "v",
            width_seconds=3600,
            small_domain=small,
            num_partitions=2,
        )
        got = {
            (r["window_start"], r["typ"]): (r["n_events"], r["sum_value"])
            for r in out.take_all()
        }
        assert got == want, f"small_domain={small}"


def test_tumbling_window_null_values():
    t = pa.table(
        {
            "ts": pa.array([_ts(1), _ts(1, 30), _ts(2)], pa.timestamp("us")),
            "typ": pa.array(["a", "a", "a"]),
            "v": pa.array([1.0, None, 5.0]),
        }
    )
    out = tumbling_window_agg(
        ray.data.from_arrow(t), "ts", ["typ"], "v", width_seconds=3600
    ).take_all()
    by_win = {r["window_start"].hour: r for r in out}
    # null value still counts toward n_events, not toward sum/avg
    assert by_win[1]["n_events"] == 2
    assert by_win[1]["sum_value"] == 1.0
    assert by_win[1]["avg_value"] == 1.0
    assert by_win[2]["n_events"] == 1 and by_win[2]["sum_value"] == 5.0


def test_hopping_window_agg_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    con.register("e", _events())
    want = {
        (w, t): (n, s)
        for w, t, n, s in con.sql(
            """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - j.j * (INTERVAL 15 MINUTE),
                      typ, count(*), sum(v)
               FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
               GROUP BY 1, 2"""
        ).fetchall()
    }
    from etl_rs_ray.stages.temporal import hopping_window_agg

    for small in (True, False):
        out = hopping_window_agg(
            ray.data.from_arrow(_events()).repartition(3),
            "ts", ["typ"], "v", width_seconds=3600, hop_seconds=900,
            small_domain=small, num_partitions=2,
        )
        got = {
            (r["window_start"], r["typ"]): (r["n_events"], r["sum_value"])
            for r in out.take_all()
        }
        assert got == want, f"small_domain={small}"


def test_session_window_agg_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    # events with user key: reuse _events typ as key is string; build int key
    rows = []
    for i in range(120):
        rows.append(
            {
                "ts": dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=(i * 13) % 480),
                "uid": i % 5,
                "v": float(i),
            }
        )
    t = pa.Table.from_pylist(rows).cast(
        pa.schema([("ts", pa.timestamp("us")), ("uid", pa.int64()), ("v", pa.float64())])
    )
    con.register("e", t)
    want = {
        tuple(r[:3]): (r[3], r[4])
        for r in con.sql(
            """WITH x AS (
                 SELECT uid, ts, v,
                        CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END AS brk
                 FROM e WINDOW w AS (PARTITION BY uid ORDER BY ts)
               ), y AS (
                 SELECT *, sum(brk) OVER (PARTITION BY uid ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
                 FROM x)
               SELECT uid, min(ts), max(ts), count(*), sum(v)
               FROM y GROUP BY uid, sid"""
        ).fetchall()
    }
    from etl_rs_ray.stages.temporal import session_window_agg

    out = session_window_agg(
        ray.data.from_arrow(t).repartition(3), "ts", "uid", "v",
        gap_seconds=1800, num_partitions=2,
    )
    got = {
        (r["uid"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in out.take_all()
    }
    assert got == want


def test_funnel_counts_oracle():
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.temporal import funnel_counts

    base = dt.datetime(2024, 1, 1)
    rows = []
    # u1 completes all 3 in order; u2 view+click only; u3 clicks BEFORE
    # viewing (click must not count); u4 view only; u5 no relevant events
    seq = {
        1: [("view", 0), ("click", 10), ("purchase", 20)],
        2: [("view", 0), ("click", 5)],
        3: [("click", 0), ("view", 5), ("purchase", 10)],
        4: [("view", 3)],
        5: [("error", 1)],
    }
    for u, evs in seq.items():
        for t, s in evs:
            rows.append({"user_id": u, "event_type": t,
                         "ts": base + dt.timedelta(seconds=s)})
    t = pa.Table.from_pylist(rows).cast(pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("ts", pa.timestamp("us"))]))
    out = funnel_counts(ray.data.from_arrow(t).repartition(3),
                        "user_id", "event_type", "ts", ["view", "click", "purchase"])
    got = {r["step"]: r["n_users"] for r in out.to_pylist()}
    # view: u1,u2,u3,u4; click after view: u1,u2; purchase after that: u1,u3?
    # u3: view at 5, purchase at 10 but no click after 5 -> stops at view
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_retention_cohorts_matches_sql():
    import duckdb as _duck
    import numpy as np

    from etl_rs_ray.stages.temporal import retention_cohorts

    rng = np.random.default_rng(3)
    n = 8000
    base = dt.datetime(2024, 3, 1)
    t = pa.table(
        {
            "u": rng.integers(0, 200, n).astype(np.int64),
            "ts": pa.array(
                [base + dt.timedelta(minutes=int(m)) for m in rng.integers(0, 60 * 24 * 30, n)],
                pa.timestamp("us"),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    got = (
        retention_cohorts(ds, "u", "ts")
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    want = _duck.sql(
        """
        WITH ud AS (SELECT DISTINCT u, datediff('day', TIMESTAMP '1970-01-01', date_trunc('day', ts)) d FROM t),
        f AS (SELECT u, MIN(d) cohort FROM ud GROUP BY u)
        SELECT f.cohort AS cohort_day, ud.d - f.cohort AS day_offset, COUNT(*) AS n_users
        FROM ud JOIN f USING (u) GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    assert got.equals(want.reset_index(drop=True))
    # day-0 cell per cohort counts every cohort member exactly once
    day0 = got[got.day_offset == 0].set_index("cohort_day")["n_users"]
    firsts = want.groupby("cohort_day")["n_users"].max()
    assert (day0 >= 1).all() and set(day0.index) == set(firsts.index)


def test_gapfill_locf_matches_sql():
    import duckdb as _duck
    import numpy as np

    from etl_rs_ray.stages.temporal import gapfill_hourly_locf

    rng = np.random.default_rng(37)
    n = 3000
    base = dt.datetime(2024, 5, 1)
    # sparse hours so real gaps exist
    t = pa.table(
        {
            "k": rng.choice(["a", "b"], n),
            "ts": pa.array(
                [base + dt.timedelta(hours=int(h), minutes=int(m))
                 for h, m in zip(rng.choice(np.arange(0, 200, 7), n), rng.integers(0, 60, n))],
                pa.timestamp("us"),
            ),
            "v": rng.integers(-50, 500, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    got = (
        gapfill_hourly_locf(ds, "ts", "k", "v")
        .to_pandas()
        .sort_values(["k", "bucket_start"])
        .reset_index(drop=True)
    )
    want = _duck.sql(
        """
        WITH RECURSIVE e AS (SELECT k, epoch_us(ts) // 3600000000 AS h, v FROM t),
        agg AS (SELECT k, h, count(*) n, sum(v) s FROM e GROUP BY 1, 2),
        bounds AS (SELECT min(h) lo, max(h) hi FROM e),
        series(h) AS (SELECT lo FROM bounds UNION ALL SELECT h + 1 FROM series, bounds WHERE h < hi),
        ks AS (SELECT DISTINCT k FROM e),
        grid AS (SELECT ks.k, s.h FROM ks CROSS JOIN series s),
        j AS (SELECT g.k, g.h, coalesce(a.n, 0) n_events, a.s
              FROM grid g LEFT JOIN agg a USING (k, h)),
        f AS (SELECT *, count(s) OVER (PARTITION BY k ORDER BY h) grp FROM j)
        SELECT k, h AS bucket_start, n_events,
               max(s) OVER (PARTITION BY k, grp) AS sum_locf
        FROM f ORDER BY k, bucket_start
        """
    ).df()
    for c in ["bucket_start", "n_events"]:
        want[c] = want[c].astype("int64")
    got["sum_locf"] = got["sum_locf"].astype("float64")
    want["sum_locf"] = want["sum_locf"].astype("float64")
    assert got.equals(want.reset_index(drop=True))
    # every key covers the full global timeline
    spans = got.groupby("k")["bucket_start"].agg(["min", "max", "count"])
    assert spans["min"].nunique() == 1 and spans["max"].nunique() == 1
    assert (spans["count"] == spans["max"].iloc[0] - spans["min"].iloc[0] + 1).all()


def test_late_corrections_only_late_window(ray_session, tmp_path):
    """A window whose every event arrives late (after the watermark has
    moved past it) must still appear in the corrections output — the
    only-late union branch the driver tiers never exercise."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_rs_ray.pipelines.queries import ORACLE_SQL, QUERIES

    h = 3_600_000_000  # 1h in us
    base = np.datetime64("2025-03-01T00:00:00", "us")
    rows = [
        # on-time events in hours 0 and 2 push the watermark forward
        (0, base + np.timedelta64(0, "us"), 1, "a", 1.0),
        (1, base + np.timedelta64(10 * 60, "s"), 1, "a", 2.0),
        (2, base + np.timedelta64(2 * 3600, "s"), 1, "a", 3.0),
        # hour-1 events arrive AFTER the wm reached hour 2 -> entire
        # hour-1 window is late-only
        (3, base + np.timedelta64(3600 + 100, "s"), 1, "a", 4.0),
        (4, base + np.timedelta64(3600 + 200, "s"), 1, "a", 5.0),
        (5, base + np.timedelta64(2 * 3600 + 300, "s"), 1, "a", 6.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")

    got = QUERIES["events_late_corrections"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["events_late_corrections"]).fetchdf()
    g = got.sort_values("window_start").reset_index(drop=True)
    w = want.sort_values("window_start").reset_index(drop=True)
    assert g[sorted(g.columns)].equals(w[sorted(w.columns)].astype(g[sorted(g.columns)].dtypes.to_dict()))
    # the hour-1 window exists with zero on-time rows
    only_late = g[(g["n_on_time"] == 0) & (g["n_late"] > 0)]
    assert len(only_late) == 1


def test_coalesce_intervals_dense_overlaps(ray_session):
    """Dense overlapping/touching/nested/duplicate intervals vs a brute
    force sweep — the sf tiers are overlap-sparse, this isn't."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.temporal import coalesce_intervals

    rng = np.random.default_rng(6)
    n = 4000
    k = rng.integers(0, 25, n)
    s = rng.integers(0, 500, n).astype(np.int64)
    e = s + rng.integers(0, 60, n).astype(np.int64)  # zero-length too
    t = pa.table({"k": k, "s": s, "e": e})
    got = (
        coalesce_intervals(ray.data.from_arrow(t).repartition(5), "k", "s", "e",
                           num_partitions=3)
        .to_pandas()
        .sort_values(["k", "island"])
        .reset_index(drop=True)
    )

    # brute force per key
    want = []
    for key in sorted(set(k.tolist())):
        ivs = sorted(
            [(int(a), int(b)) for a, b, kk in zip(s, e, k) if kk == key]
        )
        isl, cs, ce, cnt = [], None, None, 0
        for a, b in ivs:
            if cs is None or a > ce:
                if cs is not None:
                    isl.append((cs, ce, cnt))
                cs, ce, cnt = a, b, 1
            else:
                ce = max(ce, b)
                cnt += 1
        if cs is not None:
            isl.append((cs, ce, cnt))
        for i, (a, b, c) in enumerate(isl, 1):
            want.append((key, i, a, b, c))

    got_rows = [
        (int(r.k), int(r.island), int(r.island_start), int(r.island_end), int(r.n_intervals))
        for r in got.itertuples(index=False)
    ]
    assert got_rows == want
