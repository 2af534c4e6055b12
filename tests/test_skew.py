"""Skew: a hot (repo, path) holding half the event stream must still merge
correctly; the hot key inflates one bucket only and per-bucket work stays
O(n log n) (sort + neighbor mask), never the reference's O(n²) cross join."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.datagen import EVENT_SCHEMA, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


def _skewed_events(n=4000, hot_frac=0.5, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    lsn = 0
    n_hot = int(n * hot_frac)
    # hot key: one file version receiving thousands of updates
    rows.append({"lsn": lsn, "op": "I", "repo": "hot/repo", "path": "src/hot.py",
                 "commit": "h" * 40, "lang": "py", "content": "v0"})
    lsn += 1
    for i in range(n_hot):
        rows.append({"lsn": lsn, "op": "U", "repo": "hot/repo", "path": "src/hot.py",
                     "commit": "h" * 40, "lang": "py", "content": f"v{lsn}"})
        lsn += 1
    for i in range(n - n_hot):
        rows.append({"lsn": lsn, "op": "I", "repo": f"org{i % 5}/r{i % 11}",
                     "path": f"src/f{i}.py", "commit": f"{i:040x}", "lang": "py",
                     "content": f"cold-{i}"})
        lsn += 1
    rng.shuffle(rows)
    return pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)


def test_hot_key_replay(tmp_path):
    events = _skewed_events()
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=500)
    table_dir = str(tmp_path / "table")
    res = replay(log_dir, table_dir, num_buckets=8)
    assert res.committed
    oracle = oracle_replay(events)
    snap = LakeTable(table_dir).snapshot_table()
    assert snap.num_rows == len(oracle)
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in snap.to_pylist()
    }
    for k, (lsn, lang, content) in oracle.items():
        assert got[k] == (lsn, content), k
    # the hot key collapsed to its final update
    hot = got[("hot/repo", "src/hot.py", "h" * 40)]
    assert hot[1] == f"v{hot[0]}"
    assert res.metrics["superseded_dropped"] > 1000


def test_hot_key_replay_streamed_fold(tmp_path, monkeypatch):
    """Streamed xpart folding: with a tiny fold threshold the reducer
    compacts per-bucket accumulations incrementally (many folds) and still
    produces the exact oracle state — a hot partition never needs the whole
    event window in one heap."""
    monkeypatch.setenv("ETL_RS_RAY_FOLD_ROWS", "64")
    events = _skewed_events(n=3000, hot_frac=0.6, seed=9)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=3, events_per_segment=200)
    table_dir = str(tmp_path / "table")
    res = replay(log_dir, table_dir, num_buckets=4)
    assert res.committed
    oracle = oracle_replay(events)
    snap = LakeTable(table_dir).snapshot_table()
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in snap.to_pylist()
    }
    assert got == {k: (lsn, content) for k, (lsn, lang, content) in oracle.items()}
    # stats survive the incremental fold unchanged
    assert res.metrics["superseded_dropped"] >= 1500
    assert res.metrics["events_read"] == events.num_rows


def _hdd_rows(n, seed=11, dup_frac=0.1):
    """Single-Nom contact rows: dup_frac of rows share a PCE/Email/Tel with
    an earlier row (real clusters); the rest have distinct attributes."""
    rng = np.random.default_rng(seed)
    rows = []
    from etl_rs_ray.stages.dedup_hdd import (
        EMAIL, ID, ID_SOURCE, NOM, PCE, PRENOM, RAISON_SOCIALE, SIRET, SIRET_SUCC, TELEPHONE,
    )
    for i in range(n):
        r = {
            ID: f"{i:07d}", NOM: "MARTIN", PRENOM: "JEAN" if i % 3 else None,
            PCE: f"pce{i}", EMAIL: f"e{i}@x.fr", TELEPHONE: f"+33 {i:09d}",
            SIRET: None if i % 7 else f"{i:014d}", SIRET_SUCC: None,
            RAISON_SOCIALE: f"rs{i}", ID_SOURCE: f"s{i}",
        }
        if i and rng.random() < dup_frac:
            j = int(rng.integers(0, i))
            attr = (PCE, EMAIL, TELEPHONE)[int(rng.integers(0, 3))]
            r[attr] = rows[j][attr]
        rows.append(r)
    return rows


def test_indexed_pair_detection_matches_cross_join():
    """detect_pairs_indexed == detect_pairs (pairs, order, clusters)."""
    from etl_rs_ray.stages.dedup_hdd import (
        detect_pairs, detect_pairs_indexed, eliminate_subsets, merge_pairs,
    )

    rows = _hdd_rows(400, seed=13, dup_frac=0.25)
    p1, p2 = detect_pairs(rows), detect_pairs_indexed(rows)
    assert p1 == p2 and len(p1) > 10
    c1 = eliminate_subsets(merge_pairs(p1))
    c2 = eliminate_subsets(merge_pairs(p2))
    assert c1 == c2


def test_50k_single_nom_group_dedups(tmp_path):
    """A 50k-row single-Nom group (the reference's pathological case) now
    DEDUPS via attribute bucketing instead of passing through, and matches
    the O(n²) path on a subsample."""
    import time

    from etl_rs_ray.stages.dedup_hdd import (
        dedup_group, detect_pairs, detect_pairs_indexed,
    )

    rows = _hdd_rows(50_000, seed=17, dup_frac=0.05)
    t0 = time.perf_counter()
    pairs = detect_pairs_indexed(rows)
    elapsed = time.perf_counter() - t0
    assert elapsed < 30, f"indexed detection too slow: {elapsed:.1f}s"
    assert len(pairs) > 500

    # subsample equivalence against the O(n²) reference shape
    sub = rows[:2000]
    assert detect_pairs_indexed(sub) == detect_pairs(sub)

    # end-to-end group dedup actually removes clustered rows now
    t = pa.Table.from_pylist(rows)
    out = dedup_group(t)
    assert out.num_rows < len(rows)
    ids_col = out.column("IDS").to_pylist()
    assert any(v is not None and "/" in v for v in ids_col)  # merged clusters exist


def test_asof_join_hot_key():
    """One key owns 90% of both sides: the group-local binary search is
    O((l+r) log r), so a hot key inflates one group but never goes
    quadratic — verify correctness on the skewed group."""
    import datetime as dt

    import pyarrow as pa

    from etl_rs_ray.stages.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    n = 3000
    left = pa.table(
        {
            "lid": pa.array(range(n), pa.int64()),
            "k": pa.array([7] * (n * 9 // 10) + list(range(1, n // 10 + 1)), pa.int64()),
            "ts": pa.array([base + dt.timedelta(seconds=i * 7) for i in range(n)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "k": pa.array([7] * (n * 9 // 10) + list(range(1, n // 10 + 1)), pa.int64()),
            "ts": pa.array([base + dt.timedelta(seconds=i * 11) for i in range(n)], pa.timestamp("us")),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(4),
        key_col="k", time_col="ts",
        left_cols=["lid", "k", "ts"], right_cols=["rid", "ts"],
        num_partitions=4,
    ).take_all()
    assert len(out) == n
    # spot-check the hot key against a driver-side oracle
    import numpy as np

    l_hot = [(r["lid"], r["ts"], r["rid_r"]) for r in out if r["k"] == 7]
    rt = sorted((right.column("ts")[i].as_py(), right.column("rid")[i].as_py())
                for i in range(n) if right.column("k")[i].as_py() == 7)
    rts = [t for t, _ in rt]
    for lid, ts, rid_r in l_hot:
        pos = np.searchsorted(rts, ts, side="right") - 1
        want = rt[pos][1] if pos >= 0 else None
        assert rid_r == want, (lid, ts, rid_r, want)


def test_session_windows_hot_user():
    """90% of events belong to one user: the vectorized islands pass is
    O(n log n) per group; sessions still split correctly at gaps."""
    import datetime as dt

    import pyarrow as pa

    from etl_rs_ray.stages.temporal import session_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = []
    # hot user: 3 bursts of 600 events 10s apart, bursts separated by 2h
    for burst in range(3):
        for i in range(600):
            rows.append({"ts": base + dt.timedelta(hours=3 * burst, seconds=10 * i), "uid": 7, "v": 1.0})
    for u in range(1, 21):
        rows.append({"ts": base + dt.timedelta(minutes=u), "uid": 100 + u, "v": 2.0})
    t = pa.Table.from_pylist(rows).cast(
        pa.schema([("ts", pa.timestamp("us")), ("uid", pa.int64()), ("v", pa.float64())])
    )
    out = session_window_agg(
        ray.data.from_arrow(t).repartition(5), "ts", "uid", "v",
        gap_seconds=1800, num_partitions=4,
    ).take_all()
    hot = [r for r in out if r["uid"] == 7]
    assert len(hot) == 3
    assert all(r["n_events"] == 600 and r["sum_value"] == 600.0 for r in hot)
    assert sum(1 for r in out if r["uid"] != 7) == 20


def test_5m_hot_key_replay_bounded_heap(tmp_path, monkeypatch):
    """The depth drill: 5M events, 50% on ONE key, forced through a
    SINGLE exchange partition with a capped fold threshold. The merge
    task's resident row count (peak_fold_rows) must stay O(distinct keys
    + fold_rows) — never O(window events): the 2.5M hot-key redeliveries
    stream through the incremental LWW fold instead of accumulating."""
    import pyarrow.compute as pc_

    n = 5_000_000
    n_hot = n // 2
    n_cold_keys = 200_000  # cold side repeats too: output stays << window
    fold_rows = 65_536
    monkeypatch.setenv("ETL_RS_RAY_FOLD_ROWS", str(fold_rows))

    # vectorized event construction (5M pylist dicts would dominate the test)
    lsn = pa.array(np.arange(n, dtype=np.int64))
    hot = np.arange(n) < n_hot
    op = pa.array(np.where(hot, "U", "I"))
    repo = pa.array(np.where(hot, "hot/repo", "cold/repo"))
    cold_ids = np.where(hot, 0, (np.arange(n) - n_hot) % n_cold_keys)
    path = pa.array(np.where(hot, "src/hot.py", np.char.add("src/f", cold_ids.astype(str))))
    commit = pa.array(np.where(hot, "h" * 40, np.char.zfill(cold_ids.astype(str), 40)))
    lang = pa.array(np.full(n, "py"))
    content = pa.array(np.char.add("v", np.arange(n).astype(str)))
    events = pa.table(
        {"lsn": lsn, "op": op, "repo": repo, "path": path,
         "commit": commit, "lang": lang, "content": content},
        schema=EVENT_SCHEMA,
    )

    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=1_000_000)
    table_dir = str(tmp_path / "table")
    res = replay(log_dir, table_dir, num_buckets=8, shuffle_partitions=1)
    assert res.committed

    distinct_keys = n_cold_keys + 1
    assert res.rows_total == distinct_keys
    snap = LakeTable(table_dir).snapshot_table()
    hot_rows = snap.filter(pc_.equal(snap.column("repo"), "hot/repo"))
    assert hot_rows.num_rows == 1
    assert hot_rows.column("lsn")[0].as_py() == n_hot - 1
    assert hot_rows.column("content")[0].as_py() == f"v{n_hot - 1}"
    assert res.metrics["superseded_dropped"] == n - distinct_keys

    peak = res.metrics["peak_fold_rows"]
    assert peak > 0
    # bound: winners accumulated so far + one raw drain batch (+ slack for
    # per-bucket pending below the threshold). The pre-fix behavior —
    # whole-partition accumulation — would put peak near n.
    bound = distinct_keys + 2 * fold_rows + 8 * fold_rows  # 8 buckets pending
    assert peak <= bound, f"merge task held {peak} rows (bound {bound})"
    assert peak < n // 5
