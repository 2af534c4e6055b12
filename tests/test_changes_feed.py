"""Lake change-data-feed (LakeTable.changes): the I/U/D diff between two
committed epochs must reconcile snapshot(from) into snapshot(to), match
the oracle replay's state delta, and be shuffle-free per bucket."""

import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


def _setup(tmp_path, n=300, seed=17):
    repos = generate_repos(n_files=n, seed=seed)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.25, dup_frac=0.05, seed=seed)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    return events, log_dir


def _oracle_state(events, lsn_to=None):
    return {k: (lsn, content) for k, (lsn, lang, content) in oracle_replay(events, lsn_to).items()}


def _expected_feed(events, cut, ray_session=None):
    s1 = _oracle_state(events, cut)
    s2 = _oracle_state(events)
    out = {}
    for k, (lsn, content) in s2.items():
        if k not in s1:
            out[k] = ("I", lsn, content)
        elif s1[k][0] != lsn:
            out[k] = ("U", lsn, content)
    for k in s1:
        if k not in s2:
            out[k] = ("D", None, None)
    return out


def test_changes_between_epochs_matches_oracle(tmp_path, ray_session):
    events, log_dir = _setup(tmp_path)
    max_lsn = pc.max(events.column("lsn")).as_py()
    cut = max_lsn // 2
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, target_lsn=cut, num_buckets=4).committed
    assert replay(log_dir, table_dir, num_buckets=4, mode="delta").committed

    lake = LakeTable(table_dir)
    feed = lake.changes(0, 1).to_pandas()
    got = {
        (r.repo, r.path, r.commit): (
            r.op,
            None if r.op == "D" else int(r.change_lsn),
            None if r.op == "D" else r.content,
        )
        for r in feed.itertuples(index=False)
    }
    assert got == _expected_feed(events, cut)
    # the feed applied to snapshot(0) reproduces snapshot(1)
    s0 = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in lake.snapshot_table(epoch=0).to_pylist()
    }
    for k, (op, lsn, content) in got.items():
        if op == "D":
            s0.pop(k, None)
        else:
            s0[k] = (lsn, content)
    s1 = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in lake.snapshot_table(epoch=1).to_pylist()
    }
    assert s0 == s1


def test_changes_bootstrap_is_all_inserts(tmp_path, ray_session):
    events, log_dir = _setup(tmp_path, n=120, seed=5)
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, num_buckets=4).committed
    lake = LakeTable(table_dir)
    feed = lake.changes(None).to_pandas()
    assert set(feed["op"]) == {"I"}
    assert len(feed) == lake.snapshot_table().num_rows


def test_changes_same_epoch_is_empty(tmp_path, ray_session):
    events, log_dir = _setup(tmp_path, n=80, seed=9)
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, num_buckets=4).committed
    lake = LakeTable(table_dir)
    assert lake.changes(0, 0).to_pandas().empty


def test_changes_include_old_and_ivm(tmp_path, ray_session):
    """include_old carries the from-epoch state; maintaining a grouped
    count view epoch-by-epoch equals recomputing it from the snapshot."""
    import pyarrow as pa

    from etl_rs_ray.stages.ivm import maintain_grouped_agg

    events, log_dir = _setup(tmp_path, n=250, seed=23)
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, target_lsn=max_lsn // 3, num_buckets=4).committed
    assert replay(log_dir, table_dir, target_lsn=2 * max_lsn // 3, num_buckets=4, mode="delta").committed
    assert replay(log_dir, table_dir, num_buckets=4, mode="delta").committed
    lake = LakeTable(table_dir)
    assert lake.current_epoch() == 2

    # old_* columns: U rows carry the prior lsn, I rows carry nulls,
    # D rows carry the retracted state (checked over both transitions —
    # where each op lands depends on the seed)
    import pandas as pd

    feed = pd.concat(
        [
            lake.changes(0, 1, include_old=True).to_pandas(),
            lake.changes(1, 2, include_old=True).to_pandas(),
        ]
    )
    u = feed[feed["op"] == "U"]
    assert len(u) and (u["old_lsn"] < u["change_lsn"]).all()
    i = feed[feed["op"] == "I"]
    assert len(i) and i["old_lsn"].isna().all()
    d = feed[feed["op"] == "D"]
    assert len(d) and d["old_content"].notna().all() and d["content"].isna().all()

    view = None
    for e in range(lake.current_epoch() + 1):
        f = lake.changes(e - 1 if e > 0 else None, e, include_old=True)
        view = maintain_grouped_agg(view, f, "lang")
    snap = lake.snapshot_table()
    g = pa.TableGroupBy(snap.select(["lang"]), "lang").aggregate([([], "count_all")])
    want = dict(zip(g.column("lang").to_pylist(), g.column("count_all").to_pylist()))
    got = dict(zip(view.column("lang").to_pylist(), view.column("n").to_pylist()))
    assert got == want


def test_ivm_sum_and_group_change(ray_session):
    """U rows that MOVE a key between groups retract from the old group
    and add to the new one; groups drained to zero disappear."""
    import pyarrow as pa
    import ray.data

    from etl_rs_ray.stages.ivm import maintain_grouped_agg

    base = pa.table(
        {
            "op": ["I", "I", "I"],
            "g": ["a", "a", "b"],
            "v": [10, 20, 5],
            "old_g": pa.nulls(3, pa.string()),
            "old_v": pa.nulls(3, pa.int64()),
        }
    )
    view = maintain_grouped_agg(None, ray.data.from_arrow(base), "g", sum_cols=["v"])
    assert view.to_pylist() == [
        {"g": "a", "n": 2, "sum_v": 30},
        {"g": "b", "n": 1, "sum_v": 5},
    ]
    delta = pa.table(
        {
            "op": ["U", "D"],
            "g": ["b", None],
            "v": [11, None],
            "old_g": ["a", "b"],
            "old_v": [10, 5],
        }
    )
    view = maintain_grouped_agg(view, ray.data.from_arrow(delta), "g", sum_cols=["v"])
    assert view.to_pylist() == [
        {"g": "a", "n": 1, "sum_v": 20},
        {"g": "b", "n": 1, "sum_v": 11},
    ]


def test_expire_before_tombstones_through_log(tmp_path, ray_session):
    """Retention expiry appends D events and delta-replays them: expired
    keys vanish, the rest survive, a from-scratch replay of the SAME log
    reproduces the expired state (erasure is in the log, not a side
    mutation), and re-running expires nothing."""
    import pyarrow as pa

    from etl_rs_ray.pipelines.cdc import expire_before

    events, log_dir = _setup(tmp_path, n=200, seed=41)
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, num_buckets=4).committed
    lake = LakeTable(table_dir)
    before = lake.snapshot_table()
    cut = int(pc.max(events.column("lsn")).as_py() * 2) // 3

    out = expire_before(log_dir, table_dir, cut, num_buckets=4)
    assert out["committed"] and out["expired"] > 0

    lake = LakeTable(table_dir)
    after = lake.snapshot_table()
    keep = before.filter(pc.greater_equal(before.column("lsn"), cut))
    assert after.num_rows == keep.num_rows == before.num_rows - out["expired"]
    k = lambda t: {(r["repo"], r["path"], r["commit"]) for r in t.to_pylist()}
    assert k(after) == k(keep)

    # the log is the source of truth: a fresh replay reproduces the state
    t2 = str(tmp_path / "t2")
    assert replay(log_dir, t2, num_buckets=4).committed
    assert k(LakeTable(t2).snapshot_table()) == k(after)

    # idempotent: everything live now postdates the cut
    again = expire_before(log_dir, table_dir, cut, num_buckets=4)
    assert again["expired"] == 0

    # tombstones follow the LOG's partition layout (2 parts in _setup):
    # no new part=N dirs appear
    import os

    parts = {d for d in os.listdir(log_dir) if d.startswith("part=")}
    assert parts == {"part=0", "part=1"}


def test_changes_bucket_emptied_at_to_epoch(tmp_path, ray_session):
    """An overwrite replay that leaves a bucket with no files at the new
    epoch must emit D rows for that bucket's previously-live keys, not
    crash on the schemaless empty side."""
    import pyarrow as pa

    from etl_rs_ray.datagen import generate_repos

    events, log_dir = _setup(tmp_path, n=120, seed=7)
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, num_buckets=4).committed
    lake = LakeTable(table_dir)
    live0 = lake.snapshot_table().num_rows

    # overwrite with a tiny disjoint log -> most buckets empty at epoch 1
    repos2 = generate_repos(n_files=3, seed=99)
    ev2 = generate_events(repos2, update_frac=0.0, delete_frac=0.0, dup_frac=0.0, seed=99)
    log2 = str(tmp_path / "log2")
    write_event_log(ev2, log2, num_partitions=2)
    assert replay(log2, table_dir, num_buckets=4, mode="overwrite").committed

    feed = LakeTable(table_dir).changes(0, 1, include_old=True).to_pandas()
    d = feed[feed["op"] == "D"]
    assert len(d) >= live0 - 3  # every dropped key surfaced as a delete
    assert d["old_lsn"].notna().all()


def test_expire_catches_up_before_selecting(tmp_path, ray_session):
    """A key whose newer version (past the cut) sits UNAPPLIED in the
    log must survive expiry — the stale-snapshot over-delete case."""
    import pyarrow as pa

    from etl_rs_ray.pipelines.cdc import expire_before
    from etl_rs_ray.sources.event_log import EVENT_SCHEMA, EventLogWriter

    key = ("org0/p", "src/a.py", "c0")
    rows = [
        {"lsn": 0, "op": "I", "repo": key[0], "path": key[1], "commit": key[2],
         "lang": "py", "content": "v0"},
        {"lsn": 1, "op": "I", "repo": "org0/p", "path": "src/b.py", "commit": "c1",
         "lang": "py", "content": "old"},
        # the update that must save `key` from expiry, NOT yet applied
        {"lsn": 10, "op": "U", "repo": key[0], "path": key[1], "commit": key[2],
         "lang": "py", "content": "v1"},
    ]
    log_dir = str(tmp_path / "log")
    EventLogWriter(log_dir, num_partitions=2).write(
        pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    )
    table_dir = str(tmp_path / "t")
    # apply ONLY lsn 0..1; lsn 10 stays unapplied in the log
    assert replay(log_dir, table_dir, target_lsn=1, num_buckets=4).committed

    out = expire_before(log_dir, table_dir, before_lsn=5, num_buckets=4)
    # only src/b.py (lsn 1 < 5, no newer version) expires
    assert out["expired"] == 1
    snap = LakeTable(table_dir).snapshot_table()
    live = {(r["repo"], r["path"], r["commit"]): r["content"] for r in snap.to_pylist()}
    assert live == {key: "v1"}


def test_changes_across_rebucket_boundary(tmp_path, ray_session):
    """A diff whose epochs straddle a rebucket must pair buckets at the
    gcd granularity, not by bucket ID: with a same-ID pairing, every key
    whose bucket id changed under the new count shows up as a phantom
    D(-1) in its old bucket plus a phantom I in its new one. Regression
    for the coarse-pairing fix (split AND shrink boundaries)."""
    events, log_dir = _setup(tmp_path, n=300, seed=23)
    max_lsn = pc.max(events.column("lsn")).as_py()
    cut = max_lsn // 2
    table_dir = str(tmp_path / "table")
    assert replay(log_dir, table_dir, target_lsn=cut, num_buckets=8).committed
    lake = LakeTable(table_dir)
    e_from = lake.current_epoch()
    assert lake.rebucket(32) is True  # split 8 -> 32
    assert replay(log_dir, table_dir).committed  # adopts 32 from manifest
    lake = LakeTable(table_dir)
    e_to = lake.current_epoch()
    assert int(lake.manifests.read(e_from)["num_buckets"]) != int(
        lake.manifests.read(e_to)["num_buckets"]
    )

    feed = lake.changes(e_from, e_to).to_pandas()
    got = {
        (r.repo, r.path, r.commit): (
            r.op,
            None if r.op == "D" else int(r.change_lsn),
            None if r.op == "D" else r.content,
        )
        for r in feed.itertuples(index=False)
    }
    assert len(got) == len(feed), "duplicate keys in feed (phantom D+I pairs)"
    assert got == _expected_feed(events, cut)

    # shrink boundary: diff the same pair of states the other way around
    # a 32 -> 8 merge epoch (state unchanged by the rebucket itself)
    assert lake.rebucket(8) is True
    lake = LakeTable(table_dir)
    e_shrunk = lake.current_epoch()
    feed2 = lake.changes(e_from, e_shrunk).to_pandas()
    got2 = {
        (r.repo, r.path, r.commit): (
            r.op,
            None if r.op == "D" else int(r.change_lsn),
            None if r.op == "D" else r.content,
        )
        for r in feed2.itertuples(index=False)
    }
    assert got2 == _expected_feed(events, cut)
