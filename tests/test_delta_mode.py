"""LSM-style delta mode: append-only delta epochs + merge-on-read +
compaction — sparse deltas must not rewrite base buckets."""

import os

import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


def _setup(tmp_path, n=200, seed=31):
    repos = generate_repos(n_files=n, seed=seed)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.2, dup_frac=0.05, seed=seed)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    return events, log_dir


def _state(table):
    return {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in table.to_pylist()
    }


def _oracle_state(events, lsn_to=None):
    return {k: (lsn, content) for k, (lsn, lang, content) in oracle_replay(events, lsn_to).items()}


def test_delta_epochs_match_oracle_and_keep_base(tmp_path):
    events, log_dir = _setup(tmp_path)
    max_lsn = pc.max(events.column("lsn")).as_py()
    cut = max_lsn // 2
    table_dir = str(tmp_path / "table")
    # epoch 1: base upsert of the first half
    r1 = replay(log_dir, table_dir, target_lsn=cut, num_buckets=4)
    assert r1.committed
    lake = LakeTable(table_dir)
    base_files = set(lake.data_files())
    base_mtimes = {f: os.path.getmtime(f) for f in base_files}

    # epoch 2: the rest as an APPENDED delta — base files untouched
    r2 = replay(log_dir, table_dir, num_buckets=4, mode="delta")
    assert r2.committed
    lake = LakeTable(table_dir)
    assert lake.has_deltas()
    for f in base_files:
        assert os.path.getmtime(f) == base_mtimes[f]  # no base rewrite

    # merge-on-read equals the full oracle (driver + Dataset paths)
    want = _oracle_state(events)
    assert _state(lake.snapshot_table()) == want
    ds_rows = lake.snapshot().take_all()
    import pyarrow as pa

    assert _state(pa.Table.from_pylist(ds_rows)) == want

    # compaction folds deltas, preserves state, clears delta lists
    assert lake.compact()
    lake = LakeTable(table_dir)
    assert not lake.has_deltas()
    assert _state(lake.snapshot_table()) == want

    # post-compaction incremental upsert still works from the HWM
    assert lake.hwm_lsn() == max_lsn
    r3 = replay(log_dir, table_dir, num_buckets=4)
    assert not r3.committed  # nothing new


def test_many_delta_epochs_then_compact_and_vacuum(tmp_path):
    events, log_dir = _setup(tmp_path, n=150, seed=37)
    max_lsn = pc.max(events.column("lsn")).as_py()
    cuts = [max_lsn // 4, max_lsn // 2, 3 * max_lsn // 4, None]
    table_dir = str(tmp_path / "table")
    r = replay(log_dir, table_dir, target_lsn=cuts[0], num_buckets=3)
    assert r.committed
    for cut in cuts[1:]:
        r = replay(log_dir, table_dir, target_lsn=cut, num_buckets=3, mode="delta")
        assert r.committed
    lake = LakeTable(table_dir)
    # several delta files per bucket accumulated
    assert max(len(v) for v in lake.bucket_file_sets().values()) >= 3
    want = _oracle_state(events)
    assert _state(lake.snapshot_table()) == want
    assert lake.compact()
    lake = LakeTable(table_dir)
    assert not lake.has_deltas()
    assert _state(lake.snapshot_table()) == want
    # vacuum removes the superseded base + delta files, keeps current state
    removed = lake.vacuum(keep_epochs=1)
    assert removed
    lake = LakeTable(table_dir)
    assert _state(lake.snapshot_table()) == want
    import os as _os

    for files in lake.bucket_file_sets().values():
        for f in files:
            assert _os.path.exists(f)


def test_delta_tombstones_delete_base_rows(tmp_path):
    events, log_dir = _setup(tmp_path, n=80, seed=33)
    max_lsn = pc.max(events.column("lsn")).as_py()
    # first: inserts only (ops I occupy the low lsns)
    table_dir = str(tmp_path / "table")
    r1 = replay(log_dir, table_dir, target_lsn=79, num_buckets=2)
    assert r1.committed
    before = LakeTable(table_dir).snapshot_table().num_rows
    r2 = replay(log_dir, table_dir, num_buckets=2, mode="delta")
    assert r2.committed
    lake = LakeTable(table_dir)
    want = _oracle_state(events)
    got = _state(lake.snapshot_table())
    assert got == want
    # deletes happened: final key count below the insert-only count
    assert len(want) < 80 or before >= len(want)


def test_maybe_compact_policy(tmp_path):
    """Auto-compaction triggers only past the depth bound, and the
    snapshot is identical before and after."""
    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay
    from etl_rs_ray.sources.lake import LakeTable

    repos = generate_repos(n_files=300, seed=21)
    events = generate_events(repos, seed=21)
    log = str(tmp_path / "log")
    write_event_log(events, log, num_partitions=2)
    table = str(tmp_path / "table")
    max_lsn = int(events.column("lsn")[len(events) - 1].as_py())
    cuts = [int(max_lsn * f) for f in (0.3, 0.5, 0.65, 0.8, 0.9)] + [max_lsn]
    replay(log, table, target_lsn=cuts[0], num_buckets=4)
    lake = LakeTable(table)
    for cut in cuts[1:]:
        replay(log, table, target_lsn=cut, num_buckets=4, mode="delta")
    depth = lake.max_delta_depth()
    assert depth >= 5
    # below the bound: no-op
    assert lake.maybe_compact(max_delta_depth=depth) is False
    before = lake.snapshot_table().sort_by([("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")])
    # above the bound: compacts, snapshot unchanged, depth resets
    assert lake.maybe_compact(max_delta_depth=2) is True
    assert lake.max_delta_depth() == 0
    after = lake.snapshot_table().sort_by([("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")])
    assert before.select(sorted(before.column_names)).equals(after.select(sorted(after.column_names)))
