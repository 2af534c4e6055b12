"""Online bucket-count change (LakeTable.rebucket): shuffle-free
k-multiple split/merge. With bucket = hash mod N, a row of old bucket b
can only land in child b + j*N (split) and new bucket b mod M gathers
exactly its k contributors (shrink) — so the migration is one
independent task per bucket, never an exchange. The epoch commits like
any other: atomic, time-travelable, and the next replay picks the new
count up from the manifest."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import fast_hash_bucket
from etl_rs_ray.sources.lake import LakeTable


def _make_log(tmp_path, n_files=500, seed=41):
    repos = generate_repos(n_files=n_files, seed=seed)
    ev = generate_events(repos, seed=seed)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    max_lsn = pc.max(ev.column("lsn")).as_py()
    return log, max_lsn


def _state(table_dir):
    t = LakeTable(table_dir).snapshot_table()
    cols = ["repo", "path", "commit", "lang", "content", "lsn"]
    return sorted(zip(*[t.column(c).to_pylist() for c in cols]))


def _bucket_placement_ok(table_dir):
    """Every row sits in the bucket its key hashes to under the CURRENT
    manifest's count."""
    lake = LakeTable(table_dir)
    for b, files in lake.bucket_file_sets().items():
        for f in files:
            t = pq.read_table(f, columns=["repo", "path"])
            got = fast_hash_bucket(
                t.column("repo").combine_chunks(),
                t.column("path").combine_chunks(),
                lake.num_buckets,
            )
            assert pc.all(pc.equal(got, b)).as_py(), (b, f)


def test_split_preserves_state_and_placement(tmp_path, ray_session):
    log, _ = _make_log(tmp_path)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    before = _state(table)
    lake = LakeTable(table)
    assert lake.rebucket(32) is True
    lake = LakeTable(table)
    assert lake.num_buckets == 32
    assert _state(table) == before
    _bucket_placement_ok(table)
    # occupied buckets actually spread out
    assert len(lake.bucket_file_sets()) > 8


def test_shrink_preserves_state_and_placement(tmp_path, ray_session):
    log, _ = _make_log(tmp_path, seed=43)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=16)
    before = _state(table)
    assert LakeTable(table).rebucket(4) is True
    lake = LakeTable(table)
    assert lake.num_buckets == 4
    assert _state(table) == before
    _bucket_placement_ok(table)
    assert set(lake.bucket_file_sets()) <= {0, 1, 2, 3}


def test_replay_continues_after_rebucket(tmp_path, ray_session):
    """Half replay -> split -> rest of the log must land exactly where a
    one-shot replay into a fresh table puts it."""
    log, max_lsn = _make_log(tmp_path, seed=47)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8, target_lsn=max_lsn // 2)
    LakeTable(table).rebucket(16)
    replay(log, table)  # num_buckets resolved from the manifest
    oneshot = str(tmp_path / "ref")
    replay(log, oneshot, num_buckets=16)
    assert _state(table) == _state(oneshot)
    _bucket_placement_ok(table)
    assert LakeTable(table).num_buckets == 16


def test_rebucket_folds_delta_chains(tmp_path, ray_session):
    log, max_lsn = _make_log(tmp_path, seed=53)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8, target_lsn=max_lsn // 2)
    replay(log, table, mode="delta")
    lake = LakeTable(table)
    assert lake.has_deltas()
    before = _state(table)
    assert lake.rebucket(16) is True
    lake = LakeTable(table)
    assert not lake.has_deltas()  # the fold compacted as a side effect
    assert _state(table) == before


def test_rebucket_retry_after_crash_before_commit(tmp_path, ray_session, monkeypatch):
    """A driver crash after staging but before the manifest commit leaves
    only unreferenced staging files; re-running the rebucket must succeed
    and produce the same state (idempotent staged writes, atomic swing)."""
    log, _ = _make_log(tmp_path, n_files=300, seed=67)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    before = _state(table)

    lake = LakeTable(table)
    real_commit = LakeTable.commit_epoch
    boom = {"armed": True}

    def crashing_commit(self, *a, **kw):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated driver crash before manifest commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "commit_epoch", crashing_commit)
    with pytest.raises(RuntimeError, match="simulated"):
        lake.rebucket(16)
    # nothing published: still the old layout and state, and even the
    # crashed handle reverted its in-memory count
    assert lake.num_buckets == 8
    fresh = LakeTable(table)
    assert fresh.num_buckets == 8
    assert _state(table) == before
    # retry on a fresh handle (the crashed one mutated nothing durable)
    assert fresh.rebucket(16) is True
    assert LakeTable(table).num_buckets == 16
    assert _state(table) == before
    _bucket_placement_ok(table)


def test_rebucket_rejects_non_multiple_and_noop(tmp_path, ray_session):
    log, _ = _make_log(tmp_path, n_files=200, seed=59)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    lake = LakeTable(table)
    with pytest.raises(ValueError, match="multiple or divisor"):
        lake.rebucket(12)
    assert lake.rebucket(8) is False


def test_layout_stats_track_rebucket(tmp_path, ray_session):
    """layout_stats reads footers only and reflects a split: same total
    rows, more occupied buckets, smaller max bucket."""
    log, _ = _make_log(tmp_path, n_files=400, seed=73)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    lake = LakeTable(table)
    s0 = lake.layout_stats()
    assert s0["num_buckets"] == 8 and s0["occupied_buckets"] == 8
    assert s0["rows_total"] == lake.snapshot_table().num_rows
    assert s0["skew_max_over_mean"] >= 1.0
    lake.rebucket(32)
    s1 = LakeTable(table).layout_stats()
    assert s1["num_buckets"] == 32
    assert s1["rows_total"] == s0["rows_total"]
    assert s1["occupied_buckets"] > 8
    assert s1["rows_max"] < s0["rows_max"]
    assert s1["max_delta_depth"] == 0
    # empty table
    assert LakeTable(str(tmp_path / "none")).layout_stats() == {
        "buckets": 0, "rows_total": 0,
    }


def test_deep_fsck_placement_invariant(tmp_path, ray_session):
    """fsck --deep verifies every row hashes to the bucket holding it:
    green on a healthy table (before and after a split), red when two
    bucket files are swapped behind the manifest's back."""
    import os

    log, _ = _make_log(tmp_path, n_files=300, seed=71)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    lake = LakeTable(table)
    assert lake.fsck(deep=True)["ok"]
    lake.rebucket(16)
    lake = LakeTable(table)
    assert lake.fsck(deep=True)["ok"]

    # corrupt: swap two bucket files on disk (footers still valid, row
    # counts unchanged per manifest? no — counts differ, so also assert
    # the deep issue specifically)
    files = lake.bucket_files()
    (b1, f1), (b2, f2) = sorted(files.items())[:2]
    tmp = f1 + ".swap"
    os.rename(f1, tmp)
    os.rename(f2, f1)
    os.rename(tmp, f2)
    report = lake.fsck(deep=True)
    assert not report["ok"]
    assert any("misplaced rows" in i for i in report["issues"])
    # shallow fsck alone would miss it only if row counts matched; the
    # deep check catches it regardless
    swapped_back = lake.fsck(deep=False)
    assert isinstance(swapped_back["ok"], bool)


def test_time_travel_and_lookup_after_rebucket(tmp_path, ray_session):
    log, _ = _make_log(tmp_path, n_files=300, seed=61)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)
    e0 = LakeTable(table).current_epoch()
    before = _state(table)
    LakeTable(table).rebucket(32)
    lake = LakeTable(table)
    # the pre-rebucket epoch is still readable with the OLD layout
    t_old = lake.snapshot_table(epoch=e0)
    cols = ["repo", "path", "commit", "lang", "content", "lsn"]
    assert sorted(zip(*[t_old.column(c).to_pylist() for c in cols])) == before
    # point reads hash with the new count
    r = lake.snapshot_table().to_pylist()[0]
    got = lake.lookup([(r["repo"], r["path"])])
    assert got.num_rows >= 1
    assert r["repo"] in got.column("repo").to_pylist()
    # ...and a time-travel lookup at the pre-rebucket epoch must hash
    # with THAT epoch's count (8), not the current 32
    old_hit = lake.lookup([(r["repo"], r["path"])], epoch=e0)
    assert old_hit.num_rows >= 1


def test_rebucket_schema_evolved_table(tmp_path, ray_session):
    """Rebucket over a schema-evolved table: only some buckets' files
    carry the added column, so the split/merge tasks must unify schemas
    while repartitioning. State parity incl. the evolved column's nulls,
    placement invariant, and a shrink back."""
    import pyarrow as pa

    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log

    repos = generate_repos(n_files=60, seed=19)
    events = generate_events(repos, update_frac=0, delete_frac=0, dup_frac=0, seed=19)
    log1 = str(tmp_path / "log1")
    write_event_log(events, log1, num_partitions=2)
    table = str(tmp_path / "t")
    assert replay(log1, table, num_buckets=4).committed

    n = repos.num_rows
    base = events.slice(0, 12)
    evolved = base.set_column(
        base.schema.get_field_index("lsn"), "lsn",
        pa.array([n + i for i in range(12)], pa.int64()),
    ).set_column(
        base.schema.get_field_index("op"), "op", pa.array(["U"] * 12, pa.string())
    ).append_column("stars", pa.array([i * 10 for i in range(12)], pa.int64()))
    log2 = str(tmp_path / "log2")
    write_event_log(evolved, log2, num_partitions=2)
    assert replay(log2, table).committed

    def full_state(tdir):
        t = LakeTable(tdir).snapshot_table()
        cols = sorted(t.column_names)
        return sorted(zip(*[t.column(c).to_pylist() for c in cols])), cols

    before, cols = full_state(table)
    assert "stars" in cols

    lake = LakeTable(table)
    assert lake.rebucket(16) is True
    after, cols2 = full_state(table)
    assert (after, cols2) == (before, cols)
    _bucket_placement_ok(table)
    assert LakeTable(table).fsck(deep=True)["ok"]

    assert LakeTable(table).rebucket(4) is True
    assert full_state(table) == (before, cols)
    assert LakeTable(table).fsck(deep=True)["ok"]
