"""Zero-copy shallow clone (table branching): the clone's first manifest
references the source's data files by absolute path; upserts on either
side copy-on-write only the buckets they touch, so the two tables evolve
independently from a shared physical base."""

import os

import pyarrow as pa
import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import EventLogWriter, next_lsn
from etl_rs_ray.sources.lake import LakeTable


def _seeded_table(tmp_path, n_files=300, seed=17):
    repos = generate_repos(n_files=n_files, seed=seed)
    ev = generate_events(repos, seed=seed)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    table = str(tmp_path / "src")
    replay(log, table, num_buckets=8)
    return log, table


def _rows(table_dir) -> list[tuple]:
    t = LakeTable(table_dir).snapshot_table()
    cols = ["repo", "path", "commit", "lsn"]
    return sorted(zip(*[t.column(c).to_pylist() for c in cols]))


def test_clone_is_zero_copy_and_state_equal(tmp_path, ray_session):
    _, src = _seeded_table(tmp_path)
    dest = str(tmp_path / "branch")
    LakeTable(src).clone_to(dest)

    assert _rows(dest) == _rows(src)
    # zero copy: the clone owns no data files of its own
    data_dir = os.path.join(dest, "data")
    cloned_files = (
        [f for _, _, fl in os.walk(data_dir) for f in fl] if os.path.isdir(data_dir) else []
    )
    assert cloned_files == []
    # HWM carried over
    assert LakeTable(dest).hwm_lsn() == LakeTable(src).hwm_lsn()


def test_clone_refuses_nonempty_destination(tmp_path, ray_session):
    _, src = _seeded_table(tmp_path)
    dest = str(tmp_path / "branch")
    LakeTable(src).clone_to(dest)
    import pytest

    with pytest.raises(ValueError, match="not empty"):
        LakeTable(src).clone_to(dest)


def test_clone_diverges_independently(tmp_path, ray_session):
    log, src = _seeded_table(tmp_path)
    dest = str(tmp_path / "branch")
    LakeTable(src).clone_to(dest)
    before_src = _rows(src)

    # new events apply to the CLONE only
    lsn = next_lsn(log)
    upd = pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array(["I"], pa.string()),
            "repo": pa.array(["orgX/branch-only"], pa.string()),
            "path": pa.array(["src/new.py"], pa.string()),
            "commit": pa.array(["f" * 40], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["branch content"], pa.string()),
        }
    )
    EventLogWriter(log, num_partitions=4).write(upd)
    res = replay(log, dest, num_buckets=8)
    assert res.committed

    rows_dest = _rows(dest)
    assert _rows(src) == before_src, "source untouched by the branch upsert"
    assert len(rows_dest) == len(before_src) + 1
    # untouched buckets still read from the SOURCE's physical files
    sets = LakeTable(dest).bucket_file_sets()
    src_abs = os.path.abspath(src)
    foreign = [f for fl in sets.values() for f in fl if f.startswith(src_abs)]
    own = [f for fl in sets.values() for f in fl if f.startswith(os.path.abspath(dest))]
    assert foreign, "clone should still reference source files for untouched buckets"
    assert own, "the touched bucket should be copy-on-write local"


def test_clone_vacuum_never_deletes_foreign_files(tmp_path, ray_session):
    log, src = _seeded_table(tmp_path)
    dest = str(tmp_path / "branch")
    LakeTable(src).clone_to(dest)
    # advance the clone so vacuum has something old to consider
    lsn = next_lsn(log)
    EventLogWriter(log, num_partitions=4).write(
        pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["I"], pa.string()),
                "repo": pa.array(["orgY/x"], pa.string()),
                "path": pa.array(["a.py"], pa.string()),
                "commit": pa.array(["e" * 40], pa.string()),
                "lang": pa.array(["py"], pa.string()),
                "content": pa.array(["y"], pa.string()),
            }
        )
    )
    replay(log, dest, num_buckets=8)
    src_files_before = set()
    for root, _, fl in os.walk(os.path.join(src, "data")):
        src_files_before.update(os.path.join(root, f) for f in fl)

    removed = LakeTable(dest).vacuum(keep_epochs=1)
    src_files_after = set()
    for root, _, fl in os.walk(os.path.join(src, "data")):
        src_files_after.update(os.path.join(root, f) for f in fl)
    assert src_files_after == src_files_before
    for p in removed:
        assert not p.startswith(os.path.abspath(src))
    # clone still reads fine after its own vacuum
    assert len(_rows(dest)) == len(_rows(src)) + 1


def test_clone_time_travel_epoch(tmp_path, ray_session):
    """Clone at an older epoch = a branch from history."""
    log, src = _seeded_table(tmp_path)
    e0_rows = _rows(src)
    lsn = next_lsn(log)
    EventLogWriter(log, num_partitions=4).write(
        pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["I"], pa.string()),
                "repo": pa.array(["orgZ/y"], pa.string()),
                "path": pa.array(["b.py"], pa.string()),
                "commit": pa.array(["d" * 40], pa.string()),
                "lang": pa.array(["py"], pa.string()),
                "content": pa.array(["z"], pa.string()),
            }
        )
    )
    replay(log, src, num_buckets=8)
    assert len(_rows(src)) == len(e0_rows) + 1

    dest = str(tmp_path / "branch0")
    LakeTable(src).clone_to(dest, epoch=0)
    assert _rows(dest) == e0_rows


def test_fsck_clean_and_detects_damage(tmp_path, ray_session):
    _, src = _seeded_table(tmp_path, seed=23)
    lake = LakeTable(src)
    rep = lake.fsck()
    assert rep["ok"] and rep["files_checked"] > 0 and rep["issues"] == []

    # remove one referenced file -> missing; truncate another -> unreadable
    files = sorted(lake.bucket_files().values())
    os.remove(files[0])
    with open(files[1], "r+b") as f:
        f.truncate(10)
    rep2 = lake.fsck()
    assert not rep2["ok"]
    kinds = "\n".join(rep2["issues"])
    assert "missing file" in kinds and "unreadable parquet" in kinds


def test_replay_plan_dry_run(tmp_path, ray_session):
    from etl_rs_ray.datagen import generate_events, generate_repos
    from etl_rs_ray.pipelines.cdc import replay_plan

    repos = generate_repos(n_files=200, seed=31)
    ev = generate_events(repos, seed=31, txn_frac=0.4, open_tail=True, dup_frac=0.0)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    table = str(tmp_path / "t")

    plan = replay_plan(log, table, num_buckets=8, atomic_txns=True)
    assert plan["hwm_lsn"] == -1 and plan["would_apply"]
    assert plan["txn_cut"] < max(ev.column("lsn").to_pylist())
    assert plan["segments"] > 0 and plan["segment_bytes"] > 0
    # the plan touched nothing
    assert LakeTable(table, 8).current_epoch() == -1

    # after a real replay, the plan reports nothing left to do
    replay(log, table, num_buckets=8, atomic_txns=True)
    plan2 = replay_plan(log, table, num_buckets=8, atomic_txns=True)
    assert not plan2["would_apply"] and plan2["est_events"] == 0
