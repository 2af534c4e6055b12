"""Binlog retention: purge_log deletes fully-applied segments below a
cut, keeps straddlers, clamps to the table HWM, records a monotonic
marker, and replay refuses windows that reach below it (a fresh
bootstrap of a purged log would silently rebuild partial state)."""

import os

import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import expire_before, replay
from etl_rs_ray.sources.event_log import (
    PurgedLogError,
    list_segments,
    purge_cut,
    purge_log,
)
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]


@pytest.fixture(scope="module")
def purge_env(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("purge")
    repos = generate_repos(n_files=600, seed=7)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.1, seed=7)
    log_dir = str(root / "log")
    write_event_log(events, log_dir, num_partitions=3, events_per_segment=100)
    # the never-purged ground truth
    ref_dir = str(root / "ref")
    assert replay(log_dir, ref_dir, num_buckets=8).committed
    return {"root": root, "log_dir": log_dir, "ref_dir": ref_dir,
            "max_lsn": int(events.column("lsn")[len(events) - 1].as_py())}


def test_purge_keeps_straddlers_and_clamps_to_hwm(purge_env, tmp_path):
    import shutil

    log_dir = str(tmp_path / "log")
    shutil.copytree(purge_env["log_dir"], log_dir)
    table_dir = str(tmp_path / "t")
    mid = purge_env["max_lsn"] // 2
    assert replay(log_dir, table_dir, target_lsn=mid, num_buckets=8).committed
    hwm = LakeTable(table_dir).hwm_lsn()
    n_before = len(list_segments(log_dir))

    # request a cut far above the applied HWM: clamped to hwm+1
    out = purge_log(log_dir, purge_env["max_lsn"], applied_hwm=hwm)
    assert out["cut"] == hwm + 1
    assert out["purged_segments"] > 0
    assert purge_cut(log_dir) == hwm + 1
    segs = list_segments(log_dir)
    assert len(segs) == n_before - out["purged_segments"]
    # every surviving segment still reaches the cut (straddler or above)
    assert all(s.lsn_max >= hwm + 1 for s in segs)

    # idempotent
    again = purge_log(log_dir, purge_env["max_lsn"], applied_hwm=hwm)
    assert again["purged_segments"] == 0

    # the consuming table replays on past the cut and matches the
    # never-purged reference exactly
    assert replay(log_dir, table_dir).committed
    got = LakeTable(table_dir).snapshot_table().sort_by(SORT)
    want = LakeTable(purge_env["ref_dir"]).snapshot_table().sort_by(SORT)
    assert got.equals(want)


def test_fresh_bootstrap_and_overwrite_refuse_purged_log(purge_env, tmp_path):
    import shutil

    log_dir = str(tmp_path / "log")
    shutil.copytree(purge_env["log_dir"], log_dir)
    table_dir = str(tmp_path / "t")
    mid = purge_env["max_lsn"] // 2
    assert replay(log_dir, table_dir, target_lsn=mid, num_buckets=8).committed
    purge_log(log_dir, mid, applied_hwm=LakeTable(table_dir).hwm_lsn())

    with pytest.raises(PurgedLogError):
        replay(log_dir, str(tmp_path / "fresh"), num_buckets=8)
    with pytest.raises(PurgedLogError):
        replay(log_dir, table_dir, mode="overwrite")

    # a clone of the caught-up table is the documented recovery path:
    # it replays on from the clone's HWM, above the cut
    clone_dir = str(tmp_path / "clone")
    LakeTable(table_dir).clone_to(clone_dir)
    assert replay(log_dir, clone_dir).committed
    got = LakeTable(clone_dir).snapshot_table().sort_by(SORT)
    want = LakeTable(purge_env["ref_dir"]).snapshot_table().sort_by(SORT)
    assert got.equals(want)


def test_purge_composes_with_expiry(purge_env, tmp_path):
    """expire_before appends fresh-LSN tombstones ABOVE the purge cut, so
    retention-through-the-log keeps working on a purged log."""
    import shutil

    log_dir = str(tmp_path / "log")
    shutil.copytree(purge_env["log_dir"], log_dir)
    table_dir = str(tmp_path / "t")
    assert replay(log_dir, table_dir, num_buckets=8).committed
    lake = LakeTable(table_dir)
    purge_log(log_dir, purge_env["max_lsn"], applied_hwm=lake.hwm_lsn())

    live = LakeTable(table_dir).snapshot_table()
    lsns = sorted(live.column("lsn").to_pylist())
    before = lsns[len(lsns) // 2]
    res = expire_before(log_dir, table_dir, before)
    assert res["expired"] > 0
    assert LakeTable(table_dir).snapshot_table().num_rows == len(lsns) - res["expired"]
    # re-run: nothing left to expire
    assert expire_before(log_dir, table_dir, before)["expired"] == 0


def test_marker_is_monotonic(purge_env, tmp_path):
    import shutil

    log_dir = str(tmp_path / "log")
    shutil.copytree(purge_env["log_dir"], log_dir)
    purge_log(log_dir, 50)
    assert purge_cut(log_dir) == 50
    purge_log(log_dir, 30)  # lower request cannot regress the marker
    assert purge_cut(log_dir) == 50
    purge_log(log_dir, 80)
    assert purge_cut(log_dir) == 80
