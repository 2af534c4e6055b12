"""Epoch restore (rollback): a new manifest commit re-referencing a past
epoch's files — no data movement, history preserved, replay-idempotent
re-application, safe interaction with rebucket / vacuum / purge / the
change feed / a riding materialized view."""

import pyarrow as pa
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import PurgedLogError, purge_log
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]


@pytest.fixture()
def two_epoch_table(tmp_path, ray_session):
    repos = generate_repos(n_files=500, seed=21)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.1, seed=21)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=3, events_per_segment=100)
    table_dir = str(tmp_path / "t")
    max_lsn = int(events.column("lsn")[len(events) - 1].as_py())
    mid = max_lsn // 2
    assert replay(log_dir, table_dir, target_lsn=mid, num_buckets=8).committed
    lake = LakeTable(table_dir)
    e_mid = lake.current_epoch()
    state_mid = lake.snapshot_table().sort_by(SORT)
    assert replay(log_dir, table_dir).committed
    lake = LakeTable(table_dir)
    e_head = lake.current_epoch()
    state_head = lake.snapshot_table().sort_by(SORT)
    assert not state_mid.equals(state_head)
    return {
        "log_dir": log_dir, "table_dir": table_dir, "e_mid": e_mid,
        "e_head": e_head, "state_mid": state_mid, "state_head": state_head,
    }


def test_restore_rolls_back_and_replay_converges(two_epoch_table):
    env = two_epoch_table
    lake = LakeTable(env["table_dir"])
    new_epoch = lake.restore(env["e_mid"])
    assert new_epoch == env["e_head"] + 1

    lake = LakeTable(env["table_dir"])
    assert lake.current_epoch() == new_epoch
    assert lake.snapshot_table().sort_by(SORT).equals(env["state_mid"])
    # the rolled-back head is still time-travelable
    assert lake.snapshot_table(epoch=env["e_head"]).sort_by(SORT).equals(
        env["state_head"]
    )
    assert lake.fsck(deep=True)["ok"]

    # replay re-applies the rolled-back window idempotently -> head again
    assert replay(env["log_dir"], env["table_dir"]).committed
    lake = LakeTable(env["table_dir"])
    assert lake.snapshot_table().sort_by(SORT).equals(env["state_head"])
    assert lake.fsck(deep=True)["ok"]


def test_restore_across_rebucket(two_epoch_table):
    env = two_epoch_table
    lake = LakeTable(env["table_dir"])
    assert lake.rebucket(16) is True
    lake = LakeTable(env["table_dir"])
    assert lake.num_buckets == 16

    # roll back to the pre-rebucket epoch: layout comes back with it
    lake.restore(env["e_mid"])
    lake = LakeTable(env["table_dir"])
    assert lake.num_buckets == 8
    assert lake.snapshot_table().sort_by(SORT).equals(env["state_mid"])
    # replay adopts the restored (8-bucket) layout and converges to head
    assert replay(env["log_dir"], env["table_dir"]).committed
    lake = LakeTable(env["table_dir"])
    assert lake.snapshot_table().sort_by(SORT).equals(env["state_head"])
    assert lake.fsck(deep=True)["ok"]


def test_restore_survives_vacuum_and_refuses_vacuumed_epoch(two_epoch_table):
    env = two_epoch_table
    lake = LakeTable(env["table_dir"])
    lake.restore(env["e_mid"])

    # vacuum keeps files the RESTORED manifest references (it is current)
    lake = LakeTable(env["table_dir"])
    lake.vacuum(keep_epochs=1)
    lake = LakeTable(env["table_dir"])
    assert lake.snapshot_table().sort_by(SORT).equals(env["state_mid"])

    # the dropped head epoch is gone now -> restore to it must refuse
    with pytest.raises(ValueError, match="not retained|vacuumed"):
        lake.restore(env["e_head"])


def test_restore_then_purged_log_refuses_replay(two_epoch_table):
    env = two_epoch_table
    # purge up to the applied head FIRST (legal), then roll back below it
    purge_log(env["log_dir"], 10**9, applied_hwm=LakeTable(env["table_dir"]).hwm_lsn())
    lake = LakeTable(env["table_dir"])
    lake.restore(env["e_mid"])
    # the window (mid, head] was purged out of the log: replay must refuse
    # rather than silently skip the gap
    with pytest.raises(PurgedLogError):
        replay(env["log_dir"], env["table_dir"])


def test_change_feed_across_restore_is_inverse(two_epoch_table):
    env = two_epoch_table
    lake = LakeTable(env["table_dir"])
    e_new = lake.restore(env["e_mid"])
    lake = LakeTable(env["table_dir"])

    def keyed(t: pa.Table) -> dict:
        return {
            (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
            for r in t.to_pylist()
        }

    fwd = lake.changes(env["e_mid"], env["e_head"]).take_all()
    rev = lake.changes(env["e_head"], e_new).take_all()
    fwd_keys = {(r["repo"], r["path"], r["commit"]): r["op"] for r in fwd}
    rev_keys = {(r["repo"], r["path"], r["commit"]): r["op"] for r in rev}
    assert set(fwd_keys) == set(rev_keys)
    inverse = {"I": "D", "D": "I", "U": "U"}
    for k, op in fwd_keys.items():
        assert rev_keys[k] == inverse[op], k

    # applying the reverse feed to the head state must land on mid state:
    # check via value equality for non-delete ops
    mid = keyed(env["state_mid"])
    for r in rev:
        k = (r["repo"], r["path"], r["commit"])
        if r["op"] == "D":
            assert k not in mid
        else:
            assert mid[k] == (r["change_lsn"], r["content"]), k


def test_matview_converges_across_restore(two_epoch_table, tmp_path):
    from etl_rs_ray.state.matview import MaterializedView

    env = two_epoch_table
    view = MaterializedView(str(tmp_path / "v"), env["table_dir"], "lang")
    view.refresh()
    head_counts = {r["lang"]: r["n"] for r in view.read().to_pylist()}
    assert head_counts

    LakeTable(env["table_dir"]).restore(env["e_mid"])
    view.refresh()
    got = {r["lang"]: r["n"] for r in view.read().to_pylist()}
    want: dict = {}
    for r in env["state_mid"].to_pylist():
        want[r["lang"]] = want.get(r["lang"], 0) + 1
    assert got == want
