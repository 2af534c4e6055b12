"""CDC fan-out (cascade): a table's change feed exported as a new event
log; a downstream table replaying that log converges to the source
snapshot — incrementally, across deletes, rebuckets, and re-exports."""

import pyarrow.compute as pc
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import cascade_changes, replay
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
STATE_COLS = ["repo", "path", "commit", "lang", "content"]


def _state(table_dir):
    t = LakeTable(table_dir).snapshot_table().select(STATE_COLS)
    return t.sort_by(SORT)


@pytest.fixture()
def source(tmp_path, ray_session):
    repos = generate_repos(n_files=500, seed=71)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.15, seed=71)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=3, events_per_segment=150)
    max_lsn = int(pc.max(events.column("lsn")).as_py())
    return {"log_dir": log_dir, "max_lsn": max_lsn, "tmp": tmp_path}


def test_cascade_bootstrap_and_incremental(source):
    src = str(source["tmp"] / "src")
    derived_log = str(source["tmp"] / "dlog")
    dst = str(source["tmp"] / "dst")

    # bootstrap hop: source at the midpoint -> derived log -> downstream
    assert replay(source["log_dir"], src, target_lsn=source["max_lsn"] // 2,
                  num_buckets=8).committed
    out = cascade_changes(src, derived_log)
    assert out["exported"] > 0 and out["from_epoch"] is None
    assert replay(derived_log, dst, num_buckets=4).committed
    assert _state(dst).equals(_state(src))

    # incremental hop: source advances (updates + deletes), cascade ships
    # ONLY the delta, downstream converges again
    assert replay(source["log_dir"], src).committed
    out2 = cascade_changes(src, derived_log)
    assert 0 < out2["exported"]
    assert replay(derived_log, dst).committed
    assert _state(dst).equals(_state(src))
    # deletes really traveled through the hop
    assert LakeTable(dst).snapshot_table().num_rows == LakeTable(src).snapshot_table().num_rows

    # nothing new: cascade no-ops, downstream replay no-ops
    out3 = cascade_changes(src, derived_log)
    assert out3.get("noop") is True
    assert replay(derived_log, dst).committed is False


def test_cascade_across_rebucket(source):
    src = str(source["tmp"] / "src")
    derived_log = str(source["tmp"] / "dlog")
    dst = str(source["tmp"] / "dst")
    assert replay(source["log_dir"], src, target_lsn=source["max_lsn"] // 2,
                  num_buckets=8).committed
    cascade_changes(src, derived_log)
    assert replay(derived_log, dst, num_buckets=4).committed

    # source rebuckets THEN advances: the cascade's gcd-paired diff spans
    # the layout change; downstream still converges
    assert LakeTable(src).rebucket(16) is True
    assert replay(source["log_dir"], src).committed
    out = cascade_changes(src, derived_log)
    assert out["exported"] > 0
    assert replay(derived_log, dst).committed
    assert _state(dst).equals(_state(src))


def test_cascade_reexport_is_lww_idempotent(source):
    """A crash between segment write and checkpoint write re-exports the
    same window with fresh LSNs; the downstream table must converge to the
    identical state (absolute-state feed + LWW)."""
    src = str(source["tmp"] / "src")
    derived_log = str(source["tmp"] / "dlog")
    dst = str(source["tmp"] / "dst")
    assert replay(source["log_dir"], src, num_buckets=8).committed
    cascade_changes(src, derived_log)

    # simulate the lost checkpoint: wipe CASCADE_STATE and export again
    import os

    os.unlink(os.path.join(derived_log, "CASCADE_STATE"))
    out = cascade_changes(src, derived_log)
    assert out["exported"] > 0  # full re-export at fresh LSNs

    assert replay(derived_log, dst, num_buckets=4).committed
    assert _state(dst).equals(_state(src))


def test_cascade_all_delete_window(source):
    """An export window containing ONLY deletes carries entirely-null
    payload columns — the typed-array path must keep the downstream
    schema intact."""
    from etl_rs_ray.pipelines.cdc import expire_before

    src = str(source["tmp"] / "src")
    derived_log = str(source["tmp"] / "dlog")
    dst = str(source["tmp"] / "dst")
    assert replay(source["log_dir"], src, num_buckets=8).committed
    cascade_changes(src, derived_log)
    assert replay(derived_log, dst, num_buckets=4).committed

    # retention expiry tombstones roughly half the live keys -> the next
    # cascade window is pure deletes
    live = LakeTable(src).snapshot_table()
    lsns = sorted(live.column("lsn").to_pylist())
    res = expire_before(source["log_dir"], src, lsns[len(lsns) // 2])
    assert res["expired"] > 0
    out = cascade_changes(src, derived_log)
    assert out["exported"] == res["expired"]
    assert replay(derived_log, dst).committed
    assert _state(dst).equals(_state(src))
