"""MaterializedView: persisted grouped-aggregate views refreshed from
the lake change feed — maintained == recomputed across multi-epoch
replays (with deletes), online rebuckets, crash-interrupted refreshes,
and a source-vacuum fallback rebuild."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable
from etl_rs_ray.state.matview import MaterializedView


def _setup(tmp_path, n=250, seed=43):
    repos = generate_repos(n_files=n, seed=seed)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.2, dup_frac=0.05, seed=seed)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    return events, log_dir, pc.max(events.column("lsn")).as_py()


def _recomputed(table_dir):
    """Ground truth: per-lang live-row counts over the CURRENT LWW snapshot
    (sum-maintenance over a numeric payload is covered end-to-end by the
    events_ivm_group_sum gated query; the feed's payload here is strings)."""
    t = LakeTable(table_dir).snapshot_table()
    g = pa.TableGroupBy(
        pa.table({"lang": t.column("lang"),
                  "n": pa.array([1] * t.num_rows, pa.int64())}),
        "lang",
    ).aggregate([("n", "sum")])
    return {r["lang"]: r["n_sum"] for r in g.to_pylist() if r["n_sum"]}


def _view_state(mv):
    return {r["lang"]: r["n"] for r in mv.read().to_pylist()}


def test_incremental_refresh_matches_recompute(tmp_path, ray_session):
    _, log_dir, max_lsn = _setup(tmp_path)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")

    assert replay(log_dir, table, target_lsn=max_lsn // 3, num_buckets=4).committed
    mv = MaterializedView(vdir, table, "lang")
    res = mv.refresh()
    assert res["refreshed"] and not res["rebuilt"]
    assert _view_state(mv) == _recomputed(table)

    # up to date: no-op
    assert MaterializedView(vdir).refresh() == {
        "refreshed": False, "reason": "up to date", "epoch": mv.current_epoch()
    }

    # two more epochs (one delta), an online rebucket in between
    assert replay(log_dir, table, target_lsn=(2 * max_lsn) // 3, mode="delta").committed
    assert LakeTable(table).rebucket(8) is True
    assert replay(log_dir, table).committed

    mv2 = MaterializedView(vdir)  # reopened purely from META
    res = mv2.refresh()
    assert res["refreshed"] and not res["rebuilt"]
    assert res["from_epoch"] < res["to_epoch"]
    assert _view_state(mv2) == _recomputed(table)


def test_crash_between_file_and_pointer_converges(tmp_path, ray_session, monkeypatch):
    _, log_dir, max_lsn = _setup(tmp_path, seed=47)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")
    assert replay(log_dir, table, target_lsn=max_lsn // 2, num_buckets=4).committed
    mv = MaterializedView(vdir, table, "lang")
    assert mv.refresh()["refreshed"]
    assert replay(log_dir, table).committed

    from etl_rs_ray.state import fs as state_fs

    real = state_fs.advance_int_pointer

    def boom(path, value):
        raise OSError("crash after view file write, before pointer swing")

    monkeypatch.setattr(state_fs, "advance_int_pointer", boom)
    with pytest.raises(OSError):
        MaterializedView(vdir).refresh()
    monkeypatch.setattr(state_fs, "advance_int_pointer", real)

    # pointer still old; retry re-derives from the OLD view and converges
    mv = MaterializedView(vdir)
    assert mv.current_epoch() < LakeTable(table).current_epoch()
    res = mv.refresh()
    assert res["refreshed"]
    assert _view_state(mv) == _recomputed(table)


def test_vacuumed_source_falls_back_to_rebuild(tmp_path, ray_session):
    _, log_dir, max_lsn = _setup(tmp_path, seed=53)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")
    assert replay(log_dir, table, target_lsn=max_lsn // 3, num_buckets=4).committed
    mv = MaterializedView(vdir, table, "lang")
    assert mv.refresh()["refreshed"]

    assert replay(log_dir, table, target_lsn=(2 * max_lsn) // 3).committed
    assert replay(log_dir, table).committed
    LakeTable(table).vacuum(keep_epochs=1)  # drops the view's from-manifest

    res = MaterializedView(vdir).refresh()
    assert res["refreshed"] and res["rebuilt"]
    assert _view_state(MaterializedView(vdir)) == _recomputed(table)

    # old view files prunable, newest kept
    mv = MaterializedView(vdir)
    removed = mv.vacuum(keep=1)
    assert all(f.startswith("view-") for f in removed)
    assert _view_state(mv) == _recomputed(table)


def test_spec_is_immutable(tmp_path, ray_session):
    _, log_dir, max_lsn = _setup(tmp_path, seed=59)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")
    assert replay(log_dir, table, num_buckets=4).committed
    MaterializedView(vdir, table, "lang")
    with pytest.raises(ValueError, match="spec-immutable"):
        MaterializedView(vdir, table, "repo")
    with pytest.raises(ValueError, match="required"):
        MaterializedView(str(tmp_path / "fresh"))


def test_cli_view_create_and_refresh(tmp_path, ray_session, capsys):
    import json

    from etl_rs_ray import cli

    _, log_dir, max_lsn = _setup(tmp_path, seed=61)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")
    assert replay(log_dir, table, target_lsn=max_lsn // 2, num_buckets=4).committed

    assert cli.main(["view", "--dir", vdir, "--table", table, "--group", "lang"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refreshed"] and out["from_epoch"] == -1

    assert replay(log_dir, table).committed
    assert cli.main(["view", "--dir", vdir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refreshed"] and out["view_epoch"] == LakeTable(table).current_epoch()
    assert _view_state(MaterializedView(vdir)) == _recomputed(table)


def test_concurrent_refresh_racers_converge(tmp_path, ray_session):
    """Racing refreshers (same view dir, e.g. a cron overlap with a manual
    refresh) must neither crash nor tear: the view file is deterministic
    bytes written atomically, and CURRENT advances through the flock'd
    monotonic pointer — every racer lands on the same epoch and content."""
    import threading

    _, log_dir, max_lsn = _setup(tmp_path, seed=67)
    table = str(tmp_path / "t")
    vdir = str(tmp_path / "v")
    assert replay(log_dir, table, target_lsn=max_lsn // 2, num_buckets=4).committed
    MaterializedView(vdir, table, "lang").refresh()
    assert replay(log_dir, table).committed

    errors = []
    prev = threading.excepthook
    threading.excepthook = lambda args: errors.append(args.exc_value)
    try:
        # racers build feeds through Ray Datasets concurrently; each opens
        # its own MaterializedView handle like separate processes would
        threads = [
            threading.Thread(target=lambda: MaterializedView(vdir).refresh())
            for _ in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        threading.excepthook = prev
    assert errors == [], f"refresh racer raised: {errors!r}"

    mv = MaterializedView(vdir)
    assert mv.current_epoch() == LakeTable(table).current_epoch()
    assert _view_state(mv) == _recomputed(table)
