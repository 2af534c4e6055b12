"""Racing whole-table replays (two cron tails overlapping): the manifest
CAS admits exactly one committer, but the shared epoch staging/spill
paths mean the winner's cleanup can fail the loser mid-merge. The loser
must ADOPT the winner's covering commit (committed=False +
adopted_from_concurrent_replay) instead of crashing — while a genuinely
failed replay, with nobody covering the window, still raises."""

import threading

import pytest

from etl_rs_ray.datagen import (
    generate_events,
    generate_repos,
    oracle_replay,
    write_event_log,
)
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable

pytestmark = pytest.mark.filterwarnings(
    "error::pytest.PytestUnhandledThreadExceptionWarning"
)


def _make_log(tmp_path, seed):
    repos = generate_repos(n_files=400, seed=seed)
    ev = generate_events(repos, seed=seed)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    return ev, log


def test_racing_replays_one_commits_loser_adopts(tmp_path, ray_session):
    ev, log = _make_log(tmp_path, seed=73)
    table = str(tmp_path / "t")

    errors: list[BaseException] = []
    results = []
    prev = threading.excepthook
    threading.excepthook = lambda a: errors.append(a.exc_value)
    try:
        threads = [
            threading.Thread(
                target=lambda: results.append(replay(log, table, num_buckets=8))
            )
            for _ in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        threading.excepthook = prev
    committed = [r for r in results if r.committed]
    # The contract under racing replays: AT MOST one attempt commits.
    # Common outcome: one commits, the loser ADOPTS it (no exception,
    # committed=False, same hwm). Rare outcome: the racers' initial
    # spill-dir wipes kill each other before either commits — then both
    # raise, the table is untouched, and a retry converges (exactly-once
    # staging is designed for exactly this). Never: two committers, a
    # crash AFTER someone covered the window, or wrong data.
    assert len(committed) <= 1
    if committed:
        assert errors == [], f"loser crashed despite covering commit: {errors!r}"
        for r in results:
            if not r.committed:
                assert r.hwm_lsn == committed[0].hwm_lsn
    else:
        # mutual kill: both raised, nothing committed — retry converges
        assert errors and LakeTable(table).current_epoch() == -1
        assert replay(log, table, num_buckets=8).committed

    lake = LakeTable(table)
    snap = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in lake.snapshot_table().to_pylist()
    }
    want = {
        k: (lsn, content)
        for k, (lsn, lang, content) in oracle_replay(ev).items()
    }
    assert snap == want
    assert lake.fsck(deep=True)["ok"]

    # nothing new afterwards: a plain re-run is a no-op, not an adoption
    res = replay(log, table)
    assert not res.committed
    assert "adopted_from_concurrent_replay" not in res.metrics


def test_genuine_failure_still_raises(tmp_path, ray_session):
    """Adoption must never convert a real failure (window NOT covered by
    anyone) into a silent no-op."""
    _, log = _make_log(tmp_path, seed=79)
    table = str(tmp_path / "t")

    def poison(batch):
        raise RuntimeError("normalize stage is broken")

    with pytest.raises(Exception):
        replay(log, table, num_buckets=8, normalize=poison)
    # and the table was not advanced behind our back
    assert LakeTable(table).current_epoch() == -1
