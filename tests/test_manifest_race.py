"""Epoch-commit safety under racing writers and crash-resume.

The manifest file publishes first-writer-wins (hard-link CAS): exactly
one racer's bytes become manifest-<epoch>, a rename-based publish would
let the slower racer tear the faster one's already-visible content. The
CURRENT pointer is race-free by value (every racer writes the same
epoch number). A crash between publish and pointer swing is resumed by
adoption."""

import json
import os
import threading
from contextlib import contextmanager

import pytest

from etl_rs_ray.state import fs
from etl_rs_ray.state.manifest import ManifestStore

# any exception escaping on a racer thread is a test failure, not a warning
pytestmark = pytest.mark.filterwarnings(
    "error::pytest.PytestUnhandledThreadExceptionWarning"
)


@contextmanager
def _trap_thread_exceptions():
    """Collect exceptions raised on worker threads; assert none on exit."""
    errors: list[BaseException] = []
    prev = threading.excepthook
    threading.excepthook = lambda args: errors.append(args.exc_value)
    try:
        yield errors
    finally:
        threading.excepthook = prev
    assert errors == [], f"racer thread(s) raised: {errors!r}"


def _run_racers(targets) -> None:
    threads = [threading.Thread(target=t, args=a) for t, a in targets]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


def _manifest(tag: str) -> dict:
    return {"num_buckets": 2, "buckets": {}, "hwm_lsn": 9, "tag": tag}


def test_exclusive_publish_single_winner(tmp_path):
    path = str(tmp_path / "m.json")
    results = {}

    def writer(tag):
        results[tag] = fs.publish_json_exclusive(path, _manifest(tag))

    threads = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [k for k, v in results.items() if v]
    assert len(winners) == 1
    on_disk = json.loads(open(path).read())
    assert on_disk["tag"] == winners[0], "published bytes are the winner's alone"
    # no tmp litter
    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []


def test_commit_race_single_content(tmp_path):
    store = ManifestStore(str(tmp_path / "t"))
    results = {}

    def committer(tag):
        results[tag] = store.commit(0, _manifest(tag))

    threads = [threading.Thread(target=committer, args=(f"w{i}",)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert store.current_epoch() == 0
    published = store.read(0)["tag"]
    # the published content belongs to exactly one racer, and every racer
    # that reported True saw the epoch through to a committed state
    assert published in results
    assert results[published] is True
    # a later committer is refused outright
    assert store.commit(0, _manifest("late")) is False
    assert store.read(0)["tag"] == published


def test_commit_race_no_thread_exceptions(tmp_path):
    """Round-4 regression: a shared CURRENT.tmp name let a racing
    committer crash with FileNotFoundError on a commit that actually
    succeeded. 8 racers x 20 iterations; every thread exception fails."""
    with _trap_thread_exceptions():
        for it in range(20):
            store = ManifestStore(str(tmp_path / f"t{it}"))
            _run_racers(
                [(store.commit, (0, _manifest(f"w{i}"))) for i in range(8)]
            )
            assert store.current_epoch() == 0
            assert store.read(0)["tag"].startswith("w")


def test_different_epoch_racers_never_regress_pointer(tmp_path):
    """A slow committer of an older epoch must not swing CURRENT back
    after a newer epoch committed (advance-only pointer)."""
    with _trap_thread_exceptions():
        for it in range(20):
            store = ManifestStore(str(tmp_path / f"t{it}"))
            _run_racers(
                [(store.commit, (e, _manifest(f"e{e}"))) for e in range(6)]
            )
            # the pointer must land on the max epoch, no matter the
            # interleaving (an older racer may be refused outright and
            # never publish its manifest — that's fine; regression isn't)
            assert store.current_epoch() == 5
            assert store.read(5)["tag"] == "e5"
    # a late old-epoch straggler is refused and leaves the pointer alone
    store = ManifestStore(str(tmp_path / "t0"))
    assert store.commit(2, _manifest("late")) is False
    assert store.current_epoch() == 5


def test_crash_between_publish_and_pointer_is_resumed(tmp_path):
    store = ManifestStore(str(tmp_path / "t"))
    # simulate the crash: manifest published, CURRENT never swung
    assert fs.publish_json_exclusive(store.manifest_path(0), _manifest("attempt1"))
    assert store.current_epoch() == -1

    # the retry recomputes (content differs in timing fields) and commits:
    # it must ADOPT the published manifest and finish the pointer swing
    assert store.commit(0, _manifest("attempt2")) is True
    assert store.current_epoch() == 0
    assert store.read(0)["tag"] == "attempt1", "published bytes win; retry adopts"
