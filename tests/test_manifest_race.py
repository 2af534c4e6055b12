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

from etl_rs_ray.state import fs
from etl_rs_ray.state.manifest import ManifestStore


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
