"""Chaos drill: real worker death mid-replay, at every exchange stage.

The north rule demands exactly-once, resumable application under cluster
faults. The spill/merge code claims its file protocol makes Ray's
at-least-once task retry safe (content-derived spill names, deterministic
staging names, manifest pointer as the only commit point) — this drill
proves it END TO END by hard-killing worker processes (``os._exit``, a
genuine worker loss Ray must recover from, not a catchable exception) at
four injection points:

  - ``spill``      before any spill bytes are written
  - ``spill_mid``  after the payload sidecar is published, before the meta
                   file (a torn multi-file write the retry must overwrite)
  - ``merge``      before a reduce partition reads anything
  - ``merge_late`` after ALL its staged bucket files are published (the
                   retry re-stages every file under the same names)

After each chaotic replay the final table must be byte-equal to a clean
replay of the same log, with identical epoch/HWM/metrics accounting.
"""

import os

import pyarrow as pa
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]


@pytest.fixture(scope="module")
def chaos_log(tmp_path_factory):
    root = tmp_path_factory.mktemp("chaos")
    repos = generate_repos(n_files=800, seed=11)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.15, dup_frac=0.10, seed=11)
    log_dir = str(root / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=400)
    # the clean reference replay every chaotic run must reproduce
    clean_dir = str(root / "table_clean")
    res = replay(log_dir, clean_dir, num_buckets=8)
    assert res.committed
    clean = LakeTable(clean_dir)
    return {
        "root": root,
        "log_dir": log_dir,
        "snapshot": clean.snapshot_table().sort_by(SORT),
        "epoch": clean.current_epoch(),
        "hwm": clean.hwm_lsn(),
        "events_applied": res.events_applied,
        "rows_total": res.rows_total,
    }


def _run_chaotic(chaos_log, name: str, points: list[str]) -> tuple[LakeTable, object, str]:
    chaos_dir = str(chaos_log["root"] / f"chaos_{name}")
    os.makedirs(chaos_dir, exist_ok=True)
    for p in points:
        open(os.path.join(chaos_dir, f"enable-{p}"), "w").close()
    table_dir = str(chaos_log["root"] / f"table_{name}")
    res = replay(chaos_log["log_dir"], table_dir, num_buckets=8, chaos_dir=chaos_dir)
    return LakeTable(table_dir), res, chaos_dir


def _assert_state_identical(chaos_log, lake: LakeTable, res) -> None:
    assert res.committed
    assert lake.current_epoch() == chaos_log["epoch"]
    assert lake.hwm_lsn() == chaos_log["hwm"]
    assert res.events_applied == chaos_log["events_applied"]
    assert res.rows_total == chaos_log["rows_total"]
    snap = lake.snapshot_table().sort_by(SORT)
    assert snap.equals(chaos_log["snapshot"])  # byte-equal final state


def _died(chaos_dir: str, point: str) -> int:
    return sum(
        1 for f in os.listdir(chaos_dir) if f.startswith(f"died-{point}-")
    )


def test_worker_death_at_spill_and_merge(chaos_log):
    lake, res, chaos_dir = _run_chaotic(chaos_log, "early", ["spill", "merge"])
    # the drill is vacuous unless workers actually died at both stages
    assert _died(chaos_dir, "spill") >= 1
    assert _died(chaos_dir, "merge") >= 1
    _assert_state_identical(chaos_log, lake, res)


def test_worker_death_mid_write_and_post_stage(chaos_log):
    lake, res, chaos_dir = _run_chaotic(
        chaos_log, "late", ["spill_mid", "merge_late"]
    )
    assert _died(chaos_dir, "spill_mid") >= 1
    assert _died(chaos_dir, "merge_late") >= 1
    _assert_state_identical(chaos_log, lake, res)


def test_chaotic_replay_stays_idempotent(chaos_log):
    # a chaotic first replay followed by a clean re-run: no-op, no new epoch
    lake, res, _ = _run_chaotic(chaos_log, "idem", ["merge"])
    _assert_state_identical(chaos_log, lake, res)
    res2 = replay(chaos_log["log_dir"], str(chaos_log["root"] / "table_idem"), num_buckets=8)
    assert not res2.committed
    assert lake.current_epoch() == chaos_log["epoch"]
    snap = lake.snapshot_table().sort_by(SORT)
    assert snap.equals(chaos_log["snapshot"])
