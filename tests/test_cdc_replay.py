"""CDC replay correctness: final table state vs the sequential oracle,
per-row content sha256 equality (BASELINE.json input_hint), exact-once
semantics under re-runs, bounded-window resume, and tombstones.
"""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


@pytest.fixture(scope="module")
def fixture_log(tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc")
    repos = generate_repos(n_files=600, seed=7)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.15, dup_frac=0.10, seed=7)
    log_dir = str(root / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=300)
    return {"root": root, "events": events, "log_dir": log_dir}


def _state_dict(table: pa.Table) -> dict:
    out = {}
    for i in range(table.num_rows):
        key = tuple(table.column(c)[i].as_py() for c in ("repo", "path", "commit"))
        out[key] = (
            table.column("lsn")[i].as_py(),
            table.column("lang")[i].as_py(),
            table.column("content")[i].as_py(),
        )
    return out


def _assert_matches_oracle(table: pa.Table, oracle: dict):
    got = _state_dict(table)
    assert len(got) == len(oracle)
    for key, (lsn, lang, content) in oracle.items():
        g = got[key]
        assert g[0] == lsn, key
        assert g[1] == lang, key
        # per-row invariant: content sha256 equality
        assert hashlib.sha256((g[2] or "").encode()).hexdigest() == hashlib.sha256(
            (content or "").encode()
        ).hexdigest(), key


def test_full_replay_matches_oracle(fixture_log):
    table_dir = str(fixture_log["root"] / "table_full")
    res = replay(fixture_log["log_dir"], table_dir, num_buckets=8)
    assert res.committed
    oracle = oracle_replay(fixture_log["events"])
    lake = LakeTable(table_dir)
    snap = lake.snapshot_table()
    _assert_matches_oracle(snap, oracle)
    # tombstoned keys are gone; no duplicate keys
    keys = set(_state_dict(snap))
    assert len(keys) == snap.num_rows


def test_replay_is_idempotent(fixture_log):
    table_dir = str(fixture_log["root"] / "table_idem")
    res1 = replay(fixture_log["log_dir"], table_dir, num_buckets=8)
    assert res1.committed
    snap1 = LakeTable(table_dir).snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )
    # second run: no new events beyond hwm -> no-op, state unchanged
    res2 = replay(fixture_log["log_dir"], table_dir, num_buckets=8)
    assert not res2.committed
    assert res2.hwm_lsn == res1.hwm_lsn
    snap2 = LakeTable(table_dir).snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )
    assert snap1.equals(snap2)


def test_incremental_replay_resumes_from_checkpoint(fixture_log):
    """Replay in three bounded windows == one full replay; per-partition
    high-watermark checkpointing means no duplicate application."""
    events = fixture_log["events"]
    max_lsn = pc.max(events.column("lsn")).as_py()
    cut1, cut2 = max_lsn // 3, 2 * max_lsn // 3
    table_dir = str(fixture_log["root"] / "table_inc")

    r1 = replay(fixture_log["log_dir"], table_dir, target_lsn=cut1, num_buckets=8)
    assert r1.committed and r1.hwm_lsn <= cut1
    mid_oracle = oracle_replay(events, lsn_to=cut1)
    _assert_matches_oracle(LakeTable(table_dir).snapshot_table(), mid_oracle)

    r2 = replay(fixture_log["log_dir"], table_dir, target_lsn=cut2, num_buckets=8)
    assert r2.committed and r2.epoch == r1.epoch + 1
    r3 = replay(fixture_log["log_dir"], table_dir, num_buckets=8)
    assert r3.committed

    oracle = oracle_replay(events)
    _assert_matches_oracle(LakeTable(table_dir).snapshot_table(), oracle)
    # metrics + lineage recorded per epoch
    m = LakeTable(table_dir).manifests.read()
    assert m["lineage"]["lsn_window"][1] == r3.hwm_lsn
    assert m["metrics"]["events_applied"] > 0


def test_duplicate_lsns_applied_once(fixture_log):
    """dup_frac re-delivers identical (lsn, payload) rows; exact dedup keeps
    each exactly once (metrics count the drops)."""
    table_dir = str(fixture_log["root"] / "table_dup")
    res = replay(fixture_log["log_dir"], table_dir, num_buckets=8)
    assert res.metrics["superseded_dropped"] > 0


def test_schema_evolution_column_add(tmp_path):
    """Epoch 2 events carry a new column; merge unifies schemas and the
    earlier rows read as null."""
    repos = generate_repos(n_files=50, seed=11)
    events = generate_events(repos, update_frac=0, delete_frac=0, dup_frac=0, seed=11)
    log1 = str(tmp_path / "log1")
    write_event_log(events, log1, num_partitions=2)
    table_dir = str(tmp_path / "table")
    r1 = replay(log1, table_dir, num_buckets=4)
    assert r1.committed

    # evolved events: new 'stars' column + updates
    n = repos.num_rows
    base = events.slice(0, 10)
    evolved = base.set_column(
        base.schema.get_field_index("lsn"),
        "lsn",
        pa.array([n + i for i in range(10)], pa.int64()),
    ).set_column(
        base.schema.get_field_index("op"), "op", pa.array(["U"] * 10, pa.string())
    ).append_column("stars", pa.array([i * 10 for i in range(10)], pa.int64()))
    log2 = str(tmp_path / "log2")
    write_event_log(evolved, log2, num_partitions=2)
    r2 = replay(log2, table_dir, num_buckets=4)
    assert r2.committed

    snap = LakeTable(table_dir).snapshot_table()
    assert "stars" in snap.column_names
    assert snap.num_rows == n
    stars = snap.column("stars")
    assert pc.count(stars, mode="only_null").as_py() == n - 10
    assert pc.count(stars, mode="only_valid").as_py() == 10


def test_schema_evolution_type_widening(tmp_path):
    """Epoch 1 carries an int32 'stars' column; epoch 2 widens it to int64
    — merge unifies to int64 and both epochs' values survive."""
    import pyarrow as pa

    repos = generate_repos(n_files=30, seed=19)
    events = generate_events(repos, update_frac=0, delete_frac=0, dup_frac=0, seed=19)
    n = repos.num_rows
    e1 = events.append_column("stars", pa.array([1] * n, pa.int32()))
    log1 = str(tmp_path / "log1")
    write_event_log(e1, log1, num_partitions=2)
    table_dir = str(tmp_path / "table")
    assert replay(log1, table_dir, num_buckets=2).committed

    base = events.slice(0, 5)
    e2 = base.set_column(
        base.schema.get_field_index("lsn"), "lsn", pa.array([n + i for i in range(5)], pa.int64())
    ).set_column(
        base.schema.get_field_index("op"), "op", pa.array(["U"] * 5, pa.string())
    ).append_column("stars", pa.array([2**40] * 5, pa.int64()))
    log2 = str(tmp_path / "log2")
    write_event_log(e2, log2, num_partitions=2)
    assert replay(log2, table_dir, num_buckets=2).committed

    snap = LakeTable(table_dir).snapshot_table()
    assert snap.schema.field("stars").type == pa.int64()
    vals = sorted(snap.column("stars").to_pylist())
    assert vals.count(2**40) == 5 and vals.count(1) == n - 5


def test_commit_is_atomic_and_staging_is_garbage(tmp_path):
    """An uncommitted staging epoch is invisible to snapshots."""
    repos = generate_repos(n_files=20, seed=3)
    events = generate_events(repos, seed=3)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    table_dir = str(tmp_path / "table")
    r = replay(log_dir, table_dir, num_buckets=2)
    assert r.committed
    lake = LakeTable(table_dir)
    before = lake.snapshot_table()
    # simulate a crashed job that staged files but never committed
    staging = lake.staging_dir(99)
    import pyarrow.parquet as pq

    pq.write_table(before.slice(0, 1), f"{staging}/bucket-0.parquet")
    assert LakeTable(table_dir).snapshot_table().equals(before)
    assert LakeTable(table_dir).current_epoch() == r.epoch
