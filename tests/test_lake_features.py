"""Lake features: time travel, vacuum, overwrite mode, type widening,
streaming flush-to-lake, CSV sink."""

import os

import pyarrow as pa
import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


def _setup(tmp_path, n=100, seed=5):
    repos = generate_repos(n_files=n, seed=seed)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.2, dup_frac=0, seed=seed)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    return repos, events, log_dir


def test_time_travel_snapshot(tmp_path):
    repos, events, log_dir = _setup(tmp_path)
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "t")
    r1 = replay(log_dir, table_dir, target_lsn=max_lsn // 2, num_buckets=4)
    snap1 = LakeTable(table_dir).snapshot_table()
    r2 = replay(log_dir, table_dir, num_buckets=4)
    lake = LakeTable(table_dir)
    # current state matches full oracle; epoch-1 snapshot matches the cut
    assert lake.snapshot_table().num_rows == len(oracle_replay(events))
    old = lake.snapshot_table(epoch=r1.epoch)
    assert old.sort_by("lsn").equals(snap1.sort_by("lsn"))
    assert r2.epoch == r1.epoch + 1


def test_vacuum_keeps_current(tmp_path):
    repos, events, log_dir = _setup(tmp_path)
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "t")
    replay(log_dir, table_dir, target_lsn=max_lsn // 2, num_buckets=4)
    replay(log_dir, table_dir, num_buckets=4)
    lake = LakeTable(table_dir)
    before = lake.snapshot_table().sort_by("lsn")
    removed = lake.vacuum(keep_epochs=1)
    assert removed
    after = LakeTable(table_dir).snapshot_table().sort_by("lsn")
    assert before.equals(after)
    # all current files still exist
    for f in LakeTable(table_dir).data_files():
        assert os.path.exists(f)


def test_overwrite_mode_drops_previous_buckets(tmp_path):
    import pyarrow.parquet as pq

    table_dir = str(tmp_path / "t")
    lake = LakeTable(table_dir, num_buckets=2)
    t1 = pa.table({"repo": ["a"], "path": ["p"], "commit": ["c"], "lsn": [1]})
    pq.write_table(t1, os.path.join(lake.staging_dir(0), "bucket-0.parquet"))
    assert lake.commit_epoch(0, {0: {"filename": "bucket-0.parquet", "rows": 1, "hwm_lsn": 1}}, 1, {}, {})
    t2 = pa.table({"repo": ["b"], "path": ["q"], "commit": ["d"], "lsn": [2]})
    pq.write_table(t2, os.path.join(lake.staging_dir(1), "bucket-1.parquet"))
    assert lake.commit_epoch(
        1, {1: {"filename": "bucket-1.parquet", "rows": 1, "hwm_lsn": 2}}, 2, {}, {}, mode="overwrite"
    )
    snap = LakeTable(table_dir).snapshot_table()
    assert snap.num_rows == 1
    assert snap.column("repo").to_pylist() == ["b"]


def test_schema_widening_int32_to_int64():
    from etl_rs_ray.state.schema_evolution import unify_tables

    a = pa.table({"k": ["x"], "v": pa.array([1], pa.int32())})
    b = pa.table({"k": ["y"], "v": pa.array([2**40], pa.int64())})
    u = unify_tables([a, b])
    assert u.schema.field("v").type == pa.int64()
    assert u.column("v").to_pylist() == [1, 2**40]


def test_streaming_flush_to_lake(tmp_path):
    from etl_rs_ray.stages.streaming import StreamingMerge

    repos, events, log_dir = _setup(tmp_path, n=80, seed=9)
    sm = StreamingMerge(num_partitions=3)
    try:
        sm.tail(log_dir, micro_batch_rows=200)
        assert sm.flush_to_lake(str(tmp_path / "t"))
        lake = LakeTable(str(tmp_path / "t"))
        oracle = oracle_replay(events)
        assert lake.snapshot_table().num_rows == len(oracle)
        assert lake.hwm_lsn() == sm.stats()["hwm"]
    finally:
        sm.shutdown()


def test_write_single_csv_roundtrip(tmp_path):
    from etl_rs_ray.sources.csv_source import write_single_csv

    t = pa.table({"a": ["x", None], "b": [1, 2]})
    p = str(tmp_path / "out.csv")
    write_single_csv(t, p)
    text = open(p).read()
    assert text.splitlines()[0].replace('"', "") == "a,b"
    assert len(text.splitlines()) == 3
