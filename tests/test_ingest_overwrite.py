"""§3.3 parity: table->event-log ingestion (csv->Kafka analogue: row index
≙ offset) and the Overwrite replay mode (Mongo sink semantics)."""

import pyarrow as pa
import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import ingest_table_as_inserts, read_event_log_table
from etl_rs_ray.sources.lake import LakeTable


def _table(n, offset=0):
    return pa.table(
        {
            "repo": [f"o/r{i % 3}" for i in range(offset, offset + n)],
            "path": [f"f{i}.py" for i in range(offset, offset + n)],
            "commit": [f"{i:040x}" for i in range(offset, offset + n)],
            "lang": ["py"] * n,
            "content": [f"c{i}" for i in range(offset, offset + n)],
        }
    )


def test_ingest_appends_after_tail(tmp_path):
    log = str(tmp_path / "log")
    nxt = ingest_table_as_inserts(_table(10), log, num_partitions=2)
    assert nxt == 10
    nxt = ingest_table_as_inserts(_table(5, offset=10), log, num_partitions=2)
    assert nxt == 15
    t = read_event_log_table(log)
    assert t.num_rows == 15
    assert sorted(t.column("lsn").to_pylist()) == list(range(15))
    assert set(t.column("op").to_pylist()) == {"I"}
    # replay applies all ingested rows
    table_dir = str(tmp_path / "tbl")
    res = replay(log, table_dir, num_buckets=2)
    assert res.committed and res.rows_total == 15


def test_ingest_rejects_non_repo_schema(tmp_path):
    import pytest

    bad = pa.table({"x": [1, 2], "y": ["a", "b"]})
    with pytest.raises(ValueError, match="key columns"):
        ingest_table_as_inserts(bad, str(tmp_path / "log"))


def test_overwrite_replay_rebuilds_from_window(tmp_path):
    repos = generate_repos(n_files=40, seed=23)
    events = generate_events(repos, update_frac=0.3, delete_frac=0.1, dup_frac=0, seed=23)
    log = str(tmp_path / "log")
    write_event_log(events, log, num_partitions=2)
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "tbl")
    # upsert epoch 1 over the first half
    r1 = replay(log, table_dir, target_lsn=max_lsn // 2, num_buckets=2)
    assert r1.committed
    # overwrite with ONLY a later window: prior state is discarded and the
    # table equals the window's own LWW state
    r2 = replay(log, table_dir, num_buckets=2, mode="overwrite")
    assert r2.committed
    from etl_rs_ray.datagen import oracle_replay

    snap = LakeTable(table_dir).snapshot_table()
    assert snap.num_rows == len(oracle_replay(events))
    # overwrite re-read the FULL log (hwm ignored), not just the tail
    assert r2.metrics["events_read"] == events.num_rows
