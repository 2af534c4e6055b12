"""Multi-node-shaped evidence for the lake: at 100 TB the table lives in
object storage, not a local directory. These tests drive LakeTable through
the fs adapter (etl_rs_ray/state/fs.py) against non-local-path URIs:

- ``memory://`` (fsspec MemoryFileSystem): a pure object-store stand-in —
  no rename, no directories-as-inodes. Per-process, so only driver-side
  surfaces (manifests, commit protocol, snapshot_table, vacuum, time
  travel) run against it.
- ``file://`` (fsspec LocalFileSystem URI): shared-store stand-in that
  Ray workers can also reach — the FULL replay path (spill → exchange →
  merge tasks staging buckets → manifest commit) runs against the URI
  and must byte-match a plain-local-path replay of the same log.
"""

import uuid

import pyarrow as pa
import pytest

from etl_rs_ray.sources.lake import LakeTable
from etl_rs_ray.state import fs


def _mem_dir() -> str:
    return f"memory://lake-{uuid.uuid4().hex}/t"


def _stage_bucket(lake: LakeTable, epoch: int, bucket: int, rows: dict) -> dict:
    staging = lake.staging_dir(epoch)
    t = pa.table(rows)
    filename = f"bucket-{bucket}.parquet"
    fs.write_table_atomic(t, fs.join(staging, filename))
    return {"filename": filename, "rows": t.num_rows, "hwm_lsn": max(rows["lsn"])}


def _rows(lake: LakeTable, epoch=None) -> dict:
    t = lake.snapshot_table(epoch=epoch)
    return {
        (r["repo"], r["path"], r["commit"]): r["lsn"] for r in t.to_pylist()
    }


def test_memory_uri_round_trip_commit_snapshot_time_travel():
    d = _mem_dir()
    lake = LakeTable(d, num_buckets=2)
    e0 = {
        0: _stage_bucket(lake, 0, 0, {
            "repo": ["r1", "r1"], "path": ["a", "b"], "commit": ["c1", "c1"],
            "lsn": [1, 2], "op": ["I", "I"]}),
        1: _stage_bucket(lake, 0, 1, {
            "repo": ["r2"], "path": ["z"], "commit": ["c1"],
            "lsn": [3], "op": ["I"]}),
    }
    assert lake.commit_epoch(0, e0, hwm_lsn=3, metrics={}, lineage={})
    assert lake.current_epoch() == 0
    assert _rows(lake) == {("r1", "a", "c1"): 1, ("r1", "b", "c1"): 2,
                           ("r2", "z", "c1"): 3}

    # upsert epoch 1 touches only bucket 0; bucket 1 carries over
    e1 = {0: _stage_bucket(lake, 1, 0, {
        "repo": ["r1", "r1"], "path": ["a", "b"], "commit": ["c1", "c1"],
        "lsn": [10, 2], "op": ["U", "I"]})}
    assert lake.commit_epoch(1, e1, hwm_lsn=10, metrics={}, lineage={})
    assert _rows(lake) == {("r1", "a", "c1"): 10, ("r1", "b", "c1"): 2,
                           ("r2", "z", "c1"): 3}
    # time travel back to epoch 0
    assert _rows(lake, epoch=0)[("r1", "a", "c1")] == 1

    # re-opening from the URI sees committed state; re-commit is a no-op
    lake2 = LakeTable(d)
    assert lake2.current_epoch() == 1
    assert not lake2.commit_epoch(1, e1, hwm_lsn=10, metrics={}, lineage={})

    # vacuum removes the epoch-0 file once out of the retention window
    removed = lake2.vacuum(keep_epochs=1)
    assert any("epoch-0" in p for p in removed)
    assert _rows(lake2) == {("r1", "a", "c1"): 10, ("r1", "b", "c1"): 2,
                            ("r2", "z", "c1"): 3}


def test_memory_uri_empty_bucket_drop_and_staging_cleanup():
    d = _mem_dir()
    lake = LakeTable(d, num_buckets=1)
    e0 = {0: _stage_bucket(lake, 0, 0, {
        "repo": ["r"], "path": ["p"], "commit": ["c"], "lsn": [1], "op": ["I"]})}
    assert lake.commit_epoch(0, e0, hwm_lsn=1, metrics={}, lineage={})
    # epoch 1: bucket emptied (all keys tombstoned upstream -> rows=0 entry)
    staging = lake.staging_dir(1)
    filename = "bucket-0.parquet"
    fs.write_table_atomic(pa.table({"repo": pa.array([], pa.string())}),
                          fs.join(staging, filename))
    assert lake.commit_epoch(1, {0: {"filename": filename, "rows": 0,
                                     "hwm_lsn": 2}},
                             hwm_lsn=2, metrics={}, lineage={})
    assert lake.snapshot_table().num_rows == 0
    # staging for the committed epoch was cleaned up
    assert not fs.exists(fs.join(d, "_staging", "epoch-1"))


@pytest.mark.usefixtures("ray_session")
def test_file_uri_full_cdc_chain(tmp_path):
    """The FULL CDC lifecycle against a URI table the workers reach only
    through the fs adapter: upsert replay → delta replay → changes feed
    → compaction → zero-copy clone → divergent replay into the clone.
    Every stage must read/write via fs.*, and the source table must be
    untouched by the clone's writes — the multi-node shape (shared
    object store, node-local spill) end to end."""
    from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
    from etl_rs_ray.pipelines.cdc import replay

    log_dir = str(tmp_path / "log")
    repos = generate_repos(n_files=250, seed=23)
    events = generate_events(
        repos, update_frac=0.5, delete_frac=0.2, dup_frac=0.05, seed=23
    )
    write_event_log(events, log_dir, num_partitions=3)
    import pyarrow.compute as pc

    max_lsn = pc.max(events.column("lsn")).as_py()
    cut = max_lsn // 2

    uri = "file://" + str(tmp_path / "t_uri")
    # epoch 0: base upsert of the first half
    assert replay(log_dir, uri, target_lsn=cut, num_buckets=4).committed
    lake = LakeTable(uri)
    assert lake.current_epoch() == 0

    # epoch 1: the rest as an APPENDED delta through the URI
    assert replay(log_dir, uri, num_buckets=4, mode="delta").committed
    lake = LakeTable(uri)
    assert lake.has_deltas()

    def _state(t):
        return {
            (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
            for r in t.to_pylist()
        }

    want = {
        k: (lsn, content)
        for k, (lsn, lang, content) in oracle_replay(events).items()
    }
    assert _state(lake.snapshot_table()) == want

    # change feed between the two epochs over the URI
    feed = pa.Table.from_pylist(lake.changes(0, 1).take_all())
    assert feed.num_rows > 0
    ops = set(pc.unique(feed.column("op")).to_pylist())
    assert "D" in ops or "U" in ops

    # compaction folds the deltas in place (URI rewrite path)
    assert lake.compact()
    lake = LakeTable(uri)
    assert not lake.has_deltas()
    assert _state(lake.snapshot_table()) == want

    # online bucket split over the URI (staging + rename through fs.*)
    assert lake.rebucket(8)
    lake = LakeTable(uri)
    assert lake.num_buckets == 8
    assert _state(lake.snapshot_table()) == want

    # zero-copy clone to a second URI table; replay a divergent tail
    # into the CLONE only — the source snapshot must not move
    clone_uri = "file://" + str(tmp_path / "t_clone")
    lake.clone_to(clone_uri)
    clone = LakeTable(clone_uri)
    assert _state(clone.snapshot_table()) == want

    extra = events.slice(0, 10)
    extra = extra.set_column(
        extra.schema.get_field_index("lsn"), "lsn",
        pa.array([max_lsn + 1 + i for i in range(10)], pa.int64()),
    ).set_column(
        extra.schema.get_field_index("op"), "op",
        pa.array(["U"] * 10, pa.string()),
    )
    log2 = str(tmp_path / "log2")
    write_event_log(extra, log2, num_partitions=2)
    assert replay(log2, clone_uri, num_buckets=4).committed

    src_after = _state(LakeTable(uri).snapshot_table())
    assert src_after == want  # source untouched
    clone_after = _state(LakeTable(clone_uri).snapshot_table())
    assert clone_after != want
    # the tail upserts resurrect base-deleted keys; never lose any
    assert len(clone_after) >= len(want)


@pytest.mark.usefixtures("ray_session")
def test_file_uri_full_replay_matches_local(tmp_path):
    """The distributed path: replay the same log into a file:// URI table
    and a plain local table; final states must match exactly (workers
    stage bucket files through the fs adapter, driver commits)."""
    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay

    log_dir = str(tmp_path / "log")
    repos = generate_repos(n_files=300, seed=7)
    events = generate_events(repos, seed=7)
    write_event_log(events, log_dir, num_partitions=4)

    local_dir = str(tmp_path / "t_local")
    replay(log_dir, local_dir, num_buckets=4)
    uri_dir = "file://" + str(tmp_path / "t_uri")
    replay(log_dir, uri_dir, num_buckets=4)

    lake_uri = LakeTable(uri_dir)
    assert lake_uri.current_epoch() == 0
    a = LakeTable(local_dir).snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")])
    b = lake_uri.snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")])
    assert a.num_rows == b.num_rows > 0
    cols = ["repo", "path", "commit", "lang", "content", "lsn"]
    assert a.select(cols).equals(b.select(cols))
