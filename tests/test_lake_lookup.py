"""Point reads by primary key (LakeTable.lookup): the latency path —
hash each key to its bucket, open only the touched buckets' file sets
with a (repo, path) filter pushed into the parquet scan, LWW-fold the
survivors. Must reproduce exactly what a full snapshot would say about
those keys, including deletes, delta chains, schema evolution epochs and
time travel — while never opening an untouched bucket's files."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable
from etl_rs_ray.state import fs


def _seeded_table(tmp_path, n_files=400, seed=23, num_buckets=16):
    repos = generate_repos(n_files=n_files, seed=seed)
    ev = generate_events(repos, seed=seed)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=num_buckets)
    return log, table


def _snap_rows_for(table_dir, keys, epoch=None):
    """Ground truth: the full snapshot filtered to the requested keys."""
    t = LakeTable(table_dir).snapshot_table(epoch=epoch)
    want = pa.array([f"{r}\x00{p}" for r, p in keys])
    got = pc.binary_join_element_wise(
        t.column("repo").cast(pa.string()), t.column("path").cast(pa.string()), "\x00"
    )
    t = t.filter(pc.is_in(got, value_set=want))
    cols = sorted(t.column_names)
    return sorted(zip(*[t.column(c).to_pylist() for c in cols])) if t.num_rows else []


def _lookup_rows(table_dir, keys, epoch=None):
    t = LakeTable(table_dir).lookup(keys, epoch=epoch)
    if t.num_rows == 0:
        return []
    cols = sorted(t.column_names)
    return sorted(zip(*[t.column(c).to_pylist() for c in cols]))


def test_lookup_matches_snapshot(tmp_path, ray_session):
    _, table = _seeded_table(tmp_path)
    snap = LakeTable(table).snapshot_table()
    rows = snap.to_pylist()
    keys = [(r["repo"], r["path"]) for r in rows[:7]]
    assert _lookup_rows(table, keys) == _snap_rows_for(table, keys)
    assert len(_lookup_rows(table, keys)) >= len(keys)  # >=1 commit per file


def test_lookup_absent_and_deleted_keys(tmp_path, ray_session):
    _, table = _seeded_table(tmp_path)
    lake = LakeTable(table)
    # a key the generator never produced
    assert lake.lookup([("no/such-org", "nowhere.go")]).num_rows == 0
    # a key that was deleted: present in the log with op=D as final state
    snap = lake.snapshot_table()
    live = set(
        zip(snap.column("repo").to_pylist(), snap.column("path").to_pylist())
    )
    repos = generate_repos(n_files=400, seed=23)
    all_keys = set(zip(repos.column("repo").to_pylist(), repos.column("path").to_pylist()))
    deleted = sorted(all_keys - live)
    assert deleted, "generator should delete some keys (delete_frac=0.1)"
    assert lake.lookup(deleted[:5]).num_rows == 0
    # mixed present + absent: only the present keys come back
    mixed = deleted[:2] + sorted(live)[:3]
    got = lake.lookup(mixed)
    assert set(zip(got.column("repo").to_pylist(), got.column("path").to_pylist())) <= set(
        mixed[2:]
    )


def test_lookup_through_delta_chain_and_time_travel(tmp_path, ray_session):
    log, table = _seeded_table(tmp_path, n_files=300, seed=31)
    lake = LakeTable(table)
    hwm0 = lake.hwm_lsn()
    # extend the log: updates applied as delta epochs (tombstones live in
    # delta files until compaction — the merge-on-read case)
    repos = generate_repos(n_files=300, seed=31)
    ev = generate_events(repos, seed=99)
    ev = ev.filter(pc.greater(ev.column("lsn"), 0))
    ev = ev.set_column(
        ev.schema.get_field_index("lsn"),
        "lsn",
        pc.add(ev.column("lsn"), hwm0 + 1),
    )
    log2 = str(tmp_path / "log2")
    write_event_log(ev, log2, num_partitions=4)
    replay(log2, table, mode="delta")
    lake = LakeTable(table)
    assert lake.has_deltas(), "second replay must have appended a delta epoch"

    snap = lake.snapshot_table()
    keys = sorted(
        set(zip(snap.column("repo").to_pylist(), snap.column("path").to_pylist()))
    )[:9]
    assert _lookup_rows(table, keys) == _snap_rows_for(table, keys)
    # time travel: the same keys at epoch 0 reflect the pre-delta state
    assert _lookup_rows(table, keys, epoch=0) == _snap_rows_for(table, keys, epoch=0)


def test_lookup_commit_triple_and_columns(tmp_path, ray_session):
    _, table = _seeded_table(tmp_path)
    lake = LakeTable(table)
    snap = lake.snapshot_table()
    r = snap.to_pylist()[0]
    full = lake.lookup([(r["repo"], r["path"], r["commit"])])
    assert full.num_rows == 1
    assert full.column("commit").to_pylist() == [r["commit"]]
    wrong = lake.lookup([(r["repo"], r["path"], "0" * 40)])
    assert wrong.num_rows == 0
    cols = lake.lookup([(r["repo"], r["path"])], columns=["repo", "lsn"])
    assert cols.column_names == ["repo", "lsn"]


def test_lookup_reads_only_touched_buckets(tmp_path, ray_session, monkeypatch):
    """The pruning claim itself: a single-key lookup must open only that
    key's bucket file set, not the table."""
    _, table = _seeded_table(tmp_path, num_buckets=16)
    lake = LakeTable(table)
    snap = lake.snapshot_table()
    r = snap.to_pylist()[0]

    opened = []
    real = fs.read_table

    def spy(path, **kw):
        opened.append(path)
        return real(path, **kw)

    monkeypatch.setattr("etl_rs_ray.sources.lake.fs.read_table", spy)
    out = lake.lookup([(r["repo"], r["path"])])
    assert out.num_rows >= 1
    all_files = {f for fl in lake.bucket_file_sets().values() for f in fl}
    from etl_rs_ray.sources.event_log import fast_hash_bucket

    b = fast_hash_bucket(
        pa.array([r["repo"]]), pa.array([r["path"]]), lake.num_buckets
    )[0].as_py()
    assert set(opened) == set(lake.bucket_file_sets()[b])
    assert len(opened) < len(all_files)


def test_lookup_empty_inputs(tmp_path, ray_session):
    _, table = _seeded_table(tmp_path, n_files=120)
    lake = LakeTable(table)
    assert lake.lookup([]).num_rows == 0
    empty = LakeTable(str(tmp_path / "never-written"))
    assert empty.lookup([("a", "b")]).num_rows == 0


def test_lookup_mixed_pair_and_triple_probes(tmp_path, ray_session):
    """Commit filtering is per key: mixed pair/triple probes must neither
    drop pair-probed rows (global commit set) nor leak cross-products
    (probing (r1,p1,c1)+(r2,p2,c2) returning (r1,p1,c2))."""
    _, table = _seeded_table(tmp_path, n_files=300, seed=37)
    lake = LakeTable(table)
    snap = lake.snapshot_table()
    rows = snap.to_pylist()
    # two distinct (repo, path) keys with distinct commits
    a, b = rows[0], next(
        r for r in rows
        if (r["repo"], r["path"]) != (rows[0]["repo"], rows[0]["path"])
        and r["commit"] != rows[0]["commit"]
    )

    # pair probe for a + triple probe for b: a's row must survive even
    # though a.commit is not in the probed commit set
    got = lake.lookup([(a["repo"], a["path"]),
                       (b["repo"], b["path"], b["commit"])]).to_pylist()
    keys = {(r["repo"], r["path"], r["commit"]) for r in got}
    assert (a["repo"], a["path"], a["commit"]) in keys
    assert (b["repo"], b["path"], b["commit"]) in keys

    # cross-product: triple probes with SWAPPED commits must return nothing
    got = lake.lookup([(a["repo"], a["path"], b["commit"]),
                       (b["repo"], b["path"], a["commit"])]).to_pylist()
    assert got == []

    # exact triple probes return exactly those keys
    got = lake.lookup([(a["repo"], a["path"], a["commit"]),
                       (b["repo"], b["path"], b["commit"])]).to_pylist()
    assert {(r["repo"], r["path"], r["commit"]) for r in got} == {
        (a["repo"], a["path"], a["commit"]),
        (b["repo"], b["path"], b["commit"]),
    }
