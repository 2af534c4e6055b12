"""Dead-letter quarantine: structurally-broken change events are
diverted to a per-epoch quarantine directory with a reason instead of
poisoning the merge, and the table state equals a replay of only the
valid events. The quarantine surface is at-least-once diagnostics; the
table stays exactly-once."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import default_event_validator, replay
from etl_rs_ray.sources.lake import LakeTable


def _poisoned_log(tmp_path, seed=13):
    """A healthy log with three classes of malformed rows spliced in."""
    repos = generate_repos(n_files=300, seed=seed)
    ev = generate_events(repos, seed=seed, dup_frac=0.0).sort_by("lsn")
    n = ev.num_rows

    def row(lsn, op, repo, path):
        return pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array([op], pa.string()),
                "repo": pa.array([repo], pa.string()),
                "path": pa.array([path], pa.string()),
                "commit": pa.array(["deadbeef"], pa.string()),
                "lang": pa.array(["py"], pa.string()),
                "content": pa.array(["x"], pa.string()),
            }
        )

    bad = pa.concat_tables(
        [
            row(n, "X", "org0/p", "a.py"),      # bad_op
            row(n + 1, "U", None, "b.py"),      # null_key
            row(n + 2, "I", "org1/p", None),    # null_key
        ]
    )
    full = pa.concat_tables([ev, bad])
    log = str(tmp_path / "log")
    write_event_log(full, log, num_partitions=4)
    return log, ev, bad


def test_validator_reasons():
    t = pa.table(
        {
            "lsn": pa.array([1, 2, None, 4], pa.int64()),
            "op": pa.array(["I", "X", "U", None], pa.string()),
            "repo": pa.array(["r", "r", "r", "r"], pa.string()),
            "path": pa.array(["p", "p", "p", "p"], pa.string()),
        }
    )
    valid, reason = default_event_validator(t)
    assert valid.to_pylist() == [True, False, False, False]
    assert reason.to_pylist() == [None, "bad_op", "null_lsn", "bad_op"]


def test_quarantine_diverts_and_table_matches_clean_replay(tmp_path, ray_session):
    log, ev, bad = _poisoned_log(tmp_path)
    table = str(tmp_path / "t")
    res = replay(log, table, num_buckets=8, quarantine=True)
    assert res.committed
    assert res.metrics["quarantined"] == bad.num_rows

    # quarantine files carry the rows + reasons
    qdir = os.path.join(table, "quarantine", "epoch-0")
    files = [os.path.join(qdir, f) for f in os.listdir(qdir) if f.endswith(".parquet")]
    q = pa.concat_tables([pq.read_table(f) for f in files])
    assert q.num_rows == bad.num_rows
    assert set(q.column("_reason").to_pylist()) == {"bad_op", "null_key"}

    # table state == replay of the clean log alone
    clean_log = str(tmp_path / "clean_log")
    write_event_log(ev, clean_log, num_partitions=4)
    t_clean = str(tmp_path / "tc")
    replay(clean_log, t_clean, num_buckets=8)
    a = LakeTable(table, 8).snapshot_table()
    b = LakeTable(t_clean, 8).snapshot_table()
    cols = sorted(set(a.column_names) & set(b.column_names))
    ga = sorted(zip(*[a.column(c).to_pylist() for c in cols]))
    gb = sorted(zip(*[b.column(c).to_pylist() for c in cols]))
    assert ga == gb

    # HWM advanced past the quarantined rows; re-run is a no-op
    assert res.hwm_lsn == max(
        pa.concat_tables([ev, bad]).column("lsn").to_pylist()
    )
    res2 = replay(log, table, num_buckets=8, quarantine=True)
    assert not res2.committed


def test_quarantine_with_normalize_chain(tmp_path, ray_session):
    """Broken rows are split off BEFORE the curate stage, so the chain
    only ever sees structurally-sound events."""
    from etl_rs_ray.pipelines.cdc import curate_batch

    log, ev, bad = _poisoned_log(tmp_path, seed=29)
    table = str(tmp_path / "t")
    res = replay(log, table, num_buckets=8, quarantine=True, normalize=curate_batch)
    assert res.committed
    assert res.metrics["quarantined"] == bad.num_rows
    snap = LakeTable(table, 8).snapshot_table()
    assert "lang_pred" in snap.column_names
