"""Skew: a hot (repo, path) holding half the event stream must still merge
correctly; the hot key inflates one bucket only and per-bucket work stays
O(n log n) (sort + neighbor mask), never the reference's O(n²) cross join."""

import numpy as np
import pyarrow as pa

from etl_rs_ray.datagen import EVENT_SCHEMA, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable


def _skewed_events(n=4000, hot_frac=0.5, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    lsn = 0
    n_hot = int(n * hot_frac)
    # hot key: one file version receiving thousands of updates
    rows.append({"lsn": lsn, "op": "I", "repo": "hot/repo", "path": "src/hot.py",
                 "commit": "h" * 40, "lang": "py", "content": "v0"})
    lsn += 1
    for i in range(n_hot):
        rows.append({"lsn": lsn, "op": "U", "repo": "hot/repo", "path": "src/hot.py",
                     "commit": "h" * 40, "lang": "py", "content": f"v{lsn}"})
        lsn += 1
    for i in range(n - n_hot):
        rows.append({"lsn": lsn, "op": "I", "repo": f"org{i % 5}/r{i % 11}",
                     "path": f"src/f{i}.py", "commit": f"{i:040x}", "lang": "py",
                     "content": f"cold-{i}"})
        lsn += 1
    rng.shuffle(rows)
    return pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)


def test_hot_key_replay(tmp_path):
    events = _skewed_events()
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=500)
    table_dir = str(tmp_path / "table")
    res = replay(log_dir, table_dir, num_buckets=8)
    assert res.committed
    oracle = oracle_replay(events)
    snap = LakeTable(table_dir).snapshot_table()
    assert snap.num_rows == len(oracle)
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in snap.to_pylist()
    }
    for k, (lsn, lang, content) in oracle.items():
        assert got[k] == (lsn, content), k
    # the hot key collapsed to its final update
    hot = got[("hot/repo", "src/hot.py", "h" * 40)]
    assert hot[1] == f"v{hot[0]}"
    assert res.metrics["superseded_dropped"] > 1000
