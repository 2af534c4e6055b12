"""Anti-entropy table digest (stages/digest.py): divergence detection,
null handling, layout independence, fast/md5 path parity of behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_rs_ray.stages.digest import table_digest, xor_by_group


def _digests(t: pa.Table, hash: str, parts: int = 3) -> dict:
    ds = ray.data.from_arrow(t).repartition(parts)
    out = table_digest(ds, "g", ["id", "v"], hash=hash).to_pandas()
    return dict(zip(out["g"], zip(out["digest"], out["n"])))


@pytest.mark.parametrize("hash", ["md5", "fast"])
def test_digest_detects_single_row_change(hash, ray_session):
    n = 2000
    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "g": pa.array([("a", "b", "c")[i % 3] for i in range(n)]),
            "id": np.arange(n),
            "v": rng.integers(0, 100, n),
        }
    )
    base = _digests(t, hash)
    # layout independence: different partitioning, same digests
    assert base == _digests(t, hash, parts=7)
    # flip one value in group 'b': only that group's digest changes
    v2 = t.column("v").to_pylist()
    v2[4] += 1  # row 4 -> group 'b'
    t2 = t.set_column(2, "v", pa.array(v2, t.column("v").type))
    changed = _digests(t2, hash)
    assert changed["b"] != base["b"]
    assert changed["a"] == base["a"] and changed["c"] == base["c"]
    assert all(changed[k][1] == base[k][1] for k in base)  # counts equal


def test_digest_null_group_and_null_keys(ray_session):
    t = pa.table(
        {
            "g": pa.array(["a", None, "a", None]),
            "id": pa.array([1, 2, 3, None], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = table_digest(ray.data.from_arrow(t), "g", ["id", "v"], hash="md5").to_pandas()
    by_g = {(None if g != g else g): n for g, n in zip(out["g"], out["n"])}
    # null group rows digest under one null key; null id row still counts
    assert by_g == {"a": 2, None: 2}


def test_xor_by_group_weights_path():
    keys, xors, agg = xor_by_group(
        pa.array(["x", "y", "x"]),
        np.array([5, 6, 5], dtype=np.uint64),
        weights=np.array([10, 20, 30], dtype=np.int64),
    )
    m = dict(zip(keys.to_pylist(), zip(xors.tolist(), agg.tolist())))
    assert m == {"x": (0, 40), "y": (6, 20)}


def test_lake_bucket_digests_replica_comparison(ray_session, tmp_path):
    """Two replicas built from the same log agree bucket-for-bucket;
    after one applies more of the log, exactly the touched buckets
    diverge — the anti-entropy re-sync unit."""
    import pyarrow.compute as pc

    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay
    from etl_rs_ray.sources.lake import LakeTable

    repos = generate_repos(n_files=200, seed=13)
    events = generate_events(repos, update_frac=0.4, delete_frac=0.1, dup_frac=0.05, seed=13)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    cut = pc.max(events.column("lsn")).as_py() // 2

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    assert replay(log_dir, a, num_buckets=4).committed
    assert replay(log_dir, b, target_lsn=cut, num_buckets=4).committed

    da = LakeTable(a).bucket_digests()
    db = LakeTable(b).bucket_digests()
    assert set(da) == set(db) == {0, 1, 2, 3}
    assert da != db  # replica b is behind

    # catching b up makes every bucket digest equal (compaction layout
    # differences must not matter — digests are over live STATE)
    assert replay(log_dir, b, num_buckets=4, mode="delta").committed
    db2 = LakeTable(b).bucket_digests()
    assert db2 == da

    # digests are deterministic across calls
    assert LakeTable(a).bucket_digests() == da


def test_compare_digests_across_rebucket(ray_session, tmp_path):
    """A replica that rebucketed still anti-entropy-compares against one
    that didn't: compare_digests XOR-folds both maps to the gcd
    granularity (no data re-read — XOR is associative), agreeing when
    live state agrees and flagging exactly the coarse bucket a
    divergent key lands in."""
    import pyarrow.compute as pc

    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay
    from etl_rs_ray.sources.lake import LakeTable, compare_digests, coarsen_digests

    repos = generate_repos(n_files=200, seed=29)
    events = generate_events(repos, update_frac=0.4, delete_frac=0.1, dup_frac=0.05, seed=29)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    cut = pc.max(events.column("lsn")).as_py() // 2

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    assert replay(log_dir, a, num_buckets=4).committed
    assert replay(log_dir, b, num_buckets=4).committed
    assert LakeTable(b).rebucket(16) is True

    la, lb = LakeTable(a), LakeTable(b)
    da, db = la.bucket_digests(), lb.bucket_digests()
    assert set(db) != set(da)  # raw maps are at different granularities
    assert compare_digests(da, la.num_buckets, db, lb.num_buckets) == []

    # coarsening the finer map reproduces the coarser one exactly
    assert coarsen_digests(db, 16, 4) == da

    # replica a falls behind at a fresh table: only the coarse buckets
    # holding the missing keys diverge
    c = str(tmp_path / "c")
    assert replay(log_dir, c, target_lsn=cut, num_buckets=4).committed
    lc = LakeTable(c)
    dc = lc.bucket_digests()
    diverged = compare_digests(dc, lc.num_buckets, db, lb.num_buckets)
    assert diverged  # behind => something diverges
    # ground truth: coarse buckets whose live state differs between c and b
    sb = {(r["repo"], r["path"], r["commit"]): r["lsn"] for r in lb.snapshot_table().to_pylist()}
    sc = {(r["repo"], r["path"], r["commit"]): r["lsn"] for r in lc.snapshot_table().to_pylist()}
    from etl_rs_ray.sources.event_log import fast_hash_bucket
    import pyarrow as pa

    changed = {k for k in set(sb) | set(sc) if sb.get(k) != sc.get(k)}
    want = sorted({
        fast_hash_bucket(pa.array([k[0]]), pa.array([k[1]]), 4)[0].as_py()
        for k in changed
    })
    assert diverged == want

    # non-divisor coarsening is refused
    import pytest

    with pytest.raises(ValueError):
        coarsen_digests(db, 16, 3)


def test_cli_digest_compare(ray_session, tmp_path, capsys):
    """CLI `digest --table A --other B`: lagging rebucketed replica
    diverges at the gcd granularity; after catch-up, in_sync."""
    import json

    import pyarrow.compute as pc

    from etl_rs_ray import cli
    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay
    from etl_rs_ray.sources.lake import LakeTable

    repos = generate_repos(n_files=120, seed=31)
    events = generate_events(repos, seed=31)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    cut = pc.max(events.column("lsn")).as_py() // 2
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    assert replay(log_dir, a, num_buckets=4).committed
    assert replay(log_dir, b, target_lsn=cut, num_buckets=4).committed
    assert LakeTable(b).rebucket(8) is True

    assert cli.main(["digest", "--table", a, "--other", b]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compare_granularity"] == 4
    assert out["in_sync"] is False and out["diverged_buckets"]

    assert replay(log_dir, b).committed
    assert cli.main(["digest", "--table", a, "--other", b]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["in_sync"] is True and out["diverged_buckets"] == []
    assert out["rows"] == out["other"]["rows"]
