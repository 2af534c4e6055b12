"""maintain(): threshold-driven self-healing — compacts deep delta
chains, splits oversized buckets, shrinks sparse layouts, all idempotent
(a healthy table plans zero actions)."""

import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]


@pytest.fixture()
def deep_chain_table(tmp_path, ray_session):
    repos = generate_repos(n_files=400, seed=41)
    events = generate_events(repos, update_frac=0.6, delete_frac=0.1, seed=41)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2, events_per_segment=100)
    table_dir = str(tmp_path / "t")
    max_lsn = int(events.column("lsn")[len(events) - 1].as_py())
    # five delta epochs -> chains up to depth 5
    for i in range(1, 6):
        assert replay(
            log_dir, table_dir, target_lsn=max_lsn * i // 5,
            num_buckets=8, mode="delta" if i > 1 else "upsert",
        ).committed
    return table_dir


def test_maintain_compacts_deep_chains_then_noops(deep_chain_table):
    lake = LakeTable(deep_chain_table)
    state = lake.snapshot_table().sort_by(SORT)
    assert lake.layout_stats()["max_delta_depth"] > 3

    plan = lake.maintain(dry_run=True)
    assert [a["op"] for a in plan["actions"]] == ["compact"]

    out = LakeTable(deep_chain_table).maintain()
    assert out["actions"][0]["op"] == "compact" and out["actions"][0]["done"]
    lake = LakeTable(deep_chain_table)
    assert lake.layout_stats()["max_delta_depth"] == 0
    assert lake.snapshot_table().sort_by(SORT).equals(state)

    # healthy now: a second maintain plans nothing
    assert LakeTable(deep_chain_table).maintain()["actions"] == []


def test_maintain_splits_oversized_buckets(deep_chain_table):
    lake = LakeTable(deep_chain_table)
    state = lake.snapshot_table().sort_by(SORT)
    stats = lake.layout_stats()
    # force the split rule with a tiny target: every bucket is "too big"
    target = max(1024, stats["largest_bucket_bytes"] // 8)
    out = lake.maintain(target_bucket_bytes=target)
    ops = [a["op"] for a in out["actions"]]
    assert "rebucket" in ops
    lake = LakeTable(deep_chain_table)
    assert lake.num_buckets > stats["num_buckets"]
    assert lake.snapshot_table().sort_by(SORT).equals(state)
    assert lake.fsck(deep=True)["ok"]


def test_maintain_shrinks_sparse_layout(tmp_path, ray_session):
    repos = generate_repos(n_files=120, seed=43)
    events = generate_events(repos, seed=43)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    table_dir = str(tmp_path / "t")
    assert replay(log_dir, table_dir, num_buckets=64).committed
    lake = LakeTable(table_dir)
    state = lake.snapshot_table().sort_by(SORT)

    out = lake.maintain()  # tiny data in 64 buckets: way under target/16
    assert [a["op"] for a in out["actions"]] == ["rebucket"]
    assert out["actions"][0]["target"] == 32
    lake = LakeTable(table_dir)
    assert lake.num_buckets == 32
    assert lake.snapshot_table().sort_by(SORT).equals(state)


def test_maintain_vacuum_respects_tags(deep_chain_table):
    lake = LakeTable(deep_chain_table)
    e_old = 0
    old_state = lake.snapshot_table(epoch=e_old).sort_by(SORT)
    lake.tag_epoch("anchor", epoch=e_old)
    out = lake.maintain(vacuum_keep_epochs=1)
    assert any(a["op"] == "vacuum" for a in out["actions"])
    lake = LakeTable(deep_chain_table)
    assert lake.snapshot_table(epoch=e_old).sort_by(SORT).equals(old_state)
