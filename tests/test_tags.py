"""Named epoch tags: refs that pin manifests for reads/restore and act
as retention anchors vacuum must respect."""

import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.lake import LakeTable

SORT = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]


@pytest.fixture()
def tagged_table(tmp_path, ray_session):
    repos = generate_repos(n_files=400, seed=31)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.1, seed=31)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2, events_per_segment=100)
    table_dir = str(tmp_path / "t")
    max_lsn = int(events.column("lsn")[len(events) - 1].as_py())
    cuts = [max_lsn // 3, 2 * max_lsn // 3, max_lsn]
    states = []
    for c in cuts:
        assert replay(log_dir, table_dir, target_lsn=c, num_buckets=8).committed
        lake = LakeTable(table_dir)
        states.append((lake.current_epoch(), lake.snapshot_table().sort_by(SORT)))
    return {"log_dir": log_dir, "table_dir": table_dir, "states": states}


def test_tag_crud_and_immutability(tagged_table):
    lake = LakeTable(tagged_table["table_dir"])
    e0, e1, e2 = (e for e, _ in tagged_table["states"])
    assert lake.tag_epoch("prod") == e2  # default: current
    assert lake.tag_epoch("v1", epoch=e0) == e0
    assert lake.list_tags() == {"prod": e2, "v1": e0}
    with pytest.raises(ValueError, match="exists"):
        lake.tag_epoch("v1", epoch=e1)
    assert lake.tag_epoch("v1", epoch=e1, force=True) == e1
    assert lake.resolve_tag("v1") == e1
    lake.delete_tag("v1")
    with pytest.raises(ValueError, match="unknown tag"):
        lake.resolve_tag("v1")
    with pytest.raises(ValueError, match="not committed"):
        lake.tag_epoch("future", epoch=99)
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ValueError, match="bad tag name"):
            lake.tag_epoch(bad)


def test_vacuum_respects_tag_anchor(tagged_table):
    lake = LakeTable(tagged_table["table_dir"])
    (e0, s0), (e1, s1), (e2, s2) = tagged_table["states"]
    lake.tag_epoch("v0", epoch=e0)
    removed = lake.vacuum(keep_epochs=1)
    # the untagged middle epoch lost its exclusive files, the tagged one
    # did not: its snapshot still reads byte-equal
    lake = LakeTable(tagged_table["table_dir"])
    assert lake.snapshot_table(epoch=e0).sort_by(SORT).equals(s0)
    assert lake.snapshot_table().sort_by(SORT).equals(s2)
    # restoring to the tagged anchor works even after the vacuum
    lake.restore(lake.resolve_tag("v0"))
    lake = LakeTable(tagged_table["table_dir"])
    assert lake.snapshot_table().sort_by(SORT).equals(s0)
    assert lake.fsck(deep=True)["ok"]


def test_vacuum_without_tag_drops_old_epoch(tagged_table):
    """Control for the anchor test: with NO tag, the same vacuum makes
    the old epoch unreadable (so the anchor above really did the work)."""
    lake = LakeTable(tagged_table["table_dir"])
    (e0, s0), _, (e2, s2) = tagged_table["states"]
    removed = lake.vacuum(keep_epochs=1)
    assert removed
    lake = LakeTable(tagged_table["table_dir"])
    assert lake.snapshot_table().sort_by(SORT).equals(s2)
    with pytest.raises(Exception):
        lake.snapshot_table(epoch=e0)
