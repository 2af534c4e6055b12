"""Streaming actor-pool merge: equivalence with the batch replay and the
sequential oracle; exactly-once under re-delivered micro-batches."""

import pyarrow as pa
import pytest

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.stages.streaming import StreamingMerge


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    repos = generate_repos(n_files=300, seed=21)
    events = generate_events(repos, update_frac=0.5, delete_frac=0.2, dup_frac=0.1, seed=21)
    log_dir = str(root / "log")
    write_event_log(events, log_dir, num_partitions=4, events_per_segment=250)
    return {"events": events, "log_dir": log_dir}


def _to_state(table: pa.Table) -> dict:
    out = {}
    for r in table.to_pylist():
        out[(r["repo"], r["path"], r["commit"])] = (r["lsn"], r["lang"], r["content"])
    return out


def test_streaming_matches_oracle(data):
    sm = StreamingMerge(num_partitions=4)
    try:
        stats = sm.tail(data["log_dir"], micro_batch_rows=200)
        oracle = oracle_replay(data["events"])
        got = _to_state(sm.snapshot())
        assert got == oracle
        assert stats["keys"] == len(oracle)
        # duplicate LSNs that cross a micro-batch boundary are correctly
        # dropped by the partition HWM; never more than the dup count
        n_dups = data["events"].num_rows - len(set(data["events"].column("lsn").to_pylist()))
        assert stats["dropped_stale"] <= n_dups
    finally:
        sm.shutdown()


def test_streaming_exactly_once_on_redelivery(data):
    sm = StreamingMerge(num_partitions=4)
    try:
        sm.tail(data["log_dir"], micro_batch_rows=500)
        before = _to_state(sm.snapshot())
        hwm = sm.stats()["hwm"]
        # re-deliver the whole log (at-least-once upstream): all dropped
        stats = sm.tail(data["log_dir"], micro_batch_rows=500)
        assert stats["dropped_stale"] > 0
        assert stats["hwm"] == hwm
        assert _to_state(sm.snapshot()) == before
    finally:
        sm.shutdown()


def test_streaming_delta_flushes_match_oracle(data, tmp_path):
    """Tail in windows, delta-flush after each: the lake (merge-on-read)
    must track the oracle at every flush point, and compaction preserves
    the final state."""
    import pyarrow.compute as pc

    from etl_rs_ray.datagen import oracle_replay
    from etl_rs_ray.sources.lake import LakeTable

    events = data["events"]
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "table")
    sm = StreamingMerge(num_partitions=3)
    try:
        cuts = [max_lsn // 3, 2 * max_lsn // 3, None]
        prev = None
        for cut in cuts:
            sm.tail(data["log_dir"], lsn_from=prev, lsn_to=cut, micro_batch_rows=300)
            prev = cut
            assert sm.flush_delta_to_lake(table_dir)
            lake = LakeTable(table_dir)
            want = {
                k: (lsn, lang, content)
                for k, (lsn, lang, content) in oracle_replay(events, lsn_to=cut).items()
            }
            got = _to_state(lake.snapshot_table())
            assert got == want
        lake = LakeTable(table_dir)
        assert lake.has_deltas()
        assert lake.compact()
        assert _to_state(LakeTable(table_dir).snapshot_table()) == oracle_replay(events)
        # nothing dirty left -> flush is a no-op
        assert not sm.flush_delta_to_lake(table_dir)
    finally:
        sm.shutdown()


def test_streaming_incremental_windows_match_full(data):
    import pyarrow.compute as pc

    events = data["events"]
    max_lsn = pc.max(events.column("lsn")).as_py()
    sm = StreamingMerge(num_partitions=3)
    try:
        sm.tail(data["log_dir"], lsn_to=max_lsn // 2, micro_batch_rows=300)
        sm.tail(data["log_dir"], lsn_from=max_lsn // 2, micro_batch_rows=300)
        assert _to_state(sm.snapshot()) == oracle_replay(events)
    finally:
        sm.shutdown()
