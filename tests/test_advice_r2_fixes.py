"""Pins for the round-2 ADVICE findings (see ADVICE.md):

1. lake.py — manifests written before the 'partitioner' field existed are
   refused (legacy sentinel), not silently accepted as poly64-v1.
2. connectors.py — bounded Kafka replay raises on a stalled broker instead
   of silently returning a partial range.
3. multimodal.py — text payloads that merely START with 'BM' (e.g. 'BMW…')
   do not route to the real BMP decoder.
4. sketches.py — HLL uses the standard small-m alpha constants (pinned
   here so a refactor back to the asymptotic formula fails).
5. connectors.py — table/column identifiers are quoted in generated SQL.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_rs_ray.sources.connectors import (
    IncompleteReplayError,
    _KafkaPartitionReader,
    _qi,
)
from etl_rs_ray.sources.lake import PARTITIONER_ID, LakeTable
from etl_rs_ray.stages.multimodal import DecodeImage, encode_bmp, is_bmp


def test_legacy_manifest_without_partitioner_field_refused(tmp_path):
    from etl_rs_ray.state.manifest import ManifestStore

    table_dir = str(tmp_path / "legacy_tbl")
    # simulate a pre-poly64 manifest: num_buckets present, no partitioner key
    ManifestStore(table_dir).commit(0, {"num_buckets": 4, "buckets": {}, "hwm_lsn": 0})
    with pytest.raises(ValueError, match="pre-poly64-legacy"):
        LakeTable(table_dir)


def test_current_manifest_with_partitioner_field_accepted(tmp_path):
    from etl_rs_ray.state.manifest import ManifestStore

    table_dir = str(tmp_path / "current_tbl")
    ManifestStore(table_dir).commit(
        0, {"num_buckets": 4, "partitioner": PARTITIONER_ID, "buckets": {}, "hwm_lsn": 0}
    )
    t = LakeTable(table_dir)
    assert t.num_buckets == 4


class _StallingConsumer:
    """Delivers offsets [start, stall_at) then polls None forever."""

    stall_at = 5

    def __init__(self, conf):
        self._queue = []

    def assign_bounded(self, topic, partition, offset):
        from tests.test_connectors import FakeMsg

        self._queue = [FakeMsg(topic, partition, o) for o in range(offset, self.stall_at)]

    def poll(self, timeout):
        return self._queue.pop(0) if self._queue else None


def test_kafka_bounded_replay_raises_on_stall():
    reader = _KafkaPartitionReader(
        "fake:9092", "g", client_factory=_StallingConsumer, poll_timeout=0.0, max_empty_polls=3
    )
    specs = pa.table(
        {"topic": ["t"], "partition": [0], "start_offset": [0], "end_offset": [10]}
    )
    with pytest.raises(IncompleteReplayError, match=r"stalled at offset 5"):
        reader(specs)


def test_kafka_bounded_replay_tolerates_transient_empty_polls():
    class FlakyConsumer(_StallingConsumer):
        """One empty poll between every message, then completes the range."""

        def __init__(self, conf):
            super().__init__(conf)
            self._tick = 0

        def assign_bounded(self, topic, partition, offset):
            from tests.test_connectors import FakeMsg

            self._queue = [FakeMsg(topic, partition, o) for o in range(offset, 10)]

        def poll(self, timeout):
            self._tick += 1
            if self._tick % 2 == 0:
                return None
            return self._queue.pop(0) if self._queue else None

    reader = _KafkaPartitionReader(
        "fake:9092", "g", client_factory=FlakyConsumer, poll_timeout=0.0, max_empty_polls=3
    )
    specs = pa.table(
        {"topic": ["t"], "partition": [0], "start_offset": [0], "end_offset": [10]}
    )
    out = reader(specs)
    assert out.num_rows == 10
    assert out.column("offset").to_pylist() == list(range(10))


def test_text_starting_with_bm_is_not_routed_to_bmp_decoder():
    payload = "BMW 3 Series review: the benchmark compact executive.".encode()
    assert not is_bmp(payload)
    batch = pa.table({"payload": pa.array([payload], pa.binary())})
    out = DecodeImage(strict=False)(batch)
    # md5-stub path: deterministic fake dims, no exception
    assert out.num_rows == 1 and out.column("width")[0].as_py() > 0


def test_real_bmp_still_routes_to_real_decoder():
    import numpy as np

    pixels = np.full((3, 5, 3), 128, dtype=np.uint8)
    payload = encode_bmp(pixels)
    assert is_bmp(payload)
    batch = pa.table({"payload": pa.array([payload], pa.binary())})
    out = DecodeImage(strict=True)(batch)
    assert out.column("width")[0].as_py() == 5
    assert out.column("height")[0].as_py() == 3
    assert abs(out.column("mean_luma")[0].as_py() - 128.0) < 1e-9


def test_hll_small_m_alpha_constants():
    from etl_rs_ray.stages.sketches import HyperLogLog

    assert HyperLogLog._SMALL_M_ALPHA == {16: 0.673, 32: 0.697, 64: 0.709}


def test_sql_identifier_quoting():
    assert _qi("lineitem") == '"lineitem"'
    assert _qi('we"ird') == '"we""ird"'
    with pytest.raises(ValueError):
        _qi("bad\x00name")
