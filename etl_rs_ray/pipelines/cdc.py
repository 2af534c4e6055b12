"""Flagship pipeline: bounded binlog replay -> lake upsert table.

Ray-Data-first shape (SURVEY.md §7):

    read_event_log (file/row-group pruned by LSN window)
      -> [optional] map_batches(TransformChain)          stateless normalize
      -> map_batches(pre-compact)                        per-batch LWW combiner
                                                         + bucket assignment
      -> groupby("bucket").map_groups(merge)             the ONE shuffle,
                                                         keyed hash(repo,path)
      -> per-bucket staged Parquet + driver manifest commit (exactly-once)

The per-batch combiner collapses superseded events *before* the shuffle,
so the all-to-all exchange moves at most one row per (key, batch) instead
of the full event history — the partial-aggregation pattern the reference
lacks (it materializes one LazyFrame per key, transform_hdd_deduplication.rs:282-311).

Ordering: LSN total order is restored per key inside the bucket reducer
by sorting — no global sort, matching the Kafka-offset-per-partition
semantics of the reference (kafka_jdd_to_mongo.rs:35-63).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.registry import TransformChain
from ..sources.event_log import fast_hash_bucket, read_event_log, select_segments
from ..sources.lake import LakeTable
from ..stages.merge_apply import DEFAULT_KEY, LwwStats, lww_reduce, merge_bucket_tables

ENTRY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("filename", pa.string()),
        ("rows", pa.int64()),
        ("hwm_lsn", pa.int64()),
        ("events_in", pa.int64()),
        ("superseded_dropped", pa.int64()),
        ("applied_i", pa.int64()),
        ("applied_u", pa.int64()),
        ("applied_d", pa.int64()),
    ]
)


def make_precompact(num_buckets: int, key_cols=DEFAULT_KEY, lsn_col="lsn", op_col="op"):
    """Per-batch combiner: assign shuffle bucket + within-batch LWW."""

    def precompact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        batch = lww_reduce(batch, key_cols, lsn_col, op_col, drop_tombstones=False)
        bucket = fast_hash_bucket(batch.column("repo"), batch.column("path"), num_buckets)
        return batch.append_column("bucket", bucket)

    return precompact


def make_bucket_merger(
    staging_dir: str,
    bucket_files: dict[int, str],
    key_cols=DEFAULT_KEY,
    lsn_col="lsn",
    op_col="op",
):
    """Group reducer: merge one bucket's incoming winners into its stored
    state, write the new bucket file to a deterministic staging path
    (retry-idempotent), emit one manifest-entry row."""

    def merge_group(group: pa.Table) -> pa.Table:
        b = group.column("bucket")[0].as_py()
        incoming = group.drop_columns(["bucket"])
        stats = LwwStats()
        incoming = lww_reduce(incoming, key_cols, lsn_col, op_col, stats=stats)
        existing = None
        path = bucket_files.get(b)
        if path is not None:
            existing = pq.read_table(path)
        merged = merge_bucket_tables(existing, incoming, key_cols, lsn_col, op_col)
        # deterministic bytes: retried tasks must re-produce identical files
        merged = merged.sort_by([(k, "ascending") for k in key_cols])
        filename = f"bucket-{b}.parquet"
        out = os.path.join(staging_dir, filename)
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(merged, tmp, row_group_size=128 * 1024)
        os.replace(tmp, out)
        hwm = pc.max(incoming.column(lsn_col)).as_py() if incoming.num_rows else -1
        return pa.table(
            {
                "bucket": pa.array([b], pa.int32()),
                "filename": pa.array([filename]),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "hwm_lsn": pa.array([hwm], pa.int64()),
                "events_in": pa.array([stats.events_in], pa.int64()),
                "superseded_dropped": pa.array([stats.superseded_dropped], pa.int64()),
                "applied_i": pa.array([stats.ops.get("I", 0)], pa.int64()),
                "applied_u": pa.array([stats.ops.get("U", 0)], pa.int64()),
                "applied_d": pa.array([stats.ops.get("D", 0)], pa.int64()),
            },
            schema=ENTRY_SCHEMA,
        )

    return merge_group


@dataclass
class ReplayResult:
    committed: bool
    epoch: int
    hwm_lsn: int
    events_applied: int = 0
    rows_total: int = 0
    buckets_touched: int = 0
    metrics: dict = field(default_factory=dict)
    wall_seconds: float = 0.0


def replay(
    log_dir: str,
    table_dir: str,
    *,
    target_lsn: int | None = None,
    num_buckets: int = 64,
    normalize: TransformChain | dict | None = None,
    override_num_blocks: int | None = None,
    batch_size: int | None = None,
) -> ReplayResult:
    """Replay all events with ``lsn > table.hwm`` (bounded by ``target_lsn``)
    into the lake upsert table. Resumable + idempotent: re-running after a
    crash (or calling twice) applies each event exactly once."""
    t0 = time.perf_counter()
    lake = LakeTable(table_dir, num_buckets)
    hwm = lake.hwm_lsn()
    epoch = lake.current_epoch() + 1

    segs = select_segments(log_dir, hwm, target_lsn)
    if not segs:
        return ReplayResult(False, lake.current_epoch(), hwm, wall_seconds=time.perf_counter() - t0)

    ds = read_event_log(log_dir, lsn_from=hwm, lsn_to=target_lsn, override_num_blocks=override_num_blocks)
    if normalize is not None:
        chain = normalize if isinstance(normalize, TransformChain) else TransformChain(normalize)
        ds = ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    ds = ds.map_batches(
        make_precompact(lake.num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    merger = make_bucket_merger(lake.staging_dir(epoch), lake.bucket_files())
    # Hash-shuffle co-locates every row of a bucket in ONE partition. The
    # default range-sort shuffle can split a group across blocks when key
    # cardinality is low (Ray map_groups applies the UDF per block), which
    # would silently drop events — pin the strategy on this dataset's context.
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    entries_ds = ds.groupby("bucket", num_partitions=lake.num_buckets).map_groups(
        merger, batch_format="pyarrow"
    )
    entries = entries_ds.take_all()  # tiny: one row per touched bucket

    if not entries:
        return ReplayResult(False, lake.current_epoch(), hwm, wall_seconds=time.perf_counter() - t0)

    seen = [int(e["bucket"]) for e in entries]
    if len(seen) != len(set(seen)):
        raise RuntimeError(f"bucket group split across reducers: {sorted(seen)}")

    written = {
        int(e["bucket"]): {
            "filename": e["filename"],
            "rows": int(e["rows"]),
            "hwm_lsn": int(e["hwm_lsn"]),
            "stats": {
                "events_in": int(e["events_in"]),
                "superseded_dropped": int(e["superseded_dropped"]),
                "applied_i": int(e["applied_i"]),
                "applied_u": int(e["applied_u"]),
                "applied_d": int(e["applied_d"]),
            },
        }
        for e in entries
    }
    new_hwm = max([hwm] + [w["hwm_lsn"] for w in written.values()])
    metrics = {
        "events_applied": sum(w["stats"]["events_in"] for w in written.values()),
        "superseded_dropped": sum(w["stats"]["superseded_dropped"] for w in written.values()),
        "applied_i": sum(w["stats"]["applied_i"] for w in written.values()),
        "applied_u": sum(w["stats"]["applied_u"] for w in written.values()),
        "applied_d": sum(w["stats"]["applied_d"] for w in written.values()),
        "buckets_touched": len(written),
        "wall_seconds": round(time.perf_counter() - t0, 3),
    }
    lineage = {
        "segments": [s.path for s in segs],
        "lsn_window": [hwm, new_hwm],
        "log_dir": log_dir,
    }
    committed = lake.commit_epoch(epoch, written, new_hwm, metrics, lineage)
    rows_total = sum(
        int(e["rows"]) for e in lake.manifests.read()["buckets"].values()
    )
    return ReplayResult(
        committed=committed,
        epoch=lake.current_epoch(),
        hwm_lsn=lake.hwm_lsn(),
        events_applied=metrics["events_applied"],
        rows_total=rows_total,
        buckets_touched=len(written),
        metrics=metrics,
        wall_seconds=time.perf_counter() - t0,
    )
