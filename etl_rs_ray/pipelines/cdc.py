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


def make_spiller(shuffle_dir: str, key_cols=DEFAULT_KEY, lsn_col="lsn", op_col="op"):
    """Map stage of the disk exchange: per input block, LWW-precompact,
    then write one file per touched bucket under
    ``shuffle_dir/bucket=K/<content-hash>.parquet``.

    File names derive from the partition's content (lsn range, row count,
    crc of lsns) so a retried task overwrites identical bytes —
    idempotent under Ray task retry. Emits (bucket, rows) accounting rows.
    """

    def spill(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()), "spilled": pa.array([], pa.int64())})
        buckets = batch.column("bucket")
        out_b, out_n = [], []
        import zlib

        for b in pc.unique(buckets).to_pylist():
            part = batch.filter(pc.equal(buckets, b)).drop_columns(["bucket"])
            lsns = part.column("lsn")
            tag = (
                f"{pc.min(lsns).as_py()}-{pc.max(lsns).as_py()}-{part.num_rows}-"
                f"{zlib.crc32(lsns.combine_chunks().to_numpy(zero_copy_only=False).tobytes()):08x}"
            )
            bdir = os.path.join(shuffle_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            fpath = os.path.join(bdir, f"part-{tag}.parquet")
            tmp = fpath + f".tmp-{os.getpid()}"
            pq.write_table(part, tmp, row_group_size=256 * 1024, compression="zstd")
            os.replace(tmp, fpath)
            out_b.append(b)
            out_n.append(part.num_rows)
        return pa.table({"bucket": pa.array(out_b, pa.int32()), "spilled": pa.array(out_n, pa.int64())})

    return spill


def _merge_bucket_task(
    bucket: int,
    spill_dir: str,
    existing_file: str | None,
    staging_dir: str,
    key_cols=DEFAULT_KEY,
    lsn_col="lsn",
    op_col="op",
) -> dict:
    """Reduce side of the disk exchange (plain Ray task body): fold one
    bucket's spilled partials + stored state, write the new bucket file."""
    files = sorted(
        os.path.join(spill_dir, f)
        for f in os.listdir(spill_dir)
        if f.endswith(".parquet")
    )
    from ..state.schema_evolution import unify_tables

    incoming = unify_tables([pq.read_table(f) for f in files])
    stats = LwwStats()
    incoming = lww_reduce(incoming, key_cols, lsn_col, op_col, stats=stats)
    existing = pq.read_table(existing_file) if existing_file else None
    merged = merge_bucket_tables(existing, incoming, key_cols, lsn_col, op_col)
    merged = merged.sort_by([(k, "ascending") for k in key_cols])
    filename = f"bucket-{bucket}.parquet"
    out = os.path.join(staging_dir, filename)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(merged, tmp, row_group_size=128 * 1024)
    os.replace(tmp, out)
    hwm = pc.max(incoming.column(lsn_col)).as_py() if incoming.num_rows else -1
    return {
        "bucket": bucket,
        "filename": filename,
        "rows": merged.num_rows,
        "hwm_lsn": hwm,
        "events_in": stats.events_in,
        "superseded_dropped": stats.superseded_dropped,
        "applied_i": stats.ops.get("I", 0),
        "applied_u": stats.ops.get("U", 0),
        "applied_d": stats.ops.get("D", 0),
    }


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
    shuffle_partitions: int | None = None,
    shuffle: str = "disk",
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
    import ray

    staging = lake.staging_dir(epoch)
    if shuffle == "disk":
        # Explicit disk-partitioned exchange: map tasks spill per-bucket
        # partials, then one independent Ray task folds each bucket. No
        # aggregator actor pool (Ray's hash shuffle routes all data through
        # num_partitions actors, which measurably bottlenecks the pipeline)
        # and both sides scale linearly with CPUs. The shuffle dir lives
        # under the epoch's staging dir; a crashed attempt is wiped on the
        # next replay of the same epoch, keeping retries exactly-once.
        import shutil as _shutil

        shuffle_dir = os.path.join(staging, "_shuffle")
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)
        spilled = ds.map_batches(
            make_spiller(shuffle_dir),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        ).take_all()
        touched = sorted({int(r["bucket"]) for r in spilled})
        if not touched:
            return ReplayResult(False, lake.current_epoch(), hwm, wall_seconds=time.perf_counter() - t0)
        bucket_files = lake.bucket_files()
        merge_task = ray.remote(num_cpus=1)(_merge_bucket_task)
        futs = [
            merge_task.remote(
                b, os.path.join(shuffle_dir, f"bucket={b}"), bucket_files.get(b), staging
            )
            for b in touched
        ]
        entries = ray.get(futs)
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
    else:
        # Ray-native hash-shuffle groupby (kept for comparison / small jobs).
        # Hash (not range-sort) shuffle: the sort strategy can split a
        # low-cardinality group across blocks and map_groups applies the
        # UDF per block — silent data loss.
        from ray.data.context import ShuffleStrategy

        merger = make_bucket_merger(staging, lake.bucket_files())
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        if shuffle_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            shuffle_partitions = max(2, min(lake.num_buckets, cpus))
        entries_ds = ds.groupby("bucket", num_partitions=shuffle_partitions).map_groups(
            merger, batch_format="pyarrow"
        )
        entries = entries_ds.take_all()  # tiny: one row per touched bucket
        seen = [int(e["bucket"]) for e in entries]
        if len(seen) != len(set(seen)):
            raise RuntimeError(f"bucket group split across reducers: {sorted(seen)}")

    if not entries:
        return ReplayResult(False, lake.current_epoch(), hwm, wall_seconds=time.perf_counter() - t0)

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
