"""Stateful actor-pool merge-apply — the streaming-tail variant.

The batch replay (pipelines/cdc.py) re-reads + rewrites touched buckets per
epoch; for a live binlog tail with frequent small micro-batches that would
rewrite files constantly. This variant holds per-partition last-writer-wins
state IN actors (the north-star "stateful actor-pool merge-apply stage"):

- P ``PartitionMerger`` actors, each owning a disjoint set of buckets
  (bucket = hash(repo, path) % P, same partitioner as the log/lake);
- the driver tails the event log in LSN-ordered micro-batches, splits each
  Arrow batch by owner (vectorized filter), and applies concurrently;
- each actor enforces its own high-watermark (exactly-once under
  re-delivery), applies LWW + tombstones to its in-memory map, and can
  snapshot its state as an Arrow table or flush it to lake staging files.

This is a deliberate drop to raw ``@ray.remote`` actors: a Ray Data
``map_batches`` actor pool gives no batch->actor affinity, so per-key
state would be split across actors. The reference's analogous state is the
Kafka consumer group's committed offsets (src/kafka.rs:127-140) plus the
Mongo collection acting as the merge target (kafka_jdd_to_mongo.rs:68-95).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.event_log import fast_hash_bucket
from ..stages.merge_apply import DEFAULT_KEY


@ray.remote
class PartitionMerger:
    """Owns the LWW/tombstone map for a set of buckets.

    State: key tuple -> (lsn, row dict); plus the partition high-watermark.
    Setup cost is paid once at actor construction (the reference reloads
    lazy_static lookup state per process similarly, config.rs:79-97).
    """

    def __init__(self, key_cols=DEFAULT_KEY, lsn_col: str = "lsn", op_col: str = "op"):
        self.key_cols = tuple(key_cols)
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.state: pa.Table | None = None  # live rows only, LWW-collapsed
        # change set since the last delta flush: LWW winners INCLUDING
        # tombstones — exactly what a lake delta epoch appends
        self.dirty: pa.Table | None = None
        self.hwm = -1
        self.applied = 0
        self.dropped_stale = 0

    def apply(self, batch: pa.Table, enforce_hwm: bool = True) -> dict:
        """Apply one micro-batch (rows for this partition only, any order).

        Exactly-once: events at or below the partition HWM are dropped
        (re-delivery); within the batch, LWW by LSN decides. Fully
        vectorized: the same Arrow kernels as the batch replay fold the
        micro-batch into the in-memory state table.
        """
        from ..stages.merge_apply import lww_reduce, merge_bucket_tables

        if batch.num_rows == 0:
            return {"applied": 0, "hwm": self.hwm, "keys": self._keys()}
        if enforce_hwm and self.hwm >= 0:
            fresh = batch.filter(pc.greater(batch.column(self.lsn_col), self.hwm))
            self.dropped_stale += batch.num_rows - fresh.num_rows
            batch = fresh
        applied = batch.num_rows
        if applied:
            self.hwm = max(self.hwm, pc.max(batch.column(self.lsn_col)).as_py())
            incoming = lww_reduce(batch, self.key_cols, self.lsn_col, self.op_col)
            self.state = merge_bucket_tables(
                self.state, incoming, self.key_cols, self.lsn_col, self.op_col
            )
            if self.dirty is None:
                self.dirty = incoming
            else:
                from ..state.schema_evolution import unify_tables

                self.dirty = lww_reduce(
                    unify_tables([self.dirty, incoming]), self.key_cols, self.lsn_col, self.op_col
                )
        self.applied += applied
        return {"applied": applied, "hwm": self.hwm, "keys": self._keys()}

    def take_dirty(self) -> pa.Table:
        """Return-and-clear the change set since the last delta flush.

        DANGER: clearing before the manifest commit loses the changes if
        the commit fails — use peek_dirty()/confirm_flush() (two-phase)
        for durable flushes. Kept for tests/ad-hoc inspection."""
        d = self.dirty if self.dirty is not None else pa.table({})
        self.dirty = None
        return d

    def peek_dirty(self) -> pa.Table:
        """Phase 1 of a durable flush: return the change set WITHOUT
        clearing it, remembering what was handed out."""
        d = self.dirty if self.dirty is not None else pa.table({})
        self._pending_flush = d
        return d

    def confirm_flush(self) -> int:
        """Phase 2, called only after the lake manifest commit succeeded:
        drop the peeked rows from the dirty set. Rows that arrived (or
        were LWW-overwritten to a newer LSN) between peek and confirm
        stay dirty — identified by their (key, lsn) not being in the
        flushed set. Returns rows still dirty."""
        pending = getattr(self, "_pending_flush", None)
        self._pending_flush = None
        if pending is None or pending.num_rows == 0 or self.dirty is None:
            return self.dirty.num_rows if self.dirty is not None else 0
        cols = [*self.key_cols, self.lsn_col]

        def tag(t: pa.Table) -> pa.Array:
            parts = [pc.cast(t.column(c), pa.string()) for c in cols]
            joined = parts[0]
            for p in parts[1:]:
                joined = pc.binary_join_element_wise(joined, p, "\x00", null_handling="replace", null_replacement="\x01")
            return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined

        flushed = pc.is_in(tag(self.dirty), value_set=tag(pending))
        self.dirty = self.dirty.filter(pc.invert(flushed))
        if self.dirty.num_rows == 0:
            self.dirty = None
            return 0
        return self.dirty.num_rows

    def _keys(self) -> int:
        return self.state.num_rows if self.state is not None else 0

    def snapshot(self) -> pa.Table:
        """Current partition state as one Arrow table."""
        if self.state is None:
            return pa.table({})
        return self.state

    def stats(self) -> dict:
        return {
            "hwm": self.hwm,
            "keys": self._keys(),
            "applied": self.applied,
            "dropped_stale": self.dropped_stale,
        }


class StreamingMerge:
    """Driver-side coordinator: event-log tail -> actor pool."""

    def __init__(self, num_partitions: int = 8, key_cols=DEFAULT_KEY):
        self.num_partitions = num_partitions
        self.key_cols = tuple(key_cols)
        self.actors = [PartitionMerger.remote(key_cols) for _ in range(num_partitions)]

    def apply_batch(self, batch: pa.Table) -> list[dict]:
        """Split one Arrow micro-batch by owner and apply concurrently."""
        buckets = fast_hash_bucket(
            batch.column("repo"), batch.column("path"), self.num_partitions
        )
        batch = batch.append_column("_b", buckets)
        futs = []
        for p in range(self.num_partitions):
            part = batch.filter(pc.equal(batch.column("_b"), p)).drop_columns(["_b"])
            if part.num_rows:
                futs.append(self.actors[p].apply.remote(part))
        return ray.get(futs)

    def tail(self, log_dir: str, lsn_from: int | None = None, lsn_to: int | None = None,
             micro_batch_rows: int = 50_000, atomic_txns: bool = False) -> dict:
        """Bounded tail of the log, streamed micro-batch by micro-batch —
        the driver never holds more than one micro-batch, so a long
        catch-up window costs O(micro_batch) driver memory. No global
        LSN sort is needed: PartitionMerger is LWW by LSN per key and
        drops stale/duplicate LSNs regardless of arrival order.
        ``atomic_txns=True`` trims the window to the transactional safe
        cut (event_log.safe_txn_cut) so an open BEGIN..COMMIT envelope at
        the tail is held back in full; commit markers are stripped per
        micro-batch in every mode."""
        from ..sources.event_log import (
            log_has_txns,
            read_event_log,
            safe_txn_cut,
            strip_txn_envelope,
        )

        has_txns = log_has_txns(log_dir)
        if atomic_txns and has_txns:
            lsn_to = safe_txn_cut(log_dir, lsn_from, lsn_to)
            if lsn_to is None:
                return self.stats()
        ds = read_event_log(log_dir, lsn_from, lsn_to)
        for batch in ds.iter_batches(batch_size=micro_batch_rows, batch_format="pyarrow"):
            if has_txns:
                batch = strip_txn_envelope(batch)
            if batch.num_rows:
                self.apply_batch(batch)
        return self.stats()

    def snapshot(self) -> pa.Table:
        tables = [t for t in ray.get([a.snapshot.remote() for a in self.actors]) if t.num_rows]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="permissive")

    def stats(self) -> dict:
        per = ray.get([a.stats.remote() for a in self.actors])
        return {
            "hwm": max((s["hwm"] for s in per), default=-1),
            "keys": sum(s["keys"] for s in per),
            "applied": sum(s["applied"] for s in per),
            "dropped_stale": sum(s["dropped_stale"] for s in per),
            "partitions": per,
        }

    def flush_to_lake(self, table_dir: str) -> bool:
        """Persist the pool's state as one atomic lake epoch (streaming ->
        durable table bridge): each partition's snapshot becomes that
        bucket's file, committed under the pool's global HWM."""
        import pyarrow.parquet as pq

        from ..sources.lake import LakeTable

        lake = LakeTable(table_dir, self.num_partitions)
        epoch = lake.current_epoch() + 1
        staging = lake.staging_dir(epoch)
        snaps = ray.get([a.snapshot.remote() for a in self.actors])
        stats = ray.get([a.stats.remote() for a in self.actors])
        written = {}
        for p, (snap, st) in enumerate(zip(snaps, stats)):
            if snap.num_rows == 0:
                continue
            snap = snap.sort_by([(k, "ascending") for k in self.key_cols])
            filename = f"bucket-{p}.parquet"
            import os

            out = os.path.join(staging, filename)
            pq.write_table(snap, out)
            written[p] = {
                "filename": filename,
                "rows": snap.num_rows,
                "hwm_lsn": st["hwm"],
                "stats": {"applied": st["applied"], "dropped_stale": st["dropped_stale"]},
            }
        hwm = max((st["hwm"] for st in stats), default=-1)
        metrics = {
            "applied": sum(st["applied"] for st in stats),
            "dropped_stale": sum(st["dropped_stale"] for st in stats),
        }
        return lake.commit_epoch(
            epoch, written, hwm, metrics, {"source": "streaming-pool"}, mode="overwrite"
        )

    def flush_delta_to_lake(self, table_dir: str) -> bool:
        """Append only the changes since the last flush as one LSM delta
        epoch (tombstones included) — O(changes), not O(table), per flush.
        Snapshot reads merge-on-read; compact folds when deltas pile up."""
        import pyarrow.parquet as pq

        from ..sources.lake import LakeTable

        lake = LakeTable(table_dir, self.num_partitions)
        epoch = lake.current_epoch() + 1
        staging = lake.staging_dir(epoch)
        # two-phase: peek (state kept in the actors), stage + commit, and
        # only clear the actors' dirty sets once the manifest commit
        # succeeded — a crash in between re-flushes instead of losing rows
        dirties = ray.get([a.peek_dirty.remote() for a in self.actors])
        stats = ray.get([a.stats.remote() for a in self.actors])
        written = {}
        import os

        for p, (d, st) in enumerate(zip(dirties, stats)):
            if d.num_rows == 0:
                continue
            d = d.sort_by([(k, "ascending") for k in self.key_cols])
            filename = f"bucket-{p}.parquet"
            pq.write_table(d, os.path.join(staging, filename))
            written[p] = {
                "filename": filename,
                "rows": d.num_rows,
                "hwm_lsn": st["hwm"],
                "stats": {"delta_flush": True},
            }
        if not written:
            return False
        hwm = max((st["hwm"] for st in stats), default=-1)
        committed = lake.commit_epoch(
            epoch, written, hwm, {"delta_flush": True}, {"source": "streaming-pool"}, mode="delta"
        )
        if committed:
            ray.get([a.confirm_flush.remote() for a in self.actors])
        return committed

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
