"""Write-ahead manifest with atomic-rename commit — the exactly-once sink.

Replaces the reference's crude idempotence-by-truncation (Mongo Overwrite
mode: drop collection + insert_many, examples/kafka_jdd_to_mongo.rs:68-95)
and its nested-transaction commit (lib-core/src/model/store/dbx.rs:31-114)
with a lake-style protocol:

1. tasks write data files to deterministic ``_staging/epoch-N/...`` paths
   (a retried task overwrites the same bytes — idempotent),
2. the driver writes ``_manifests/manifest-N.json`` (the WAL record:
   file list, row counts, per-bucket + global high-watermark LSN, metrics,
   lineage, schema),
3. commit = atomic ``os.replace`` of the CURRENT pointer.

Re-committing an epoch <= CURRENT is a no-op, so a replayed job's only
visible effect is the single pointer swap.

The protocol follows the log-structured table model published as Delta
Lake (Armbrust et al., "Delta Lake: High-Performance ACID Table Storage
over Cloud Object Stores", VLDB 2020): immutable data files + an ordered
manifest log whose tail pointer is the only mutable state.
"""

from __future__ import annotations

from . import fs


class ManifestStore:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.manifest_dir = fs.join(table_dir, "_manifests")
        fs.makedirs(self.manifest_dir)

    @property
    def current_path(self) -> str:
        return fs.join(self.manifest_dir, "CURRENT")

    def current_epoch(self) -> int:
        try:
            return int(fs.read_text(self.current_path).strip())
        except FileNotFoundError:
            return -1

    def manifest_path(self, epoch: int) -> str:
        return fs.join(self.manifest_dir, f"manifest-{epoch}.json")

    def read(self, epoch: int | None = None) -> dict | None:
        if epoch is None:
            epoch = self.current_epoch()
        if epoch < 0:
            return None
        return fs.read_json(self.manifest_path(epoch))

    def commit(self, epoch: int, manifest: dict) -> bool:
        """Write manifest-<epoch> and swing CURRENT. Returns False (no-op)
        if this epoch — or a later one — is already committed.

        Racing writers of the SAME epoch are serialized by a first-
        writer-wins exclusive publish of the manifest file (hard-link
        CAS): exactly one racer's content becomes manifest-<epoch>; the
        loser returns False without touching it. The CURRENT swing is a
        monotonic advance (fs.advance_int_pointer: flock-serialized
        locally), so concurrent committers — same epoch or different —
        can neither crash each other (the round-4 shared-tmp
        FileNotFoundError) nor regress the pointer past a newer epoch."""
        if self.current_epoch() >= epoch:
            return False
        manifest = dict(manifest, epoch=epoch)
        won = fs.publish_json_exclusive(self.manifest_path(epoch), manifest)
        if not won and self.current_epoch() >= epoch:
            # another writer fully committed this (or a later) epoch
            return False
        # either this call's content won, or an earlier attempt published
        # the manifest and crashed before swinging CURRENT — adopt the
        # published content (deterministic staging makes it equivalent)
        # and finish the commit.
        fs.advance_int_pointer(self.current_path, epoch)
        return True
