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

import json
import os


class ManifestStore:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.manifest_dir = os.path.join(table_dir, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    @property
    def current_path(self) -> str:
        return os.path.join(self.manifest_dir, "CURRENT")

    def current_epoch(self) -> int:
        try:
            with open(self.current_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-{epoch}.json")

    def read(self, epoch: int | None = None) -> dict | None:
        if epoch is None:
            epoch = self.current_epoch()
        if epoch < 0:
            return None
        with open(self.manifest_path(epoch)) as f:
            return json.load(f)

    def commit(self, epoch: int, manifest: dict) -> bool:
        """Write manifest-<epoch> and swing CURRENT. Returns False (no-op)
        if this epoch — or a later one — is already committed."""
        if self.current_epoch() >= epoch:
            return False
        manifest = dict(manifest, epoch=epoch)
        mpath = self.manifest_path(epoch)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        tmp_cur = self.current_path + ".tmp"
        with open(tmp_cur, "w") as f:
            f.write(str(epoch))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_cur, self.current_path)  # the single atomic commit point
        return True
