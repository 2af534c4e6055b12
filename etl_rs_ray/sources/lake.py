"""Bucket-partitioned lake upsert table with manifest snapshots.

The Ray-native replacement for the reference's Postgres/Mongo sinks
(examples/csv_jdd_to_postgres.rs:40-125, kafka_jdd_to_mongo.rs:68-95):
Overwrite mode ≙ copy-on-write bucket rewrite + manifest swap; Append
mode ≙ adding data files to the manifest. A snapshot read
(``SELECT * FROM t``, examples/transform_jdd_normalisation.rs:32-38)
≙ ``read_parquet`` over the CURRENT manifest's file list.

Layout::

    table_dir/_manifests/{manifest-N.json, CURRENT}
    table_dir/_staging/epoch-N/bucket-K.parquet   (task outputs, pre-commit)
    table_dir/data/epoch-N/bucket-K.parquet       (committed)

Data files are renamed from staging into ``data/`` at commit time by the
driver; uncommitted staging epochs are garbage (never referenced by
CURRENT) and can be vacuumed.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import ManifestStore


class LakeTable:
    def __init__(self, table_dir: str, num_buckets: int = 64):
        self.table_dir = table_dir
        os.makedirs(table_dir, exist_ok=True)
        self.manifests = ManifestStore(table_dir)
        m = self.manifests.read()
        if m is not None:
            self.num_buckets = int(m["num_buckets"])
        else:
            self.num_buckets = num_buckets

    # --- read side ---------------------------------------------------------

    def current_epoch(self) -> int:
        return self.manifests.current_epoch()

    def hwm_lsn(self) -> int:
        m = self.manifests.read()
        return int(m["hwm_lsn"]) if m else -1

    def bucket_files(self, epoch: int | None = None) -> dict[int, str]:
        m = self.manifests.read(epoch)
        if not m:
            return {}
        return {
            int(b): os.path.join(self.table_dir, e["file"])
            for b, e in m["buckets"].items()
        }

    def data_files(self, epoch: int | None = None) -> list[str]:
        return sorted(self.bucket_files(epoch).values())

    def snapshot(self, columns: list[str] | None = None, epoch: int | None = None):
        """Table state as a streaming Ray Dataset. ``epoch`` gives time
        travel to any retained manifest (lineage is per-epoch)."""
        import ray.data

        files = self.data_files(epoch)
        if not files:
            return ray.data.from_arrow(pa.schema([]).empty_table())
        kwargs = {"columns": columns} if columns else {}
        return ray.data.read_parquet(files, **kwargs)

    def snapshot_table(self, epoch: int | None = None) -> pa.Table:
        """Driver-side materialized snapshot (tests / small tables)."""
        files = self.data_files(epoch)
        if not files:
            return pa.schema([]).empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

    def vacuum(self, keep_epochs: int = 1) -> list[str]:
        """Delete data files not referenced by the last ``keep_epochs``
        committed manifests (plus orphaned staging). Returns removed paths."""
        cur = self.current_epoch()
        if cur < 0:
            return []
        referenced: set[str] = set()
        kept = 0
        for e in range(cur, -1, -1):
            if kept >= keep_epochs:
                break
            try:
                m = self.manifests.read(e)
            except FileNotFoundError:
                continue
            if m is None:
                continue
            referenced.update(
                os.path.join(self.table_dir, entry["file"]) for entry in m["buckets"].values()
            )
            kept += 1
        removed = []
        data_root = os.path.join(self.table_dir, "data")
        if os.path.isdir(data_root):
            for root, _dirs, files in os.walk(data_root):
                for fn in files:
                    p = os.path.join(root, fn)
                    if p not in referenced:
                        os.unlink(p)
                        removed.append(p)
        staging_root = os.path.join(self.table_dir, "_staging")
        if os.path.isdir(staging_root):
            shutil.rmtree(staging_root, ignore_errors=True)
            removed.append(staging_root)
        # drop manifests older than the kept window (CURRENT stays valid)
        for fn in os.listdir(self.manifests.manifest_dir):
            if fn.startswith("manifest-"):
                e = int(fn.split("-")[1].split(".")[0])
                if e <= cur - keep_epochs:
                    os.unlink(os.path.join(self.manifests.manifest_dir, fn))
        return removed

    def metrics(self) -> dict:
        m = self.manifests.read()
        return m.get("metrics", {}) if m else {}

    # --- write side --------------------------------------------------------

    def staging_dir(self, epoch: int) -> str:
        d = os.path.join(self.table_dir, "_staging", f"epoch-{epoch}")
        os.makedirs(d, exist_ok=True)
        return d

    def commit_epoch(
        self,
        epoch: int,
        written_buckets: dict[int, dict],
        hwm_lsn: int,
        metrics: dict,
        lineage: dict,
        schema_str: str | None = None,
        mode: str = "upsert",
    ) -> bool:
        """Publish an epoch: move staged bucket files into data/, carry over
        untouched buckets from the parent manifest, swing CURRENT.

        Idempotent: returns False without side effects if ``epoch`` is
        already committed. ``mode='upsert'`` replaces touched buckets
        (copy-on-write); ``mode='overwrite'`` drops all previous buckets.
        """
        if self.manifests.current_epoch() >= epoch:
            return False
        prev = self.manifests.read()
        buckets: dict[str, dict] = {}
        if prev and mode == "upsert":
            buckets.update({str(k): dict(v) for k, v in prev["buckets"].items()})

        data_dir = os.path.join(self.table_dir, "data", f"epoch-{epoch}")
        os.makedirs(data_dir, exist_ok=True)
        staging = self.staging_dir(epoch)
        for b, entry in written_buckets.items():
            staged = os.path.join(staging, entry["filename"])
            if entry.get("rows", 0) == 0:
                # bucket became empty (all keys tombstoned) -> drop it
                buckets.pop(str(b), None)
                if os.path.exists(staged):
                    os.unlink(staged)
                continue
            final_rel = os.path.join("data", f"epoch-{epoch}", entry["filename"])
            final_abs = os.path.join(self.table_dir, final_rel)
            if os.path.exists(staged):
                os.replace(staged, final_abs)
            elif not os.path.exists(final_abs):
                raise FileNotFoundError(f"bucket {b}: neither staged nor final file exists: {staged}")
            buckets[str(b)] = {
                "file": final_rel,
                "rows": int(entry["rows"]),
                "hwm_lsn": int(entry.get("hwm_lsn", hwm_lsn)),
                "stats": entry.get("stats", {}),
            }
        shutil.rmtree(staging, ignore_errors=True)
        manifest = {
            "num_buckets": self.num_buckets,
            "mode": mode,
            "buckets": buckets,
            "hwm_lsn": int(hwm_lsn),
            "metrics": metrics,
            "lineage": lineage,
            "schema": schema_str,
            "parent_epoch": prev["epoch"] if prev else -1,
        }
        return self.manifests.commit(epoch, manifest)
