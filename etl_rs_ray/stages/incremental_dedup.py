"""Incremental near-dup dedup: new documents against a PERSISTED corpus
index — the daily-increment workflow at 100 TB, where re-minhashing the
whole corpus per increment is not an option.

The index stores the corpus's LSH band signatures as Parquet,
hive-partitioned by ``sig_bucket = stable_hash64(sig) % K``: an
increment routes its new signatures to their buckets and each bucket
task reads ONLY its own partition directory — increment cost scales
with the increment (touched buckets), not the corpus.

Flow per increment:
1. band the new docs (same perms31/word-trigram pipeline as the batch
   dedup family — one signature definition everywhere);
2. route new bands by sig_bucket; per touched bucket, one task loads the
   stored (band, sig) set and emits the new doc ids that collide with
   the corpus (= near-dup of something already kept);
3. drop corpus-colliding docs, then dedup the remaining new docs against
   EACH OTHER with the ordinary in-memory path;
4. append the survivors' bands to the index (new files in the bucket
   dirs — never rewriting existing ones, so a crashed increment leaves
   the index readable and re-runnable).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.event_log import stable_hash64
from .dedup import make_minhash_bands_pairwise


def _sig_bucket(sig_arr, k: int) -> pa.Array:
    arr = sig_arr.combine_chunks() if isinstance(sig_arr, pa.ChunkedArray) else sig_arr
    return pa.array((stable_hash64(arr) % np.uint64(k)).astype(np.int64))


def _bands_of(ds, text_col: str, id_col: str, num_perm: int, bands: int, k: int):
    b = ds.map_batches(
        make_minhash_bands_pairwise(text_col, id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return b.map_batches(
        lambda t, _k=k: t.append_column("sig_bucket", _sig_bucket(t.column("sig"), _k)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class MinhashIndex:
    """Persisted LSH band index (one dir per sig_bucket)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)

    @classmethod
    def build(cls, ds, index_dir: str, text_col: str = "text", id_col: str = "doc_id",
              num_perm: int = 64, bands: int = 8, num_buckets: int = 64) -> "MinhashIndex":
        os.makedirs(index_dir, exist_ok=True)
        b = _bands_of(ds, text_col, id_col, num_perm, bands, num_buckets)
        b.write_parquet(os.path.join(index_dir, "bands"), partition_cols=["sig_bucket"])
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(
                {"num_perm": num_perm, "bands": bands, "num_buckets": num_buckets,
                 "id_col": id_col, "text_col": text_col},
                f,
            )
        return cls(index_dir)

    def bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.index_dir, "bands", f"sig_bucket={bucket}")

    def bucket_files(self, bucket: int) -> list[str]:
        return sorted(glob.glob(os.path.join(self.bucket_dir(bucket), "*.parquet")))

    def append_bands(self, bands_tbl: pa.Table) -> int:
        """Append an increment's band rows as NEW files in their bucket
        dirs (tmp + rename; existing files untouched)."""
        written = 0
        buckets = bands_tbl.column("sig_bucket").to_numpy(zero_copy_only=False)
        for bkt in np.unique(buckets):
            part = bands_tbl.filter(pc.equal(bands_tbl.column("sig_bucket"), int(bkt)))
            part = part.drop_columns(["sig_bucket"])
            d = self.bucket_dir(int(bkt))
            os.makedirs(d, exist_ok=True)
            name = f"inc-{os.getpid()}-{written}-{os.urandom(4).hex()}.parquet"
            tmp = os.path.join(d, name + ".tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(d, name))
            written += 1
        return written


def incremental_minhash_dedup(
    new_ds,
    index: MinhashIndex,
    update_index: bool = True,
):
    """Dedup an increment against the corpus index (and within itself).
    Returns (survivors_ds, stats). Only the touched sig_bucket partitions
    of the index are read."""
    import ray
    import ray.data

    from .dedup import _filter_removed, _removal_set, minhash_lsh_dedup

    m = index.meta
    text_col, id_col = m["text_col"], m["id_col"]
    new_bands = _bands_of(
        new_ds, text_col, id_col, m["num_perm"], m["bands"], m["num_buckets"]
    )
    index_dir_ref = ray.put(index.index_dir)

    def collide(group: pa.Table) -> pa.Table:
        """One task per touched bucket: load the stored (band, sig) keys,
        emit new doc ids whose (band, sig) exists in the corpus."""
        bkt = int(group.column("sig_bucket")[0].as_py())
        files = sorted(
            glob.glob(os.path.join(ray.get(index_dir_ref), "bands", f"sig_bucket={bkt}", "*.parquet"))
        )
        if not files:
            return pa.table({id_col: pa.array([], pa.int64())})
        stored = pa.concat_tables(
            [pq.read_table(f, columns=["band", "sig"]) for f in files],
            promote_options="permissive",
        )
        stored = stored.cast(pa.schema([("band", pa.int64()), ("sig", pa.string())]))
        key_stored = pc.binary_join_element_wise(
            pc.cast(stored.column("band"), pa.string()), stored.column("sig"), "|"
        )
        key_new = pc.binary_join_element_wise(
            pc.cast(group.column("band"), pa.string()), group.column("sig"), "|"
        )

        hit = pc.is_in(key_new, value_set=key_stored.combine_chunks())
        ids = pc.unique(group.column(id_col).filter(hit).combine_chunks())
        return pa.table({id_col: ids})

    from .dedup import _group_partitions, _hash_shuffle

    colliding = (
        _hash_shuffle(new_bands)
        .groupby("sig_bucket", num_partitions=_group_partitions())
        .map_groups(collide, batch_format="pyarrow")
    )
    corpus_dups = {r[id_col] for r in colliding.take_all()}
    stats = {"corpus_dups": len(corpus_dups)}

    fresh = _filter_removed(new_ds, id_col, corpus_dups) if corpus_dups else new_ds
    # dedup the remaining new docs against each other (ordinary path)
    survivors = minhash_lsh_dedup(
        fresh, text_col, id_col, num_perm=m["num_perm"], bands=m["bands"], small_input=True
    )

    if update_index:
        surv_bands = _bands_of(
            survivors, text_col, id_col, m["num_perm"], m["bands"], m["num_buckets"]
        )
        # increment-sized: the survivors' band rows (docs x bands) fit the
        # driver for any realistic daily increment
        tbl = pa.Table.from_pylist(surv_bands.take_all())
        if tbl.num_rows:
            index.append_bands(tbl)
        stats["index_band_rows_appended"] = tbl.num_rows
    return survivors, stats
