"""Resumable partitioned Parquet export.

The brief's output rule at 100 TB: never one giant file, and a failed
run must be able to skip finished partitions. This exporter makes the
PARTITION the unit of atomicity:

- rows hash-shuffle to their partition value; each partition's whole row
  set is written by one task to ``out_dir/<col>=<val>/part-0.parquet``
  (tmp + rename) and then a ``_SUCCESS`` marker — the marker only exists
  if every row of that partition is durably on disk;
- a re-run lists the markers first and anti-joins finished values out of
  the input via the broadcast semi-join stage, so only missing/partial
  partitions are recomputed and rewritten (partials are truncated by the
  rename).

For lake tables the manifest commit (sources/lake.py) is the atomicity
mechanism; this is the generic exporter for pipeline OUTPUTS consumed by
other systems.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _partition_dirname(col: str, val) -> str:
    return f"{col}={val}"


def finished_partitions(out_dir: str, partition_col: str) -> list[str]:
    """Partition VALUES (as strings, hive-style) already marked done."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    prefix = f"{partition_col}="
    for d in sorted(os.listdir(out_dir)):
        if d.startswith(prefix) and os.path.exists(os.path.join(out_dir, d, "_SUCCESS")):
            out.append(d[len(prefix):])
    return out


def export_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    resume: bool = True,
    num_partitions: int = 8,
) -> dict:
    """Write one directory per partition value, each committed atomically
    (data rename, then marker). Returns {"written": n, "skipped": m}."""
    import pyarrow.compute as pc

    from ..stages.joins import broadcast_semi_join

    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col) if resume else []
    skipped = len(done)
    if done:
        # compare in string space: the dir name is the canonical value
        def str_col(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__pstr", pc.cast(b.column(partition_col), pa.string())
            )

        ds = ds.map_batches(str_col, batch_format="pyarrow", zero_copy_batch=True)
        ds = broadcast_semi_join(ds, pa.array(done), on="__pstr", anti=True)
        ds = ds.drop_columns(["__pstr"])

    def write_group(group: pa.Table) -> pa.Table:
        val = group.column(partition_col)[0].as_py()
        pdir = os.path.join(out_dir, _partition_dirname(partition_col, val))
        os.makedirs(pdir, exist_ok=True)
        out = os.path.join(pdir, "part-0.parquet")
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(group, tmp)
        os.replace(tmp, out)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(str(group.num_rows))
        return pa.table(
            {
                "partition": pa.array([str(val)], pa.string()),
                "rows": pa.array([group.num_rows], pa.int64()),
            }
        )

    from ..util import drop_empty_blocks

    # upstream shuffled stages can leave schema-less empty blocks that
    # break the keyed shuffle; strip them first (zero-copy). The real
    # schema is the fallback so a fully-skipped run still groups cleanly.
    rs = ds.schema(fetch_if_missing=True)
    sch = pa.schema(list(zip(rs.names, rs.types))) if rs is not None else None
    ds = drop_empty_blocks(ds, sch)
    if ds.count() == 0:
        # everything already exported (or empty input): nothing to shuffle
        return {"written": 0, "skipped": skipped, "rows": 0}
    acct = (
        _hash_shuffle(ds)
        .groupby(partition_col, num_partitions=num_partitions)
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return {
        "written": len(acct),
        "skipped": skipped,
        "rows": sum(r["rows"] for r in acct),
    }
