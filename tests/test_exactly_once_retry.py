"""Exactly-once under task retry: the exchange's spill and merge tasks
must produce byte-identical files when re-executed on the same inputs —
the property that makes Ray's at-least-once task retry safe, with the
manifest pointer swap as the only commit point."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from etl_rs_ray.pipelines.cdc import _merge_xpart_task, make_spiller
from etl_rs_ray.datagen import EVENT_SCHEMA


def _events(n=500):
    rows = []
    for i in range(n):
        rows.append(
            {
                "lsn": i,
                "op": "U" if i % 3 else "I",
                "repo": f"org{i % 4}/r",
                "path": f"src/f{i % 50}.py",
                "commit": f"{i % 50:040x}",
                "lang": "py",
                "content": f"c{i}",
            }
        )
    return pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)


def _sha(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


def test_spill_retry_is_byte_identical(tmp_path):
    shuffle_dir = str(tmp_path / "shuffle")
    spill = make_spiller(shuffle_dir, num_xparts=4, num_buckets=8)
    batch = _events()
    out1 = spill(batch)
    files1 = {
        os.path.join(r, f): _sha(os.path.join(r, f))
        for r, _d, fs in os.walk(shuffle_dir)
        for f in fs
    }
    assert files1
    out2 = spill(batch)  # retried task: same input block
    files2 = {
        os.path.join(r, f): _sha(os.path.join(r, f))
        for r, _d, fs in os.walk(shuffle_dir)
        for f in fs
    }
    assert files1 == files2  # same names, same bytes — no duplicates
    assert out1.equals(out2)


def test_merge_retry_is_byte_identical(tmp_path):
    shuffle_dir = str(tmp_path / "shuffle")
    staging = str(tmp_path / "staging")
    os.makedirs(staging, exist_ok=True)
    spill = make_spiller(shuffle_dir, num_xparts=2, num_buckets=4)
    acct = spill(_events())
    plan = [
        (f, int(rg))
        for x, f, rg in zip(
            acct.column("xpart").to_pylist(),
            acct.column("file").to_pylist(),
            acct.column("rg").to_pylist(),
        )
        if int(x) == 0
    ]
    assert plan
    entries1 = _merge_xpart_task(shuffle_dir, plan, {}, staging)
    hashes1 = {e["bucket"]: _sha(os.path.join(staging, e["filename"])) for e in entries1}
    entries2 = _merge_xpart_task(shuffle_dir, plan, {}, staging)  # retried reducer
    hashes2 = {e["bucket"]: _sha(os.path.join(staging, e["filename"])) for e in entries2}
    assert hashes1 == hashes2
    assert entries1 == entries2
