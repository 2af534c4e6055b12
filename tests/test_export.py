"""Resumable partitioned export (sources/export.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from etl_rs_ray.sources.export import export_partitioned, finished_partitions


def _data(n=1000, parts=7):
    return pa.table(
        {
            "k": pa.array([i % parts for i in range(n)], pa.int64()),
            "v": pa.array(range(n), pa.int64()),
        }
    )


def test_export_writes_all_partitions(tmp_path):
    out = str(tmp_path / "out")
    res = export_partitioned(ray.data.from_arrow(_data()).repartition(4), out, "k")
    assert res == {"written": 7, "skipped": 0, "rows": 1000}
    assert sorted(finished_partitions(out, "k")) == [str(i) for i in range(7)]
    # every row is present exactly once across the partition files
    total = 0
    for d in os.listdir(out):
        t = pq.read_table(os.path.join(out, d, "part-0.parquet"))
        ks = set(t.column("k").to_pylist())
        assert len(ks) == 1  # partition purity
        total += t.num_rows
    assert total == 1000


def test_export_resume_skips_finished(tmp_path):
    out = str(tmp_path / "out")
    export_partitioned(ray.data.from_arrow(_data()).repartition(4), out, "k")
    # simulate a failed run on partition 3: marker missing, data partial
    import shutil

    os.remove(os.path.join(out, "k=3", "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "k=5"))
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
        for d in os.listdir(out)
        if os.path.exists(os.path.join(out, d, "part-0.parquet"))
    }
    res = export_partitioned(ray.data.from_arrow(_data()).repartition(4), out, "k")
    assert res["written"] == 2 and res["skipped"] == 5
    # finished partitions untouched (same file bytes mtime)
    for d, m in mtimes.items():
        if d not in ("k=3", "k=5"):
            assert os.path.getmtime(os.path.join(out, d, "part-0.parquet")) == m
    # rewritten partitions complete again
    assert sorted(finished_partitions(out, "k")) == [str(i) for i in range(7)]
    t3 = pq.read_table(os.path.join(out, "k=3", "part-0.parquet"))
    assert t3.num_rows == len([i for i in range(1000) if i % 7 == 3])


def test_export_no_resume_rewrites_everything(tmp_path):
    out = str(tmp_path / "out")
    export_partitioned(ray.data.from_arrow(_data()), out, "k")
    res = export_partitioned(ray.data.from_arrow(_data()), out, "k", resume=False)
    assert res["written"] == 7 and res["skipped"] == 0


def test_export_string_partition_values(tmp_path):
    t = pa.table({"lang": pa.array(["py", "rs", "py", "go"]), "x": pa.array([1, 2, 3, 4])})
    out = str(tmp_path / "out")
    res = export_partitioned(ray.data.from_arrow(t), out, "lang")
    assert res["written"] == 3
    assert sorted(finished_partitions(out, "lang")) == ["go", "py", "rs"]
