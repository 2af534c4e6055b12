"""CRUD-semantics tests replacing the reference's live-Postgres serial
tests (lib-core/src/model/agent.rs:75-311): create/create_many/update/
delete/delete_many/get/first/list/count, I/U/D ordering, tombstones,
idempotent re-apply."""

import pytest

from etl_rs_ray.crud import CrudStore, EntityNotFound, LIST_LIMIT_DEFAULT


def _row(i, content="v1"):
    return {
        "repo": f"org/r{i % 3}",
        "path": f"src/f{i}.py",
        "commit": f"{i:040x}",
        "lang": "py",
        "content": content,
    }


@pytest.fixture
def store(tmp_path):
    return CrudStore(str(tmp_path / "log"), str(tmp_path / "table"))


def test_create_get_update_delete(store):
    key = ("org/r0", "src/f0.py", f"{0:040x}")
    store.create(_row(0))
    store.flush()
    got = store.get(key)
    assert got["content"] == "v1"

    store.update(key, content="v2")
    store.flush()
    assert store.get(key)["content"] == "v2"

    store.delete(key)
    store.flush()
    assert store.get(key) is None
    with pytest.raises(EntityNotFound):
        store.update(key, content="v3")
    with pytest.raises(EntityNotFound):
        store.delete(key)


def test_create_many_list_count(store):
    store.create_many([_row(i) for i in range(10)])
    store.flush()
    assert store.count() == 10
    assert store.count(filters={"repo": "org/r1"}) == 3  # i=1,4,7
    rows = store.list(order_bys=["!path"], limit=3)
    assert [r["path"] for r in rows] == ["src/f9.py", "src/f8.py", "src/f7.py"]
    rows = store.list(order_bys=["path"], limit=2, offset=1)
    assert [r["path"] for r in rows] == ["src/f1.py", "src/f2.py"]
    assert store.first(filters={"repo": "org/r2"}, order_bys=["path"])["path"] == "src/f2.py"


def test_delete_many_and_flush_idempotent(store):
    store.create_many([_row(i) for i in range(6)])
    store.flush()
    store.delete_many([("org/r0", "src/f0.py", f"{0:040x}"), ("org/r1", "src/f1.py", f"{1:040x}")])
    store.flush()
    assert store.count() == 4
    # flush again with no new events: no-op
    store.flush()
    assert store.count() == 4


def test_lsn_orders_writes(store):
    key = ("org/r0", "src/f0.py", f"{0:040x}")
    store.create(_row(0, "a"))
    # interleaved updates apply in emit order (mtime ≙ LSN)
    store._emit([{**_row(0, "b"), "op": "U"}])
    store._emit([{**_row(0, "c"), "op": "U"}])
    store.flush()
    assert store.get(key)["content"] == "c"


def test_list_limit_default(store):
    assert LIST_LIMIT_DEFAULT == 1000


def test_get_is_point_read(tmp_path, monkeypatch):
    """get() must open only the owning bucket's file set (bucket pruning),
    never the whole table."""
    from etl_rs_ray.crud import CrudStore

    store = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"), num_partitions=2, num_buckets=8)
    rows = [
        {"repo": f"r{i%5}", "path": f"p{i}", "commit": "c", "lang": "py", "content": f"x{i}"}
        for i in range(200)
    ]
    store.create_many(rows)
    store.flush()
    from etl_rs_ray.sources.lake import LakeTable

    lake = LakeTable(str(tmp_path / "table"))
    n_buckets_present = len(lake.bucket_file_sets())
    assert n_buckets_present > 1

    import pyarrow.parquet as pq

    opened = []
    orig = pq.read_table

    def counting(path, *a, **k):
        opened.append(path)
        return orig(path, *a, **k)

    monkeypatch.setattr(pq, "read_table", counting)
    got = store.get(("r3", "p13", "c"))
    assert got is not None and got["content"] == "x13"
    # only ONE bucket's files were touched
    assert len(opened) == len(lake.bucket_file_sets()[_bucket_of(lake, "r3", "p13")])
    assert len(opened) < n_buckets_present
    opened.clear()
    assert store.get(("nope", "nope", "c")) is None


def _bucket_of(lake, repo, path):
    import pyarrow as pa

    from etl_rs_ray.sources.event_log import fast_hash_bucket

    return fast_hash_bucket(pa.array([repo]), pa.array([path]), lake.num_buckets)[0].as_py()
