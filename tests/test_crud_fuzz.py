"""Randomized CRUD interleavings vs a dict model: after every flush the
lake state must equal the model exactly (the _dev_utils-seeded serial CRUD
tests of the reference, generalized to random traces)."""

import numpy as np
import pytest

from etl_rs_ray.crud import CrudStore, EntityNotFound


def _key(i):
    return (f"org/r{i % 4}", f"src/f{i}.py", f"{i:040x}")


def _row(i, v):
    k = _key(i)
    return {"repo": k[0], "path": k[1], "commit": k[2], "lang": "py", "content": f"v{v}"}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_crud_trace_matches_model(tmp_path, seed):
    rng = np.random.default_rng(seed)
    store = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"), num_buckets=4)
    model: dict[tuple, str] = {}
    version = 0
    for step in range(60):
        i = int(rng.integers(0, 12))
        k = _key(i)
        op = rng.choice(["create", "update", "delete", "flush"])
        if op == "create" and k not in model:
            version += 1
            store.create(_row(i, version))
            model[k] = f"v{version}"
        elif op == "update":
            version += 1
            if k in model:
                # updates only visible after the previous state is flushed;
                # the CRUD surface reads the lake snapshot, so flush first
                store.flush()
                store.update(k, content=f"v{version}")
                model[k] = f"v{version}"
            else:
                store.flush()
                with pytest.raises(EntityNotFound):
                    store.update(k, content="x")
        elif op == "delete":
            store.flush()
            if k in model:
                store.delete(k)
                del model[k]
            else:
                with pytest.raises(EntityNotFound):
                    store.delete(k)
        else:
            store.flush()
    store.flush()
    rows = store.list(limit=5000)
    got = {(r["repo"], r["path"], r["commit"]): r["content"] for r in rows}
    assert got == model
    assert store.count() == len(model)
    for k, content in model.items():
        assert store.get(k)["content"] == content


@pytest.mark.parametrize("seed", [5, 6])
def test_random_txn_trace_matches_model(tmp_path, seed):
    """Random traces with nested transactions: inner commits fold into the
    outermost, rollbacks discard the whole open group, and the model only
    absorbs a group's changes when its OUTERMOST commit lands."""
    rng = np.random.default_rng(seed)
    store = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"), num_buckets=4)
    model: dict[tuple, str] = {}  # committed + flushed state
    pending: dict[tuple, str | None] = {}  # staged inside the open group
    version = 0
    depth = 0
    for step in range(80):
        i = int(rng.integers(0, 10))
        k = _key(i)
        op = rng.choice(["create", "delete", "begin", "commit", "rollback", "flush"])
        visible = {**model, **pending} if depth else model
        visible = {kk: v for kk, v in visible.items() if v is not None}
        if op == "create":
            if k in visible:
                continue
            version += 1
            if depth == 0:
                store.flush()
            store.create(_row(i, version))
            if depth:
                pending[k] = f"v{version}"
            else:
                model[k] = f"v{version}"
        elif op == "delete":
            if depth == 0:
                store.flush()
            if k in visible:
                store.delete(k)
                if depth:
                    pending[k] = None
                else:
                    del model[k]
            else:
                with pytest.raises(EntityNotFound):
                    store.delete(k)
        elif op == "begin":
            if depth == 0:
                store.flush()  # snapshot base the overlay reads against
            store.begin_txn()
            depth += 1
        elif op == "commit":
            if depth == 0:
                continue
            store.commit_txn()
            depth -= 1
            if depth == 0:
                for kk, v in pending.items():
                    if v is None:
                        model.pop(kk, None)
                    else:
                        model[kk] = v
                pending = {}
        elif op == "rollback":
            if depth == 0:
                continue
            store.rollback_txn()
            if depth == 1:
                pending = {}
            depth -= 1
        else:
            if depth == 0:
                store.flush()
    while depth:
        store.commit_txn()
        depth -= 1
    for kk, v in pending.items():
        if v is None:
            model.pop(kk, None)
        else:
            model[kk] = v
    store.flush()
    rows = store.list(limit=5000)
    got = {(r["repo"], r["path"], r["commit"]): r["content"] for r in rows}
    assert got == model


def test_filter_fuzz_matches_python(tmp_path):
    """Typed-operator filters vs a Python predicate model over a random
    table: every operator family and random OR-groups."""
    rng = np.random.default_rng(9)
    store = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"), num_buckets=4)
    rows = []
    for i in range(60):
        r = _row(i + 100, i)
        r["lang"] = rng.choice(["py", "rs", "go", None])
        rows.append(r)
    store.create_many(rows)
    store.flush()
    snap = {(r["repo"], r["path"], r["commit"]): r for r in store.list(limit=5000)}

    def model_count(pred):
        return sum(1 for r in snap.values() if pred(r))

    assert store.count({"lang": {"$in": ["py", "rs"]}}) == model_count(
        lambda r: r["lang"] in ("py", "rs")
    )
    assert store.count({"lang": {"$null": True}}) == model_count(lambda r: r["lang"] is None)
    assert store.count({"lsn": {"$gte": 10, "$lt": 40}}) == model_count(
        lambda r: 10 <= r["lsn"] < 40
    )
    assert store.count({"content": {"$startsWith": "v1"}}) == model_count(
        lambda r: (r["content"] or "").startswith("v1")
    )
    assert store.count(
        [{"lang": "py", "lsn": {"$lt": 30}}, {"lang": "rs"}]
    ) == model_count(lambda r: (r["lang"] == "py" and r["lsn"] < 30) or r["lang"] == "rs")
