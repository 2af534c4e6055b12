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
