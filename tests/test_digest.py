"""Anti-entropy table digest (stages/digest.py): divergence detection,
null handling, layout independence, fast/md5 path parity of behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_rs_ray.stages.digest import table_digest, xor_by_group


def _digests(t: pa.Table, hash: str, parts: int = 3) -> dict:
    ds = ray.data.from_arrow(t).repartition(parts)
    out = table_digest(ds, "g", ["id", "v"], hash=hash).to_pandas()
    return dict(zip(out["g"], zip(out["digest"], out["n"])))


@pytest.mark.parametrize("hash", ["md5", "fast"])
def test_digest_detects_single_row_change(hash, ray_session):
    n = 2000
    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "g": pa.array([("a", "b", "c")[i % 3] for i in range(n)]),
            "id": np.arange(n),
            "v": rng.integers(0, 100, n),
        }
    )
    base = _digests(t, hash)
    # layout independence: different partitioning, same digests
    assert base == _digests(t, hash, parts=7)
    # flip one value in group 'b': only that group's digest changes
    v2 = t.column("v").to_pylist()
    v2[4] += 1  # row 4 -> group 'b'
    t2 = t.set_column(2, "v", pa.array(v2, t.column("v").type))
    changed = _digests(t2, hash)
    assert changed["b"] != base["b"]
    assert changed["a"] == base["a"] and changed["c"] == base["c"]
    assert all(changed[k][1] == base[k][1] for k in base)  # counts equal


def test_digest_null_group_and_null_keys(ray_session):
    t = pa.table(
        {
            "g": pa.array(["a", None, "a", None]),
            "id": pa.array([1, 2, 3, None], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = table_digest(ray.data.from_arrow(t), "g", ["id", "v"], hash="md5").to_pandas()
    by_g = {(None if g != g else g): n for g, n in zip(out["g"], out["n"])}
    # null group rows digest under one null key; null id row still counts
    assert by_g == {"a": 2, None: 2}


def test_xor_by_group_weights_path():
    keys, xors, agg = xor_by_group(
        pa.array(["x", "y", "x"]),
        np.array([5, 6, 5], dtype=np.uint64),
        weights=np.array([10, 20, 30], dtype=np.int64),
    )
    m = dict(zip(keys.to_pylist(), zip(xors.tolist(), agg.tolist())))
    assert m == {"x": (0, 40), "y": (6, 20)}
