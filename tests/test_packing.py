"""Token-budget document packing (stages/packing.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.stages.packing import pack_batch, pack_documents


def test_pack_batch_invariants():
    rng = np.random.default_rng(3)
    ids = np.arange(200)
    toks = rng.integers(50, 900, 200)
    budget = 2048
    packs = pack_batch(ids, toks, budget)
    seen = [d for m, _ in packs for d in m]
    assert sorted(seen) == list(range(200))  # every doc packed exactly once
    tok_by_id = dict(zip(ids.tolist(), toks.tolist()))
    for members, tot in packs:
        assert tot == sum(tok_by_id[d] for d in members)
        assert tot <= budget
    # FFD efficiency: used bins within 25% of the lower bound
    lower = int(np.ceil(toks.sum() / budget))
    assert len(packs) <= int(np.ceil(lower * 1.25))


def test_pack_oversized_doc_gets_own_bin():
    packs = pack_batch(np.array([1, 2, 3]), np.array([5000, 100, 100]), budget=2048)
    solo = [m for m, _ in packs if m == [1]]
    assert len(solo) == 1  # over-budget doc isolated, not dropped


def test_pack_documents_dataset():
    rng = np.random.default_rng(8)
    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "n_tokens": pa.array(rng.integers(20, 700, 1000), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = pack_documents(ds, budget=1024).take_all()
    all_docs = sorted(d for r in out for d in r["doc_ids"])
    assert all_docs == list(range(1000))
    assert all(r["total_tokens"] <= 1024 or r["n_docs"] == 1 for r in out)
    total = t.column("n_tokens").to_numpy().sum()
    assert sum(r["total_tokens"] for r in out) == total
    # determinism incl. pack ids
    out2 = pack_documents(ray.data.from_arrow(t).repartition(4), budget=1024).take_all()
    assert sorted(r["pack_id"] for r in out) == sorted(r["pack_id"] for r in out2)
