"""Feature-hashing text embedder + its integration with the ANN family."""

import numpy as np
import pyarrow as pa
import ray.data

from etl_rs_ray.stages.embed import HashingEmbedder, embed_texts


def test_embedder_deterministic_and_normalized():
    e = HashingEmbedder(dim=32)
    b = pa.table({"text": ["the quick brown fox", "the quick brown fox", "unrelated text here", None, ""]})
    out = e(b)
    vecs = out.column("embedding").to_pylist()
    assert vecs[0] == vecs[1]  # deterministic
    assert abs(np.linalg.norm(vecs[0]) - 1.0) < 1e-5
    assert vecs[3] == [0.0] * 32 and vecs[4] == [0.0] * 32  # null/empty -> zero


def test_similar_texts_closer_than_different():
    e = HashingEmbedder(dim=64)
    b = pa.table(
        {
            "text": [
                "the cat sat on the mat near the door of the house",
                "the cat sat on the mat near the door of the home",
                "quarterly revenue grew by twelve percent in asia",
            ]
        }
    )
    v = np.array(e(b).column("embedding").to_pylist())
    sim_near = float(v[0] @ v[1])
    sim_far = float(v[0] @ v[2])
    assert sim_near > sim_far


def test_embed_then_ann_roundtrip():
    """text -> embed (actor pool) -> brute-force top-1 finds the doc
    itself: the full text-to-search loop inside the engine."""
    from etl_rs_ray.stages.ann import brute_force_topk

    docs = [
        {"doc_id": i, "text": f"document number {i} about topic {i % 5} with words {i * 7}"}
        for i in range(40)
    ]
    ds = embed_texts(ray.data.from_items(docs).repartition(3), dim=64)
    emb = pa.Table.from_pylist(ds.take_all())
    q = np.array(emb.column("embedding").to_pylist()[:3], dtype=np.float32)
    ds2 = ray.data.from_arrow(
        pa.table({"vec_id": emb.column("doc_id"), "embedding": emb.column("embedding")})
    ).repartition(2)
    out = brute_force_topk(ds2, q, k=1)
    top1 = {r["query_id"]: r["vec_id"] for r in out.to_pylist()}
    assert top1 == {0: 0, 1: 1, 2: 2}
