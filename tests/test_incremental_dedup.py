"""Incremental dedup against a persisted corpus index."""

import pyarrow as pa
import ray.data

from etl_rs_ray.stages.incremental_dedup import MinhashIndex, incremental_minhash_dedup


def _doc(i, text):
    return {"doc_id": i, "text": text}


BASE = [
    _doc(0, "the quick brown fox jumps over the lazy dog every single morning"),
    _doc(1, "machine learning systems require careful data curation and validation work"),
    _doc(2, "completely different content about cooking pasta with tomato sauce tonight"),
]


def test_incremental_dedup_flow(tmp_path):
    idx_dir = str(tmp_path / "idx")
    corpus = ray.data.from_items(BASE).repartition(2)
    idx = MinhashIndex.build(corpus, idx_dir, num_buckets=16)

    increment = [
        _doc(10, BASE[0]["text"]),  # exact dup of corpus doc 0
        _doc(11, "the quick brown fox jumps over the lazy dog every single evening"),  # near dup of 0
        _doc(12, "a brand new document about distributed query engines and arrow batches"),
        _doc(13, "a brand new document about distributed query engines and arrow batches"),  # dup within increment
        _doc(14, "yet another unique text mentioning sailing boats and ocean navigation"),
    ]
    surv, stats = incremental_minhash_dedup(
        ray.data.from_items(increment).repartition(2), idx
    )
    ids = sorted(r["doc_id"] for r in surv.take_all())
    # corpus dups (10, 11) dropped; within-increment dup keeps min id (12)
    assert stats["corpus_dups"] >= 2
    assert 10 not in ids and 11 not in ids
    assert 12 in ids and 13 not in ids
    assert 14 in ids

    # second increment re-sending the SAME new docs: caught by the updated index
    surv2, stats2 = incremental_minhash_dedup(
        ray.data.from_items([_doc(20, increment[2]["text"]),
                             _doc(21, "totally fresh text about alpine hiking trails in summer")]).repartition(1),
        idx,
    )
    ids2 = sorted(r["doc_id"] for r in surv2.take_all())
    assert 20 not in ids2  # duplicate of doc 12, now in the index
    assert ids2 == [21]


def test_incremental_dedup_no_update(tmp_path):
    idx_dir = str(tmp_path / "idx")
    MinhashIndex.build(ray.data.from_items(BASE), idx_dir, num_buckets=8)
    idx = MinhashIndex(idx_dir)
    inc = [_doc(30, "some wholly original sentence about telescopes and distant galaxies")]
    surv, _ = incremental_minhash_dedup(ray.data.from_items(inc), idx, update_index=False)
    assert [r["doc_id"] for r in surv.take_all()] == [30]
    # index untouched: re-sending the same doc is NOT caught
    surv2, stats2 = incremental_minhash_dedup(ray.data.from_items(inc), idx, update_index=False)
    assert [r["doc_id"] for r in surv2.take_all()] == [30]
    assert stats2["corpus_dups"] == 0
