"""End-to-end corpus curation pipeline (pipelines/curation.py)."""

import os

import pyarrow.parquet as pq
import ray.data

from etl_rs_ray.pipelines.curation import curate_corpus

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_curate_counts_monotone():
    stats = curate_corpus(_docs(), small_input=True, stage_counts=True)
    assert stats["input_docs"] == 500
    assert (
        stats["input_docs"]
        >= stats["after_quality_lang_filter"]
        >= stats["after_exact_dedup"]
        >= stats["after_near_dedup"]
        == stats["final_docs"]
        > 0
    )
    assert stats["total_tokens"] > 0
    assert stats["total_tokens_bpe"] >= stats["total_tokens"]


def test_curate_exports_partitioned_and_resumes(tmp_path):
    out = str(tmp_path / "corpus")
    stats = curate_corpus(_docs(), out_dir=out, small_input=True)
    assert stats["partitions_written"] >= 1 and stats["partitions_skipped"] == 0
    # output is one dir per language with complete markers
    dirs = [d for d in os.listdir(out) if d.startswith("lang_pred=")]
    assert len(dirs) == stats["partitions_written"]
    total = sum(
        pq.read_table(os.path.join(out, d, "part-0.parquet")).num_rows for d in dirs
    )
    assert total == stats["final_docs"]
    # second run: everything skipped
    stats2 = curate_corpus(_docs(), out_dir=out, small_input=True)
    assert stats2["partitions_written"] == 0
    assert stats2["partitions_skipped"] == stats["partitions_written"]


def test_curate_deterministic():
    a = curate_corpus(_docs(), small_input=True, stage_counts=True)
    b = curate_corpus(_docs(), small_input=True, stage_counts=True)
    assert a == b


def test_curate_with_decontamination_and_splits(tmp_path):
    """The full r3 pipeline: reference corpus strips its near-dups, and
    every surviving doc carries a deterministic split tag."""
    import ray.data

    docs_ds = _docs()
    # reference = a few docs straight from the corpus (guaranteed hits)
    ref_rows = docs_ds.take(3)
    reference = ray.data.from_items(
        [{"doc_id": 10_000 + i, "text": r["text"]} for i, r in enumerate(ref_rows)]
    )
    base = curate_corpus(_docs(), small_input=True)
    stats = curate_corpus(
        _docs(),
        reference=reference,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        small_input=True,
        stage_counts=True,
    )
    assert stats["after_decontaminate"] <= stats["after_near_dedup"]
    assert stats["final_docs"] < base["final_docs"]  # contamination removed

    out = str(tmp_path / "corpus")
    stats2 = curate_corpus(
        _docs(), out_dir=out, reference=reference,
        splits={"train": 0.8, "val": 0.1, "test": 0.1}, small_input=True,
    )
    dirs = [d for d in os.listdir(out) if d.startswith("lang_pred=")]
    tables = [pq.read_table(os.path.join(out, d, "part-0.parquet")) for d in dirs]
    total = sum(t.num_rows for t in tables)
    assert total == stats2["final_docs"] == stats["final_docs"]
    splits_seen = {s for t in tables for s in t.column("split").to_pylist()}
    assert splits_seen <= {"train", "val", "test"} and "train" in splits_seen
