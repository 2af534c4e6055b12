"""End-to-end training-data curation: the 100 TB corpus pipeline in one
composition of the engine's operators.

    read documents (pruned columns)
      -> quality scoring + language ID   (one fused map_batches, all RE2)
      -> quality / language filter       (vectorized predicate)
      -> exact dedup                     (hash combiner -> one shuffle)
      -> MinHash-LSH near-dup dedup      (banded buckets, CC removal)
      -> benchmark decontamination       (cross-corpus LSH anti-join,
                                          optional `reference` corpus)
      -> token counting                  (RE2)
      -> train/val/test split            (optional `splits`, zero shuffle)
      -> resumable partitioned export    (one dir per language, _SUCCESS
                                          markers, re-run skips finished)

Every stage streams: no driver materialization of documents at any
point; the only driver state is the near-dup removal id set (O(dups))
and the per-partition accounting rows. Returns corpus-level stats
computed as a by-product (counts per stage, token totals).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    ds,
    out_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.2,
    langs: tuple = ("en", "fr", "es", "de"),
    near_dup: bool = True,
    reference=None,
    splits: dict | None = None,
    split_seed: str = "s0",
    small_input: bool = False,
    resume: bool = True,
    stage_counts: bool = False,
) -> dict:
    """Run the curation pipeline; write partitioned Parquet when
    ``out_dir`` is given, else just count the surviving corpus. Returns
    per-stage counts + token stats."""
    from ..stages.dedup import exact_dedup, minhash_lsh_dedup
    from ..stages.text_stats import bpe_ish_token_count, lang_id, quality_score

    stats: dict = {}
    stats["input_docs"] = ds.count()  # parquet metadata — no execution

    def score(batch: pa.Table) -> pa.Table:
        return lang_id(quality_score(batch, text_col), text_col)

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    lang_set = pa.array(list(langs))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch.column("quality_score"), min_quality),
            pc.is_in(batch.column("lang_pred"), value_set=lang_set),
        )
        return batch.filter(mask)

    kept = scored.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    # per-stage counts each force a full extra execution of the prefix —
    # diagnostics only (stage_counts=True); the fast path runs the
    # pipeline once end to end
    if stage_counts:
        stats["after_quality_lang_filter"] = kept.count()

    deduped = exact_dedup(kept, text_col, id_col)
    if stage_counts:
        stats["after_exact_dedup"] = deduped.count()

    if near_dup:
        deduped = minhash_lsh_dedup(
            deduped, text_col, id_col, num_perm=64, bands=8, small_input=small_input
        )
        if stage_counts:
            stats["after_near_dedup"] = deduped.count()

    if reference is not None:
        # strip near-duplicates of the held-out benchmark corpus (the
        # training-set hygiene step) — same LSH band space as near-dup
        from ..stages.dedup import decontaminate

        deduped = decontaminate(
            deduped, reference, text_col, id_col, small_input=small_input
        )
        if stage_counts:
            stats["after_decontaminate"] = deduped.count()

    def add_tokens(batch: pa.Table) -> pa.Table:
        # n_tokens already rode in from quality_stats; add the BPE-ish one
        txt = batch.column(text_col)
        return batch.append_column(
            "n_tokens_bpe", pc.cast(bpe_ish_token_count(txt), pa.int64())
        )

    final = deduped.map_batches(add_tokens, batch_format="pyarrow", zero_copy_batch=True)

    if splits:
        # deterministic train/val/test tag — rides along to the export so
        # downstream loaders filter by the `split` column (zero shuffle)
        from ..stages.sampling import assign_split

        final = assign_split(final, id_col, splits, seed=split_seed)

    # corpus-level token totals: tiny per-batch partials, one gather
    def token_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "docs": pa.array([b.num_rows], pa.int64()),
                "tokens": pa.array([pc.sum(b.column("n_tokens")).as_py() or 0], pa.int64()),
                "tokens_bpe": pa.array(
                    [pc.sum(b.column("n_tokens_bpe")).as_py() or 0], pa.int64()
                ),
            }
        )

    if out_dir is None:
        agg = final.map_batches(
            token_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        stats["final_docs"] = sum(r["docs"] for r in agg)
        stats["total_tokens"] = sum(r["tokens"] for r in agg)
        stats["total_tokens_bpe"] = sum(r["tokens_bpe"] for r in agg)
        return stats

    from ..sources.export import export_partitioned

    res = export_partitioned(final, out_dir, "lang_pred", resume=resume)
    stats["final_docs"] = res["rows"]
    stats["partitions_written"] = res["written"]
    stats["partitions_skipped"] = res["skipped"]
    return stats
