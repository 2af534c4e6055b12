"""Token-budget document packing — grouping documents into fixed-size
training sequences.

Exact bin packing is NP-hard and inherently serial; at corpus scale the
standard compromise is block-local first-fit-decreasing (FFD): each
map_batches block packs ITS documents into bins of ``budget`` tokens.
Quality loss vs global packing is bounded — FFD wastes at most ~22%
over optimal in the worst case and single-digit % on real length
distributions — while the operator stays a shuffle-free streaming pass.
Documents longer than the budget get a bin of their own (truncation is
the trainer's decision, not the packer's).

Output: one row per PACK: (pack_id, doc_ids list, n_docs, total_tokens).
pack_id is content-derived (hash of member ids), so re-running on the
same blocks yields the same ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_batch(
    doc_ids: "np.ndarray", token_counts: "np.ndarray", budget: int
) -> list[tuple[list, int]]:
    """First-fit-decreasing over one block: returns [(member_ids,
    total_tokens)]. Vectorized sort; the fit loop is O(docs x open bins)
    with bins bounded by docs."""
    order = np.argsort(-token_counts, kind="stable")
    bins: list[list] = []
    bin_tokens: list[int] = []
    for i in order:
        t = int(token_counts[i])
        placed = False
        for b in range(len(bins)):
            if bin_tokens[b] + t <= budget:
                bins[b].append(doc_ids[i])
                bin_tokens[b] += t
                placed = True
                break
        if not placed:
            bins.append([doc_ids[i]])
            bin_tokens.append(t)
    return [(members, tot) for members, tot in zip(bins, bin_tokens)]


def pack_documents(
    ds,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
):
    """Pack a corpus into token-budget bins, block-locally (see module
    docstring for the FFD-per-block tradeoff). Returns a Dataset
    (pack_id, doc_ids, n_docs, total_tokens)."""
    import hashlib

    def fn(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        toks = b.column(tokens_col).to_numpy(zero_copy_only=False)
        packs = pack_batch(ids, toks, budget)
        pack_ids, members, n_docs, totals = [], [], [], []
        for m, tot in packs:
            m = [int(x) for x in m]
            digest = hashlib.md5(",".join(map(str, sorted(m))).encode()).digest()
            pack_ids.append(int.from_bytes(digest[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF)
            members.append(m)
            n_docs.append(len(m))
            totals.append(int(tot))
        return pa.table(
            {
                "pack_id": pa.array(pack_ids, pa.int64()),
                "doc_ids": pa.array(members, pa.list_(pa.int64())),
                "n_docs": pa.array(n_docs, pa.int64()),
                "total_tokens": pa.array(totals, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
