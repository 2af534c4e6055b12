"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (``ray.put`` once, read per task), per-batch
partial top-k, tiny driver-side merge. This is exact and the scale path
for "top-k of a handful of queries against everything" — the data moves
zero times.

Scale path: IVF — coarse centroids from a seeded sample (k-means on the
driver, centroids broadcast), one shuffle assigning rows to their nearest
centroid's partition; queries probe only ``nprobe`` nearest lists.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray


def _as_matrix(col) -> np.ndarray:
    # list<float> column -> (n, dim) contiguous float32, zero-ish copy via
    # flattened values buffer when the list column has no nulls
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0 and isinstance(col, (pa.ListArray, pa.LargeListArray)):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all():
            return flat.reshape(len(col), int(widths[0]))
    return np.array(col.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, cos_sim, rank) sorted per query."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        Q = ray.get(q_ref)
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = Q @ embs.T  # (nq, nbatch)
        nq = Q.shape[0]
        take = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            idx = np.argpartition(-sims[qi], take - 1)[:take]
            out_q.extend([qi] * take)
            out_id.extend(ids[idx].tolist())
            out_s.extend(sims[qi, idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True).take_all()
    # driver-side merge: nq * k * num_batches rows, tiny
    best: dict[int, list] = {}
    for r in partials:
        heap = best.setdefault(r["query_id"], [])
        item = (r["cos_sim"], -r[id_col])
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    out_q, out_id, out_s, out_rank = [], [], [], []
    for qi in sorted(best):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, neg_id) in enumerate(ranked, 1):
            out_q.append(qi)
            out_id.append(-neg_id)
            out_s.append(s)
            out_rank.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "cos_sim": pa.array(out_s, pa.float64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


def train_centroids(ds, emb_col: str = "embedding", n_centroids: int = 16,
                    sample_rows: int = 4096, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (IVF coarse quantizer)."""
    sample = ds.limit(sample_rows).take_all()
    X = _normalize(np.array([r[emb_col] for r in sample], dtype=np.float32))
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> pa.Table:
    """IVF-style ANN: only rows whose nearest centroid is among each
    query's nprobe probed lists are scored. Approximate by construction."""
    cent = train_centroids(ds, emb_col, n_centroids)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probes]
    q_ref = ray.put(q)
    probes_ref = ray.put(probe_sets)

    def partial(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        Q = ray.get(q_ref)
        P = ray.get(probes_ref)
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        assign = (embs @ C.T).argmax(axis=1)
        sims = Q @ embs.T
        out_q, out_id, out_s = [], [], []
        for qi in range(Q.shape[0]):
            mask = np.isin(assign, list(P[qi]))
            if not mask.any():
                continue
            cand = np.where(mask)[0]
            take = min(k, len(cand))
            top = cand[np.argpartition(-sims[qi, cand], take - 1)[:take]]
            out_q.extend([qi] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(sims[qi, top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    best: dict[int, list] = {}
    for r in partials:
        heap = best.setdefault(r["query_id"], [])
        item = (r["cos_sim"], -r[id_col])
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    out = {"query_id": [], id_col: [], "cos_sim": [], "rank": []}
    for qi in sorted(best):
        for rank, (s, neg_id) in enumerate(sorted(best[qi], key=lambda t: (-t[0], -t[1])), 1):
            out["query_id"].append(qi)
            out[id_col].append(-neg_id)
            out["cos_sim"].append(s)
            out["rank"].append(rank)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            id_col: pa.array(out[id_col], pa.int64()),
            "cos_sim": pa.array(out["cos_sim"], pa.float64()),
            "rank": pa.array(out["rank"], pa.int64()),
        }
    )
