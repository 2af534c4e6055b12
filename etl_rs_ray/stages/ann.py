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
import pyarrow.compute as pc
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


def _list_matrix(col, dtype) -> np.ndarray:
    """(n, dim) matrix from a fixed-width list column, PRESERVING the
    requested dtype — _as_matrix's float32 cast silently destroys int64
    partial sums above 2^24 (found as a ±256-unit centroid drift)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return flat.reshape(0, 0)
    return flat.reshape(len(col), int(widths[0]))


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
    return _merge_topk(partials, k, id_col)


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


def build_ivf_index(
    ds,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    sample_rows: int = 4096,
    seed: int = 5,
) -> np.ndarray:
    """Physically route rows to their IVF list: one hive partition
    directory per coarse centroid (``lists/ivf_list=<c>/``), so a search
    READS only the probed lists — at 100 TB the other lists never leave
    storage. Centroids are trained on a driver sample, broadcast once,
    and persisted next to the lists for searches in later sessions.

    ``ivf_list`` is kept as a real column in the files too (hive strips
    partition columns from leaf files; searches read leaf dirs directly)."""
    import json
    import os

    cent = train_centroids(ds, emb_col, n_centroids, sample_rows=sample_rows, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        lists = (embs @ C.T).argmax(axis=1).astype(np.int64)
        batch = batch.append_column("ivf_list", pa.array(lists))
        return batch.append_column("list_id", pa.array(lists))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["ivf_list"]
    )
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_centroids": int(len(cent)), "emb_col": emb_col, "id_col": id_col}, f)
    return cent


def ivf_search_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> tuple[pa.Table, list[str]]:
    """Search a build_ivf_index directory: compute each query's nprobe
    nearest lists, read ONLY the union of probed list directories, score
    each row for exactly the queries that probed its list, then the same
    tiny partial-top-k driver merge as brute_force_topk. Returns
    (results, probed_paths) — the path list is the I/O-pruning evidence."""
    import json
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    emb_col, id_col = meta["emb_col"], meta["id_col"]
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probes]
    union = sorted(set().union(*probe_sets)) if probe_sets else []
    paths = [
        p
        for c in union
        if os.path.isdir(p := os.path.join(index_dir, "lists", f"ivf_list={c}"))
    ]
    if not paths:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        return empty, paths

    import glob

    import ray.data

    # a path LIST is treated as files by the reader: expand each probed
    # list dir to its parquet leaves
    files = [f for p in paths for f in sorted(glob.glob(os.path.join(p, "*.parquet")))]
    ds = ray.data.read_parquet(files, columns=[id_col, emb_col, "list_id"])
    q_ref = ray.put(q)
    probes_ref = ray.put(probe_sets)

    def partial(batch: pa.Table) -> pa.Table:
        Q = ray.get(q_ref)
        P = ray.get(probes_ref)
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lists = batch.column("list_id").to_numpy(zero_copy_only=False)
        sims = Q @ embs.T
        out_q, out_id, out_s = [], [], []
        for qi in range(Q.shape[0]):
            mask = np.isin(lists, list(P[qi]))
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
    return _merge_topk(partials, k, id_col), paths


def _merge_topk(partials: list[dict], k: int, id_col: str) -> pa.Table:
    """Driver-side merge of per-batch partial top-k rows (nq*k*batches)."""
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
    return _merge_topk(partials, k, id_col)


def group_centroids(
    ds,
    group_col: str,
    emb_col: str = "embedding",
    quantize: float | None = None,
):
    """Per-group mean embedding (cluster centroids / per-source embedding
    profiles) as a vectorized list-column aggregation: each batch
    stable-sorts by group and `np.add.reduceat`s the (n, dim) matrix into
    one partial (group, sum_vec, n) row per group — O(dim) bytes per
    group move through the shuffle, never the vectors — then a small
    groupby folds partials and divides.

    ``quantize``: emit centroids as list<int64> micro-units via EXACT
    fixed-point arithmetic: inputs round-half-away to int64 at scale
    2^31, partials and the fold sum INTEGERS (associative — no fold
    order can move any bit), and one final float64 expression
    ``round(sum * quantize / (n * 2^31))`` quantizes. A float-sum
    variant was flipped on a rounding boundary when a read-block-size
    change regrouped the partials; integer sums make the result
    independent of batching by construction. The SQL mirror applies the
    identical input rounding and final expression.
    Returns (group_col, centroid, n_vectors)."""
    FIX = 2147483648.0  # 2^31: exact for float32 inputs, no i64 overflow
                        # before ~2^32 rows per group
    from .dedup import _group_partitions, _hash_shuffle

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], batch.schema.field(group_col).type),
                    "_sum": pa.array([], pa.list_(pa.float64())),
                    "_n": pa.array([], pa.int64()),
                }
            )
        X = _as_matrix(batch.column(emb_col)).astype(np.float64)
        if quantize is not None:
            # round-half-away (SQL round()), not np.round's half-even
            V = X * FIX
            X = (np.sign(V) * np.floor(np.abs(V) + 0.5)).astype(np.int64)
        g = batch.column(group_col).combine_chunks()
        order = pc.sort_indices(g)
        onp = order.to_numpy(zero_copy_only=False)
        gs = g.take(order)
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs.slice(1).to_numpy(zero_copy_only=False) != gs.slice(
            0, len(gs) - 1
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(X[onp], starts, axis=0)
        ends = np.append(starts[1:], len(gs))
        sum_type = pa.int64() if quantize is not None else pa.float64()
        return pa.table(
            {
                group_col: gs.take(pa.array(starts)),
                "_sum": pa.array(list(sums), pa.list_(sum_type)),
                "_n": pa.array((ends - starts).astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        # whole-block kernel over MANY groups: sort by group, reduceat the
        # partial sums/counts per segment — one python call per partition
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], t.schema.field(group_col).type),
                    "centroid": pa.array(
                        [], pa.list_(pa.int64() if quantize is not None else pa.float64())
                    ),
                    "n_vectors": pa.array([], pa.int64()),
                }
            )
        t = t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending")]))
        from .merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, (group_col,)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        acc_t = np.int64 if quantize is not None else np.float64
        sums = np.add.reduceat(_list_matrix(t.column("_sum"), acc_t), starts, axis=0)
        n = np.add.reduceat(
            t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64), starts
        )
        if quantize is not None:
            # the one float expression, on exact integer inputs — mirrors
            # the oracle's round((SUM*q)/(n*2^31)) term for term
            q = (sums.astype(np.float64) * float(quantize)) / (
                n[:, None].astype(np.float64) * FIX
            )
            cents_q = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
            cent_arr = pa.array(list(cents_q), pa.list_(pa.int64()))
        else:
            cents = sums / n[:, None]
            cent_arr = pa.array(list(cents), pa.list_(pa.float64()))
        return pa.table(
            {
                group_col: t.column(group_col).take(pa.array(starts)),
                "centroid": cent_arr,
                "n_vectors": pa.array(n, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    folded = (
        _hash_shuffle(partials)
        .repartition(num_blocks=_group_partitions(8), keys=[group_col])
        .map_batches(fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    # hash-shuffled stages can emit zero-row schema-less blocks that break
    # downstream concat/union; the folded output is tiny (one row per
    # group), so stripping them via materialization is free
    from ..util import drop_empty_blocks

    return drop_empty_blocks(folded)


def append_ivf_index(ds, index_dir: str) -> dict:
    """Append new vectors to an EXISTING physical IVF index (the daily
    embedding increment): rows route with the STORED centroids — routing
    stays stable, no retraining, old lists untouched — and each batch
    writes one new file per touched list dir. File names derive from the
    batch's id content (crc), so a retried task overwrites identical
    bytes: idempotent under Ray task retry, crash-safe by construction
    (a partial append leaves whole files that a re-run overwrites).

    Mirrors incremental_dedup's bucket-partitioned append-only updates;
    ivf_search_index needs no changes (it globs every file in each
    probed list dir). Returns {'rows': n, 'lists_touched': m}."""
    import json
    import os

    import pyarrow.parquet as pq

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    emb_col, id_col = meta["emb_col"], meta["id_col"]
    cent_ref = ray.put(cent)
    lists_root = os.path.join(index_dir, "lists")

    def spill(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"list_id": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        C = ray.get(cent_ref)
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        lists = (embs @ C.T).argmax(axis=1).astype(np.int64)
        batch = batch.append_column("list_id", pa.array(lists))
        order = np.argsort(lists, kind="stable")
        batch = batch.take(pa.array(order))
        lists = lists[order]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # full md5 of the id payload + id range: these files are DURABLE
        # (unlike the transient cdc spill) — a 32-bit crc birthday
        # collision between two batches would silently overwrite data
        import hashlib

        tag = (
            f"{hashlib.md5(ids.tobytes()).hexdigest()}-"
            f"{int(ids.min())}-{int(ids.max())}-{batch.num_rows}"
        )
        bounds = np.flatnonzero(np.diff(lists)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(lists)]))
        out_l, out_n = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            c = int(lists[s])
            d = os.path.join(lists_root, f"ivf_list={c}")
            os.makedirs(d, exist_ok=True)
            fpath = os.path.join(d, f"append-{tag}.parquet")
            tmp = fpath + f".tmp-{os.getpid()}"
            pq.write_table(batch.slice(s, e - s), tmp)
            os.replace(tmp, fpath)
            out_l.append(c)
            out_n.append(e - s)
        return pa.table({"list_id": pa.array(out_l, pa.int64()),
                         "rows": pa.array(out_n, pa.int64())})

    acct = ds.map_batches(spill, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return {
        "rows": int(sum(r["rows"] for r in acct)),
        "lists_touched": len({r["list_id"] for r in acct}),
    }
