"""Document deduplication family for training-data pipelines.

Beyond the reference's key/cluster dedup (SURVEY.md §2.3), these are the
operators a 100 TB text corpus needs. All follow the same Ray shape:

    map_batches(vectorized fingerprint)          # embarrassingly parallel
      -> groupby(bucket) shuffle                 # co-locate candidates
      -> per-bucket candidate pairs / winners
      -> broadcast removal set -> filter         # tiny side, no 2nd shuffle

Scale notes: candidate *edges* are collected to the driver for the
union-find (they are O(duplicates), orders of magnitude smaller than the
corpus); a fully distributed connected-components pass would replace the
driver fold on multi-TB duplicate graphs. Buckets are the partitioning
assumption: only documents sharing a bucket (an LSH band, a simhash band,
an exact hash) are ever compared — never all pairs.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _group_partitions(default: int = 32) -> int:
    # one aggregator actor per partition: stay at or below the CPU budget
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(default, cpus))


# --- exact dedup -------------------------------------------------------------


def md5_hex(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None else hashlib.md5(v.encode()).hexdigest() for v in arr.to_pylist()],
        pa.string(),
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact content dedup: keep the lowest-id row per content hash.

    Per-batch combiner first (drop within-batch dups), then one hash
    shuffle on the content hash, then first-per-group — the same
    partial-aggregate-then-shuffle shape as the CDC merge.
    """

    def add_hash_and_precompact(batch: pa.Table) -> pa.Table:
        h = md5_hex(batch.column(text_col))
        batch = batch.append_column("_h", h)
        idx = pc.sort_indices(batch, sort_keys=[("_h", "ascending"), (id_col, "ascending")])
        batch = batch.take(idx)
        from ..stages.merge_apply import _first_per_key_mask

        return batch.filter(_first_per_key_mask(batch, ("_h",)))

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_h", "ascending"), (id_col, "ascending")])
        g = group.take(idx)
        from ..stages.merge_apply import _first_per_key_mask

        return g.filter(_first_per_key_mask(g, ("_h",))).drop_columns(["_h"])

    ds = ds.map_batches(add_hash_and_precompact, batch_format="pyarrow", zero_copy_batch=True)
    ds = _hash_shuffle(ds)
    # keep_first is segment-safe (sorts + first-per-key over the whole
    # block): hash-repartition + ONE call per partition, not one python
    # call per digest group
    return ds.repartition(num_blocks=_group_partitions(), keys=["_h"]).map_batches(
        keep_first, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


# --- shingles / token helpers ------------------------------------------------

_TOKEN_RE = re.compile(r"\S+")


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-char shingle hashes — vectorized polynomial rolling hash
    (sliding_window_view), stable across processes."""
    from .text_stats import _kgram_hashes

    return np.unique(_kgram_hashes(text, k))


def word_ngrams(text: str, n: int = 3) -> set:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# --- batch-vectorized signature helpers --------------------------------------


def _minhash_segments(
    flat: np.ndarray, starts: np.ndarray, a: np.ndarray, b: np.ndarray, modulus
) -> np.ndarray:
    """Minhash signatures for MANY docs at once: ``flat`` concatenates all
    docs' shingle hashes, ``starts`` marks each doc's first index. One
    (num_perm x chunk) vectorized pass + ``np.minimum.reduceat`` per doc —
    no per-doc Python. Chunked so the temp matrix stays ~25 MB."""
    num_perm, n = len(a), len(flat)
    ndocs = len(starts)
    out = np.empty((ndocs, num_perm), dtype=flat.dtype)
    chunk = max(1, 50_000 // 1)  # shingle positions per chunk
    # chunk boundaries must align to doc starts so reduceat segments stay whole
    doc_of = np.arange(ndocs)
    lo = 0
    with np.errstate(over="ignore"):
        while lo < ndocs:
            hi = lo + 1
            while hi < ndocs and (starts[hi] - starts[lo]) < chunk:
                hi += 1
            s, e = starts[lo], starts[hi] if hi < ndocs else n
            seg = flat[s:e]
            terms = a[:, None] * seg[None, :] + b[:, None]  # (perm, seg) < 2^62
            if modulus == MINHASH_P31:
                # Mersenne 2^61-1: shift-add reduction instead of integer
                # division — x mod M = (x & M) + (x >> 61), one conditional
                # subtract (~3x faster than %, same exact values). Constants
                # in the array's own dtype: mixing uint64 with python ints
                # promotes to float64 and breaks.
                m_t = terms.dtype.type(MINHASH_P31)
                terms = (terms & m_t) + (terms >> terms.dtype.type(61))
                terms[terms >= m_t] -= m_t
            else:
                terms %= modulus
            out[lo:hi] = np.minimum.reduceat(terms, starts[lo:hi] - s, axis=1).T
            lo = hi
    return out


def _flatten_hash_lists(hash_lists: list[np.ndarray]):
    """(flat, starts) for a list of per-doc hash arrays, dropping empties.
    Returns (flat, starts, keep_idx)."""
    keep = [i for i, h in enumerate(hash_lists) if len(h)]
    if not keep:
        return None, None, []
    arrs = [hash_lists[i] for i in keep]
    lens = np.array([len(x) for x in arrs])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.concatenate(arrs), starts.astype(np.int64), keep


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minimums of (a*x + b) mod 2^61-1 — one matmul-shaped op."""
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    prod = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


# Per-worker-process hash memo (module global == once per worker, like the
# reference's lazy_static lookup maps): natural-language token/shingle
# frequencies are Zipfian, so memoization collapses most hash calls.
_HASH_MEMO: dict[str, dict] = {}


def _memo_hashes(strings: list[str], kind: str, hasher) -> np.ndarray:
    memo = _HASH_MEMO.setdefault(kind, {})
    out = np.empty(len(strings), dtype=np.uint64)
    get = memo.get
    for i, s in enumerate(strings):
        h = get(s)
        if h is None:
            if len(memo) > 2_000_000:  # bound worker memory
                memo.clear()
            h = hasher(s)
            memo[s] = h
        out[i] = h
    return out


def make_minhash_bands(text_col: str, id_col: str, num_perm: int, bands: int, shingle_k: int):
    """map_batches fn: one (band, band_hash, id) row per doc per band.
    Signatures for the whole batch come from ONE vectorized pass
    (_minhash_segments), not a per-doc loop."""
    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        live = [(i, t) for i, t in enumerate(texts) if t is not None]
        hlists = [char_shingles(t, shingle_k) for _, t in live]
        flat, starts, keep = _flatten_hash_lists(hlists)
        sigs = np.zeros((len(live), num_perm), dtype=np.uint64)  # empty docs: sig 0
        if flat is not None:
            sigs[keep] = _minhash_segments(flat, starts, a, b, _MERSENNE)
        out_band, out_hash, out_id = [], [], []
        for row, (i, _t) in enumerate(live):
            sig = sigs[row]
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                out_band.append(bi)
                out_hash.append(zlib.crc32(chunk.tobytes()))
                out_id.append(ids[i])
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                id_col: pa.array(out_id),
            }
        )

    return fn


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            # deterministic: smaller root wins
            lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            self.parent[hi] = lo


def _bucket_edges_table(batch: pa.Table, keys, id_col: str, max_bucket: int) -> pa.Table:
    """Single-task vectorized star-edge extraction over ALL buckets: edge
    (bucket-min id -> member) for every bucket of size 2..max_bucket."""
    if batch.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    idx = pc.sort_indices(
        batch, sort_keys=[(k, "ascending") for k in keys] + [(id_col, "ascending")]
    )
    t = batch.take(idx)
    from ..stages.merge_apply import _first_per_key_mask

    first = _first_per_key_mask(t, tuple(keys)).to_numpy(zero_copy_only=False)
    gidx = np.cumsum(first) - 1
    sizes = np.bincount(gidx)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    bucket_min = ids[first][gidx]
    pick = (~first) & (sizes[gidx] >= 2) & (sizes[gidx] <= max_bucket)
    return pa.table(
        {"a": pa.array(bucket_min[pick], pa.int64()), "b": pa.array(ids[pick], pa.int64())}
    )


def _gather(bands_ds, fn):
    """Run ``fn`` once over the whole (small) bands table in one task —
    avoids the hash-shuffle aggregator spin-up that dominates wall time
    when the input is far below a block. The groupby path is the scale
    path; callers choose via ``small_input``."""
    return bands_ds.repartition(1).map_batches(fn, batch_format="pyarrow", batch_size=None)


def _edges_ds_from_buckets(
    bands_ds, id_col: str, max_bucket: int = 1000, small_input: bool = False,
    keys: tuple = ("band", "band_hash"),
):
    """Per bucket (keyed by ``keys``): chain the members into candidate
    edges, as a DATASET (nothing collected — the scale path)."""
    if small_input:
        return _gather(
            bands_ds, lambda b: _bucket_edges_table(b, keys, id_col, max_bucket)
        )

    # the small-path kernel is already vectorized over ALL buckets in a
    # block, so the scale path is just hash-repartition + one call per
    # partition (was: one python call + to_pylist per bucket)
    bands_ds = _hash_shuffle(bands_ds)
    return bands_ds.repartition(
        num_blocks=_group_partitions(), keys=list(keys)
    ).map_batches(
        lambda b: _bucket_edges_table(b, keys, id_col, max_bucket),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def _edges_from_buckets(bands_ds, id_col: str, max_bucket: int = 1000) -> list[tuple]:
    """Driver-side candidate edges (small graphs: edges are O(duplicates))."""
    return [(r["a"], r["b"]) for r in _edges_ds_from_buckets(bands_ds, id_col, max_bucket).take_all()]


def _removal_set(edges: list[tuple]) -> set:
    uf = _UnionFind()
    for x, y in edges:
        uf.union(x, y)
    remove = set()
    for x in list(uf.parent):
        root = uf.find(x)
        if root != x:
            remove.add(x)
    return remove


def _filter_removed(ds, id_col: str, remove: set):
    """Broadcast the (tiny) removal set; vectorized is_in filter."""
    import ray

    ref = ray.put(pa.array(sorted(remove)))

    def flt(batch: pa.Table) -> pa.Table:
        removal = ray.get(ref)
        return batch.filter(pc.invert(pc.is_in(batch.column(id_col), value_set=removal)))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    distributed_cc: bool = False,
    small_input: bool = False,
):
    """Near-dup removal: word-trigram shingle -> minhash (perms31, the
    same signature pipeline as the pairwise variant and its SQL oracle)
    -> banded LSH buckets -> connected components -> keep the smallest id
    per cluster.

    ``distributed_cc=True`` is the scale path: candidate edges stay a
    Dataset end-to-end — Ray-native min-label propagation (stages/cc.py)
    computes the removal set as a Dataset and the survivors come from a
    hash-partitioned ANTI JOIN, so neither the duplicate graph nor the
    removal set ever lands on the driver."""
    bands_ds = ds.map_batches(
        make_minhash_bands_pairwise(text_col, id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if distributed_cc:
        from .cc import removal_ds

        edges_ds = _edges_ds_from_buckets(
            bands_ds, id_col, small_input=small_input, keys=("band", "sig")
        )
        removal = removal_ds(edges_ds, num_partitions=_group_partitions(8))
        return ds.join(
            removal,
            join_type="left_anti",
            num_partitions=_group_partitions(8),
            on=(id_col,),
            right_on=("node",),
        )
    remove = _removal_set(
        [
            (r["a"], r["b"])
            for r in _edges_ds_from_buckets(
                bands_ds, id_col, small_input=small_input, keys=("band", "sig")
            ).take_all()
        ]
    )
    return _filter_removed(ds, id_col, remove) if remove else ds


# --- SimHash -----------------------------------------------------------------


def _crc_token_hash(tok: str) -> int:
    return zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode() + b"#") << 32)


def simhash64(text: str) -> int:
    """64-bit token-weight simhash (crc32 token hashes spread to 64 bits).
    Scalar reference; the batch path is :func:`simhash_batch`."""
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in _TOKEN_RE.findall(text.lower()):
        h = np.uint64(_crc_token_hash(tok))
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits == 1, 1, -1)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


def simhash_batch(texts: list[str | None], kind: str, hasher) -> list[tuple[int, bool] | None]:
    """Whole-batch simhash: memoized token hashes, ONE bit-spread matrix +
    per-doc segment sum (reduceat) — no per-token Python in the hot path.
    Returns, aligned with ``texts``: None for null text, else
    (signature, has_tokens)."""
    tok_lists = [None if t is None else _TOKEN_RE.findall(t.lower()) for t in texts]
    live = [(i, tl) for i, tl in enumerate(tok_lists) if tl is not None]
    nonempty = [(i, tl) for i, tl in live if tl]
    out: list[tuple[int, bool] | None] = [None] * len(texts)
    for i, tl in live:
        out[i] = (0, bool(tl))  # token-less docs: sig 0
    if nonempty:
        flat_tokens = [t for _, tl in nonempty for t in tl]
        lens = np.array([len(tl) for _, tl in nonempty])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        th = _memo_hashes(flat_tokens, kind, hasher)
        shifts = np.arange(64, dtype=np.uint64)
        # (ntok, 64) ±1 contributions; int16 is safe for docs < 16k tokens
        pm = (((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int16) * 2 - 1)
        v = np.add.reduceat(pm.astype(np.int32), starts, axis=0)  # (ndocs, 64)
        weights = np.uint64(1) << shifts
        sigs = ((v > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        for row, (i, _tl) in enumerate(nonempty):
            out[i] = (int(sigs[row]), True)
    return out


_POP16 = None  # 64 KiB popcount LUT, built on first use (import stays cheap)


def _hamming_edges(ids, sigs, max_hamming: int):
    """All id-ordered pairs (a, b), a < b, with popcount(sig_a ^ sig_b)
    <= max_hamming. One XOR outer product + 16-bit popcount LUT — no
    per-pair Python for buckets big enough to matter; tiny buckets (the
    common case: 2-3 near-dups) keep the scalar loop, which is faster
    than numpy setup at that size."""
    n = len(ids)
    if n < 2:
        return [], []
    if n < 16:
        rows = sorted(zip(ids, sigs))
        ea, eb = [], []
        for i in range(n):
            for j in range(i + 1, n):
                if bin(rows[i][1] ^ rows[j][1]).count("1") <= max_hamming:
                    ea.append(rows[i][0])
                    eb.append(rows[j][0])
        return ea, eb
    order = np.argsort(np.asarray(ids), kind="stable")
    ids_s = np.asarray(ids)[order]
    pop = _popcount_matrix(np.asarray(sigs, dtype=np.uint64)[order])
    iu, ju = np.triu_indices(n, k=1)
    keep = pop[iu, ju] <= max_hamming
    return ids_s[iu[keep]].tolist(), ids_s[ju[keep]].tolist()


def _popcount_matrix(s: "np.ndarray") -> "np.ndarray":
    """(n, n) pairwise hamming distances of a uint64 signature vector:
    XOR outer product + 16-bit popcount LUT, four chunk passes."""
    global _POP16
    if _POP16 is None:
        _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)
    x = s[:, None] ^ s[None, :]
    pop = np.zeros(x.shape, dtype=np.int16)
    for k in (0, 16, 32, 48):
        pop += _POP16[((x >> np.uint64(k)) & np.uint64(0xFFFF)).astype(np.int64)]
    return pop


def _hamming_losers(ids, sigs, max_hamming: int):
    """Ids that have ANY smaller-id neighbor within ``max_hamming`` in
    this bucket (the pairwise-losers rule), id order. Vectorized via the
    same popcount matrix as ``_hamming_edges``; tiny buckets scalar."""
    n = len(ids)
    if n < 2:
        return []
    if n < 16:
        rows = sorted(zip(ids, sigs))
        out = []
        for i in range(1, n):
            for j in range(i):
                if bin(rows[i][1] ^ rows[j][1]).count("1") <= max_hamming:
                    out.append(rows[i][0])
                    break
        return out
    order = np.argsort(np.asarray(ids), kind="stable")
    ids_s = np.asarray(ids)[order]
    pop = _popcount_matrix(np.asarray(sigs, dtype=np.uint64)[order])
    close = pop <= max_hamming
    loser = np.tril(close, k=-1).any(axis=1)
    return ids_s[loser].tolist()


def simhash_dedup(
    ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    small_input: bool = False,
):
    """SimHash near-dup: 4x16-bit bands (two same-band docs within
    hamming<=3 must share at least one exact band)."""

    def add_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        # md5 token hashes — the same signature pipeline as the pairwise
        # variant and its SQL oracle (md5_number_lower); token-less docs
        # get no bands and survive (SQL parity)
        sigs = simhash_batch(texts, "md5u64", md5_u64)
        ob, oh, oid, osig = [], [], [], []
        for did, s in zip(ids, sigs):
            if s is None or not s[1]:
                continue
            sig = s[0]
            for bi in range(4):
                ob.append(bi)
                oh.append((sig >> (16 * bi)) & 0xFFFF)
                oid.append(did)
                osig.append(sig)
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "band_hash": pa.array(oh, pa.int64()),
                id_col: pa.array(oid),
                "_sig": pa.array(osig, pa.uint64()),
            }
        )

    def bucket_edges(group: pa.Table) -> pa.Table:
        ea, eb = _hamming_edges(
            group.column(id_col).to_pylist(), group.column("_sig").to_pylist(), max_hamming
        )
        return pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})

    bands_ds = ds.map_batches(add_bands, batch_format="pyarrow", zero_copy_batch=True)
    if small_input:
        def all_buckets(batch: pa.Table) -> pa.Table:
            # one gathered task: sort into buckets, hamming-scan each
            idx = pc.sort_indices(
                batch,
                sort_keys=[("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")],
            )
            t = batch.take(idx)
            from ..stages.merge_apply import _first_per_key_mask

            first = _first_per_key_mask(t, ("band", "band_hash")).to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(first).tolist() + [t.num_rows]
            ids = t.column(id_col).to_pylist()
            sigs = t.column("_sig").to_pylist()
            ea, eb = [], []
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                ba, bb = _hamming_edges(ids[s0:s1], sigs[s0:s1], max_hamming)
                ea.extend(ba)
                eb.extend(bb)
            return pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})

        edges_ds = _gather(bands_ds, all_buckets)
    else:
        bands_ds = _hash_shuffle(bands_ds)
        edges_ds = bands_ds.groupby(
            ["band", "band_hash"], num_partitions=_group_partitions()
        ).map_groups(bucket_edges, batch_format="pyarrow")
    remove = _removal_set([(r["a"], r["b"]) for r in edges_ds.take_all()])
    return _filter_removed(ds, id_col, remove) if remove else ds


# --- n-gram Jaccard verify ---------------------------------------------------


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 8,
):
    """MinHash-LSH candidates (the same perms31/word-trigram signature
    pipeline as the pairwise variant, so the SQL oracle can recompute
    them) verified by TRUE word-n-gram Jaccard — removes only pairs >=
    threshold (no LSH false positives).

    The verify step is DISTRIBUTED: candidate edges stay a Dataset and the
    texts are hash-joined onto them (two keyed joins), so the per-pair
    Jaccard runs inside tasks — driver memory never holds a text. Only the
    verified edge list (true near-duplicate pairs, tiny by definition)
    reaches the driver for the union-find."""
    bands_ds = ds.map_batches(
        make_minhash_bands_pairwise(text_col, id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edges_ds = _edges_ds_from_buckets(bands_ds, id_col, keys=("band", "sig"))
    docs = ds.select_columns([id_col, text_col])
    nparts = _group_partitions(8)
    e1 = edges_ds.join(
        docs, join_type="inner", num_partitions=nparts, on=("a",), right_on=(id_col,),
        right_suffix="_l",
    )
    e2 = e1.join(
        docs, join_type="inner", num_partitions=nparts, on=("b",), right_on=(id_col,),
        right_suffix="_r",
    )
    tl, tr = text_col, f"{text_col}_r"

    def verify(batch: pa.Table) -> pa.Table:
        la = batch.column("a").to_pylist()
        lb = batch.column("b").to_pylist()
        xa = batch.column(tl).to_pylist()
        xb = batch.column(tr).to_pylist()
        ea, eb = [], []
        for a_, b_, x, y in zip(la, lb, xa, xb):
            if jaccard(word_ngrams(x or "", n), word_ngrams(y or "", n)) >= threshold:
                ea.append(a_)
                eb.append(b_)
        return pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})

    verified_ds = e2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
    verified = [(r["a"], r["b"]) for r in verified_ds.take_all()]
    remove = _removal_set(verified)
    return _filter_removed(ds, id_col, remove) if remove else ds


# --- SQL-mirrorable pairwise-dominated variants ------------------------------
#
# The CC-based operators above use repo-internal hashes (poly64/crc32) and a
# transitive union-find — fast, but not reproducible by a SQL engine, so the
# driver can only run a rows-only check on them. These variants trade both
# choices for full DuckDB-oracle checkability (CORRECTNESS hash match):
#
# - fingerprints built from md5 (DuckDB ``md5_number_lower`` == the upper 8
#   digest bytes little-endian, pinned by test),
# - 31-bit permutation constants so ``a*h + b`` stays inside int64 for both
#   numpy and SQL BIGINT arithmetic,
# - the removal rule is PAIRWISE-DOMINATED, not transitive: a doc is removed
#   iff some bucket it occupies contains a smaller doc_id (equivalently: it
#   has a direct smaller near-duplicate neighbor). No connected components,
#   so the whole operator is one bands shuffle + one broadcast filter — and
#   expressible as pure SQL. Chains (A~B, B~C, but A!~C) keep C's bucket-
#   mates only; the transitive variants above collapse the whole component.


def md5_u64(s: str) -> int:
    """Matches DuckDB 's ``md5_number_lower``: upper 8 md5 digest bytes,
    little-endian (pinned by tests/test_dedup_family.py)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


MINHASH_P31 = (1 << 61) - 1


def minhash_perms31(num_perm: int = 64, seed: int = 7):
    """Permutation constants bounded to 31/30 bits: a*h+b < 2^62 for 32-bit
    shingle hashes, exact in both numpy int64 and SQL BIGINT."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 30, num_perm, dtype=np.int64)
    b = rng.integers(0, 1 << 30, num_perm, dtype=np.int64)
    return a, b


def word_shingle_list(text: str, n: int = 3) -> list[str]:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def make_minhash_bands_pairwise(text_col: str, id_col: str, num_perm: int, bands: int):
    """map_batches fn: (band, sig, id) rows; sig is the '-'-joined band
    chunk of the minhash signature (string — SQL string_agg mirrors it)."""
    rows_per_band = num_perm // bands
    a, b = minhash_perms31(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        live_ids, hlists = [], []
        for doc_id, text in zip(ids, texts):
            if text is None:
                continue
            sh = word_shingle_list(text)
            if not sh:
                continue  # no shingles -> no bands -> survives
            live_ids.append(doc_id)
            hlists.append(_memo_hashes(sh, "md5u32", lambda s: md5_u64(s) & 0xFFFFFFFF).astype(np.int64))
        flat, starts, keep = _flatten_hash_lists(hlists)
        if flat is None:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "sig": pa.array([], pa.string()),
                    id_col: pa.array([]),
                }
            )
        sigs = _minhash_segments(flat, starts, a, b, MINHASH_P31)
        nlive = len(live_ids)
        # '-'-joined band strings entirely in Arrow kernels: the flattened
        # doc-major signature order puts each band's rows_per_band values
        # consecutively, so one int->string cast + a zero-copy ListArray
        # wrap + ONE binary_join produce every band string (the per-value
        # Python str()/join loop was ~20% of the whole UDF)
        flat_strs = pc.cast(pa.array(sigs.ravel()), pa.string())
        offsets = pa.array(
            np.arange(0, nlive * num_perm + 1, rows_per_band, dtype=np.int32)
        )
        out_sig = pc.binary_join(pa.ListArray.from_arrays(offsets, flat_strs), "-")
        out_band = np.tile(np.arange(bands, dtype=np.int32), nlive)
        out_id = np.repeat(np.asarray(live_ids), bands)
        return pa.table(
            {
                "band": pa.array(out_band),
                "sig": out_sig,
                id_col: pa.array(out_id),
            }
        )

    return fn


def _pairwise_removal(bands_ds, id_col: str, max_bucket: int = 1000, small_input: bool = False) -> set:
    """Removal set under the pairwise-dominated rule: every non-min member
    of every (band, sig) bucket (bucket size capped against mega-buckets)."""
    if small_input:
        losers_ds = _gather(
            bands_ds,
            lambda b: pa.table(
                {id_col: _bucket_edges_table(b, ("band", "sig"), id_col, max_bucket).column("b")}
            ),
        )
        return {r[id_col] for r in losers_ds.take_all()}

    bands_ds = _hash_shuffle(bands_ds)
    losers = bands_ds.repartition(
        num_blocks=_group_partitions(), keys=["band", "sig"]
    ).map_batches(
        lambda b: pa.table(
            {id_col: _bucket_edges_table(b, ("band", "sig"), id_col, max_bucket).column("b")}
        ),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    return {r[id_col] for r in losers.take_all()}


def minhash_dedup_pairwise(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    small_input: bool = False,
):
    """MinHash LSH dedup, pairwise-dominated removal (SQL-checkable).
    ``small_input=True`` gathers the (tiny) bands table into one task
    instead of spinning up hash-shuffle aggregators."""
    bands_ds = ds.map_batches(
        make_minhash_bands_pairwise(text_col, id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    remove = _pairwise_removal(bands_ds, id_col, small_input=small_input)
    return _filter_removed(ds, id_col, remove) if remove else ds


def simhash64_md5(text: str) -> int:
    """64-bit token simhash over md5 token hashes (duplicates counted) —
    vectorized bit spread, reproducible in SQL via md5_number_lower."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    th = np.array([md5_u64(t) for t in toks], dtype=np.uint64)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)  # (64,)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_dedup_pairwise(
    ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    small_input: bool = False,
):
    """SimHash near-dup, pairwise-dominated removal: a doc is dropped iff
    some smaller-id doc shares one of its 4 16-bit bands AND is within
    ``max_hamming`` of its full signature (SQL-checkable)."""

    def add_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        sigs = simhash_batch(texts, "md5u64", md5_u64)
        ob, oh, oid, osig = [], [], [], []
        for did, s in zip(ids, sigs):
            if s is None or not s[1]:
                continue  # null text / no tokens -> no bands -> survives (SQL parity)
            sig = s[0]
            for bi in range(4):
                ob.append(bi)
                oh.append((sig >> (16 * bi)) & 0xFFFF)
                oid.append(did)
                osig.append(sig)
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "band_hash": pa.array(oh, pa.int64()),
                id_col: pa.array(oid),
                "_sig": pa.array(osig, pa.uint64()),
            }
        )

    def all_buckets(batch: pa.Table) -> pa.Table:
        # sort into buckets, run the per-bucket hamming scan — handles
        # every bucket in the block (used by BOTH the one-task small path
        # and the hash-repartitioned scale path)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        idx = pc.sort_indices(
            batch,
            sort_keys=[("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")],
        )
        t = batch.take(idx)
        from ..stages.merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, ("band", "band_hash")).to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(first).tolist() + [t.num_rows]
        ids = t.column(id_col).to_pylist()
        sigs = t.column("_sig").to_pylist()
        out = []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            out.extend(_hamming_losers(ids[s0:s1], sigs[s0:s1], max_hamming))
        return pa.table({id_col: pa.array(out, pa.int64())})

    bands_ds = ds.map_batches(add_bands, batch_format="pyarrow", zero_copy_batch=True)
    if small_input:
        losers = _gather(bands_ds, all_buckets)
    else:
        bands_ds = _hash_shuffle(bands_ds)
        losers = bands_ds.repartition(
            num_blocks=_group_partitions(), keys=["band", "band_hash"]
        ).map_batches(
            all_buckets, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    remove = {r[id_col] for r in losers.take_all()}
    return _filter_removed(ds, id_col, remove) if remove else ds


# --- embedding cosine near-dup ----------------------------------------------


def hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """Deterministic random-hyperplane matrix (float32 values, so both the
    Ray path and a DOUBLE-arithmetic SQL oracle can inline the exact same
    weights)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, num_planes)).astype(np.float32)


def embedding_dedup_exact(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
):
    """EXACT cosine near-dup removal for small corpora: gather the
    embeddings into one task, full float64 cosine matrix, union-find over
    pairs >= threshold, keep each component's min id. O(n^2) by
    definition — this is the oracle-able small-input path; the
    hyperplane-LSH ``embedding_dedup`` is the scale path."""

    def removal(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        E = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
        if len(ids) < 2:
            return pa.table({"node": pa.array([], pa.int64())})
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        S = E @ E.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= threshold
        remove = _removal_set(list(zip(ids[iu[hit]].tolist(), ids[ju[hit]].tolist())))
        return pa.table({"node": pa.array(sorted(remove), pa.int64())})

    removed = {
        r["node"]
        for r in _gather(ds.select_columns([id_col, emb_col]), removal).take_all()
    }
    return _filter_removed(ds, id_col, removed) if removed else ds


def embedding_dedup(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 13,
):
    """Near-dup by cosine >= threshold. Random-hyperplane LSH buckets
    (sign pattern of num_planes projections) -> in-bucket pairwise cosine.
    Two near-identical vectors agree on most signs; we emit each doc into
    2 bucket families (full pattern + pattern with one rotated half) to
    cut misses."""

    planes: dict = {}

    def add_buckets(batch: pa.Table) -> pa.Table:
        # float64 projection over float32-valued planes: the stored plane
        # weights are float32 (exactly representable in double) so a SQL
        # oracle computing sum(e*w) in DOUBLE sees the same signs
        embs = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
        ids = batch.column(id_col).to_pylist()
        if embs.size == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "band_hash": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 emb_col: pa.array([], pa.list_(pa.float32()))}
            )
        dim = embs.shape[1]
        if dim not in planes:
            planes[dim] = hyperplanes(dim, num_planes, seed).astype(np.float64)
        P = planes[dim]
        signs = (embs @ P) > 0  # (n, planes)
        half = num_planes // 2
        weights_full = 1 << np.arange(num_planes, dtype=np.int64)
        h_full = (signs * weights_full).sum(axis=1)
        h_half = (signs[:, :half] * weights_full[:half]).sum(axis=1)
        n = len(ids)
        emb_f32 = embs.astype(np.float32).tolist()
        return pa.table(
            {
                "band": pa.array([0] * n + [1] * n, pa.int32()),
                "band_hash": pa.array(np.concatenate([h_full, h_half]), pa.int64()),
                id_col: pa.array(ids + ids),
                emb_col: pa.array(emb_f32 + emb_f32, pa.list_(pa.float32())),
            }
        )

    def all_bucket_edges(batch: pa.Table) -> pa.Table:
        # every bucket in the block: in-bucket cosine over each (band,
        # band_hash) segment (buckets are LSH-bounded, so the per-bucket
        # pair scan stays small)
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        idx = pc.sort_indices(
            batch,
            sort_keys=[("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")],
        )
        t = batch.take(idx)
        from ..stages.merge_apply import _first_per_key_mask

        first = _first_per_key_mask(t, ("band", "band_hash")).to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(first).tolist() + [t.num_rows]
        all_ids = t.column(id_col).to_pylist()
        all_embs = np.array(t.column(emb_col).to_pylist(), dtype=np.float64)
        ea, eb = [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            ids = all_ids[s0:s1]
            if len(ids) < 2:
                continue
            embs = all_embs[s0:s1]
            norms = np.linalg.norm(embs, axis=1)
            normed = embs / np.maximum(norms[:, None], 1e-12)
            sims = normed @ normed.T
            order = np.argsort(ids)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    i, j = order[ii], order[jj]
                    if sims[i, j] >= threshold:
                        ea.append(ids[i])
                        eb.append(ids[j])
        return pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})

    bands_ds = ds.map_batches(add_buckets, batch_format="pyarrow", zero_copy_batch=True)
    bands_ds = _hash_shuffle(bands_ds)
    edges_ds = bands_ds.repartition(
        num_blocks=_group_partitions(), keys=["band", "band_hash"]
    ).map_batches(
        all_bucket_edges, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    remove = _removal_set([(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in edges_ds.take_all()])
    return _filter_removed(ds, id_col, remove) if remove else ds


# --- cross-corpus decontamination --------------------------------------------


def decontaminate(
    corpus,
    reference,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    ref_id_col: str | None = None,
    num_perm: int = 64,
    bands: int = 8,
    small_input: bool = False,
    broadcast_reference: bool | None = None,
    broadcast_max_bands: int = 2_000_000,
):
    """Benchmark decontamination: remove from ``corpus`` every document
    that shares a minhash LSH band bucket with ANY ``reference`` document
    (the training-set hygiene step: strip near-duplicates of eval/bench
    data before training). Cross-corpus variant of minhash_dedup_pairwise
    — same perms31 word-trigram signature pipeline, so a SQL oracle
    recomputes the removed set exactly.

    Scale shapes, chosen by ``broadcast_reference`` (auto: broadcast when
    the reference's band set fits ``broadcast_max_bands``):

    - BROADCAST (the common case — benchmark sets are tiny next to the
      training corpus): the reference's distinct (band, sig) keys are
      collected once, ``ray.put`` once, and the corpus is banded, probed
      and FILTERED in a single map pass — zero shuffles, zero joins, the
      corpus streams through exactly once.
    - SHUFFLE (both sides large): both corpora band in one map pass each,
      a union + ONE hash-shuffle groupby on (band, sig) finds buckets
      containing a reference doc (per-bucket work is a filter, O(bucket),
      so a hot boilerplate bucket cannot go quadratic); survivors come
      from a hash-partitioned ANTI JOIN. ``small_input=True`` gathers the
      tiny bands table into one task instead.
    """
    ref_text_col = ref_text_col or text_col
    ref_id_col = ref_id_col or id_col

    if broadcast_reference is None:
        # bands-per-doc rows: count() is parquet metadata when available
        broadcast_reference = reference.count() * bands <= broadcast_max_bands
    if broadcast_reference:
        import ray as _ray

        ref_bands = reference.map_batches(
            make_minhash_bands_pairwise(ref_text_col, ref_id_col, num_perm, bands),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        keys = set()
        for b in ref_bands.iter_batches(batch_size=None, batch_format="pyarrow"):
            for band, sig in zip(b.column("band").to_pylist(), b.column("sig").to_pylist()):
                keys.add(f"{band}|{sig}")
        key_ref = _ray.put(pa.array(sorted(keys)))
        band_fn = make_minhash_bands_pairwise(text_col, id_col, num_perm, bands)

        def filter_contaminated(batch: pa.Table) -> pa.Table:
            ref_keys = _ray.get(key_ref)
            bd = band_fn(batch)
            key = pc.binary_join_element_wise(
                pc.cast(bd.column("band"), pa.string()), bd.column("sig"), "|"
            )
            hit_ids = pc.unique(
                bd.filter(pc.is_in(key, value_set=ref_keys)).column(id_col).combine_chunks()
            )
            return batch.filter(
                pc.invert(pc.is_in(batch.column(id_col), value_set=hit_ids))
            )

        return corpus.map_batches(
            filter_contaminated, batch_format="pyarrow", zero_copy_batch=True
        )

    corp_bands = corpus.map_batches(
        make_minhash_bands_pairwise(text_col, id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda b: b.append_column("side", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _ref_rename(b: pa.Table) -> pa.Table:
        if ref_id_col != id_col:
            b = b.rename_columns([id_col if c == ref_id_col else c for c in b.column_names])
        return b.append_column("side", pa.array(np.ones(b.num_rows, dtype=np.int8)))

    ref_bands = reference.map_batches(
        make_minhash_bands_pairwise(ref_text_col, ref_id_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(_ref_rename, batch_format="pyarrow", zero_copy_batch=True)

    all_bands = corp_bands.union(ref_bands)

    def all_buckets(batch: pa.Table) -> pa.Table:
        # every (band, sig) bucket containing a reference row contaminates
        # its corpus rows — exact composite-key is_in, so the kernel is
        # correct over a block holding MANY buckets (used by both the
        # one-task small path and the hash-repartitioned scale path)
        ref_keys = batch.filter(pc.equal(batch.column("side"), 1)).select(["band", "sig"])
        if ref_keys.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("band"), pa.string()), batch.column("sig"), "|"
        )
        ref_key = pc.binary_join_element_wise(
            pc.cast(ref_keys.column("band"), pa.string()), ref_keys.column("sig"), "|"
        )
        in_ref = pc.is_in(key, value_set=pc.unique(ref_key.combine_chunks()))
        hit = batch.filter(pc.and_(in_ref, pc.equal(batch.column("side"), 0)))
        return pa.table(
            {id_col: pc.unique(hit.column(id_col).combine_chunks()).cast(pa.int64())}
        )

    if small_input:
        remove = {r[id_col] for r in _gather(all_bands, all_buckets).take_all()}
        return _filter_removed(corpus, id_col, remove) if remove else corpus

    contaminated = (
        _hash_shuffle(all_bands)
        .repartition(num_blocks=_group_partitions(), keys=["band", "sig"])
        .map_batches(all_buckets, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return _hash_shuffle(corpus).join(
        contaminated,
        join_type="left_anti",
        num_partitions=_group_partitions(8),
        on=(id_col,),
        right_on=(id_col,),
    )
