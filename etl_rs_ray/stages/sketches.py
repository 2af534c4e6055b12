"""Mergeable sketches for unbounded-cardinality statistics at 100 TB.

Exact distinct counts / quantiles over an unbounded key domain need a
full shuffle of every distinct value. A MERGEABLE sketch replaces that
with the engine's cheapest shape — per-batch partial (a few KB) ->
gather -> merge — constant communication regardless of input size:

- ``HyperLogLog``: distinct count, 2^p registers, standard bias-corrected
  estimate (Flajolet et al.; the small-range linear-counting correction
  included). Registers merge by element-wise max.
- ``FixedHistogram``: quantiles over a known value range via a fixed
  bucket grid; merges by vector addition, quantile by cumulative search.
  Error is bounded by bucket width (range/#buckets) — the right tool
  when the value domain is known (scores, ratios, sizes); see t-digest
  for the unknown-range case.

Both run as one ``map_batches`` partial pass + a driver merge of
#blocks tiny states — no shuffle at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class HyperLogLog:
    """Fixed-seed HLL. ``add_hashed`` takes uint64 hashes (use
    sources.event_log.stable_hash64 for version-stable hashing)."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: "np.ndarray") -> None:
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the remaining 64-p bits, +1; the OR'd-in
        # low p ones bound the rank at 64-p+1 so v is never zero
        v = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        ranks = np.ones(len(h), dtype=np.uint8)
        done = np.zeros(len(h), dtype=bool)
        mask = np.uint64(1) << np.uint64(63)
        # log2-free leading-zero loop (float64 log2 is unsafe past 2^53):
        # each pass retires the rows whose current top bit is set
        for _ in range(64 - self.p):
            done |= (v & mask) != 0
            if done.all():
                break
            ranks[~done] += 1
            v = v << np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("mismatched precision")
        self.registers = np.maximum(self.registers, other.registers)
        return self

    # Standard small-m bias constants (Flajolet et al. Fig. 3): the
    # asymptotic 0.7213/(1+1.079/m) formula only holds for m >= 128;
    # m = 16/32/64 carry their own measured constants.
    _SMALL_M_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}

    def estimate(self) -> float:
        m = float(self.m)
        alpha = self._SMALL_M_ALPHA.get(self.m, 0.7213 / (1 + 1.079 / m))
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distinct-count estimate over a column: per-batch HLL partial ->
    tiny register blobs -> one driver merge. Communication is
    #blocks * 2^p bytes no matter how many rows."""
    from ..sources.event_log import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        col_arr = b.column(col)
        if col_arr.null_count:
            col_arr = pc.drop_null(col_arr)
        if len(col_arr):
            arr = col_arr.combine_chunks() if isinstance(col_arr, pa.ChunkedArray) else col_arr
            if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
                arr = pc.cast(arr, pa.string())
            h.add_hashed(stable_hash64(arr))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        merged.merge(HyperLogLog.from_bytes(r["sketch"], p))
    return merged.estimate()


class TDigest:
    """Mergeable t-digest (Dunning & Ertl) for quantiles over an UNKNOWN
    value range — complements FixedHistogram (which needs the range up
    front). Centroids are (mean, weight) pairs; compression keeps at most
    ~delta centroids with the scale function k(q) = delta/2 * (2q - 1)
    concentrating resolution at the tails. Merging = concatenate + re-
    compress; per-batch state is O(delta) floats."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add(self, values: "np.ndarray") -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.means) > 8 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        out_m, out_w = [], []
        cur_m, cur_w = m[0], w[0]
        acc = 0.0  # weight before the current centroid
        lim = self._k_limit
        for i in range(1, len(m)):
            q0 = acc / total
            q1 = (acc + cur_w + w[i]) / total
            if lim(q1) - lim(q0) <= 1.0:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def _k_limit(self, q: float) -> float:
        # k1 scale function: delta/(2*pi) * asin(2q-1)
        return self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_arrays(self) -> tuple[list, list]:
        self._compress()
        return self.means.tolist(), self.weights.tolist()

    @classmethod
    def from_arrays(cls, means, weights, delta: int = 100) -> "TDigest":
        t = cls(delta)
        t.means = np.asarray(means, dtype=np.float64)
        t.weights = np.asarray(weights, dtype=np.float64)
        return t


def tdigest_quantiles(ds, col: str, qs: list[float], delta: int = 100) -> list[float]:
    """Quantiles with no prior knowledge of the value range: per-batch
    t-digest partials (O(delta) floats each) -> driver merge."""

    def partial(b: pa.Table) -> pa.Table:
        t = TDigest(delta)
        t.add(b.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        m, w = t.to_arrays()
        return pa.table(
            {
                "means": pa.array([m], pa.list_(pa.float64())),
                "weights": pa.array([w], pa.list_(pa.float64())),
            }
        )

    merged = TDigest(delta)
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        merged.merge(TDigest.from_arrays(r["means"], r["weights"], delta))
    return [merged.quantile(q) for q in qs]


def exact_quantiles(ds, col: str, qs: list[float], buckets: int = 2048,
                    gather_max: int = 262_144) -> list[float]:
    """EXACT quantiles (numpy linear-interpolation semantics) without ever
    materializing the column on the driver: distributed rank selection by
    iterative histogram refinement.

    Pass 1 aggregates (count, min, max). Each refinement pass histograms
    only the current candidate interval (``buckets`` bins, one
    map_batches partial + driver merge of tiny count vectors) and narrows
    the interval to the bins containing the target ranks; the interval
    width shrinks x``buckets`` per pass, so a handful of passes reduce
    the candidate set below ``gather_max`` regardless of input size. The
    final pass gathers ONLY the candidate values (bounded by
    ``gather_max``), sorts them, and reads the two order statistics each
    quantile interpolates between. Driver memory is O(buckets + gather_max)
    at any scale; heavy duplicate values short-circuit via the interval's
    min==max. Matches ``np.quantile(sorted_col, q)`` bit-for-bit."""

    def stats_pass(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        n = len(v)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "mn": pa.array([float(v.min()) if n else np.inf]),
                "mx": pa.array([float(v.max()) if n else -np.inf]),
            }
        )

    parts = ds.map_batches(stats_pass, batch_format="pyarrow", zero_copy_batch=True).take_all()
    total = sum(int(r["n"]) for r in parts)
    if total == 0:
        return [float("nan")] * len(qs)
    lo = min(float(r["mn"]) for r in parts)
    hi = max(float(r["mx"]) for r in parts)
    if lo == hi:  # constant column: every order statistic is that value
        return [lo] * len(qs)
    # 0-indexed order statistics each quantile needs: floor and ceil of
    # (n-1)*q — numpy's default linear interpolation reads exactly these
    needed: set[int] = set()
    pos = {}
    for q in qs:
        p = (total - 1) * float(q)
        f, c = int(np.floor(p)), int(np.ceil(p))
        pos[q] = (p, f, c)
        needed.update((f, c))
    # Each needed rank gets its OWN candidate interval (intervals merge
    # when ranks land in the same histogram bin and SPLIT as refinement
    # separates them). Refining one interval spanning min..max rank would
    # keep ~(q_max - q_min) of all rows as candidates forever — e.g.
    # qs=[0.5, 0.9] pins ~40% of the table into the final gather. A
    # massive duplicate run resolves WITHOUT gathering: when an interval
    # collapses to lo == hi the value of every rank inside is known.
    intervals = [{"lo": lo, "hi": hi, "below": 0, "count": total,
                  "ranks": sorted(needed), "value": None, "pinned": False}]

    def _active(ivs):
        return [iv for iv in ivs
                if iv["value"] is None and iv["count"] > gather_max and not iv["pinned"]]

    for _ in range(64):
        active = _active(intervals)
        if not active:
            break
        spans = [(iv["lo"], iv["hi"]) for iv in active]
        nb = buckets

        def hist_pass(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            out = np.empty(len(spans) * nb, dtype=np.int64)
            for si, (slo, shi) in enumerate(spans):
                w = v[(v >= slo) & (v <= shi)]
                idx = np.clip(
                    np.floor((w - slo) / (shi - slo) * nb).astype(np.int64), 0, nb - 1
                )
                out[si * nb:(si + 1) * nb] = np.bincount(idx, minlength=nb)
            return pa.table({"counts": pa.array([out.tolist()], pa.list_(pa.int64()))})

        merged = np.zeros(len(spans) * nb, dtype=np.int64)
        for r in ds.map_batches(hist_pass, batch_format="pyarrow",
                                zero_copy_batch=True).take_all():
            merged += np.array(r["counts"], dtype=np.int64)

        done = [iv for iv in intervals if iv not in active]
        for si, iv in enumerate(active):
            counts = merged[si * nb:(si + 1) * nb]
            cum = np.cumsum(counts)
            span_lo, span_hi = iv["lo"], iv["hi"]
            width = (span_hi - span_lo) / nb
            # group this interval's ranks by the bin that contains them
            by_bin: dict[int, list[int]] = {}
            for rk in iv["ranks"]:
                b0 = int(np.searchsorted(cum, rk - iv["below"] + 1, side="left"))
                by_bin.setdefault(min(b0, nb - 1), []).append(rk)
            for b0, rks in sorted(by_bin.items()):
                new_lo = span_lo + b0 * width
                new_hi = span_hi if b0 >= nb - 1 else span_lo + (b0 + 1) * width
                sub = {
                    "lo": new_lo,
                    "hi": new_hi,
                    "below": iv["below"] + (int(cum[b0 - 1]) if b0 > 0 else 0),
                    "count": int(counts[b0]),
                    "ranks": rks,
                    "value": None,
                    "pinned": False,
                }
                if new_lo == new_hi or width == 0.0 or not new_hi > new_lo:
                    # collapsed to a point (duplicate run): value known, no
                    # gather — this is the heavy-duplicate short-circuit
                    sub["value"] = new_lo
                elif (new_lo, new_hi, sub["count"]) == (span_lo, span_hi, iv["count"]) and len(by_bin) == 1:
                    sub["pinned"] = True  # cannot shrink further; gather as-is
                done.append(sub)
        intervals = done

    # gather candidates for every unresolved interval in ONE pass
    unresolved = [iv for iv in intervals if iv["value"] is None]
    value_of_rank: dict[int, float] = {}
    for iv in intervals:
        if iv["value"] is not None:
            for rk in iv["ranks"]:
                value_of_rank[rk] = iv["value"]
    if unresolved:
        # expand each gather interval by one bin width: histogram floor()
        # binning and the gather comparison can disagree by an ulp at bin
        # edges; the expansion makes that harmless
        bounds = [
            (iv["lo"] - (iv["hi"] - iv["lo"]) / buckets,
             iv["hi"] + (iv["hi"] - iv["lo"]) / buckets)
            for iv in unresolved
        ]

        def gather_pass(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            vals_cols, below_cols = [], []
            for g_lo, g_hi in bounds:
                vals_cols.append(v[(v >= g_lo) & (v <= g_hi)].tolist())
                below_cols.append(int((v < g_lo).sum()))
            return pa.table(
                {
                    "vals": pa.array([vals_cols], pa.list_(pa.list_(pa.float64()))),
                    "n_below": pa.array([below_cols], pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(gather_pass, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        for gi, iv in enumerate(unresolved):
            vals = np.sort(np.concatenate(
                [np.asarray(r["vals"][gi], dtype=np.float64) for r in rows]
            )) if rows else np.array([])
            below_final = sum(int(r["n_below"][gi]) for r in rows)
            for rk in iv["ranks"]:
                value_of_rank[rk] = float(
                    vals[min(max(rk - below_final, 0), len(vals) - 1)]
                )

    out = []
    for q in qs:
        p, f, c = pos[q]
        vf = value_of_rank[f]
        vc = value_of_rank[c]
        out.append(float(vf + (p - f) * (vc - vf)))
    return out


class FixedHistogram:
    def __init__(self, lo: float, hi: float, buckets: int = 1024):
        if not hi > lo:
            raise ValueError("hi must exceed lo")
        self.lo, self.hi, self.n = float(lo), float(hi), int(buckets)
        self.counts = np.zeros(buckets + 2, dtype=np.int64)  # under/overflow ends

    def add(self, values: "np.ndarray") -> None:
        v = values[~np.isnan(values)]
        idx = np.floor((v - self.lo) / (self.hi - self.lo) * self.n).astype(np.int64)
        idx = np.clip(idx + 1, 0, self.n + 1)
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        self.counts += other.counts
        return self

    def quantile(self, q: float) -> float:
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        target = q * total
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, target, side="left"))
        if i == 0:
            return self.lo
        if i >= self.n + 1:
            return self.hi
        width = (self.hi - self.lo) / self.n
        return self.lo + (i - 1) * width + width / 2  # bucket midpoint

    def to_array(self) -> "np.ndarray":
        return self.counts


def approx_quantiles(ds, col: str, qs: list[float], lo: float, hi: float,
                     buckets: int = 1024) -> list[float]:
    """Quantile estimates via mergeable fixed histograms: error bounded
    by (hi-lo)/buckets. One map_batches pass + driver merge."""

    def partial(b: pa.Table) -> pa.Table:
        h = FixedHistogram(lo, hi, buckets)
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        h.add(v)
        return pa.table({"counts": pa.array([h.to_array().tolist()], pa.list_(pa.int64()))})

    merged = FixedHistogram(lo, hi, buckets)
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        merged.counts += np.array(r["counts"], dtype=np.int64)
    return [merged.quantile(q) for q in qs]


class CountMinSketch:
    """Count-min frequency sketch (Cormode & Muthukrishnan '05): d
    hash rows x w counters. Point estimate = min over rows — NEVER an
    underestimate, and over by at most (e/w)*N with probability
    1 - (1/e)^d. Rows merge by element-wise addition, so per-batch
    partials fold exactly like the other sketches: one map_batches pass,
    #blocks * d*w*8 bytes to the driver, no shuffle at any scale."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.w, self.d = int(width), int(depth)
        self.counts = np.zeros((self.d, self.w), dtype=np.int64)

    def add_hashed(self, hashes: "np.ndarray", weights: "np.ndarray | None" = None) -> None:
        from ..sources.event_log import _splitmix64

        h = hashes.astype(np.uint64, copy=True)
        wts = weights if weights is not None else 1
        for row in range(self.d):
            # independent row hash: one extra splitmix round per row
            h = _splitmix64(h + np.uint64(row + 1))
            idx = (h % np.uint64(self.w)).astype(np.int64)
            np.add.at(self.counts[row], idx, wts)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self

    def estimate(self, hashes: "np.ndarray") -> "np.ndarray":
        from ..sources.event_log import _splitmix64

        h = hashes.astype(np.uint64, copy=True)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for row in range(self.d):
            h = _splitmix64(h + np.uint64(row + 1))
            idx = (h % np.uint64(self.w)).astype(np.int64)
            est = np.minimum(est, self.counts[row][idx])
        return est

    def total(self) -> int:
        return int(self.counts[0].sum())

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, width: int = 2048, depth: int = 4) -> "CountMinSketch":
        s = cls(width, depth)
        s.counts = np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy()
        return s


def _string_hashes(col_arr) -> "np.ndarray":
    from ..sources.event_log import stable_hash64

    arr = col_arr.combine_chunks() if isinstance(col_arr, pa.ChunkedArray) else col_arr
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return stable_hash64(arr)


def cms_frequencies(ds, col: str, width: int = 2048, depth: int = 4) -> CountMinSketch:
    """Build one merged count-min sketch over a column: per-batch
    partials -> driver merge. Query the result with
    ``sketch.estimate(stable_hash64(keys))``."""

    def partial(b: pa.Table) -> pa.Table:
        s = CountMinSketch(width, depth)
        col_arr = b.column(col)
        if col_arr.null_count:
            col_arr = pc.drop_null(col_arr)
        if len(col_arr):
            s.add_hashed(_string_hashes(col_arr))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = CountMinSketch(width, depth)
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        merged.merge(CountMinSketch.from_bytes(r["sketch"], width, depth))
    return merged


def grouped_approx_distinct(ds, group_col: str, col: str, p: int = 12) -> dict:
    """Distinct count per group via one HLL per (batch, group) — the
    mergeable-sketch answer to ``COUNT(DISTINCT x) GROUP BY g`` when the
    x-domain is unbounded but the group domain is small (event types,
    languages, shards): communication is #blocks * |groups| * 2^p bytes,
    no shuffle of the x values ever. For a LARGE group domain route the
    sketch rows through one keyed shuffle instead (the per-group blobs
    are already tiny)."""
    from ..sources.event_log import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, col])
        if t.column(col).null_count:
            t = t.filter(pc.is_valid(t.column(col)))
        groups, sketches = [], []
        # vectorized per group: sort by group, slice runs
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending")])
        t = t.take(idx)
        garr = t.column(group_col)
        import numpy as np_

        keys = garr.to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({group_col: pa.array([], garr.type),
                             "sketch": pa.array([], pa.binary())})
        bounds = np_.flatnonzero(np_.concatenate(([True], keys[1:] != keys[:-1])))
        ends = np_.concatenate((bounds[1:], [len(keys)]))
        arr = t.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
            arr = pc.cast(arr, pa.string())
        hashes = stable_hash64(arr)
        for s_i, e_i in zip(bounds.tolist(), ends.tolist()):
            h = HyperLogLog(p)
            h.add_hashed(hashes[s_i:e_i])
            groups.append(keys[s_i])
            sketches.append(h.to_bytes())
        return pa.table({group_col: pa.array(groups, garr.type),
                         "sketch": pa.array(sketches, pa.binary())})

    merged: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        g = r[group_col]
        h = HyperLogLog.from_bytes(r["sketch"], p)
        if g in merged:
            merged[g].merge(h)
        else:
            merged[g] = h
    return {g: h.estimate() for g, h in merged.items()}
