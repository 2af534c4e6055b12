"""LSN-ordered change-event log over partitioned Parquet segments.

The Ray-native analogue of the reference's Kafka surface: the producer
writing one keyed message per row with a monotone offset
(src/kafka.rs:17-90), the consumer group with committed offsets
(src/kafka.rs:93-141), and the bounded offset-range replay
(examples/kafka_jdd_to_mongo.rs:18-66).  Offset ≙ ``lsn``; topic
partition ≙ ``part=<k>`` directory (k = hash64(repo, path) % P so a
key's history is colocated); the consumer's committed offset ≙ the lake
manifest's high-watermark LSN.

Layout::

    log_dir/part=<k>/seg-<lsn_min>-<lsn_max>.parquet

Bounded replay ``lsn ∈ (lsn_from, lsn_to]`` prunes at the read: segment
files outside the range are skipped by filename, and row-group stats +
a pyarrow dataset filter prune inside files.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),  # I | U | D  (crud_fns.rs:18,191,222)
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

KEY_COLS = ("repo", "path", "commit")
_SEG_RE = re.compile(r"seg-(\d+)-(\d+)\.parquet$")


# Identity of the persisted bucket partitioner. Bucket assignment is durable
# table layout: a key's stored row and its future events must land in the
# same bucket FOREVER, so the hash must be pinned to an algorithm this repo
# owns (library hashes — polars/pandas — do not guarantee cross-version
# stability). The id is recorded in every lake manifest; LakeTable refuses
# to open a table written with a different partitioner.
PARTITIONER_ID = "poly64-v1"

_POLY_B = np.uint64(1099511628211)  # FNV-64 prime as the polynomial base


@lru_cache(maxsize=None)
def _poly_pows(k: int) -> "np.ndarray":
    out = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wrap-around IS the modulus
        for i in range(k):
            out[i] = acc
            acc = acc * _POLY_B
    return out


def _splitmix64(h: "np.ndarray") -> "np.ndarray":
    h = h + np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


# Modular inverse of the base (B is odd, hence invertible mod 2^64): lets
# the padded-matrix path divide out trailing-zero padding exactly.
_POLY_B_INV = np.uint64(pow(int(_POLY_B), -1, 2**64))
# Above this byte length the O(rows x maxlen) padded matrix stops paying
# for itself (one pathological long row would inflate every row's work);
# such rows take the active-set Horner loop instead.
_PAD_MAXLEN = 128
_HASH_CHUNK = 1 << 16


@lru_cache(maxsize=None)
def _poly_inv_pows(k: int) -> "np.ndarray":
    out = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[i] = acc
            acc = acc * _POLY_B_INV
    return out


def _hash_padded(data: "np.ndarray", starts: "np.ndarray", lengths: "np.ndarray") -> "np.ndarray":
    """Fixed-width Horner over a zero-padded byte matrix. One gather builds
    an (rows x maxlen) matrix (bytes past a row's end belong to the NEXT
    row, so they are masked to 0), maxlen fully-vectorized mul-adds run
    Horner over contiguous columns, then the zero padding is divided out:
    padded_hash = true_hash * B^(maxlen-len), and B is odd so
    true_hash = padded_hash * B^-(maxlen-len) (mod 2^64) exactly."""
    n = len(starts)
    maxlen = int(lengths.max())
    positions = np.arange(maxlen)
    inv_pows = _poly_inv_pows(maxlen + 1)
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c0 in range(0, n, _HASH_CHUNK):
            c1 = min(n, c0 + _HASH_CHUNK)
            st, ln = starts[c0:c1], lengths[c0:c1]
            idx = st[:, None] + positions[None, :]
            np.clip(idx, 0, len(data) - 1, out=idx)
            m = np.where(positions[None, :] < ln[:, None], data[idx], 0)
            m = np.ascontiguousarray(m.T)  # column access -> contiguous rows
            h = np.zeros(c1 - c0, dtype=np.uint64)
            for j in range(maxlen):
                h = h * _POLY_B + m[j]
            out[c0:c1] = h * inv_pows[maxlen - ln]
    return out


def stable_hash64(arr: pa.Array | pa.ChunkedArray) -> "np.ndarray":
    """Version-stable vectorized string hash (the ``poly64-v1`` partitioner):
    polynomial rolling hash over the utf-8 bytes (base = FNV-64 prime,
    modulus 2^64) finalized with a splitmix64 mixer. Implemented with
    numpy segment ops — no per-row Python — and owned by this repo, so the
    mapping key->bucket can never drift under a library upgrade."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = np.diff(offs)
    start, stop = int(offs[0]), int(offs[-1])
    if stop == start:  # all rows empty
        return _splitmix64(np.zeros(n, dtype=np.uint64))
    starts = offs[:-1]
    h = np.zeros(n, dtype=np.uint64)
    short = lengths <= _PAD_MAXLEN
    if short.all():
        h = _hash_padded(data, starts, lengths)
    else:
        s_idx = np.flatnonzero(short)
        if len(s_idx):
            h[s_idx] = _hash_padded(data, starts[s_idx], lengths[s_idx])
        # long tail: active-set Horner, one byte position per iteration —
        # temporaries stay O(active rows) instead of O(total bytes)
        active = np.flatnonzero(~short)
        with np.errstate(over="ignore"):
            for i in range(int(lengths[active].max())):
                if len(active) == 0:
                    break
                keep = lengths[active] > i
                if not keep.all():
                    active = active[keep]
                h[active] = h[active] * _POLY_B + data[starts[active] + i]
    return _splitmix64(h + lengths.astype(np.uint64))


def fast_hash_bucket(repo: pa.Array, path: pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized key-hash partitioner (``poly64-v1``): value-pure (the
    hash of a value never depends on its neighbors), stable across
    processes AND library versions — all required for a durable shuffle
    key. (pandas.util.hash_array is NOT value-pure through its categorize
    path; polars' seeded hash is not guaranteed stable across versions.)"""
    joined = pc.binary_join_element_wise(repo, path, "\x00")
    h = stable_hash64(joined)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


@dataclass
class SegmentInfo:
    path: str
    partition: int
    lsn_min: int
    lsn_max: int


def list_segments(log_dir: str) -> list[SegmentInfo]:
    segs: list[SegmentInfo] = []
    for part in sorted(os.listdir(log_dir)):
        if not part.startswith("part="):
            continue
        k = int(part.split("=", 1)[1])
        pdir = os.path.join(log_dir, part)
        for fn in sorted(os.listdir(pdir)):
            m = _SEG_RE.search(fn)
            if m:
                segs.append(SegmentInfo(os.path.join(pdir, fn), k, int(m.group(1)), int(m.group(2))))
    return segs


PURGE_MARKER = "PURGED_BELOW"


class PurgedLogError(RuntimeError):
    """A replay window reaches below the log's purge cut — the events it
    needs were retention-deleted. Recover by cloning an existing table
    (the table IS the checkpoint once its HWM passes the cut)."""


def purge_cut(log_dir: str) -> int:
    """Highest purge cut recorded for this log (0 = never purged):
    every event with lsn < cut MAY have been deleted."""
    try:
        with open(os.path.join(log_dir, PURGE_MARKER)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def purge_log(log_dir: str, below_lsn: int, *, applied_hwm: int | None = None) -> dict:
    """Binlog retention (the Kafka log-retention / MySQL PURGE BINARY
    LOGS analogue): delete segments that lie WHOLLY below ``below_lsn``.
    Straddler segments stay intact, so every event with
    ``lsn >= effective cut`` remains replayable.

    ``applied_hwm`` (pass the consuming table's ``hwm_lsn()``) clamps
    the cut to ``hwm + 1`` so unapplied events can never be purged —
    in atomic-txn mode the HWM stops at the safe cut, so held-back
    open-transaction events are below-HWM-safe automatically.

    The cut is recorded in a ``PURGED_BELOW`` marker (monotonic max);
    ``replay`` refuses any window that reaches below it — a fresh
    bootstrap or overwrite replay of a purged log would otherwise
    silently rebuild PARTIAL state. Idempotent: re-running with the
    same cut deletes nothing and reports 0."""
    cut = below_lsn if applied_hwm is None else min(below_lsn, applied_hwm + 1)
    purged = freed = 0
    for s in list_segments(log_dir):
        if s.lsn_max < cut:
            freed += os.path.getsize(s.path)
            os.unlink(s.path)
            purged += 1
    if cut > purge_cut(log_dir):
        from ..state import fs as _sfs

        _sfs.write_text_atomic(os.path.join(log_dir, PURGE_MARKER), str(cut))
    return {
        "purged_segments": purged,
        "freed_bytes": freed,
        "cut": cut,
        "requested": below_lsn,
    }


def select_segments(log_dir: str, lsn_from: int | None, lsn_to: int | None) -> list[SegmentInfo]:
    """Segments intersecting the half-open replay window (lsn_from, lsn_to]."""
    segs = list_segments(log_dir)
    out = []
    for s in segs:
        if lsn_from is not None and s.lsn_max <= lsn_from:
            continue
        if lsn_to is not None and s.lsn_min > lsn_to:
            continue
        out.append(s)
    return out


def replay_filter(lsn_from: int | None, lsn_to: int | None):
    expr = None
    if lsn_from is not None:
        expr = pads.field("lsn") > lsn_from
    if lsn_to is not None:
        e2 = pads.field("lsn") <= lsn_to
        expr = e2 if expr is None else expr & e2
    return expr


def read_event_log(
    log_dir: str,
    lsn_from: int | None = None,
    lsn_to: int | None = None,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """Bounded replay as a streaming Ray Dataset (file + row-group pruning)."""
    import ray.data

    segs = select_segments(log_dir, lsn_from, lsn_to)
    if not segs:
        return ray.data.from_arrow(EVENT_SCHEMA.empty_table())
    # partitioning=None: don't infer a hive 'part' column from the dir
    # layout. EXCEPT when pruning columns: ray's parquet datasource hits an
    # UnboundLocalError combining partitioning=None with columns= (the
    # partition_columns branch never runs), so a pruned read keeps the
    # default hive inference — the requested columns never include 'part',
    # so the inferred partition column is projected away regardless.
    base_kwargs = {} if columns is not None else {"partitioning": None}
    if columns is not None:
        base_kwargs["columns"] = columns

    # Row filtering is only needed on segments that STRADDLE the window
    # boundary — by filename every selected segment overlaps the window,
    # and most sit entirely inside it. Applying the lsn filter to every
    # row of every segment measurably dominated bounded replay (a 3.3M-
    # event replay-to-cut ran ~2s filtered vs ~1.4s unfiltered), so the
    # fully-inside segments read filter-free and only the boundary
    # segments pay per-row evaluation.
    def _inside(s: SegmentInfo) -> bool:
        lo_ok = lsn_from is None or s.lsn_min > lsn_from
        hi_ok = lsn_to is None or s.lsn_max <= lsn_to
        return lo_ok and hi_ok

    full = [s for s in segs if _inside(s)]
    edge = [s for s in segs if not _inside(s)]
    reads = []
    if full:
        kw = dict(base_kwargs)
        if override_num_blocks is not None:
            kw["override_num_blocks"] = max(1, override_num_blocks - min(len(edge), 2))
        reads.append(ray.data.read_parquet([s.path for s in full], **kw))
    if edge:
        kw = dict(base_kwargs)
        flt = replay_filter(lsn_from, lsn_to)
        if flt is not None:
            kw["filter"] = flt
        if override_num_blocks is not None:
            kw["override_num_blocks"] = min(len(edge) * 2, max(1, override_num_blocks))
        reads.append(ray.data.read_parquet([s.path for s in edge], **kw))
    if len(reads) == 1:
        return reads[0]
    return reads[0].union(reads[1])


TXN_COL = "txn_id"

# Per-segment transaction digest, stamped into the parquet footer by the
# writer so safe_txn_cut can fold FOOTERS instead of scanning every
# segment's (lsn, op, txn_id) columns (Iceberg-style file statistics):
#   range: [lo, hi] — the lsn span of the WHOLE writer slice this file
#          belongs to. One write() slice fans out into one file per
#          partition with interleaved lsns; the digest cancels commits
#          across the whole slice, so it is only valid when the whole
#          slice is inside the replay window. A window edge inside the
#          slice disqualifies every file of the slice (they fall back to
#          the exact scan together).
#   opens: {txn_id: min event lsn} for txns with events in THIS FILE
#          whose commit marker is NOT in this slice (any partition).
#          Only slice-straddling and genuinely-open txns appear — a few
#          per slice — never the committed bulk (a txn's events scatter
#          across partition files while its marker lands in one; without
#          the slice-wide cancellation, opens would list ~every txn).
#   cmh:   base64 of the sorted uint64 stable_hash64 of the txn_ids that
#          COMMIT (op='C') in this file. Hashes are a pruning index,
#          never trusted for correctness: a hash hit only nominates the
#          file for an exact confirm scan, so a collision costs one
#          extra file read, not a wrong cut.
TXN_DIGEST_KEY = b"etl_rs_ray.txn_digest.v1"


def slice_txn_markers(events: pa.Table) -> set | None:
    """Committed txn ids across a whole writer slice (None if no envelope)."""
    if TXN_COL not in events.column_names:
        return None
    t = events.filter(
        pc.and_(
            pc.is_valid(events.column(TXN_COL)), pc.equal(events.column("op"), "C")
        )
    )
    return set(pc.unique(t.column(TXN_COL)).to_pylist()) if t.num_rows else set()


def txn_digest(
    part: pa.Table,
    slice_markers: set | None = None,
    slice_range: tuple[int, int] | None = None,
) -> dict | None:
    """Digest one partition file's transaction envelope (None if no
    envelope). ``slice_markers`` / ``slice_range`` describe the whole
    writer slice the file belongs to; they default to the file itself
    (single-partition writers)."""
    if TXN_COL not in part.column_names:
        return None
    if slice_range is None:
        lsns = part.column("lsn")
        slice_range = (pc.min(lsns).as_py(), pc.max(lsns).as_py())
    rng = [int(slice_range[0]), int(slice_range[1])]
    t = part.filter(pc.is_valid(part.column(TXN_COL)))
    if t.num_rows == 0:
        return {"range": rng, "opens": {}, "cmh": ""}
    is_c = pc.equal(t.column("op"), "C")
    markers = t.filter(is_c)
    file_marker_ids = set(pc.unique(markers.column(TXN_COL)).to_pylist())
    if slice_markers is None:
        slice_markers = file_marker_ids
    events = t.filter(pc.invert(is_c))
    g = pa.TableGroupBy(
        pa.table({TXN_COL: events.column(TXN_COL), "lsn": events.column("lsn")}),
        TXN_COL,
    ).aggregate([("lsn", "min")])
    opens = {
        txn: int(lo)
        for txn, lo in zip(
            g.column(TXN_COL).to_pylist(), g.column("lsn_min").to_pylist()
        )
        if txn not in slice_markers
    }
    cmh = ""
    if file_marker_ids:
        import base64

        h = np.sort(stable_hash64(pa.array(sorted(file_marker_ids), pa.string())))
        cmh = base64.b64encode(h.tobytes()).decode()
    return {"range": rng, "opens": opens, "cmh": cmh}


def read_txn_digest(pf: "pq.ParquetFile") -> dict | None:
    """Digest from an open ParquetFile's footer, or None (foreign log /
    pre-digest writer)."""
    import json

    meta = pf.schema_arrow.metadata or {}
    raw = meta.get(TXN_DIGEST_KEY)
    return json.loads(raw) if raw else None


def log_has_txns(log_dir: str) -> bool:
    """True iff the log carries the transaction envelope column. Checks
    the lowest- AND highest-LSN segments (two footer reads, not O(segs)):
    a log that adopts the envelope mid-stream has it on the newest
    segment; one that dropped it still has it on the oldest."""
    segs = list_segments(log_dir)
    if not segs:
        return False
    lo = min(segs, key=lambda s: s.lsn_min)
    hi = max(segs, key=lambda s: s.lsn_max)
    return any(
        TXN_COL in pq.ParquetFile(s.path).schema_arrow.names for s in {lo.path: lo, hi.path: hi}.values()
    )


def safe_txn_cut(
    log_dir: str, lsn_from: int | None = None, lsn_to: int | None = None
) -> int | None:
    """Largest LSN ``cut ≤ lsn_to`` such that applying the prefix
    ``lsn ∈ (lsn_from, cut]`` never splits a transaction: every event of
    an uncommitted transaction (no op='C' commit marker at or below
    ``lsn_to``) lies strictly above the cut. This is the binlog rule
    "apply up to the last commit record" — a producer crash mid-
    transaction (open tail) holds back exactly the suffix from the open
    transaction's first event onward, and the held-back events apply on
    a later replay once their commit marker lands.

    Assumes commit markers carry an LSN greater than every member
    event's (true of any WAL). Runs as a distributed column-pruned scan:
    per-block partials fold (txn_id → min event LSN, committed?) before
    anything moves; the fold output is O(transactions in window).

    Returns ``lsn_to`` (or the window max) when the log has no
    transaction column or no open transaction; ``None`` for an empty
    window.

    Segments stamped with the writer's footer txn digest (TXN_DIGEST_KEY)
    are folded from their FOOTERS: only window-straddling / undigested
    segments get the exact column scan, plus the digested segments whose
    commit-hash index may hold a candidate open txn's marker (exact
    confirm scan, filtered to the candidate ids). On a fully-digested
    log the scan cost is O(straddlers + boundary txns), not O(events) —
    without digests it falls back to the original distributed full scan."""
    segs = select_segments(log_dir, lsn_from, lsn_to)
    if not segs:
        return lsn_to
    window_max = max(s.lsn_max for s in segs) if lsn_to is None else lsn_to
    # a log can adopt the envelope mid-stream: scan only the window
    # segments that carry the column (rows in envelope-less segments are
    # single-event autocommits by definition and can never hold the cut)
    def _footer(s):
        pf = pq.ParquetFile(s.path)
        if TXN_COL not in pf.schema_arrow.names:
            return s, False, None
        # a digest cancels commits across its whole writer SLICE, so it
        # only substitutes for the scan when the entire slice (every
        # partition file of it) is inside the replay window — a window
        # edge inside the slice sends all of its files to the exact scan
        d = read_txn_digest(pf)
        if d is not None and "range" in d:
            lo, hi = d["range"]
            if (lsn_from is None or lo > lsn_from) and (
                lsn_to is None or hi <= lsn_to
            ):
                return s, True, d
        return s, True, None

    # footer reads are independent IO — thread-pool them (0.65 s serial
    # over 832 files at the 10M tier, ~0.1 s pooled)
    from concurrent.futures import ThreadPoolExecutor

    txn_segs, digests = [], {}
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(segs)))) as ex:
        for s, has_txn, d in ex.map(_footer, segs):
            if not has_txn:
                continue
            txn_segs.append(s)
            if d is not None:
                digests[s.path] = d
    if not txn_segs:
        return window_max

    import ray.data

    def _read(seg_list, extra_filter=None):
        kwargs = {"columns": ["lsn", "op", TXN_COL]}
        flt = replay_filter(lsn_from, lsn_to)
        if extra_filter is not None:
            flt = extra_filter if flt is None else flt & extra_filter
        if flt is not None:
            kwargs["filter"] = flt
        return ray.data.read_parquet([s.path for s in seg_list], **kwargs)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column(TXN_COL)))
        if t.num_rows == 0:
            return pa.table(
                {
                    TXN_COL: pa.array([], pa.string()),
                    "min_lsn": pa.array([], pa.int64()),
                    "committed": pa.array([], pa.int64()),
                }
            )
        is_c = pc.equal(t.column("op"), "C")
        ev_lsn = pc.if_else(is_c, pa.scalar(None, pa.int64()), t.column("lsn"))
        g = pa.TableGroupBy(
            pa.table(
                {
                    TXN_COL: t.column(TXN_COL),
                    "ev_lsn": ev_lsn,
                    "c": pc.cast(is_c, pa.int64()),
                }
            ),
            TXN_COL,
        ).aggregate([("ev_lsn", "min"), ("c", "max")])
        return g.rename_columns([TXN_COL, "min_lsn", "committed"])

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, TXN_COL).aggregate(
            [("min_lsn", "min"), ("committed", "max")]
        )
        g = g.rename_columns([TXN_COL, "min_lsn", "committed"])
        opens = g.filter(
            pc.and_(pc.equal(g.column("committed"), 0), pc.is_valid(g.column("min_lsn")))
        )
        open_min = pc.min(opens.column("min_lsn")).as_py() if opens.num_rows else None
        return pa.table({"open_min": pa.array([open_min], pa.int64())})

    # a mostly-undigested window (foreign log, or a window edge slicing
    # through most slices) gains nothing from digest bookkeeping — the
    # phase-A driver-side partials would be O(txns in scanned segments);
    # the original fold ships ONE row to the driver instead
    if len(digests) < len(txn_segs) // 2:
        digests = {}
    if not digests:
        # foreign / pre-digest log: the original distributed full scan.
        # Partials fold to ONE row before anything reaches the driver — a
        # driver-side take_all of per-block partials was measured 10x
        # slower (hundreds of thousands of python dicts) than this fold.
        rows = (
            _read(txn_segs)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .take_all()
        )
        open_min = rows[0]["open_min"] if rows else None
        if open_min is None:
            return window_max
        return int(open_min) - 1

    empty_partial = pa.table(
        {
            TXN_COL: pa.array([], pa.string()),
            "min_lsn": pa.array([], pa.int64()),
            "committed": pa.array([], pa.int64()),
        }
    )

    def _scan_partials(seg_list, extra_filter=None) -> pa.Table:
        t = pa.Table.from_pylist(
            _read(seg_list, extra_filter)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        return t.cast(empty_partial.schema) if t.num_rows else empty_partial

    # Phase A: exact scan of the straddler / undigested segments (usually
    # 0-2 files) — discovers txns the digests can't see
    scan_segs = [s for s in txn_segs if s.path not in digests]
    a_tbl = _scan_partials(scan_segs) if scan_segs else empty_partial

    # candidate open txns = digest opens + phase-A opens. Digest opens
    # are tiny by construction (only segment-boundary-straddling and
    # genuinely-open txns appear); A is bounded by the straddlers' rows.
    cands: dict[str, int] = {}
    for d in digests.values():
        for txn, lo in d["opens"].items():
            lo = int(lo)
            if txn not in cands or lo < cands[txn]:
                cands[txn] = lo
    if a_tbl.num_rows:
        ga = pa.TableGroupBy(a_tbl, TXN_COL).aggregate(
            [("min_lsn", "min"), ("committed", "max")]
        )
        for txn, lo, c in zip(
            ga.column(TXN_COL).to_pylist(),
            ga.column("min_lsn_min").to_pylist(),
            ga.column("committed_max").to_pylist(),
        ):
            if c == 0 and lo is not None and (txn not in cands or lo < cands[txn]):
                cands[txn] = int(lo)

    # Phase B: a candidate is committed iff some segment holds its op='C'
    # marker at lsn in (candidate min, lsn_to]. The digests' commit-hash
    # index nominates which digested segments COULD hold one; nominated
    # segments get an exact scan filtered to the candidate ids (a hash
    # collision costs one extra segment read, never a wrong cut).
    b_tbl = empty_partial
    if cands:
        import base64

        cand_ids = sorted(cands)
        cand_hashes = set(stable_hash64(pa.array(cand_ids, pa.string())).tolist())
        min_cand = min(cands.values())
        confirm = []
        for s in txn_segs:
            d = digests.get(s.path)
            if d is None or not d["cmh"] or s.lsn_max <= min_cand:
                continue
            seg_h = np.frombuffer(base64.b64decode(d["cmh"]), dtype=np.uint64)
            if cand_hashes.intersection(seg_h.tolist()):
                confirm.append(s)
        if confirm:
            b_tbl = _scan_partials(
                confirm, extra_filter=pads.field(TXN_COL).isin(cand_ids)
            )

    cand_tbl = pa.table(
        {
            TXN_COL: pa.array(list(cands), pa.string()),
            "min_lsn": pa.array(list(cands.values()), pa.int64()),
            "committed": pa.array([0] * len(cands), pa.int64()),
        }
    )
    merged = fold(pa.concat_tables([cand_tbl, a_tbl, b_tbl]))
    open_min = merged.column("open_min")[0].as_py()
    if open_min is None:
        return window_max
    return int(open_min) - 1


def strip_txn_envelope(batch: pa.Table) -> pa.Table:
    """Drop op='C' commit-marker rows and the txn_id transport column —
    neither is table data; every replay path applies this when the log
    carries the envelope."""
    if TXN_COL in batch.column_names:
        batch = batch.filter(pc.not_equal(batch.column("op"), "C")).drop_columns(
            [TXN_COL]
        )
    return batch


def read_event_log_table(log_dir: str, lsn_from=None, lsn_to=None) -> pa.Table:
    """Driver-side bounded replay (tests / tiny fixtures)."""
    segs = select_segments(log_dir, lsn_from, lsn_to)
    if not segs:
        return EVENT_SCHEMA.empty_table()
    tables = [pq.read_table(s.path) for s in segs]
    t = pa.concat_tables(tables, promote_options="permissive")
    flt = replay_filter(lsn_from, lsn_to)
    if flt is not None:
        t = pads.dataset(t).to_table(filter=flt)
    return t


def next_lsn(log_dir: str) -> int:
    """First unused LSN after the log's current tail — THE LSN-allocation
    rule; every appender must use this."""
    segs = list_segments(log_dir) if os.path.isdir(log_dir) else []
    return max((s.lsn_max for s in segs), default=-1) + 1


def ingest_table_as_inserts(
    table: pa.Table,
    log_dir: str,
    num_partitions: int = 8,
    start_lsn: int | None = None,
) -> int:
    """The csv->Kafka producer path (examples/csv_jdd_to_kafka.rs:7-37,
    src/kafka.rs:24-41): every row becomes one op=I change event, LSN =
    start offset + row index (the reference's key = row index). Appends
    after the log's current tail when ``start_lsn`` is None. Returns the
    next unused LSN."""
    missing = {"repo", "path", "commit"} - set(table.column_names)
    if missing:
        raise ValueError(
            f"ingest requires the source-repo key columns (BASELINE.json "
            f"input_hint schema); missing: {sorted(missing)}"
        )
    if start_lsn is None:
        start_lsn = next_lsn(log_dir)
    n = table.num_rows
    table = table.add_column(0, "lsn", pa.array(range(start_lsn, start_lsn + n), pa.int64()))
    table = table.add_column(1, "op", pa.array(["I"] * n, pa.string()))
    EventLogWriter(log_dir, num_partitions).write(table)
    return start_lsn + n


class EventLogWriter:
    """Partitioned segment writer (the ``push_json_to_kafka`` analogue,
    src/kafka.rs:24-41: key -> partition, offset order within partition).

    Not an appender per-row: callers hand whole Arrow tables (micro-batches
    or bulk datagen output); each flush writes one segment file per
    partition, named by its LSN range so replay can prune by filename.
    """

    def __init__(self, log_dir: str, num_partitions: int = 8):
        self.log_dir = log_dir
        self.num_partitions = num_partitions
        os.makedirs(log_dir, exist_ok=True)

    def write(self, events: pa.Table) -> list[SegmentInfo]:
        if events.num_rows == 0:
            return []
        bucket = fast_hash_bucket(events.column("repo"), events.column("path"), self.num_partitions)
        # the txn digest cancels commits across the WHOLE slice (a txn's
        # events scatter over partition files; its marker lands in one)
        slice_markers = slice_txn_markers(events)
        slice_range = (
            pc.min(events.column("lsn")).as_py(),
            pc.max(events.column("lsn")).as_py(),
        )
        events = events.append_column("_part", bucket)
        infos = []
        for k in range(self.num_partitions):
            part = events.filter(pc.equal(events.column("_part"), k)).drop_columns(["_part"])
            if part.num_rows == 0:
                continue
            part = part.sort_by("lsn")
            digest = txn_digest(part, slice_markers, slice_range)
            if digest is not None:
                import json

                meta = dict(part.schema.metadata or {})
                meta[TXN_DIGEST_KEY] = json.dumps(digest, sort_keys=True)
                part = part.replace_schema_metadata(meta)
            lsn_min = part.column("lsn")[0].as_py()
            lsn_max = part.column("lsn")[-1].as_py()
            pdir = os.path.join(self.log_dir, f"part={k}")
            os.makedirs(pdir, exist_ok=True)
            fpath = os.path.join(pdir, f"seg-{lsn_min}-{lsn_max}.parquet")
            tmp = fpath + ".tmp"
            pq.write_table(part, tmp, row_group_size=64 * 1024)
            os.replace(tmp, fpath)  # atomic publish
            infos.append(SegmentInfo(fpath, k, lsn_min, lsn_max))
        return infos
