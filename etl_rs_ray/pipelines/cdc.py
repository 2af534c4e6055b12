"""Flagship pipeline: bounded binlog replay -> lake upsert table.

Ray-Data-first shape (SURVEY.md §7):

    read_event_log (file/row-group pruned by LSN window)
      -> [optional] map_batches(TransformChain)          stateless normalize
      -> map_batches(pre-compact)                        per-batch LWW combiner
                                                         + bucket assignment
      -> groupby("bucket").map_groups(merge)             the ONE shuffle,
                                                         keyed hash(repo,path)
      -> per-bucket staged Parquet + driver manifest commit (exactly-once)

The per-batch combiner collapses superseded events *before* the shuffle,
so the all-to-all exchange moves at most one row per (key, batch) instead
of the full event history — the partial-aggregation pattern the reference
lacks (it materializes one LazyFrame per key, transform_hdd_deduplication.rs:282-311).

Ordering: LSN total order is restored per key inside the bucket reducer
by sorting — no global sort, matching the Kafka-offset-per-partition
semantics of the reference (kafka_jdd_to_mongo.rs:35-63).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.registry import TransformChain
from ..sources.event_log import (
    fast_hash_bucket,
    log_has_txns,
    PurgedLogError,
    purge_cut,
    read_event_log,
    safe_txn_cut,
    select_segments,
    strip_txn_envelope,
)
from ..sources.lake import LakeTable
from ..stages.merge_apply import DEFAULT_KEY, LwwStats, lww_reduce, merge_bucket_tables
from ..state import fs


def _chaos_crash(chaos_dir: str | None, point: str, key: str) -> None:
    """Fault-injection hook for the chaos drill (tests/test_chaos_replay.py).

    When ``chaos_dir`` is set and contains an ``enable-<point>`` file, the
    FIRST task to reach (point, key) hard-kills its worker process with
    ``os._exit`` — a real worker loss, not a Python exception Ray could
    intercept in-process — after dropping a marker so the retried attempt
    proceeds. This exercises, under genuine mid-job worker death: Ray's
    task retry, the content-derived idempotent spill/payload file names,
    the deterministic staging names, and the exactly-once manifest commit.
    No-op in production (chaos_dir is never set outside tests)."""
    if not chaos_dir or not os.path.exists(os.path.join(chaos_dir, f"enable-{point}")):
        return
    marker = os.path.join(chaos_dir, f"died-{point}-{key}")
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return
    os.close(fd)
    os._exit(1)


def curate_batch(batch: pa.Table) -> pa.Table:
    """The normalize/curate stage of the full ingest pipeline: language-ID
    + quality signals (vectorized RE2) and a winnowing content fingerprint
    per event — the training-data analogue of the reference's per-record
    Transform chain. Tombstones (null content) pass through untouched."""
    import pyarrow.compute as _pc

    from ..stages.text_stats import lang_id, quality_stats, winnow_fingerprints_batch

    live_mask = _pc.is_valid(batch.column("content"))
    live = batch.filter(live_mask)
    dead = batch.filter(_pc.invert(live_mask))
    if live.num_rows:
        live = quality_stats(live, "content")
        live = lang_id(live, "content", out_col="lang_pred")
        fps = winnow_fingerprints_batch(live.column("content").to_pylist())
        live = live.append_column("fingerprint", pa.array(fps, pa.list_(pa.int64())))
    if dead.num_rows == 0:
        return live
    from ..state.schema_evolution import unify_tables

    return unify_tables([live, dead]) if live.num_rows else dead


def default_event_validator(batch: pa.Table):
    """Structural validity of change events: key columns present, op one
    of I/U/D, LSN present. Returns (valid_mask, reason) — ``reason`` is a
    string array, null for valid rows."""
    ok_op = pc.is_in(batch.column("op"), value_set=pa.array(["I", "U", "D"]))
    ok_key = pc.and_(
        pc.is_valid(batch.column("repo")), pc.is_valid(batch.column("path"))
    )
    ok_lsn = pc.is_valid(batch.column("lsn"))
    reason = pc.if_else(
        pc.invert(pc.fill_null(ok_op, False)),
        pa.scalar("bad_op", pa.string()),
        pc.if_else(
            pc.invert(ok_key),
            pa.scalar("null_key", pa.string()),
            pc.if_else(
                pc.invert(ok_lsn),
                pa.scalar("null_lsn", pa.string()),
                pa.scalar(None, pa.string()),
            ),
        ),
    )
    valid = pc.is_null(reason)
    return valid, reason


def make_quarantine_splitter(qdir: str, validator=default_event_validator):
    """Dead-letter stage: rows failing ``validator`` are diverted to one
    Parquet file per offending batch under ``qdir`` (with a ``_reason``
    column) and the valid rows flow on. The filename is a content hash of
    the bad rows' identity (LSN span + count + reason multiset), so a
    retried task rewrites the SAME file — the quarantine surface is
    at-least-once diagnostic output (orphans from a crashed attempt are
    possible), while the TABLE stays exactly-once via the manifest.
    Quarantined events are terminal: the HWM advances past them;
    reprocessing means re-ingesting fixed rows at fresh LSNs."""
    import hashlib

    def split(batch: pa.Table) -> pa.Table:
        valid, reason = validator(batch)
        if pc.all(pc.fill_null(valid, False)).as_py():
            return batch
        bad = batch.filter(pc.invert(pc.fill_null(valid, False)))
        bad = bad.append_column(
            "_reason", reason.filter(pc.invert(pc.fill_null(valid, False)))
        )
        # identity = content hash of the bad rows themselves ((lsn, op,
        # reason) triples, order-insensitive): deterministic under task
        # retry, and two batches from different log partitions with
        # overlapping LSN ranges can never collide unless their bad rows
        # are identical (in which case one file IS the right outcome)
        triples = sorted(
            zip(
                bad.column("lsn").to_pylist(),
                bad.column("op").to_pylist(),
                bad.column("_reason").to_pylist(),
            )
        )
        tag = hashlib.sha1(repr(triples).encode()).hexdigest()[:16]
        os.makedirs(qdir, exist_ok=True)
        path = os.path.join(qdir, f"bad-{tag}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(bad, tmp)
        os.replace(tmp, path)
        return batch.filter(pc.fill_null(valid, False))

    return split


def quarantine_stats(qdir: str) -> tuple[int, int | None]:
    """(total quarantined rows, max quarantined LSN) from parquet footer
    metadata only — no data pages are read. The max LSN folds into the
    epoch's HWM so a quarantined tail is consumed, not re-read forever."""
    if not os.path.isdir(qdir):
        return 0, None
    rows, max_lsn = 0, None
    for f in os.listdir(qdir):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(qdir, f)).metadata
        rows += md.num_rows
        lsn_idx = md.schema.to_arrow_schema().get_field_index("lsn")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(lsn_idx).statistics
            if st is not None and st.has_min_max:
                m = int(st.max)
                max_lsn = m if max_lsn is None else max(max_lsn, m)
    return rows, max_lsn


ENTRY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("filename", pa.string()),
        ("rows", pa.int64()),
        ("hwm_lsn", pa.int64()),
        ("events_in", pa.int64()),
        ("superseded_dropped", pa.int64()),
        ("applied_i", pa.int64()),
        ("applied_u", pa.int64()),
        ("applied_d", pa.int64()),
    ]
)


def make_precompact(num_buckets: int, key_cols=DEFAULT_KEY, lsn_col="lsn", op_col="op"):
    """Per-batch combiner: assign shuffle bucket + within-batch LWW."""

    def precompact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        batch = lww_reduce(batch, key_cols, lsn_col, op_col, drop_tombstones=False)
        bucket = fast_hash_bucket(batch.column("repo"), batch.column("path"), num_buckets)
        return batch.append_column("bucket", bucket)

    return precompact


def _read_bucket_state(files: list[str] | None, key_cols, lsn_col, op_col) -> pa.Table | None:
    """Stored state of one bucket = merge-on-read of [base?, *deltas].

    Upsert epochs REPLACE a touched bucket's manifest entry, so any
    outstanding delta files must be folded in here or their rows are
    silently lost (ADVICE r1: cdc.py:358)."""
    if not files:
        return None
    if len(files) == 1:
        return fs.read_table(files[0])
    from ..state.schema_evolution import unify_tables

    t = unify_tables([fs.read_table(f) for f in files])
    # deltas carry tombstones; folding drops them from the stored state
    return lww_reduce(t, key_cols, lsn_col, op_col, drop_tombstones=True)


def make_bucket_merger(
    staging_dir: str,
    bucket_files: dict[int, list[str]],
    key_cols=DEFAULT_KEY,
    lsn_col="lsn",
    op_col="op",
):
    """Group reducer: merge one bucket's incoming winners into its stored
    state (base + any delta files, merge-on-read), write the new bucket
    file to a deterministic staging path (retry-idempotent), emit one
    manifest-entry row."""

    def merge_group(group: pa.Table) -> pa.Table:
        b = group.column("bucket")[0].as_py()
        incoming = group.drop_columns(["bucket"])
        stats = LwwStats()
        incoming = lww_reduce(incoming, key_cols, lsn_col, op_col, stats=stats)
        existing = _read_bucket_state(bucket_files.get(b), key_cols, lsn_col, op_col)
        merged = merge_bucket_tables(existing, incoming, key_cols, lsn_col, op_col)
        # merged is already key-sorted (lww_reduce sorts by (key, lsn desc)
        # and every merge_bucket_tables path returns an lww_reduce output or
        # a filter of one), so bytes are deterministic under retry without
        # re-sorting — a full sort+copy pass over the bucket state saved
        filename = f"bucket-{b}.parquet"
        fs.write_table_atomic(merged, fs.join(staging_dir, filename), row_group_size=128 * 1024)
        hwm = pc.max(incoming.column(lsn_col)).as_py() if incoming.num_rows else -1
        return pa.table(
            {
                "bucket": pa.array([b], pa.int32()),
                "filename": pa.array([filename]),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "hwm_lsn": pa.array([hwm], pa.int64()),
                "events_in": pa.array([stats.events_in], pa.int64()),
                "superseded_dropped": pa.array([stats.superseded_dropped], pa.int64()),
                "applied_i": pa.array([stats.ops.get("I", 0)], pa.int64()),
                "applied_u": pa.array([stats.ops.get("U", 0)], pa.int64()),
                "applied_d": pa.array([stats.ops.get("D", 0)], pa.int64()),
            },
            schema=ENTRY_SCHEMA,
        )

    return merge_group


def make_spiller(
    shuffle_dir: str,
    num_xparts: int,
    num_buckets: int,
    key_cols=DEFAULT_KEY,
    lsn_col="lsn",
    op_col="op",
    rg_rows: int | None = None,
    chaos_dir: str | None = None,
):
    """Map stage of the disk exchange (sort-based shuffle): per input
    block, LWW-precompact (the combiner — superseded events die before
    any data moves), assign lake buckets, stable-sort by exchange
    partition (xpart = bucket % num_xparts), then write ONE meta file
    per block with ONE RECORD BATCH per touched xpart, plus a payload
    sidecar holding every non-fold column exactly once (see
    ``_attach_payload``). The accounting rows are the shuffle index:
    (xpart, file, batch ordinal, batch start row).

    One file per block — not one per (block, xpart) — is the classic
    sort-based-shuffle file bound: M files total instead of M x R, which
    at small blocks removes ~R file creations per map task (measured 2x
    on the spill stage) and at 100 TB keeps the filesystem to O(blocks)
    objects. Reducers read ONLY their row groups via the index; parquet
    row-group pruning makes that one footer read + R-th of the bytes per
    file. Spilled rows keep their ``bucket`` column; the reducer splits
    them per bucket in memory.

    File names derive from the block's content (lsn range, row count,
    crc of lsns) so a retried task overwrites identical bytes —
    idempotent under Ray task retry."""

    # cap spilled row groups at min(128k, fold threshold): the reducer's
    # drain granularity is one row group, so an oversized group (one hot
    # xpart owning a whole 500k-row block) would blow past the fold
    # threshold in a single indivisible chunk. Resolved on the DRIVER
    # (make_spiller runs there) so test env overrides reach the workers
    # via the closure.
    if rg_rows is None:
        fold_env = int(os.environ.get("ETL_RS_RAY_FOLD_ROWS", 512 * 1024))
        rg_rows = max(16, min(128 * 1024, fold_env))

    empty = pa.table(
        {
            "xpart": pa.array([], pa.int32()),
            "spilled": pa.array([], pa.int64()),
            "raw_events": pa.array([], pa.int64()),
            "file": pa.array([], pa.string()),
            "rg": pa.array([], pa.int32()),
            "rg_start": pa.array([], pa.int64()),
        }
    )

    # Lazy payload: only (key, lsn, op, bucket) participate in the fold's
    # sort/take passes — every other column (content, commit, lang, any
    # normalize-added signal) is pure payload the reducer never inspects,
    # so shipping it THROUGH the fold copies megabytes per pass for
    # nothing. Payload is spilled ONCE to a per-block sidecar in the
    # block's sorted row order; meta rows are re-joined to it by (file,
    # row ordinal) AFTER the fold, so only final LWW winners pay the
    # payload read (measured: content bytes were 40% of the 10M-event
    # replay wall; superseded rows never move their payload again).
    fold_cols = set(key_cols) | {lsn_col, op_col, "bucket", "_x"}

    def spill(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        import zlib

        from ..stages.merge_apply import _first_per_key_mask

        raw_rows = batch.num_rows
        # ONE composite stable sort does both jobs: leading xpart key makes
        # the block xpart-contiguous for the row-group layout, the (key,
        # lsn desc) suffix is exactly lww_reduce's order (xpart is a
        # function of the key, so per-key adjacency is preserved and the
        # first row of each key run is its LWW winner; ties break on
        # delivery order — Arrow's table sort is stable)
        bucket = fast_hash_bucket(batch.column("repo"), batch.column("path"), num_buckets)
        bnp = bucket.to_numpy(zero_copy_only=False)
        batch = batch.append_column("bucket", bucket)
        batch = batch.append_column("_x", pa.array((bnp % num_xparts).astype(np.int32)))
        sort_keys = [("_x", "ascending")] + [(k, "ascending") for k in key_cols] + [
            (lsn_col, "descending")
        ]
        # sort + combiner mask are computed on the fold columns only, then
        # applied to the full batch in ONE take — payload strings are
        # copied once, not once for the sort and again for the filter
        small = batch.select(list(dict.fromkeys(["_x", *key_cols, lsn_col])))
        sort_idx = pc.sort_indices(small, sort_keys=sort_keys)
        small = small.take(sort_idx)
        mask = _first_per_key_mask(small, key_cols)
        batch = batch.take(sort_idx.filter(mask))
        xs = batch.column("_x").to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["_x"])
        bounds = np.flatnonzero(np.diff(xs)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(xs)]))
        lsns = batch.column(lsn_col)
        tag = (
            f"{pc.min(lsns).as_py()}-{pc.max(lsns).as_py()}-{batch.num_rows}-"
            f"{zlib.crc32(lsns.combine_chunks().to_numpy(zero_copy_only=False).tobytes()):08x}"
        )
        # spill files are TRANSIENT (deleted after the epoch's merge), so
        # the format is Arrow IPC, not parquet: encode is ~memcpy (3x
        # faster writes) and the reducer's per-batch random access is a
        # zero-copy mmap read (58x faster than parquet row-group decode,
        # measured on this workload) — parquet's encoding only buys
        # compression the transient medium doesn't need. One record batch
        # per index entry plays the role of one row group. Codec: raw
        # bytes on a ramdisk (encode time is pure loss there), lz4 buffer
        # compression on disk, zstd for slow/remote storage (env
        # override). Durable lake files remain parquet.
        _chaos_crash(chaos_dir, "spill", tag)
        codec = os.environ.get(
            "ETL_RS_RAY_SPILL_CODEC", "none" if "/dev/shm" in shuffle_dir else "lz4"
        )
        opts = pa.ipc.IpcWriteOptions(compression=None if codec == "none" else codec)
        fname = f"block-{tag}.arrow"
        os.makedirs(shuffle_dir, exist_ok=True)
        fpath = os.path.join(shuffle_dir, fname)
        tmp = fpath + f".tmp-{os.getpid()}"

        payload_names = [c for c in batch.column_names if c not in fold_cols]
        if payload_names:
            # sidecar keeps the block's sorted row order, so the meta row
            # at global ordinal i IS payload row i — the pointer the
            # reducer carries is just (file, ordinal)
            import json

            payload = batch.select(payload_names)
            orig_cols = [c for c in batch.column_names if c != "bucket"]
            pschema = payload.schema.with_metadata(
                {b"orig_cols": json.dumps(orig_cols).encode()}
            )
            ppath = os.path.join(shuffle_dir, f"payload-{tag}.arrow")
            ptmp = ppath + f".tmp-{os.getpid()}"
            with pa.OSFile(ptmp, "wb") as sink, pa.ipc.new_file(
                sink, pschema, options=opts
            ) as writer:
                writer.write_table(
                    payload.combine_chunks().replace_schema_metadata(pschema.metadata),
                    max_chunksize=64 * 1024,
                )
            os.replace(ptmp, ppath)
            # mid-write crash: payload published, meta file not yet — the
            # retry must overwrite the payload with identical bytes
            _chaos_crash(chaos_dir, "spill_mid", tag)
            batch = batch.drop_columns(payload_names)

        out_x, out_n, out_s = [], [], []
        with pa.OSFile(tmp, "wb") as sink, pa.ipc.new_file(sink, batch.schema, options=opts) as writer:
            for s, e in zip(starts.tolist(), ends.tolist()):
                for off in range(s, e, rg_rows):
                    sz = min(rg_rows, e - off)
                    writer.write_table(batch.slice(off, sz).combine_chunks(), max_chunksize=sz)
                    out_x.append(int(xs[s]))
                    out_n.append(sz)
                    out_s.append(off)
        os.replace(tmp, fpath)
        raw_col = [raw_rows] + [0] * (len(out_x) - 1)  # attribute once per batch
        return pa.table(
            {
                "xpart": pa.array(out_x, pa.int32()),
                "spilled": pa.array(out_n, pa.int64()),
                "raw_events": pa.array(raw_col, pa.int64()),
                "file": pa.array([fname] * len(out_x)),
                "rg": pa.array(range(len(out_x)), pa.int32()),
                "rg_start": pa.array(out_s, pa.int64()),
            }
        )

    return spill


def _attach_payload(
    t: pa.Table, fid_files: list[str], shuffle_dir: str
) -> pa.Table:
    """Re-join a folded meta table to its spilled payload sidecars by
    (file id, row ordinal) — only LWW winners reach here, so payload
    bytes of superseded rows are read zero times after their one spill
    write. Gathers are grouped per sidecar (one zero-copy mmap open
    each) with ordinals pre-sorted, then scattered back to fold order."""
    if "_cfid" not in t.column_names:
        return t
    import json

    from ..state.schema_evolution import unify_tables

    fids = t.column("_cfid").combine_chunks().to_numpy()
    refs = t.column("_cref").combine_chunks().to_numpy()
    t = t.drop_columns(["_cfid", "_cref"])
    if t.num_rows == 0:
        fname = fid_files[0].replace("block-", "payload-", 1)
        rd = pa.ipc.open_file(pa.memory_map(os.path.join(shuffle_dir, fname)))
        for name, col in zip(
            rd.schema.names, rd.read_all().slice(0, 0).columns
        ):
            t = t.append_column(name, col)
        return t
    order = np.lexsort((refs, fids))
    sfids, srefs = fids[order], refs[order]
    bounds = np.flatnonzero(np.diff(sfids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sfids)]))
    parts, orig_cols = [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        fname = fid_files[int(sfids[s])].replace("block-", "payload-", 1)
        rd = pa.ipc.open_file(pa.memory_map(os.path.join(shuffle_dir, fname)))
        for c in json.loads((rd.schema.metadata or {})[b"orig_cols"]):
            if c not in orig_cols:
                orig_cols.append(c)
        parts.append(rd.read_all().take(pa.array(srefs[s:e])))
    payload = parts[0] if len(parts) == 1 else unify_tables(parts)
    payload = payload.take(pa.array(np.argsort(order)))
    for name in payload.column_names:
        t = t.append_column(name, payload.column(name))
    sel = [c for c in orig_cols if c in t.column_names]
    sel += [c for c in t.column_names if c not in sel]
    return t.select(sel)


def _merge_xpart_task(
    shuffle_dir: str,
    plan: list[tuple[str, int] | tuple[str, int, int]],
    bucket_files: dict,
    staging_dir: str,
    key_cols=DEFAULT_KEY,
    lsn_col="lsn",
    op_col="op",
    delta: bool = False,
    fold_rows: int | None = None,
    chaos_dir: str | None = None,
    chaos_key: str = "",
) -> list[dict]:
    """Reduce side of the disk exchange (plain Ray task body): read one
    exchange partition's row groups out of the spilled block files (the
    ``plan`` is the shuffle index: sorted (file, row-group) pairs), then
    fold EACH contained lake bucket with its stored state and write that
    bucket's new file.

    ``delta=True`` (LSM mode) writes just the window's LWW winners —
    tombstones INCLUDED so merge-on-read can delete base rows — without
    touching the stored base.

    The spilled files are folded INCREMENTALLY: raw files accumulate up
    to ``fold_rows`` rows, then ONE stable sort-by-bucket splits the
    batch into contiguous per-bucket slices (zero-copy) and any bucket
    whose accumulation exceeds ``fold_rows`` is LWW-compacted on the
    spot. Worker heap is bounded by (winners so far + one raw batch),
    not the partition's total event count — a hot exchange partition
    (skewed key) streams through instead of loading whole — and each
    spilled row is touched O(1) times, not once per bucket (the r2
    per-file-per-bucket ``filter`` loop scanned every file num_buckets
    times and doubled the replay wall clock).
    ``ETL_RS_RAY_FOLD_ROWS`` overrides the threshold (tests)."""
    from ..state.schema_evolution import unify_tables

    _chaos_crash(chaos_dir, "merge", chaos_key)
    if fold_rows is None:
        # NB: reading the env HERE only works when the worker inherited it
        # (shell-level export). Tests/monkeypatch must pass fold_rows via
        # replay(), which resolves the env on the DRIVER.
        fold_rows = int(os.environ.get("ETL_RS_RAY_FOLD_ROWS", 512 * 1024))
    acc: dict[int, list[pa.Table]] = {}
    pending: dict[int, int] = {}
    events_in: dict[int, int] = {}
    # heap bound evidence: max rows resident at once = accumulated winners
    # + the raw batch being drained. The skew drill asserts this stays
    # O(output + fold_rows), never O(partition events).
    acc_total = 0
    peak_rows = 0

    def fold(b: int) -> pa.Table:
        nonlocal acc_total
        tabs = acc[b]
        before = sum(x.num_rows for x in tabs)
        t = tabs[0] if len(tabs) == 1 else unify_tables(tabs)
        t = lww_reduce(t, key_cols, lsn_col, op_col)
        acc[b] = [t]
        pending[b] = 0
        acc_total += t.num_rows - before
        return t

    raw: list[pa.Table] = []
    raw_rows = 0

    def drain_raw() -> None:
        # single-pass split of the accumulated raw spill by bucket: a
        # STABLE argsort (LWW ties are broken by delivery order — see
        # lww_reduce) then contiguous zero-copy slices at run boundaries
        nonlocal raw, raw_rows, acc_total, peak_rows
        if not raw:
            return
        t = raw[0] if len(raw) == 1 else unify_tables(raw)
        peak_rows = max(peak_rows, t.num_rows + acc_total)
        if os.environ.get("ETL_RS_RAY_FOLD_TRACE"):
            import sys

            print(
                f"FOLD_TRACE drain t={t.num_rows} acc_total={acc_total} "
                f"pend={dict(sorted(pending.items()))}",
                file=sys.stderr,
                flush=True,
            )
        raw, raw_rows = [], 0
        buckets = t.column("bucket").combine_chunks().to_numpy()
        order = np.argsort(buckets, kind="stable")
        if not np.array_equal(order, np.arange(len(order))):
            t = t.take(pa.array(order))
            buckets = buckets[order]
        t = t.drop_columns(["bucket"])
        bounds = np.flatnonzero(np.diff(buckets)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(buckets)]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            b = int(buckets[s])
            part = t.slice(s, e - s)
            acc.setdefault(b, []).append(part)
            events_in[b] = events_in.get(b, 0) + part.num_rows
            pending[b] = pending.get(b, 0) + part.num_rows
            acc_total += part.num_rows
            if pending[b] >= fold_rows:
                fold(b)

    # the plan is sorted by file name, so each spill file's record batches
    # are consumed consecutively: ONE mmap reader at a time. get_batch on
    # a memory map is zero-copy, so the reader reference is DROPPED (not
    # close()d — closing would unmap memory that raw/acc slices still
    # view) on file change; the periodic drain_raw sort+take copies the
    # rows out within one fold window, after which the mapping dies with
    # its last buffer. Resident mappings are therefore bounded by the
    # files of one fold window, not the whole plan — at O(100k) map
    # blocks per 100-TB epoch the task never nears the fd limit.
    fid_files = sorted({item[0] for item in plan})
    fid_of = {f: i for i, f in enumerate(fid_files)}
    cur_fname, cur_rd, cur_fid, cur_has_payload, cur_starts = None, None, -1, False, None
    for item in sorted(plan):
        fname, rg = item[0], int(item[1])
        start = int(item[2]) if len(item) > 2 else None
        if fname != cur_fname:
            cur_fname = fname
            cur_rd = pa.ipc.open_file(pa.memory_map(os.path.join(shuffle_dir, fname)))
            cur_fid = fid_of[fname]
            cur_has_payload = os.path.exists(
                os.path.join(shuffle_dir, fname.replace("block-", "payload-", 1))
            )
            cur_starts = None
        data = pa.Table.from_batches([cur_rd.get_batch(rg)])
        if cur_has_payload:
            if start is None:
                # legacy 2-tuple plan (tests): reconstruct batch offsets once
                if cur_starts is None:
                    sizes = [
                        cur_rd.get_batch(j).num_rows
                        for j in range(cur_rd.num_record_batches)
                    ]
                    cur_starts = np.concatenate(([0], np.cumsum(sizes)))
                start = int(cur_starts[rg])
            n = data.num_rows
            data = data.append_column(
                "_cfid", pa.array(np.full(n, cur_fid, dtype=np.int32))
            ).append_column(
                "_cref", pa.array(start + np.arange(n, dtype=np.int64))
            )
        raw.append(data)
        raw_rows += data.num_rows
        if raw_rows >= fold_rows:
            drain_raw()
    cur_rd = None
    drain_raw()

    entries = []
    for b in sorted(acc):
        # a bucket whose last drain already folded it (pending == 0, one
        # accumulated table) is already LWW-reduced — re-reducing would be
        # a no-op full sort+copy of its final state
        if pending.get(b, 0) == 0 and len(acc[b]) == 1:
            incoming = acc[b][0]
        else:
            incoming = fold(b)
        # only the bucket's final winners fetch their payload columns back
        incoming = _attach_payload(incoming, fid_files, shuffle_dir)
        stats = LwwStats(events_in=events_in[b], rows_out=incoming.num_rows)
        stats.superseded_dropped = events_in[b] - incoming.num_rows
        if op_col in incoming.column_names:
            for item in incoming.column(op_col).combine_chunks().value_counts():
                stats.ops[item["values"].as_py()] = item["counts"].as_py()
        if delta:
            merged = incoming
        else:
            existing = _read_bucket_state(bucket_files.get(b), key_cols, lsn_col, op_col)
            merged = merge_bucket_tables(existing, incoming, key_cols, lsn_col, op_col)
        # merged is key-sorted by construction (see make_bucket_merger) —
        # skipping the redundant final sort saves a full copy pass per bucket
        filename = f"bucket-{b}.parquet"
        fs.write_table_atomic(merged, fs.join(staging_dir, filename), row_group_size=128 * 1024)
        hwm = pc.max(incoming.column(lsn_col)).as_py() if incoming.num_rows else -1
        entries.append(
            {
                "bucket": b,
                "filename": filename,
                "rows": merged.num_rows,
                "hwm_lsn": hwm,
                "events_in": stats.events_in,
                "superseded_dropped": stats.superseded_dropped,
                "applied_i": stats.ops.get("I", 0),
                "applied_u": stats.ops.get("U", 0),
                "applied_d": stats.ops.get("D", 0),
                "peak_fold_rows": peak_rows,
            }
        )
    # late crash: every staged bucket file already published — the retry
    # re-runs the whole partition and overwrites the same staging names
    _chaos_crash(chaos_dir, "merge_late", chaos_key)
    return entries


@dataclass
class ReplayResult:
    committed: bool
    epoch: int
    hwm_lsn: int
    events_applied: int = 0
    rows_total: int = 0
    buckets_touched: int = 0
    metrics: dict = field(default_factory=dict)
    wall_seconds: float = 0.0


def replay_plan(
    log_dir: str,
    table_dir: str,
    *,
    target_lsn: int | None = None,
    num_buckets: int = 64,
    atomic_txns: bool = False,
) -> dict:
    """Dry run: what WOULD a replay do — current HWM, transactional safe
    cut, selected segments, estimated event count (dense-LSN span bound)
    — without touching the table or the log. Footer/filename metadata
    only, except the safe-cut scan (column-pruned, distributed)."""
    lake = LakeTable(table_dir, num_buckets)
    hwm = lake.hwm_lsn()
    plan: dict = {"hwm_lsn": hwm, "target_lsn": target_lsn, "atomic_txns": atomic_txns}
    effective_target = target_lsn
    if atomic_txns and log_has_txns(log_dir):
        cut = safe_txn_cut(log_dir, hwm, target_lsn)
        plan["txn_cut"] = cut
        effective_target = cut
    segs = select_segments(log_dir, hwm, effective_target)
    plan["segments"] = len(segs)
    plan["segment_bytes"] = sum(
        os.path.getsize(s.path) for s in segs if os.path.exists(s.path)
    )
    if segs:
        lo = min(s.lsn_min for s in segs)
        hi = max(s.lsn_max for s in segs)
        if effective_target is not None:
            hi = min(hi, effective_target)
        plan["lsn_window"] = [max(hwm, lo - 1), hi]
        plan["est_events"] = max(0, hi - max(hwm, lo - 1))
    else:
        plan["lsn_window"] = [hwm, hwm]
        plan["est_events"] = 0
    plan["would_apply"] = plan["est_events"] > 0
    return plan


def replay(
    log_dir: str,
    table_dir: str,
    *,
    target_lsn: int | None = None,
    num_buckets: int = 64,
    normalize: TransformChain | dict | None = None,
    override_num_blocks: int | None = None,
    batch_size: int | None = None,
    shuffle_partitions: int | None = None,
    shuffle: str = "disk",
    mode: str = "upsert",
    atomic_txns: bool = False,
    quarantine=False,
    chaos_dir: str | None = None,
) -> ReplayResult:
    """Replay with loser-tolerant concurrency: a racing replayer of the
    same window (two cron tails overlapping) shares the epoch's staging
    and spill paths, so the winner's post-merge cleanup can fail the
    loser's in-flight tasks mid-merge. Data is never at risk — the
    manifest CAS admits exactly one committer and staged bytes are
    deterministic — but the loser used to CRASH on work that in fact
    completed. On failure this wrapper polls the manifest briefly: if
    another committer advanced the table until OUR window has no
    segments left, the loser adopts that result (``committed=False``,
    ``metrics.adopted_from_concurrent_replay``) instead of raising.
    A genuinely failed replay (nobody covered the window) still raises.
    Single-writer-per-table remains the recommended operating mode;
    this makes the overlap benign rather than fatal."""
    try:
        return _replay_attempt(
            log_dir, table_dir, target_lsn=target_lsn, num_buckets=num_buckets,
            normalize=normalize, override_num_blocks=override_num_blocks,
            batch_size=batch_size, shuffle_partitions=shuffle_partitions,
            shuffle=shuffle, mode=mode, atomic_txns=atomic_txns,
            quarantine=quarantine, chaos_dir=chaos_dir,
        )
    except PurgedLogError:
        # a retention-purged window is unrecoverable, not a racing
        # committer: the purged segments also make select_segments come
        # back empty, which the adoption poll below would mistake for
        # "someone else covered the window" — surface the real error
        raise
    except Exception:
        for _ in range(10):
            lake = LakeTable(table_dir, num_buckets)
            cur_epoch = lake.current_epoch()
            cur_hwm = lake.hwm_lsn()
            covered = not select_segments(log_dir, cur_hwm, target_lsn)
            if not covered and atomic_txns and log_has_txns(log_dir):
                # an atomic winner only advances to the safe cut; the
                # window is covered when nothing below the cut remains
                cut = safe_txn_cut(log_dir, cur_hwm, target_lsn)
                covered = cut is None or cut <= cur_hwm
            if cur_epoch >= 0 and covered:
                m = lake.manifests.read()
                rows = sum(
                    int(e.get("rows", 0)) + int(e.get("delta_rows", 0))
                    for e in m["buckets"].values()
                )
                return ReplayResult(
                    False, cur_epoch, cur_hwm, rows_total=rows,
                    metrics={"adopted_from_concurrent_replay": True},
                )
            time.sleep(0.5)
        raise


def _replay_attempt(
    log_dir: str,
    table_dir: str,
    *,
    target_lsn: int | None = None,
    num_buckets: int = 64,
    normalize: TransformChain | dict | None = None,
    override_num_blocks: int | None = None,
    batch_size: int | None = None,
    shuffle_partitions: int | None = None,
    shuffle: str = "disk",
    mode: str = "upsert",
    atomic_txns: bool = False,
    quarantine=False,
    chaos_dir: str | None = None,
) -> ReplayResult:
    """Replay all events with ``lsn > table.hwm`` (bounded by ``target_lsn``)
    into the lake upsert table. Resumable + idempotent: re-running after a
    crash (or calling twice) applies each event exactly once.

    ``atomic_txns=True`` enforces transaction atomicity over a log that
    carries the BEGIN..COMMIT envelope (a ``txn_id`` column + op='C'
    commit markers): the replay window is trimmed to the last LSN below
    which every transaction is committed (event_log.safe_txn_cut), so a
    partial transaction at the log tail is held back in full and applies
    on a later replay once its commit marker lands — without ever
    breaking the exactly-once HWM accounting. Commit-marker rows and the
    txn_id column are stripped before the merge in every mode (they are
    transport envelope, not table data)."""
    t0 = time.perf_counter()
    lake = LakeTable(table_dir, num_buckets)
    # Overwrite mode (the Mongo-sink semantics, kafka_jdd_to_mongo.rs:68-95):
    # rebuild the table from the full replay window, discarding prior
    # buckets — idempotent-by-truncation, but with an atomic manifest swap
    # instead of a drop+insert gap.
    hwm = -1 if mode == "overwrite" else lake.hwm_lsn()
    cut = purge_cut(log_dir)
    if cut > 0 and hwm + 1 < cut:
        # events in (hwm, cut) were retention-purged — replaying would
        # silently rebuild partial state (worst in overwrite/bootstrap,
        # which start from LSN 0)
        raise PurgedLogError(
            f"replay window starts at lsn {hwm + 1} but the log is purged "
            f"below {cut}; bootstrap new tables by cloning a caught-up one"
        )
    epoch = lake.current_epoch() + 1

    def _noop() -> ReplayResult:
        m = lake.manifests.read()
        rows = (
            sum(int(e.get("rows", 0)) + int(e.get("delta_rows", 0)) for e in m["buckets"].values())
            if m
            else 0
        )
        return ReplayResult(
            False, lake.current_epoch(), hwm, rows_total=rows,
            wall_seconds=time.perf_counter() - t0,
        )

    txn_log = log_has_txns(log_dir)
    txn_cut = None
    if atomic_txns and txn_log:
        txn_cut = safe_txn_cut(log_dir, hwm, target_lsn)
        if txn_cut is None or txn_cut <= hwm:
            return _noop()
        target_lsn = txn_cut

    segs = select_segments(log_dir, hwm, target_lsn)
    if not segs:
        return _noop()

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if override_num_blocks is None:
        # LSNs are globally dense, so the global LSN span bounds the row
        # count (per-segment ranges overlap across log partitions and
        # would overcount). Size blocks to ~150k rows, at least one per
        # CPU — hundreds of tiny segment blocks would otherwise explode
        # the exchange into blocks x partitions micro-files.
        est_rows = max(s.lsn_max for s in segs) - min(s.lsn_min for s in segs) + 1
        # round up to a multiple of the CPU count: 34 blocks on 32 CPUs
        # means one full wave plus a 2-task straggler wave (~half the
        # fleet idle); k x cpus blocks keeps waves even
        waves = max(1, -(-est_rows // (150_000 * cpus)))
        override_num_blocks = cpus * waves
    ds = read_event_log(log_dir, lsn_from=hwm, lsn_to=target_lsn, override_num_blocks=override_num_blocks)
    if txn_log:
        ds = ds.map_batches(
            strip_txn_envelope, batch_format="pyarrow", zero_copy_batch=True
        )
    qdir = None
    if quarantine:
        # dead-letter split BEFORE normalize: structurally-broken rows
        # (null key / unknown op / null LSN) would poison the transform
        # chain and the merge; divert them with a reason instead
        qdir = os.path.join(table_dir, "quarantine", f"epoch-{epoch}")
        validator = quarantine if callable(quarantine) else default_event_validator
        ds = ds.map_batches(
            make_quarantine_splitter(qdir, validator),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if normalize is not None:
        # a TransformChain, a column->transform mapping, or any
        # batch -> batch callable (e.g. a curation stage)
        if isinstance(normalize, dict):
            normalize = TransformChain(normalize)
        ds = ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    staging = lake.staging_dir(epoch)
    if shuffle == "disk":
        # Explicit disk-partitioned exchange: map tasks spill per-exchange-
        # partition partials, then one independent Ray task per partition
        # folds its lake buckets. No aggregator actor pool (Ray's hash
        # shuffle routes all data through num_partitions actors, which
        # measurably bottlenecks the pipeline) and both sides scale
        # linearly with CPUs. The shuffle dir lives under the epoch's
        # staging dir; a crashed attempt is wiped on the next replay of the
        # same epoch, keeping retries exactly-once.
        import shutil as _shutil

        if shuffle_partitions is None:
            shuffle_partitions = max(2, min(lake.num_buckets, cpus))
        # The exchange spill is TRANSIENT (wiped before and after the
        # epoch; commit atomicity lives in the manifest, not here), so it
        # can sit on node-local fast storage instead of the table's
        # filesystem: set ETL_RS_RAY_SHUFFLE_BASE (e.g. /dev/shm or a
        # local NVMe mount) to take lake-directory disk out of the
        # shuffle path. Unique per staging dir so concurrent replays of
        # different tables/epochs never collide.
        base = os.environ.get("ETL_RS_RAY_SHUFFLE_BASE")
        if base:
            import hashlib as _hashlib

            tag = _hashlib.sha1(staging.encode()).hexdigest()[:16]
            shuffle_dir = os.path.join(base, f"etl_rs_ray_shuffle_{tag}")
        elif fs.is_uri(staging):
            # remote table (object store): the transient spill must NOT
            # round-trip through the remote store — keep it node-local
            import hashlib as _hashlib
            import tempfile as _tempfile

            tag = _hashlib.sha1(staging.encode()).hexdigest()[:16]
            shuffle_dir = os.path.join(
                _tempfile.gettempdir(), f"etl_rs_ray_shuffle_{tag}"
            )
        else:
            shuffle_dir = os.path.join(staging, "_shuffle")
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)
        spill_ds = ds.map_batches(
            make_spiller(shuffle_dir, shuffle_partitions, lake.num_buckets,
                         chaos_dir=chaos_dir),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
        t_spill0 = time.perf_counter()
        spilled = spill_ds.take_all()
        t_spill = time.perf_counter() - t_spill0
        if os.environ.get("ETL_RS_RAY_STATS"):
            print(spill_ds.stats())
        events_read = sum(int(r["raw_events"]) for r in spilled)
        plans: dict[int, list[tuple[str, int, int]]] = {}
        for r in spilled:
            plans.setdefault(int(r["xpart"]), []).append(
                (r["file"], int(r["rg"]), int(r["rg_start"]))
            )
        if not plans:
            return _noop()
        bucket_files = lake.bucket_file_sets() if mode == "upsert" else {}
        merge_task = ray.remote(num_cpus=1)(_merge_xpart_task)
        t_merge0 = time.perf_counter()
        futs = [
            merge_task.remote(
                shuffle_dir, plans[x], bucket_files, staging,
                delta=(mode == "delta"),
                fold_rows=int(os.environ.get("ETL_RS_RAY_FOLD_ROWS", 512 * 1024)),
                chaos_dir=chaos_dir,
                chaos_key=str(x),
            )
            for x in sorted(plans)
        ]
        entries = [e for sub in ray.get(futs) for e in sub]
        t_merge = time.perf_counter() - t_merge0
        phase_secs = {"spill": round(t_spill, 3), "merge": round(t_merge, 3)}
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
    else:
        # Ray-native hash-shuffle groupby (kept for comparison / small jobs).
        # Hash (not range-sort) shuffle: the sort strategy can split a
        # low-cardinality group across blocks and map_groups applies the
        # UDF per block — silent data loss.
        from ray.data.context import ShuffleStrategy

        ds = ds.map_batches(
            make_precompact(lake.num_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
        events_read = None
        merger = make_bucket_merger(staging, lake.bucket_file_sets() if mode == "upsert" else {})
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        if shuffle_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            shuffle_partitions = max(2, min(lake.num_buckets, cpus))
        entries_ds = ds.groupby("bucket", num_partitions=shuffle_partitions).map_groups(
            merger, batch_format="pyarrow"
        )
        entries = entries_ds.take_all()  # tiny: one row per touched bucket
        phase_secs = {}
        seen = [int(e["bucket"]) for e in entries]
        if len(seen) != len(set(seen)):
            raise RuntimeError(f"bucket group split across reducers: {sorted(seen)}")

    if not entries:
        return _noop()

    written = {
        int(e["bucket"]): {
            "filename": e["filename"],
            "rows": int(e["rows"]),
            "hwm_lsn": int(e["hwm_lsn"]),
            "stats": {
                "events_in": int(e["events_in"]),
                "superseded_dropped": int(e["superseded_dropped"]),
                "applied_i": int(e["applied_i"]),
                "applied_u": int(e["applied_u"]),
                "applied_d": int(e["applied_d"]),
            },
        }
        for e in entries
    }
    new_hwm = max([hwm] + [w["hwm_lsn"] for w in written.values()])
    q_rows, q_max = quarantine_stats(qdir) if qdir else (0, None)
    if q_max is not None:
        # quarantined events are consumed (terminal): advance the HWM past
        # them so a bad tail isn't re-read on every subsequent replay
        new_hwm = max(new_hwm, q_max)
    if txn_cut is not None:
        # stripped commit markers can sit between the last applied event
        # and the cut; advance the HWM to the cut so the next replay's
        # window starts past them (they apply nothing by definition)
        new_hwm = max(new_hwm, txn_cut)
    elif txn_log:
        # atomic_txns off: markers were stripped with no cut to advance
        # to. A marker whose LSN sits above the last applied event would
        # otherwise stay above the HWM forever — every later replay
        # re-selects its segment, applies nothing, and commits an empty
        # epoch. Everything in the read window was consumed (applied,
        # superseded, quarantined, or a stripped marker), so the window
        # max is a safe HWM.
        window_max = max(s.lsn_max for s in segs)
        if target_lsn is not None:
            window_max = min(window_max, target_lsn)
        new_hwm = max(new_hwm, window_max)
    merged_in = sum(w["stats"]["events_in"] for w in written.values())
    merge_dropped = sum(w["stats"]["superseded_dropped"] for w in written.values())
    if events_read is None:
        events_read = merged_in
    metrics = {
        "events_read": events_read,
        "events_applied": events_read,
        "combiner_dropped": events_read - merged_in,
        "superseded_dropped": (events_read - merged_in) + merge_dropped,
        "applied_i": sum(w["stats"]["applied_i"] for w in written.values()),
        "applied_u": sum(w["stats"]["applied_u"] for w in written.values()),
        "applied_d": sum(w["stats"]["applied_d"] for w in written.values()),
        "buckets_touched": len(written),
        **({"quarantined": q_rows} if qdir else {}),
        "wall_seconds": round(time.perf_counter() - t0, 3),
        "phase_seconds": phase_secs,
        # max rows any merge task held at once (disk-exchange path only;
        # 0 under the hash-shuffle path, whose merger has no fold loop)
        "peak_fold_rows": max((int(e.get("peak_fold_rows", 0)) for e in entries), default=0),
    }
    lineage = {
        "segments": [s.path for s in segs],
        "lsn_window": [hwm, new_hwm],
        "log_dir": log_dir,
        **({"txn_cut": txn_cut} if txn_cut is not None else {}),
    }
    committed = lake.commit_epoch(epoch, written, new_hwm, metrics, lineage, mode=mode)
    rows_total = sum(
        int(e.get("rows", 0)) + int(e.get("delta_rows", 0))
        for e in lake.manifests.read()["buckets"].values()
    )
    return ReplayResult(
        committed=committed,
        epoch=lake.current_epoch(),
        hwm_lsn=lake.hwm_lsn(),
        events_applied=metrics["events_applied"],
        rows_total=rows_total,
        buckets_touched=len(written),
        metrics=metrics,
        wall_seconds=time.perf_counter() - t0,
    )


def expire_before(
    log_dir: str,
    table_dir: str,
    before_lsn: int,
    *,
    num_partitions: int | None = None,
    num_buckets: int = 64,
) -> dict:
    """Retention / right-to-erasure THROUGH the log: tombstone every
    live key whose current version predates ``before_lsn``. Erasure is
    never an in-place mutation — op=D events with fresh LSNs are
    appended to the log and applied as an ordinary exactly-once delta
    epoch, so the deletion is auditable, replayable, and resumable like
    any other change. Re-running is a no-op (the expired keys are no
    longer live).

    The expired key set rides through the driver here (selected columns
    only, collected as Arrow blocks — no per-row Python objects); at an
    expired share where that matters, assign per-partition LSN ranges
    from per-bucket counts in a first pass and write the tombstone
    segments from the snapshot tasks themselves.
    """
    import ray

    from ..sources.event_log import EventLogWriter, list_segments, next_lsn
    from ..sources.lake import LakeTable

    # catch the table up to the log head FIRST: selecting expired keys
    # from a stale snapshot would tombstone a key whose newer version
    # (past the cut) is still sitting unapplied in the log — the delete
    # would then outrank that update and over-delete
    replay(log_dir, table_dir, num_buckets=num_buckets, mode="delta")
    lake = LakeTable(table_dir, num_buckets)
    snap = lake.snapshot(columns=["repo", "path", "commit", "lang", "lsn"])

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b.column("lsn"), before_lsn)).select(
            ["repo", "path", "commit", "lang"]
        )

    blocks = [
        t for t in ray.get(
            snap.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    expired = (
        pa.concat_tables(blocks, promote_options="permissive")
        if blocks
        else pa.table({c: pa.array([], pa.string()) for c in ["repo", "path", "commit", "lang"]})
    )
    segs = list_segments(log_dir)
    base = next_lsn(log_dir)
    if num_partitions is None:
        # tombstones must follow the LOG's key->partition layout, or a
        # key's delete lands in a different partition than its history
        num_partitions = max((s.partition for s in segs), default=7) + 1
    if expired.num_rows:
        n = expired.num_rows
        events = pa.table(
            {
                "lsn": pa.array(range(base, base + n), pa.int64()),
                "op": pa.array(["D"] * n, pa.string()),
                "repo": expired.column("repo"),
                "path": expired.column("path"),
                "commit": expired.column("commit"),
                "lang": expired.column("lang"),
                "content": pa.nulls(n, pa.string()),
            }
        )
        EventLogWriter(log_dir, num_partitions).write(events)
    result = replay(log_dir, table_dir, num_buckets=num_buckets, mode="delta")
    return {
        "expired": expired.num_rows,
        "tombstone_lsn_first": base if expired.num_rows else None,
        "committed": result.committed,
        "rows_total": result.rows_total,
    }


def cascade_changes(
    table_dir: str,
    out_log: str,
    *,
    num_partitions: int = 4,
    to_epoch: int | None = None,
) -> dict:
    """CDC fan-out: materialize a table's change feed as a NEW event log
    so downstream tables can tail a DERIVED table exactly like a source —
    the building block for table DAGs (bronze -> silver -> gold), each
    hop an ordinary exactly-once ``replay``.

    Incremental: a ``CASCADE_STATE`` checkpoint in the out log records the
    last exported source epoch; each call exports only
    ``changes(last, head)`` — cost tracks |changes|, never table size —
    and assigns fresh monotonic LSNs (the downstream log has its own LSN
    space; ``next_lsn`` keeps successive exports ordered). The feed
    carries at most one row per key with ABSOLUTE new state, so a crash
    between segment write and checkpoint write only re-exports a window
    whose re-application is LWW-idempotent downstream (at-least-once
    export, exactly-once effect).

    The feed is ordered deterministically (change_lsn, then key) before
    LSN assignment. The feed rides through the driver here (one row per
    changed key, selected columns); a 100-TB hop would assign per-bucket
    LSN ranges from per-bucket change counts and write segments from the
    diff tasks themselves — same pattern as ``expire_before``'s note."""
    from ..sources.event_log import EventLogWriter, next_lsn
    from ..sources.lake import LakeTable

    lake = LakeTable(table_dir)
    head = lake.current_epoch() if to_epoch is None else int(to_epoch)
    state_path = fs.join(out_log, "CASCADE_STATE")
    try:
        st = fs.read_json(state_path)
        last: int | None = int(st["last_epoch"])
    except FileNotFoundError:
        st, last = {}, None
    if last is not None and head <= last:
        return {"exported": 0, "from_epoch": last, "to_epoch": head, "noop": True}

    feed_ds = lake.changes(last, head)
    feed_schema = feed_ds.schema()
    feed_types = dict(zip(feed_schema.names, feed_schema.types)) if feed_schema else {}
    feed = feed_ds.take_all()
    keys = ("repo", "path", "commit")
    feed.sort(key=lambda r: (r["change_lsn"], tuple(r[k] for k in keys)))

    base = next_lsn(out_log)
    payload = [
        c for c in (feed[0].keys() if feed else [])
        if c not in keys and c not in ("op", "change_lsn")
    ]
    rows = pa.table(
        {
            "lsn": pa.array(range(base, base + len(feed)), pa.int64()),
            "op": pa.array([r["op"] for r in feed], pa.string()),
            **{k: pa.array([r[k] for r in feed], pa.string()) for k in keys},
            # explicit types from the feed schema: an all-delete window
            # carries entirely-null payload columns, which bare inference
            # would type as null and break downstream unification
            **{
                c: pa.array([r[c] for r in feed], type=feed_types.get(c))
                for c in payload
            },
        }
    ) if feed else None
    written = 0
    if rows is not None and rows.num_rows:
        EventLogWriter(out_log, num_partitions=num_partitions).write(rows)
        written = rows.num_rows
    fs.makedirs(out_log)
    fs.write_json_atomic(
        state_path,
        dict(st, source=table_dir, last_epoch=head),
    )
    return {"exported": written, "from_epoch": last, "to_epoch": head}
