"""Transactional (BEGIN..COMMIT) replay atomicity.

The binlog rule: events belong to transactions; replay may only apply a
prefix of the log that never splits a transaction. An open transaction
at the tail (producer crash — its commit marker never landed) is held
back IN FULL and applies on a later replay once the marker arrives,
with exactly-once accounting intact throughout.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_rs_ray.datagen import attach_txns, generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import (
    EventLogWriter,
    log_has_txns,
    next_lsn,
    read_event_log_table,
    safe_txn_cut,
    strip_txn_envelope,
)
from etl_rs_ray.sources.lake import LakeTable


def _events(n_files=400, txn_frac=0.4, open_tail=False, seed=7):
    repos = generate_repos(n_files=n_files, seed=seed)
    return generate_events(
        repos, seed=seed, txn_frac=txn_frac, open_tail=open_tail, dup_frac=0.05
    )




# --- attach_txns invariants ---------------------------------------------------


def test_attach_txns_dense_lsns_and_commit_after_members():
    repos = generate_repos(n_files=300, seed=3)
    ev = generate_events(repos, seed=3, dup_frac=0.0)
    t = attach_txns(ev, txn_frac=0.5, seed=3)
    lsns = t.column("lsn").to_pylist()
    assert lsns == list(range(len(lsns))), "LSNs must stay dense after splicing"
    # every txn's commit marker sits above all of its member events
    txn = {}
    for lsn, op, tid in zip(lsns, t.column("op").to_pylist(), t.column("txn_id").to_pylist()):
        if tid is None:
            continue
        lo, hi, c = txn.get(tid, (None, None, None))
        if op == "C":
            txn[tid] = (lo, hi, lsn)
        else:
            txn[tid] = (lsn if lo is None else lo, lsn, c)
    assert txn, "expected transactions"
    for tid, (lo, hi, c) in txn.items():
        assert c is not None, f"txn {tid} missing commit marker"
        assert c > hi >= lo >= 0
    # payload identical to the untransacted log (same multiset of rows)
    stripped = strip_txn_envelope(t)
    assert stripped.num_rows == ev.num_rows
    a = sorted(zip(ev.column("op").to_pylist(), ev.column("commit").to_pylist()))
    b = sorted(zip(stripped.column("op").to_pylist(), stripped.column("commit").to_pylist()))
    assert a == b


def test_attach_txns_open_tail_drops_last_commit_only():
    repos = generate_repos(n_files=300, seed=5)
    ev = generate_events(repos, seed=5, dup_frac=0.0)
    closed = attach_txns(ev, txn_frac=0.5, seed=5)
    opened = attach_txns(ev, txn_frac=0.5, open_tail=True, seed=5)
    n_c_closed = pc.sum(pc.equal(closed.column("op"), "C").cast(pa.int64())).as_py()
    n_c_open = pc.sum(pc.equal(opened.column("op"), "C").cast(pa.int64())).as_py()
    assert n_c_open == n_c_closed - 1


# --- safe_txn_cut -------------------------------------------------------------


def test_safe_cut_full_when_all_committed(tmp_path, ray_session):
    log = str(tmp_path / "log")
    ev = _events(open_tail=False)
    write_event_log(ev, log, num_partitions=4)
    assert log_has_txns(log)
    cut = safe_txn_cut(log)
    assert cut == max(ev.column("lsn").to_pylist())


def test_safe_cut_holds_back_open_txn(tmp_path, ray_session):
    log = str(tmp_path / "log")
    ev = _events(open_tail=True)
    write_event_log(ev, log, num_partitions=4)
    cut = safe_txn_cut(log)
    # the open txn: txn_ids with no C row
    tid_all = set(
        t for t, in zip(ev.column("txn_id").to_pylist()) if t is not None
    )
    committed = set(
        t
        for t, op in zip(ev.column("txn_id").to_pylist(), ev.column("op").to_pylist())
        if t is not None and op == "C"
    )
    open_tids = tid_all - committed
    assert len(open_tids) == 1
    (open_tid,) = open_tids
    open_lsns = [
        l
        for l, t, op in zip(
            ev.column("lsn").to_pylist(),
            ev.column("txn_id").to_pylist(),
            ev.column("op").to_pylist(),
        )
        if t == open_tid and op != "C"
    ]
    assert cut == min(open_lsns) - 1, "cut must sit just below the open txn's first event"


def test_safe_cut_no_txn_column_is_passthrough(tmp_path, ray_session):
    log = str(tmp_path / "log")
    repos = generate_repos(n_files=100, seed=11)
    ev = generate_events(repos, seed=11)  # no txn column
    write_event_log(ev, log, num_partitions=2)
    assert not log_has_txns(log)
    assert safe_txn_cut(log) == max(ev.column("lsn").to_pylist())
    assert safe_txn_cut(log, lsn_to=50) == 50


# --- atomic replay ------------------------------------------------------------


def test_atomic_replay_holds_back_and_catches_up(tmp_path, ray_session):
    log = str(tmp_path / "log")
    ev = _events(open_tail=True)
    write_event_log(ev, log, num_partitions=4)
    cut = safe_txn_cut(log)

    table = str(tmp_path / "t")
    r1 = replay(log, table, num_buckets=8, atomic_txns=True)
    assert r1.committed
    assert r1.hwm_lsn == cut, "HWM must stop at the safe cut"

    # reference state: apply the stripped payload with lsn <= cut
    want1 = _lww(strip_txn_envelope(ev), cut)
    got1 = LakeTable(table, 8).snapshot_table().select(want1.column_names)
    _assert_same_rows(got1, want1)

    # the commit marker lands -> held-back events now apply
    open_tid = _open_txn_id(ev)
    lsn = next_lsn(log)
    commit_row = pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array(["C"], pa.string()),
            "repo": pa.array([None], pa.string()),
            "path": pa.array([None], pa.string()),
            "commit": pa.array([None], pa.string()),
            "lang": pa.array([None], pa.string()),
            "content": pa.array([None], pa.string()),
            "txn_id": pa.array([open_tid], pa.string()),
        }
    )
    EventLogWriter(log, num_partitions=4).write(commit_row)

    r2 = replay(log, table, num_buckets=8, atomic_txns=True)
    assert r2.committed
    assert r2.hwm_lsn == lsn
    want2 = _lww(strip_txn_envelope(ev), None)
    got2 = LakeTable(table, 8).snapshot_table().select(want2.column_names)
    _assert_same_rows(got2, want2)

    # idempotence: nothing new -> no-op commit
    r3 = replay(log, table, num_buckets=8, atomic_txns=True)
    assert not r3.committed


def test_atomic_replay_equals_plain_replay_when_all_committed(tmp_path, ray_session):
    log = str(tmp_path / "log")
    ev = _events(open_tail=False)
    write_event_log(ev, log, num_partitions=4)

    t_atomic = str(tmp_path / "ta")
    t_plain = str(tmp_path / "tp")
    ra = replay(log, t_atomic, num_buckets=8, atomic_txns=True)
    rp = replay(log, t_plain, num_buckets=8)
    assert ra.committed and rp.committed
    a = LakeTable(t_atomic, 8).snapshot_table()
    p = LakeTable(t_plain, 8).snapshot_table()
    _assert_same_rows(a.select(sorted(a.column_names)), p.select(sorted(a.column_names)))


def test_commit_markers_never_reach_the_table(tmp_path, ray_session):
    log = str(tmp_path / "log")
    ev = _events(open_tail=False)
    write_event_log(ev, log, num_partitions=4)
    table = str(tmp_path / "t")
    replay(log, table, num_buckets=8)  # even WITHOUT atomic_txns
    snap = LakeTable(table, 8).snapshot_table()
    assert "txn_id" not in snap.column_names
    assert snap.num_rows == pc.sum(
        pc.cast(pc.is_valid(snap.column("repo")), pa.int64())
    ).as_py(), "no null-key commit-marker rows in the table"


# --- helpers ------------------------------------------------------------------


def _open_txn_id(ev: pa.Table) -> str:
    tids = ev.column("txn_id").to_pylist()
    ops = ev.column("op").to_pylist()
    all_t = {t for t in tids if t is not None}
    done = {t for t, op in zip(tids, ops) if t is not None and op == "C"}
    (tid,) = all_t - done
    return tid


def _lww(stripped: pa.Table, upto: int | None) -> pa.Table:
    """Driver-side last-writer-wins oracle over the stripped payload."""
    t = stripped
    if upto is not None:
        t = t.filter(pc.less_equal(t.column("lsn"), upto))
    t = t.sort_by([("repo", "ascending"), ("path", "ascending"), ("commit", "ascending"), ("lsn", "descending")])
    import numpy as np

    keys = list(zip(t.column("repo").to_pylist(), t.column("path").to_pylist(), t.column("commit").to_pylist()))
    seen, idx = set(), []
    for i, k in enumerate(keys):
        if k not in seen:
            seen.add(k)
            idx.append(i)
    t = t.take(pa.array(idx))
    t = t.filter(pc.not_equal(t.column("op"), "D"))
    return t.select(["repo", "path", "commit", "lang", "content", "lsn"])


def _assert_same_rows(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    cols = sorted(want.column_names)
    g = sorted(zip(*[got.column(c).to_pylist() for c in cols]))
    w = sorted(zip(*[want.column(c).to_pylist() for c in cols]))
    assert g == w


def test_streaming_tail_atomic_txns(tmp_path, ray_session):
    """The actor-pool tail honors the same safe cut: an open txn at the
    log tail is held back, and applies after its commit marker lands."""
    from etl_rs_ray.stages.streaming import StreamingMerge

    log = str(tmp_path / "log")
    ev = _events(open_tail=True)
    write_event_log(ev, log, num_partitions=4)
    cut = safe_txn_cut(log)

    sm = StreamingMerge(num_partitions=4)
    try:
        st = sm.tail(log, atomic_txns=True)
        assert st["hwm"] <= cut
        want1 = _lww(strip_txn_envelope(ev), cut)
        snap1 = sm.snapshot()
        live1 = snap1.filter(pc.not_equal(snap1.column("op"), "D"))
        assert live1.num_rows == want1.num_rows

        open_tid = _open_txn_id(ev)
        lsn = next_lsn(log)
        commit_row = pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["C"], pa.string()),
                "repo": pa.array([None], pa.string()),
                "path": pa.array([None], pa.string()),
                "commit": pa.array([None], pa.string()),
                "lang": pa.array([None], pa.string()),
                "content": pa.array([None], pa.string()),
                "txn_id": pa.array([open_tid], pa.string()),
            }
        )
        EventLogWriter(log, num_partitions=4).write(commit_row)
        sm.tail(log, lsn_from=st["hwm"], atomic_txns=True)
        want2 = _lww(strip_txn_envelope(ev), None)
        snap2 = sm.snapshot()
        live2 = snap2.filter(pc.not_equal(snap2.column("op"), "D"))
        assert live2.num_rows == want2.num_rows
    finally:
        sm.shutdown()


def test_mid_stream_txn_adoption(tmp_path, ray_session):
    """A log whose OLD segments predate the envelope (no txn_id column)
    and whose new segments carry it: the safe cut still holds back the
    open txn, and replay handles the mixed segment schemas."""
    log = str(tmp_path / "log")
    repos = generate_repos(n_files=300, seed=41)
    plain = generate_events(repos, seed=41, dup_frac=0.0)  # 7-column schema
    write_event_log(plain, log, num_partitions=4)
    assert not log_has_txns(log)

    # new era: transactional events appended after the plain tail
    repos2 = generate_repos(n_files=80, seed=43)
    ev2 = generate_events(repos2, seed=43, dup_frac=0.0)
    ev2 = attach_txns(ev2, txn_frac=0.5, open_tail=True, seed=43)
    base = next_lsn(log)
    ev2 = ev2.set_column(
        0, "lsn", pc.add(ev2.column("lsn"), base)
    )
    EventLogWriter(log, num_partitions=4).write(ev2)
    assert log_has_txns(log)

    cut = safe_txn_cut(log)
    open_tid = _open_txn_id(ev2)
    open_min = min(
        l
        for l, t, op in zip(
            ev2.column("lsn").to_pylist(),
            ev2.column("txn_id").to_pylist(),
            ev2.column("op").to_pylist(),
        )
        if t == open_tid and op != "C"
    )
    assert cut == open_min - 1

    table = str(tmp_path / "t")
    res = replay(log, table, num_buckets=8, atomic_txns=True)
    assert res.committed and res.hwm_lsn == cut
    # full payload below the cut applied (old era entirely, new era prefix)
    both = pa.concat_tables(
        [
            plain.append_column("txn_id", pa.nulls(plain.num_rows, pa.string())),
            ev2,
        ]
    )
    want = _lww(strip_txn_envelope(both), cut)
    got = LakeTable(table, 8).snapshot_table().select(want.column_names)
    _assert_same_rows(got, want)


def test_attach_txns_property_sweep():
    """Hypothesis sweep over sizes/fractions/seeds: the envelope always
    preserves the payload multiset, keeps LSNs dense, and puts every
    commit marker strictly above its members."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n_files=st.integers(5, 120),
        txn_frac=st.floats(0.05, 0.9),
        lo=st.integers(2, 3),
        span=st.integers(0, 4),
        open_tail=st.booleans(),
        seed=st.integers(0, 10_000),
    )
    def check(n_files, txn_frac, lo, span, open_tail, seed):
        repos = generate_repos(n_files=n_files, seed=seed)
        ev = generate_events(repos, seed=seed, dup_frac=0.0)
        t = attach_txns(
            ev, txn_frac=txn_frac, txn_len=(lo, lo + span), open_tail=open_tail, seed=seed
        )
        lsns = t.column("lsn").to_pylist()
        if open_tail:
            # the dropped commit marker leaves exactly one LSN gap (an
            # aborted WAL reservation) — otherwise dense and increasing
            assert sorted(lsns) == lsns
            assert len(set(lsns)) == len(lsns)
            full = set(range(max(lsns) + 1)) if lsns else set()
            assert len(full - set(lsns)) <= 1
        else:
            assert lsns == list(range(len(lsns)))
        stripped = strip_txn_envelope(t)
        assert stripped.num_rows == ev.num_rows
        a = sorted(
            zip(ev.column("op").to_pylist(), ev.column("commit").to_pylist(),
                ev.column("content").to_pylist())
        )
        b = sorted(
            zip(stripped.column("op").to_pylist(), stripped.column("commit").to_pylist(),
                stripped.column("content").to_pylist())
        )
        assert a == b
        # commit marker strictly above members; at most one open txn
        spans = {}
        for lsn, op, tid in zip(
            lsns, t.column("op").to_pylist(), t.column("txn_id").to_pylist()
        ):
            if tid is None:
                continue
            lo_, hi_, c_ = spans.get(tid, (None, None, None))
            if op == "C":
                spans[tid] = (lo_, hi_, lsn)
            else:
                spans[tid] = (lsn if lo_ is None else lo_, lsn, c_)
        opens = 0
        for tid, (lo_, hi_, c_) in spans.items():
            assert lo_ is not None, f"txn {tid} has a marker but no members"
            if c_ is None:
                opens += 1
            else:
                assert c_ > hi_
        assert opens == (1 if (open_tail and spans) else 0)

    check()


# --- footer txn digest (r5) ---------------------------------------------------


def _strip_digests(log_dir: str) -> None:
    """Rewrite every segment without the footer digest — simulates a
    foreign / pre-digest log so the full-scan fallback runs."""
    from etl_rs_ray.sources.event_log import TXN_DIGEST_KEY

    for root, _, files in os.walk(log_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                t = pq.read_table(p)
                meta = dict(t.schema.metadata or {})
                if TXN_DIGEST_KEY in meta:
                    del meta[TXN_DIGEST_KEY]
                pq.write_table(t.replace_schema_metadata(meta), p)


def test_segments_carry_txn_digest(tmp_path, ray_session):
    from etl_rs_ray.sources.event_log import list_segments, read_txn_digest

    log = str(tmp_path / "log")
    write_event_log(_events(open_tail=True), log, num_partitions=3)
    segs = list_segments(log)
    assert segs
    digs = [read_txn_digest(pq.ParquetFile(s.path)) for s in segs]
    assert all(d is not None for d in digs)
    # the open tail txn must appear in some segment's opens
    assert any(d["opens"] for d in digs)
    # committed markers are hashed into the commit index
    assert any(d["cmh"] for d in digs)


@pytest.mark.parametrize("seed,open_tail", [(3, True), (4, False), (5, True)])
def test_safe_cut_digest_path_matches_full_scan(tmp_path, ray_session, seed, open_tail):
    """The footer-digest fast path must return the IDENTICAL cut the
    original full scan returns — over full-history calls, windowed calls
    whose bounds straddle segments mid-file (digest disabled for the
    straddlers), and the foreign-log fallback."""
    ev = _events(n_files=300, open_tail=open_tail, seed=seed)
    log = str(tmp_path / f"log{seed}")
    # small segments so windows straddle several files
    write_event_log(ev, log, num_partitions=3, events_per_segment=120)
    plain = str(tmp_path / f"plain{seed}")
    write_event_log(ev, plain, num_partitions=3, events_per_segment=120)
    _strip_digests(plain)

    max_lsn = max(ev.column("lsn").to_pylist())
    windows = [
        (None, None),
        (None, max_lsn // 2),
        (max_lsn // 3, None),
        (max_lsn // 3, 2 * max_lsn // 3),
        (-1, max_lsn),
    ]
    for lsn_from, lsn_to in windows:
        got = safe_txn_cut(log, lsn_from, lsn_to)
        want = safe_txn_cut(plain, lsn_from, lsn_to)
        assert got == want, f"window ({lsn_from}, {lsn_to}]: digest {got} != scan {want}"


def test_safe_cut_marker_in_digested_segment_events_in_straddler(tmp_path, ray_session):
    """Regression for the nomination logic: a txn whose EVENTS sit in a
    window-straddling segment (scanned) but whose COMMIT MARKER sits in
    a fully-digested segment must still be seen as committed — the
    confirm scan has to be nominated from phase-A candidates, not only
    from digest opens (otherwise the cut regresses below the committed
    txn and replay stops making progress)."""
    rows = []
    # txn tx1: events at lsn 0,1 — marker at lsn 5 (different file)
    for lsn, op, txn in [
        (0, "I", "tx1"), (1, "U", "tx1"), (2, "I", None), (3, "I", None),
        (4, "I", None), (5, "C", "tx1"), (6, "I", None), (7, "I", None),
    ]:
        rows.append({
            "lsn": lsn, "op": op, "repo": "r", "path": f"p{lsn}",
            "commit": "c", "lang": "py", "content": "x", "txn_id": txn,
        })
    ev = pa.Table.from_pylist(rows)
    log = str(tmp_path / "log")
    # one partition, 4-row segments: [0..3] and [4..7]
    write_event_log(ev, log, num_partitions=1, events_per_segment=4)
    # window starts INSIDE the first segment -> it is a straddler (no
    # digest), while the marker's segment [4..7] stays fully digested
    assert safe_txn_cut(log, lsn_from=-1, lsn_to=7) == 7
    assert safe_txn_cut(log, lsn_from=0, lsn_to=7) == 7
