"""North-star composition drill: every round-4 CDC feature in ONE flow.

A transactional log with an open tail AND structurally-broken events is
replayed with curation, atomicity and quarantine all on; the table is
branched, the branch diverges, and digests/changes/fsck stay coherent
throughout. Pins the ORDER of the stages (txn strip → quarantine →
curate) and that the features compose rather than merely coexist.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc

from etl_rs_ray.datagen import attach_txns, generate_events, generate_repos, write_event_log
from etl_rs_ray.pipelines.cdc import curate_batch, replay, replay_plan
from etl_rs_ray.sources.event_log import EventLogWriter, next_lsn, safe_txn_cut
from etl_rs_ray.sources.lake import LakeTable


def _bad_row(lsn: int) -> pa.Table:
    return pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array(["X"], pa.string()),  # bad_op -> quarantine
            "repo": pa.array(["org0/p"], pa.string()),
            "path": pa.array(["junk.py"], pa.string()),
            "commit": pa.array(["c" * 40], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["junk"], pa.string()),
            "txn_id": pa.array([None], pa.string()),
        }
    )


def test_full_cdc_composition(tmp_path, ray_session):
    # 1. transactional log with an open tail + one malformed event INSIDE
    #    the committed prefix
    repos = generate_repos(n_files=400, seed=53)
    ev = generate_events(repos, seed=53, dup_frac=0.05, txn_frac=0.4, open_tail=True)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=4)
    cut = safe_txn_cut(log)
    bad_lsn = cut // 2
    # splice the malformed row at a fresh LSN below the cut is impossible
    # (dense); append it above the log head instead — it lands beyond the
    # open txn, so the atomic cut must still hold everything back
    tail_bad = next_lsn(log)
    EventLogWriter(log, num_partitions=4).write(_bad_row(tail_bad))

    table = str(tmp_path / "t")
    plan = replay_plan(log, table, num_buckets=8, atomic_txns=True)
    assert plan["txn_cut"] == cut, "a junk row above the open txn cannot move the cut"

    # 2. atomic + quarantine + curate replay
    res = replay(
        log, table, num_buckets=8, atomic_txns=True, quarantine=True,
        normalize=curate_batch,
    )
    assert res.committed
    assert res.hwm_lsn == cut, "quarantine HWM advance must not leap the txn cut"
    # the junk row sits ABOVE the cut -> not consumed, not quarantined yet
    assert res.metrics.get("quarantined", 0) == 0

    lake = LakeTable(table, 8)
    snap = lake.snapshot_table()
    assert "lang_pred" in snap.column_names, "curation ran"
    assert "txn_id" not in snap.column_names
    assert lake.fsck()["ok"]

    # 3. commit marker lands -> catch-up replay applies the held txn AND
    #    quarantines the junk row it now passes over
    tids = ev.column("txn_id").to_pylist()
    ops = ev.column("op").to_pylist()
    open_tid = ({t for t in tids if t is not None}
                - {t for t, o in zip(tids, ops) if t is not None and o == "C"}).pop()
    lsn = next_lsn(log)
    EventLogWriter(log, num_partitions=4).write(
        pa.table(
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
    )
    res2 = replay(
        log, table, num_buckets=8, atomic_txns=True, quarantine=True,
        normalize=curate_batch,
    )
    assert res2.committed
    assert res2.hwm_lsn == lsn
    assert res2.metrics["quarantined"] == 1
    qdir = os.path.join(table, "quarantine", f"epoch-{res2.epoch}")
    assert os.path.isdir(qdir)

    # final state equals a clean one-shot replay of the same log
    oneshot = str(tmp_path / "os")
    r3 = replay(log, oneshot, num_buckets=8, atomic_txns=True, quarantine=True,
                normalize=curate_batch)
    assert r3.committed
    a = LakeTable(table, 8).snapshot_table()
    b = LakeTable(oneshot, 8).snapshot_table()
    cols = sorted(set(a.column_names) & set(b.column_names))
    ra = sorted(zip(*[a.column(c).to_pylist() for c in cols]), key=repr)
    rb = sorted(zip(*[b.column(c).to_pylist() for c in cols]), key=repr)
    assert ra == rb

    # 4. branch the table, diverge the branch, digests disagree only then
    branch = str(tmp_path / "branch")
    LakeTable(table).clone_to(branch)
    assert LakeTable(branch).bucket_digests() == LakeTable(table).bucket_digests()

    upd = pa.table(
        {
            "lsn": pa.array([next_lsn(log)], pa.int64()),
            "op": pa.array(["I"], pa.string()),
            "repo": pa.array(["orgB/only"], pa.string()),
            "path": pa.array(["b.py"], pa.string()),
            "commit": pa.array(["b" * 40], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["branch divergence"], pa.string()),
            "txn_id": pa.array([None], pa.string()),
        }
    )
    EventLogWriter(log, num_partitions=4).write(upd)
    rb2 = replay(log, branch, num_buckets=8, atomic_txns=True, quarantine=True,
                 normalize=curate_batch)
    assert rb2.committed
    da = LakeTable(table).bucket_digests()
    db = LakeTable(branch).bucket_digests()
    assert da != db
    diverged = [k for k in db if db[k] != da.get(k)]
    assert len(diverged) == 1, "one new key -> exactly one diverging bucket"
    assert LakeTable(branch).fsck()["ok"]
    assert LakeTable(table).fsck()["ok"]


def test_lifecycle_ops_composition(tmp_path, ray_session):
    """The late-r5 operational surface in ONE flow: tag an epoch, diverge,
    maintain (compact + shrink), restore back through the tag, purge the
    applied log, converge forward again, vacuum against the tag anchor —
    deep fsck green throughout."""
    from etl_rs_ray.sources.event_log import PurgedLogError, purge_log

    repos = generate_repos(n_files=500, seed=61)
    ev = generate_events(repos, update_frac=0.5, delete_frac=0.1, seed=61)
    log = str(tmp_path / "log")
    write_event_log(ev, log, num_partitions=3, events_per_segment=100)
    # NOT the last row's lsn: the tail rows are duplicate re-deliveries
    # carrying their original (smaller) LSNs
    max_lsn = int(pc.max(ev.column("lsn")).as_py())
    table = str(tmp_path / "t")

    # epoch 0 at the midpoint; tag it
    assert replay(log, table, target_lsn=max_lsn // 2, num_buckets=64).committed
    lake = LakeTable(table)
    lake.tag_epoch("mid")
    state_mid = lake.snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )

    # two delta epochs to the head -> chains + sparse 64-bucket layout
    assert replay(log, table, target_lsn=3 * max_lsn // 4, mode="delta").committed
    assert replay(log, table, mode="delta").committed
    lake = LakeTable(table)
    head_hwm = lake.hwm_lsn()
    assert head_hwm == max_lsn
    state_head = lake.snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )

    # maintain: folds the chains and halves the sparse layout
    out = lake.maintain(max_delta_depth=0)
    ops = [a["op"] for a in out["actions"]]
    assert "compact" in ops and "rebucket" in ops
    lake = LakeTable(table)
    assert lake.num_buckets == 32
    assert lake.fsck(deep=True)["ok"]

    # restore through the tag (crosses the rebucket boundary backwards)
    lake.restore(lake.resolve_tag("mid"))
    lake = LakeTable(table)
    assert lake.num_buckets == 64
    got = lake.snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )
    assert got.equals(state_mid)

    # purge everything the pre-restore head had applied: the rolled-back
    # window is now gone from the log, so catching up must REFUSE...
    purge_log(log, head_hwm + 1, applied_hwm=head_hwm)
    try:
        replay(log, table)
        raise AssertionError("replay over the purged gap must refuse")
    except PurgedLogError:
        pass
    # ...and the documented recovery is restoring forward to a caught-up
    # epoch (the pre-restore head is still retained)
    head_epoch = next(
        e for e in range(lake.current_epoch() - 1, -1, -1)
        if lake.manifests.read(e)["hwm_lsn"] == head_hwm
    )
    lake.restore(head_epoch)
    lake = LakeTable(table)
    got = lake.snapshot_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    )
    assert got.equals(state_head)
    assert replay(log, table).committed is False  # nothing new: no-op

    # vacuum with the tag as anchor: mid stays readable, table intact
    lake.vacuum(keep_epochs=1)
    lake = LakeTable(table)
    assert lake.snapshot_table(
        epoch=lake.resolve_tag("mid")
    ).sort_by(
        [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    ).equals(state_mid)
    assert lake.fsck(deep=True)["ok"]
