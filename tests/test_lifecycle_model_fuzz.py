"""Model-based lifecycle fuzz: random interleavings of the lake's
operational surface — incremental replay (upsert/delta), compact,
rebucket (split + shrink), point lookup, time travel, the change feed,
fsck — checked step-by-step against a plain-dict LWW reference model.

The point is the INTERLEAVINGS: every operator is green in isolation in
its own test file, but the two bugs this suite is modeled on (phantom
D+I pairs in changes() across a rebucket boundary; digest maps
incomparable across layouts) only appear when independent features
compose. A seeded random walk over the op alphabet exercises
compositions no hand-written scenario enumerates.

Determinism: fixed seeds, fixed event universe — failures replay
exactly. Keep the walk short (seconds per seed); depth comes from the
seed matrix, not one long run.
"""

import random
import shutil

import pyarrow as pa
import pytest

from etl_rs_ray.pipelines.cdc import replay
from etl_rs_ray.sources.event_log import EVENT_SCHEMA
from etl_rs_ray.datagen import write_event_log
from etl_rs_ray.sources.lake import LakeTable

KEY_UNIVERSE = [
    (f"org{o}/repo{r}", f"src/f{p}.py", f"c{c}")
    for o in range(2)
    for r in range(2)
    for p in range(8)
    for c in range(2)
]  # 64 keys — small enough that every op touches shared state


def make_log(tmp_path, rng, n_events=480):
    rows = []
    for lsn in range(n_events):
        repo, path, commit = rng.choice(KEY_UNIVERSE)
        op = rng.choices(["I", "U", "D"], weights=[3, 4, 3])[0]
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": None if op == "D" else "py",
                "content": None if op == "D" else f"content-{lsn}",
            }
        )
    events = pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=3)
    return events, rows, log_dir


def model_at(rows, lsn_to):
    """Reference LWW state after applying every event with lsn <= lsn_to."""
    state = {}
    for r in rows:  # rows are already lsn-ordered
        if r["lsn"] > lsn_to:
            break
        k = (r["repo"], r["path"], r["commit"])
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = (r["lsn"], r["content"])
    return state


def lake_state(lake, epoch=None):
    return {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in lake.snapshot_table(epoch=epoch).to_pylist()
    }


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_lifecycle_random_walk_matches_model(tmp_path, ray_session, seed):
    rng = random.Random(seed)
    _, rows, log_dir = make_log(tmp_path, rng)
    max_lsn = rows[-1]["lsn"]
    table_dir = str(tmp_path / "table")

    # first step is always a bootstrap upsert replay of a prefix
    cuts = sorted(rng.sample(range(40, max_lsn), 5)) + [max_lsn]
    cut_iter = iter(cuts)
    applied = next(cut_iter)
    assert replay(log_dir, table_dir, target_lsn=applied, num_buckets=4).committed

    lake = LakeTable(table_dir)
    # epoch -> (model state, hwm at that epoch); every committed epoch is
    # state-checkable until vacuumed
    epoch_model = {lake.current_epoch(): (model_at(rows, applied), applied)}

    def record(state, hwm):
        epoch_model[LakeTable(table_dir).current_epoch()] = (state, hwm)

    # a materialized view rides along for the whole walk: refreshed at
    # random points (arbitrarily many epochs behind, across rebuckets and
    # compactions), it must always equal the model's recompute
    from etl_rs_ray.state.matview import MaterializedView

    view = MaterializedView(str(tmp_path / "view"), table_dir, "lang")

    def check_view():
        view.refresh()
        got = {r["lang"]: r["n"] for r in view.read().to_pylist()}
        cur_state, _ = epoch_model[LakeTable(table_dir).current_epoch()]
        # live rows in this generator all carry lang="py"
        want = {"py": len(cur_state)} if cur_state else {}
        assert got == want, (seed, got, want)

    # a cascaded DOWNSTREAM table also rides the walk: at random steps the
    # change feed since the last export is shipped to a derived log and
    # replayed into a second table, which must then equal the model too —
    # whatever interleaving of compactions, rebuckets, restores and purges
    # produced the feed
    from etl_rs_ray.pipelines.cdc import cascade_changes

    derived_log = str(tmp_path / "dlog")
    derived_table = str(tmp_path / "dtable")

    def check_cascade():
        cascade_changes(table_dir, derived_log)
        replay(derived_log, derived_table, num_buckets=4)
        cur_state, _ = epoch_model[LakeTable(table_dir).current_epoch()]
        got = lake_state(LakeTable(derived_table))
        # downstream rows carry their own LSN space; compare content only
        assert {k: v[1] for k, v in got.items()} == {
            k: v[1] for k, v in cur_state.items()
        }, seed

    ops = ["replay", "compact", "rebucket", "lookup", "time_travel", "changes",
           "fsck", "view_refresh", "purge", "restore", "cascade"]
    weights = [4, 2, 2, 3, 3, 3, 1, 2, 1, 1, 2]
    steps = [rng.choices(ops, weights=weights)[0] for _ in range(14)]
    purged = False

    for step in steps:
        lake = LakeTable(table_dir)
        cur_state, cur_hwm = epoch_model[lake.current_epoch()]

        if step == "replay":
            nxt = next(cut_iter, None)
            if nxt is None:
                res = replay(log_dir, table_dir)  # nothing new: must no-op
                assert not res.committed
                continue
            applied = nxt
            # overwrite rebuilds from the full [0, cut] window and discards
            # prior buckets — the change feed's bucket-emptied branch only
            # triggers through this path. A purged log precludes overwrite
            # (replay refuses windows below the cut, by design).
            modes = ["upsert", "delta"] + ([] if purged else ["overwrite"])
            mode = rng.choice(modes)
            res = replay(log_dir, table_dir, target_lsn=applied, mode=mode)
            assert res.committed
            record(model_at(rows, applied), applied)

        elif step == "purge":
            # binlog retention rides the walk: drop fully-applied segments;
            # every later replay/expiry step must keep working above the cut
            from etl_rs_ray.sources.event_log import purge_log

            out = purge_log(log_dir, cur_hwm + 1, applied_hwm=cur_hwm)
            assert out["cut"] <= cur_hwm + 1
            purged = True

        elif step == "restore":
            # rollback composes with everything else on the walk. The
            # operational constraint: a restore below the log's purge cut
            # would strand the table (replay refuses the gap), so only
            # epochs whose HWM still reaches the cut are candidates.
            from etl_rs_ray.sources.event_log import purge_cut

            cut = purge_cut(log_dir)
            cur_e = lake.current_epoch()
            candidates = [
                e for e, (_, h) in epoch_model.items()
                if e < cur_e and h is not None and h + 1 >= cut
            ]
            if not candidates:
                continue
            target = rng.choice(candidates)
            new_e = lake.restore(target)
            t_state, t_hwm = epoch_model[target]
            epoch_model[new_e] = (t_state, t_hwm)
            # the walk's replay cursor stays monotonic; the next replay
            # simply re-applies the rolled-back window through LWW

        elif step == "compact":
            did = lake.compact()
            if did:
                record(cur_state, cur_hwm)

        elif step == "rebucket":
            n = lake.num_buckets
            target = n * 2 if n <= 8 else (n // 2 if rng.random() < 0.7 else n * 2)
            assert lake.rebucket(target) is True
            record(cur_state, cur_hwm)

        elif step == "lookup":
            present = rng.sample(sorted(cur_state), min(5, len(cur_state)))
            absent = [k for k in rng.sample(KEY_UNIVERSE, 6) if k not in cur_state][:3]
            got = {
                (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
                for r in lake.lookup(present + absent).to_pylist()
            }
            want = {k: cur_state[k] for k in present}
            # lookup hashes (repo, path) and post-filters commit, so OTHER
            # live commits sharing a probed (repo, path) may also return —
            # only when that commit was itself probed. Exactness per key:
            for k in present:
                assert got[k] == want[k], (seed, k)
            for k in absent:
                assert k not in got, (seed, k)

        elif step == "time_travel":
            e = rng.choice(sorted(epoch_model))
            assert lake_state(lake, epoch=e) == epoch_model[e][0], (seed, e)

        elif step == "changes":
            if len(epoch_model) < 2:
                continue
            e1, e2 = sorted(rng.sample(sorted(epoch_model), 2))
            s1, s2 = epoch_model[e1][0], epoch_model[e2][0]
            feed = lake.changes(e1, e2, include_old=True).take_all()
            got = {}
            for r in feed:
                k = (r["repo"], r["path"], r["commit"])
                assert k not in got, (seed, "duplicate feed key", k)
                got[k] = (r["op"], r["change_lsn"], r["content"],
                          r["old_lsn"], r["old_content"])
            want_keys = {
                k
                for k in set(s1) | set(s2)
                if s1.get(k) != s2.get(k)
            }
            assert set(got) == want_keys, (seed, e1, e2)
            # the old_* retraction columns are the IVM contract: exactly
            # the from-epoch state for U/D, nulls for I
            for k, (op, lsn, content, old_lsn, old_content) in got.items():
                if k not in s2:
                    assert op == "D" and content is None, (seed, k)
                    assert (old_lsn, old_content) == s1[k], (seed, k)
                elif k not in s1:
                    assert op == "I" and (lsn, content) == s2[k], (seed, k)
                    assert old_lsn is None and old_content is None, (seed, k)
                else:
                    assert op == "U" and (lsn, content) == s2[k], (seed, k)
                    assert (old_lsn, old_content) == s1[k], (seed, k)

        elif step == "fsck":
            rep = lake.fsck(deep=rng.random() < 0.5)
            assert rep["ok"], (seed, rep["issues"])

        elif step == "view_refresh":
            check_view()

        elif step == "cascade":
            check_cascade()

    # the downstream table catches up over whatever the walk left behind
    check_cascade()

    # end-of-walk invariants: final state, a zero-copy clone, then vacuum
    lake = LakeTable(table_dir)
    final_epoch = lake.current_epoch()
    assert lake_state(lake) == epoch_model[final_epoch][0]

    clone_dir = str(tmp_path / "clone")
    lake.clone_to(clone_dir)
    assert lake_state(LakeTable(clone_dir)) == epoch_model[final_epoch][0]
    shutil.rmtree(clone_dir)  # clone references source files; drop it
    # before vacuum so retention can't break it

    # retention tombstones through the log, composed with whatever bucket
    # layout / delta chains the walk left behind: expire first catches the
    # table up to the log head, then tombstones live keys whose version
    # predates the cut (fresh-LSN op=D events, ordinary delta epoch)
    from etl_rs_ray.pipelines.cdc import expire_before

    head_state = model_at(rows, max_lsn)
    live_lsns = sorted(lsn for lsn, _ in head_state.values())
    before_lsn = live_lsns[len(live_lsns) // 2]
    res = expire_before(log_dir, table_dir, before_lsn)
    expected = {k: v for k, v in head_state.items() if v[0] >= before_lsn}
    assert res["expired"] == len(head_state) - len(expected), seed
    lake = LakeTable(table_dir)
    assert lake_state(lake) == expected, seed
    # idempotent: re-running expires nothing
    assert expire_before(log_dir, table_dir, before_lsn)["expired"] == 0

    # the view catches up over the expiry epochs too (the vacuum-rebuild
    # fallback path has its own dedicated test in test_matview.py)
    epoch_model[LakeTable(table_dir).current_epoch()] = (expected, None)
    check_view()

    lake.vacuum(keep_epochs=1)
    lake = LakeTable(table_dir)
    assert lake_state(lake) == expected
    rep = lake.fsck(deep=True)
    assert rep["ok"], rep["issues"]
    check_view()  # already at head: must be a clean no-op
